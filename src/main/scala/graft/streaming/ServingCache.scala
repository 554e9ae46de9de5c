package graft.streaming

import org.apache.spark.sql.DataFrame

/** Registry for the streaming serving tiers' PERSISTED static folds
  * (packed inverted-list / packed PQ-code rows — the stream-static build
  * sides in [[Streams.streamingAnnTopK]] / [[Streams.streamingAnnAdcTopK]]
  * / [[Streams.streamingAnnRerankTopK]]).
  *
  * Each fold is cached MEMORY_AND_DISK for the LIFETIME OF ITS QUERY —
  * steady-state serving pays the corpus scan + fold shuffle once, not per
  * micro-batch — but the fold is built inside the plan-construction call,
  * before any StreamingQuery (and its id) exists, so there is nothing to
  * key an automatic QueryTerminated unpersist on. Instead every fold
  * registers here and the OWNER of the stream's lifecycle releases it:
  *   - one-shot runs (bench / verify / tests) call [[releaseAll]] after
  *     the stream stops — without it, every (re)start in a shared JVM
  *     accumulates a corpus-sized cache entry (the r16 bench JVM held
  *     dozens of dead folds by the tail of a 230-key pass);
  *   - long-lived serving keeps the fold exactly as long as the query,
  *     releasing on restart/redeploy.
  */
object ServingCache {

  private val tracked =
    scala.collection.mutable.ArrayBuffer.empty[(String, DataFrame)]

  /** Register a persisted fold under a short diagnostic name; returns the
    * same frame so registration composes inline with the plan build. */
  def track(name: String, df: DataFrame): DataFrame = synchronized {
    tracked += ((name, df))
    df
  }

  /** Number of folds currently tracked (diagnostic / spec hook). */
  def size: Int = synchronized(tracked.size)

  /** Names of the folds currently tracked, registration order. */
  def names: Seq[String] = synchronized(tracked.map(_._1).toSeq)

  /** Unpersist every tracked fold (non-blocking) and clear the registry.
    * Safe to call with streams stopped; a running stream whose fold is
    * released simply re-caches it on the next micro-batch. Returns the
    * number of folds released. */
  def releaseAll(): Int = synchronized {
    val n = tracked.size
    tracked.foreach { case (_, df) =>
      try df.unpersist(blocking = false)
      catch { case _: Throwable => () } // a stopped session has no cache to drop
    }
    tracked.clear()
    n
  }
}

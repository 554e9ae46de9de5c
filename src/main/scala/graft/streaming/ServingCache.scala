package graft.streaming

import org.apache.spark.sql.DataFrame
import scala.util.control.NonFatal

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
  *   - long-lived serving ([[graft.exec.Serving]]) wraps its plan BUILD in
  *     [[withOwner]] and calls [[release]] with its own token when its
  *     stream stops — TWO serve assets running concurrently on one session
  *     (pipeline `concurrency: 2`, the shipped annserve fixture) release
  *     independently; through r17 the only release was global, so stopping
  *     one serve unpersisted the other's folds and silently degraded it to
  *     a corpus re-fold every micro-batch (ADVICE r17 #2).
  *
  * Ownership is carried on a DynamicVariable: folds register during plan
  * construction on the owner's own thread, so no signature threading is
  * needed through the tier builders.
  */
object ServingCache {

  private val tracked =
    scala.collection.mutable.ArrayBuffer.empty[(String, String, DataFrame)]

  /** Owner token for folds registered by the CURRENT THREAD's plan build;
    * registrations outside any [[withOwner]] scope land under "global"
    * (the one-shot bench/verify/test contract, released by releaseAll). */
  private val owner = new scala.util.DynamicVariable[String]("global")

  /** Run `f` (a plan-construction section) with every fold it registers
    * owned by `token`, so [[release]] with the same token drops exactly
    * those folds and no others. */
  def withOwner[T](token: String)(f: => T): T = owner.withValue(token)(f)

  /** Register a persisted fold under a short diagnostic name; returns the
    * same frame so registration composes inline with the plan build. */
  def track(name: String, df: DataFrame): DataFrame = {
    val o = owner.value
    synchronized { tracked += ((o, name, df)) }
    df
  }

  /** Number of folds currently tracked (diagnostic / spec hook). */
  def size: Int = synchronized(tracked.size)

  /** Names of the folds currently tracked, registration order. */
  def names: Seq[String] = synchronized(tracked.map(_._2).toSeq)

  /** Names of the folds currently tracked for one owner token. */
  def namesFor(token: String): Seq[String] =
    synchronized(tracked.collect { case (o, n, _) if o == token => n }.toSeq)

  private def unpersistQuietly(df: DataFrame): Unit =
    try df.unpersist(blocking = false)
    catch { case NonFatal(_) => () } // a stopped session has no cache to drop

  /** Unpersist the folds registered under `token` (non-blocking) and drop
    * them from the registry; folds owned by OTHER tokens — other serving
    * streams sharing the session — stay cached. A running stream whose
    * fold is released simply re-caches it on the next micro-batch.
    * Returns the number of folds released. */
  def release(token: String): Int = synchronized {
    val (mine, rest) = tracked.partition(_._1 == token)
    mine.foreach { case (_, _, df) => unpersistQuietly(df) }
    tracked.clear()
    tracked ++= rest
    mine.size
  }

  /** Unpersist EVERY tracked fold regardless of owner and clear the
    * registry — the one-shot-run contract (bench / verify / tests), where
    * the single caller owns the whole JVM's stream lifecycle. Returns the
    * number of folds released. */
  def releaseAll(): Int = synchronized {
    val n = tracked.size
    tracked.foreach { case (_, _, df) => unpersistQuietly(df) }
    tracked.clear()
    n
  }
}

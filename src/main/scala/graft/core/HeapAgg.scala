package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Per-query scoping for Spark's object-hash-aggregation memory valve.
  *
  * `spark.sql.objectHashAggregate.sortBased.fallbackThreshold` (default
  * 128 groups) flips an ObjectHashAggregate to SORT-based aggregation
  * once a partition sees that many groups — the safety valve for
  * UNBOUNDED per-group state (collect_list/collect_set/percentile),
  * which would otherwise grow the hash map until the executor OOMs.
  *
  * graft's own typed aggregates ([[graft.functions.BoundedTopK]],
  * [[graft.functions.CappedCollectList]]) keep O(k) rows per group BY
  * CONSTRUCTION, so for them the valve only destroys performance: the
  * sort fallback sorts the full joined input per partition (observed at
  * the sf10 streaming-ANN probe: hours instead of minutes on one
  * straggling sorted partial). Through r16 every session builder raised
  * the threshold SESSION-WIDE, which kept the bounded heaps fast but
  * disabled the valve for any future unbounded aggregate (ADVICE r15/
  * VERDICT r16 #3). This helper scopes the raise to exactly the plans
  * that carry a k-bounded aggregate and restores the session default
  * afterwards. */
object HeapAgg {

  val Key = "spark.sql.objectHashAggregate.sortBased.fallbackThreshold"

  /** 2M groups — large enough that every measured bounded-heap plan stays
    * on the hash path, finite so a pathological group explosion still has
    * a ceiling. */
  val Raised = "2097152"

  /** prettyNames of graft's k-bounded TypedImperativeAggregates — the only
    * aggregates whose per-group state is capped and therefore safe to keep
    * on the hash path at any group count. A NEW bounded aggregate must be
    * listed here or its plans silently fall back to sort at scale. */
  private val BoundedAggs = Seq("bounded_top_k", "capped_collect_list")

  /** Does this (batch or streaming) plan aggregate with a k-bounded heap?
    * Answered from the ANALYZED plan — no execution is triggered. */
  def plansBoundedAgg(df: DataFrame): Boolean = {
    val p = df.queryExecution.analyzed.toString
    BoundedAggs.exists(p.contains)
  }

  /** Run `f` with the fallback threshold raised, restoring the prior
    * session value (usually the Spark default = valve armed) afterwards —
    * even on failure. Covers both plan construction and execution, so
    * callers wrap the whole action (streaming queries capture the conf at
    * query start; batch actions read it at execution). */
  def withRaised[T](spark: SparkSession)(f: => T): T = {
    val prior = spark.conf.getOption(Key)
    spark.conf.set(Key, Raised)
    try f
    finally prior match {
      case Some(v)    => spark.conf.set(Key, v)
      case scala.None => spark.conf.unset(Key)
    }
  }

  /** Execute `action` with the raise ONLY when `df`'s plan carries a
    * k-bounded aggregate — the per-query form of the old session-wide
    * conf: bounded heaps stay on the hash path, everything else keeps the
    * default valve. */
  def maybeRaised[T](df: DataFrame)(action: => T): T =
    if (plansBoundedAgg(df)) withRaised(df.sparkSession)(action) else action
}

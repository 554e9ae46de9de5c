package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.aggregate.AggregateExpression
import org.apache.spark.sql.graft.SqlBridge

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
  * disabled the valve for any future unbounded aggregate; r17's
  * `withRaised` scoped the raise per query but MUTATED the shared
  * session conf, so two assets on one session (pipeline concurrency > 1,
  * the shipped annserve fixture) could interleave raises/restores and
  * leave the session permanently raised, or plan an UNBOUNDED aggregate
  * inside another asset's raised window (ADVICE r17 #1).
  *
  * r18 removes the shared-conf mutation entirely: the raise now lives on
  * a per-use CLONED session (`SQLConf` is per-session; `cloneSession`
  * shares the SparkContext, block manager, and catalog), and the plan
  * that carries the bounded heap is REBOUND onto that clone. Nothing
  * else on the original session can ever observe the raised value — the
  * valve stays armed for every concurrent plan, and there is no restore
  * step to corrupt.
  */
object HeapAgg {

  val Key = "spark.sql.objectHashAggregate.sortBased.fallbackThreshold"

  /** 2M groups — large enough that every measured bounded-heap plan stays
    * on the hash path, finite so a pathological group explosion still has
    * a ceiling. */
  val Raised = "2097152"

  /** Is this aggregate function one of graft's k-bounded
    * TypedImperativeAggregates — the only aggregates whose per-group
    * state is capped and therefore safe to keep on the hash path at any
    * group count? Matched on the aggregate CLASS, never on plan text (a
    * user column literally named `bounded_top_k` must not trigger the
    * raise). A NEW bounded aggregate must be listed here or its plans
    * silently fall back to sort at scale. */
  private def isBounded(fn: Any): Boolean = fn match {
    case _: graft.functions.BoundedTopK        => true
    case _: graft.functions.CappedCollectList  => true
    case _                                     => false
  }

  /** Does this (batch or streaming) plan aggregate with a k-bounded heap?
    * Answered by walking the ANALYZED plan's aggregate expressions — no
    * execution is triggered, and names appearing in data/columns cannot
    * false-positive. Subquery expressions are descended explicitly
    * (`Expression.exists` stops at a SubqueryExpression's plan boundary,
    * and a bounded heap inside a scalar subquery still needs the raise). */
  def plansBoundedAgg(df: DataFrame): Boolean = {
    def planHas(plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): Boolean =
      plan.exists(node => node.expressions.exists(_.exists {
        case ae: AggregateExpression => isBounded(ae.aggregateFunction)
        case s: org.apache.spark.sql.catalyst.expressions.SubqueryExpression =>
          planHas(s.plan)
        case _ => false
      }))
    planHas(df.queryExecution.analyzed)
  }

  /** A cloned session with the fallback threshold raised. Shares the
    * SparkContext, block-manager cache, and external catalog with
    * `spark`; conf and temp views are copied at clone time. The parent
    * session's conf is NEVER touched — concurrent plans on it keep the
    * default valve. Use for streaming builders whose bounded-heap plan is
    * constructed (and whose query starts) inside the builder call. */
  def raisedClone(spark: SparkSession): SparkSession =
    SqlBridge.sessionWithConf(spark, Key -> Raised)

  /** Rebind `df`'s plan onto a raised clone of its session: the returned
    * frame plans/executes under the raised threshold, while the original
    * session — and every other plan on it — keeps the default valve. */
  def rebindRaised(df: DataFrame): DataFrame =
    SqlBridge.ofRows(raisedClone(df.sparkSession), SqlBridge.analyzedPlan(df))

  /** The per-query form of the old session-wide conf: IF `df`'s plan
    * carries a k-bounded aggregate, return it rebound onto a raised
    * clone (bounded heaps stay on the hash path); otherwise return `df`
    * unchanged (everything else keeps the default valve). Race-free by
    * construction — no shared state is written. */
  def maybeRebound(df: DataFrame): DataFrame =
    if (plansBoundedAgg(df)) rebindRaised(df) else df
}

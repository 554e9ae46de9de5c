package graft

import org.scalatest.funsuite.AnyFunSuite

/** Plan-shape invariants for the scale-critical operators: the properties
  * that make a query survive a 100× scale-up (pushdown reaching the scan,
  * broadcast of small sides, bounded Exchanges, distributed top-N) are
  * asserted on the compiled plan so a refactor can't silently regress them.
  */
class PlanSpec extends AnyFunSuite {
  import SparkTestSession._

  private def planOf(name: String): String = {
    val df = SparkEntry.queries(name)(spark, sfDir)
    df.queryExecution.executedPlan.toString
  }

  test("stratified sampling is a pure pruned scan — no shuffle, no extra columns") {
    val p = planOf("sample_stratified")
    assert(!p.contains("Exchange"), "sampling must not shuffle")
    // the scan prunes to exactly the projected columns — through the parquet
    // reader, or through the cached-relation scan when another suite already
    // cached the table in this shared session
    assert(p.contains("ReadSchema: struct<doc_id:bigint,lang:string,source:string>") ||
      """InMemoryTableScan \[doc_id#\d+L?, lang#\d+, source#\d+\]""".r.findFirstIn(p).nonEmpty,
      s"scan must prune to exactly the projected columns:\n$p")
  }

  test("vocabulary top-N plans as distributed TakeOrderedAndProject") {
    val p = planOf("text_vocab")
    assert(p.contains("TakeOrderedAndProject"),
      "global top-N must not single-partition the vocabulary")
  }

  test("sessionize shares one user-key shuffle across windows and rollup") {
    val p = planOf("rel_sessionize")
    // count SHUFFLE exchanges specifically — a BroadcastExchange or
    // ReusedExchange elsewhere would not violate the invariant
    assert("Exchange hashpartitioning".r.findAllIn(p).size == 1,
      s"windows + aggregation should reuse one user-key shuffle:\n$p")
  }

  test("repetition runs both aggregations on one id-keyed shuffle") {
    val p = planOf("text_repetition")
    assert("Exchange hashpartitioning".r.findAllIn(p).size == 1,
      s"id-partitioning should serve the per-bigram and per-id aggregations:\n$p")
  }

  test("contamination broadcasts the eval gram set") {
    assert(planOf("dedup_contamination").contains("BroadcastHashJoin"),
      "train side must stream against a broadcast eval side")
  }

  test("capped jaccard never self-joins raw gram rows") {
    val p = planOf("dedup_ngram_jaccard")
    assert(p.contains("collect_list"),
      "candidates must come from df-bounded gram buckets (one shuffle)")
    val joinLines = p.split("\n").filter(_.contains("Join"))
    assert(!joinLines.exists(_.contains("gram#")),
      s"raw gram rows must never be a join key in the capped path:\n${joinLines.mkString("\n")}")
    assert(p.contains("array_intersect"),
      "surviving candidates must be exact-verified over the full gram sets")
  }

  test("no cartesian products anywhere in the registry's relational plans") {
    // no exemptions: even simhash's deliberate words×bits crossJoin plans as
    // a BroadcastNestedLoopJoin over the 60-row literal side, never a
    // CartesianProduct
    SparkEntry.queries.keys.foreach { name =>
      val p = planOf(name)
      assert(!p.contains("CartesianProduct"),
        s"$name plans a CartesianProduct — unbounded at scale")
    }
  }
}

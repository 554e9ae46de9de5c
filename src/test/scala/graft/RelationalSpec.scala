package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

object SparkTestSession {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      // object-agg fallback valve at the SESSION DEFAULT: specs exercise
      // the same scoped-raise path (graft.core.HeapAgg) the product
      // surfaces use, and tiny-SF sort fallbacks are harmless
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.warehouse.dir",
        s"/tmp/graft-wh-test-${ProcessHandle.current().pid()}")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }
  val sfDir = "/root/testdata/sf0.001"
}

class RelationalSpec extends AnyFunSuite {
  import SparkTestSession._

  // anti-join style queries can be legitimately empty on the tiny SF
  private val mayBeEmpty = Set("rel_left_anti")

  test("every registered query runs and is non-degenerate at sf0.001") {
    SparkEntry.registry.foreach { q =>
      val df = q.run(spark, sfDir)
      assert(df.columns.nonEmpty, s"${q.name}: no columns")
      val n = df.count()
      if (!mayBeEmpty(q.name)) assert(n > 0, s"${q.name}: empty result")
    }
  }

  test("query and oracle keys line up") {
    val qk = SparkEntry.queries.keySet
    assert(SparkEntry.oracleSql.keySet.subsetOf(qk))
  }

  test("entry smoke returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("pricing summary has expected shape") {
    val df = SparkEntry.queries("rel_agg_pricing_summary")(spark, sfDir)
    assert(df.columns.toSet ==
      Set("l_returnflag", "l_linestatus", "sum_qty", "sum_base_price",
        "sum_disc_price", "min_price", "max_price", "count_order"))
  }

  test("as-of join: inclusive/strict bounds, tie-break, no-match nulls") {
    import org.apache.spark.sql.functions.col
    // left events at t=5,10,20 for key 1; right versions at t=5 (two rows,
    // ids 100/101 — tie), t=10, t=15; key 2 has a left row with NO right
    val left = spark.createDataFrame(Seq(
      (1L, 1, 5L), (2L, 1, 10L), (3L, 1, 20L), (4L, 2, 7L)))
      .toDF("eid", "k", "t")
    val right = spark.createDataFrame(Seq(
      (100L, 1, 5L, "a"), (101L, 1, 5L, "b"), (110L, 1, 10L, "c"),
      (115L, 1, 15L, "d")))
      .toDF("rid", "k", "rt", "v")
    def run(strict: Boolean) =
      graft.ops.AsOf.asofJoin(left, right, Seq("k"), "t", "rt",
        payload = Seq("rid", "v"), tieCol = "rid", strict = strict)
        .collect().map(r => r.getLong(0) ->
          (if (r.isNullAt(3)) None else Some((r.getLong(3), r.getString(4)))))
        .toMap
    val incl = run(strict = false)
    // t=5: both right rows at 5 visible under <=, greatest rid wins the tie
    assert(incl(1L) == Some((101L, "b")))
    assert(incl(2L) == Some((110L, "c")))
    assert(incl(3L) == Some((115L, "d")))
    assert(incl(4L) == None, "key with no right side must keep NULL payload")
    val strict = run(strict = true)
    assert(strict(1L) == None, "strict < must not see the tying right row")
    assert(strict(2L) == Some((101L, "b")), "strict at t=10 sees only t=5 rows")
    assert(strict(3L) == Some((115L, "d")))
    // plan shape: the sweep is ONE exchange (the key partition), no join
    val plan = graft.ops.AsOf.asofJoin(left, right, Seq("k"), "t", "rt",
      payload = Seq("rid", "v"), tieCol = "rid")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), s"as-of must not plan a join:\n$plan")
    assert("Exchange".r.findAllIn(plan).size == 1,
      s"as-of must shuffle exactly once:\n$plan")
    // STRING tie columns keep their native ordering (a long cast would
    // NULL them out and break the greatest-tie-wins determinism)
    val rightS = right.selectExpr("concat('id', rid) AS srid", "k", "rt", "v")
    val tied = graft.ops.AsOf.asofJoin(left, rightS, Seq("k"), "t", "rt",
      payload = Seq("srid", "v"), tieCol = "srid")
      .collect().map(r => r.getLong(0) -> r.getString(3)).toMap
    assert(tied(1L) == "id101", s"string tie must pick the greatest: $tied")
  }

  test("object-agg valve: session default armed, HeapAgg scopes the raise") {
    import graft.core.HeapAgg
    import org.apache.spark.sql.functions.{col, collect_list}
    // through r16 every session builder disabled the valve session-wide;
    // the raise is now scoped per bounded-heap query (VERDICT r16 #3)
    assert(spark.conf.get(HeapAgg.Key) == "128",
      "the sort-fallback valve must sit at the Spark default between queries")
    // an UNBOUNDED collect_list over ~3M groups on a tiny heap slice:
    // with the valve armed each partition's hash agg flips to sort at 128
    // groups and the query COMPLETES instead of ballooning the hash map
    // (the session-wide raise turned this into an OOM candidate at scale)
    val grouped = spark.range(3000000L)
      .selectExpr("id AS g", "CAST(id % 97 AS STRING) AS v")
      .groupBy("g").agg(collect_list("v").as("vs"))
    assert(grouped.count() == 3000000L)
    // the raise lives on a CLONED session; the shared session's conf is
    // never written, so concurrent assets can't interleave a set/restore
    // into a permanent raise (ADVICE r17 #1)
    val clone = HeapAgg.raisedClone(spark)
    assert(clone.conf.get(HeapAgg.Key) == HeapAgg.Raised)
    assert(spark.conf.get(HeapAgg.Key) == "128",
      "raisedClone must leave the parent session's valve armed")
    // plan sniffing: a bounded-heap plan is recognized, a plain agg is not
    val bounded = graft.ops.Sampling.groupTopK(
      spark.range(100).selectExpr("id % 10 AS g", "id AS x"),
      Seq("g"), Seq(col("x")), 3)
    assert(HeapAgg.plansBoundedAgg(bounded))
    assert(!HeapAgg.plansBoundedAgg(grouped))
    // the sniff walks aggregate CLASSES, not plan text: a column literally
    // named bounded_top_k must not trigger the raise (VERDICT r17 #3)
    val decoy = spark.range(100)
      .selectExpr("id % 10 AS g", "id AS bounded_top_k")
      .groupBy("g").agg(collect_list(col("bounded_top_k")).as("capped_collect_list"))
    assert(!HeapAgg.plansBoundedAgg(decoy),
      "a column named after the aggregate must not false-positive the sniff")
    // maybeRebound: bounded plans come back on a raised clone with the
    // same result; unbounded plans come back untouched
    val rebound = HeapAgg.maybeRebound(bounded)
    assert(rebound.sparkSession ne spark)
    assert(rebound.sparkSession.conf.get(HeapAgg.Key) == HeapAgg.Raised)
    assert(rebound.collect().length == bounded.collect().length)
    assert(HeapAgg.maybeRebound(decoy).sparkSession eq spark)
  }
}

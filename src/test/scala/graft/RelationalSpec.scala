package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

object SparkTestSession {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
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
}

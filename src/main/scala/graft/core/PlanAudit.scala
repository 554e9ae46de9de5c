package graft.core

import org.apache.spark.sql.SparkSession

/** Dev-only: print executed plans of registered queries (args = names) so
  * shuffle/pushdown shape can be audited without running the full bench. */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val qs = graft.SparkEntry.queries
    args.foreach { name =>
      println(s"===== $name =====")
      println(qs(name)(spark, sfDir).queryExecution.executedPlan.toString.take(4000))
    }
    spark.stop()
  }
}

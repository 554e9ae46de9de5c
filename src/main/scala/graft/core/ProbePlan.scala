package graft.core

import org.apache.spark.sql.SparkSession

/** Dev-only: dump an analyzed plan to inspect alias/relation structure. */
object ProbePlan {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[2]")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Tables.register(spark, "/root/testdata/sf0.001")
    val plan = spark.sql(
      "SELECT n_name, count(*) AS n FROM nation JOIN region ON n_regionkey = r_regionkey GROUP BY n_name")
      .queryExecution.analyzed
    println(plan.treeString)
    spark.stop()
  }
}

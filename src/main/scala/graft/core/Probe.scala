package graft.core

import org.apache.spark.sql.SparkSession

/** Dev-only: print schemas of the testdata tables (checks ns-timestamp read). */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    Tables.all.foreach { t =>
      try {
        val df = Tables.load(spark, dir, t)
        println(s"== $t: ${df.schema.simpleString}")
        df.show(2, truncate = false)
      } catch { case e: Throwable => println(s"== $t FAILED: ${e.getMessage.take(300)}") }
    }
    spark.stop()
  }
}

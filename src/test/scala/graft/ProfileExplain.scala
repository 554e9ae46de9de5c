package graft
import org.apache.spark.sql.SparkSession
object ProfileExplain {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.core.Tables.register(spark, "/root/testdata/sf0.01")
    val q = graft.ops.Dedup.jaccardPairs(spark.table("documents"))
    q.count() // let AQE finalize
    val plan = q.queryExecution.executedPlan.toString
    println("REUSED_EXCHANGE=" + plan.contains("ReusedExchange"))
    println(plan.split("\n").filter(l => l.contains("Exchange") || l.contains("MapElements") || l.contains("Scan parquet")).mkString("\n"))
    spark.stop()
  }
}

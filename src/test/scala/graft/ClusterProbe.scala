package graft.core

import org.apache.spark.sql.SparkSession

/** Dev probe: phase timings for Dedup.clusters at a given SF dir. */
object ClusterProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Tables.register(spark, sfDir)
    val docs = spark.table("documents")
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[probe] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val pairs = t("jaccardPairs count") {
      val p = graft.ops.Dedup.jaccardPairs(docs, 3, 0.5).cache(); println(p.count()); p
    }
    t("clusters from cached pairs") {
      println(graft.ops.Dedup.clusters(docs, pairs).count())
    }
    spark.stop()
  }
}

package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ops.{Dedup, TextAnalysis}

/** Throwaway stage-level profiling for the r9 curation capstone. */
object ProfileCuration {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.core.Tables.register(spark, sfDir)
    val docs = spark.table("documents")

    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"$label%-40s ${(System.nanoTime() - t0) / 1e9}%8.2f s   rows=$n")
    }

    val gateIds = TextAnalysis.gopherFilter(docs)
      .where(col("passes_gopher")).select("doc_id")
    time("gate (gopher)") { gateIds.count() }
    val gated = docs.join(gateIds, Seq("doc_id"))
    val lined = TextAnalysis.lineDedup(
      gated.withColumn("text", regexp_replace(col("text"), " (the|a) ", "\n")),
      minDf = 3)
    time("line dedup") { lined.count() }
    val cleaned = gated.drop("text").join(
      lined.where(col("n_lines_kept") >= 1)
        .select(col("doc_id"), col("text_deduped").as("text")), Seq("doc_id"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    time("cleaned (materialize cache)") { cleaned.count() }
    val losers = Dedup.jaccardPairs(cleaned, n = 3, threshold = 0.5, maxDocFreq = 20)
      .select(col("b").as("doc_id")).distinct()
    time("fuzzy losers (jaccard over cached)") { losers.count() }
    val fuzzy = cleaned.join(losers, Seq("doc_id"), "left_anti")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    time("fuzzy (materialize cache)") { fuzzy.count() }
    val b = graft.ops.Sampling.hashBucket(col("doc_id"))
    val train = fuzzy.where(b >= 10)
    val dirty = Dedup.contamination(train, fuzzy.where(b < 10), n = 5)
      .select("doc_id")
    time("contamination") { dirty.count() }
    val decon = train.join(dirty, Seq("doc_id"), "left_anti")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    time("decon (materialize cache)") { decon.count() }
    time("decon.count again (cache probe)") { decon.count() }
    time("decon counts agg only") {
      decon.groupBy("lang").agg(count("*")).count()
    }
    val mixed = graft.ops.Sampling.mixture(decon, "lang",
      Map("en" -> 0.4, "de" -> 0.2, "es" -> 0.2, "fr" -> 0.1, "zh" -> 0.1))
    println("== mixed plan (tail):")
    val pl = mixed.queryExecution.executedPlan.toString
    println(pl.linesIterator.filter(l => l.contains("InMemory") || l.contains("Scan parquet")).mkString("\n").take(2000))
    time("mixture") { mixed.count() }
    val out = graft.ops.Sampling.split(mixed)
      .groupBy("split", "lang")
      .agg(count("*").cast("long").as("n_docs"),
        sum("n_chars").cast("long").as("sum_chars"))
    time("split+rollup (end)") { out.count() }
    time("full again (warm)") { out.count() }
    spark.stop()
  }
}

package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway profiling harness (round 7, sample_dsir_scores cost). */
object ProfileDsir {
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
    val docs = spark.table("documents").cache()
    println(s"docs: ${docs.count()}")
    val target = docs.where(col("lang") === "en")

    def time(name: String)(f: => Long): Unit = {
      f
      val ts = (1 to 2).map { _ =>
        val t0 = System.nanoTime(); val n = f; (System.nanoTime() - t0) / 1e9 -> n
      }
      println(f"$name%-34s ${ts.map(_._1).min}%8.3f s   rows=${ts.head._2}")
    }

    // words only
    val ws = graft.ops.TextAnalysis.words(col("text"))
    time("explode unigrams") {
      docs.select(explode(ws)).count()
    }
    val bigrams = when(size(ws) >= 2,
      transform(sequence(lit(0), size(ws) - 2),
        i => concat_ws(" ", element_at(ws, i + 1), element_at(ws, i + 2))))
      .otherwise(array().cast("array<string>"))
    time("explode bigrams") {
      docs.select(explode(bigrams)).count()
    }
    time("explode uni+bi concat") {
      docs.select(explode(concat(ws, bigrams))).count()
    }
    time("grams + md5 bucket") {
      docs.select(explode(concat(ws, bigrams)).as("gram"))
        .select((conv(substring(md5(col("gram")), 1, 8), 16, 10).cast("long") % 1024).as("b"))
        .count()
    }
    time("bucketLogProbs(raw)") {
      graft.ops.Dsir.bucketLogProbs(docs).count()
    }
    time("bucketLogProbs(target)") {
      graft.ops.Dsir.bucketLogProbs(target).count()
    }
    time("full scores") {
      graft.ops.Dsir.scores(docs, target).count()
    }
    spark.stop()
  }
}

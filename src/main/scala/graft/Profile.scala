package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway profiling harness (round 4, dedup_ngram_jaccard regression). */
object Profile {
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

    def time(name: String)(f: => Long): Unit = {
      // warm once, then measure twice
      f
      val ts = (1 to 2).map { _ =>
        val t0 = System.nanoTime(); val n = f; (System.nanoTime() - t0) / 1e9 -> n
      }
      println(f"$name%-28s ${ts.map(_._1).min}%8.3f s   rows=${ts.head._2}")
    }

    // stage decomposition
    time("shingleArray(JVM).count")   { graft.ops.Dedup.shingleArray(docs).count() }
    time("shingles(explode).count")   { graft.ops.Dedup.shingles(docs).count() }
    time("jaccardPairs uncapped")     { graft.ops.Dedup.jaccardPairs(docs).count() }
    time("jaccardPairs capped20")     { graft.ops.Dedup.jaccardPairs(docs, maxDocFreq = 20).count() }

    // pure-Catalyst shingles alternative: materialize words col, then HOF walk
    def catalystShingles(n: Int) = {
      val ws = docs.select(col("doc_id"), graft.ops.TextAnalysis.words(col("text")).as("ws"))
      ws.select(col("doc_id"), explode(array_distinct(
        when(size(col("ws")) >= n,
          transform(sequence(lit(0), size(col("ws")) - n),
            i => concat_ws(" ", (0 until n).map(j => element_at(col("ws"), i + j + 1)): _*)))
          .otherwise(array().cast("array<string>")))).as("gram"))
    }
    time("catalystShingles.count")    { catalystShingles(3).count() }
    // full jaccard on catalyst shingles
    def jacCat(): Long = {
      val sh = catalystShingles(3)
      val counts = sh.groupBy("doc_id").agg(count("*").as("n_grams"))
      val a = sh.select(col("doc_id").as("a"), col("gram"))
      val b = sh.select(col("doc_id").as("b"), col("gram"))
      val common = a.join(b, Seq("gram")).where(col("a") < col("b"))
        .groupBy("a", "b").agg(count("*").as("common"))
      common
        .join(counts.select(col("doc_id").as("a"), col("n_grams").as("na")), Seq("a"))
        .join(counts.select(col("doc_id").as("b"), col("n_grams").as("nb")), Seq("b"))
        .where(col("common") / (col("na") + col("nb") - col("common")) >= 0.5)
        .count()
    }
    time("jaccard catalyst-sh")       { jacCat() }
    time("simhash(JVM)")              { graft.ops.Dedup.simhash(docs).count() }
    time("minhashLsh")                { graft.ops.Dedup.minhashLsh(docs).count() }

    // capped-path stage decomposition
    def cappedCandidates(maxDocFreq: Int) = {
      val shx = graft.ops.Dedup.shingles(docs)
      val buckets = shx.groupBy("gram").agg(collect_list(col("doc_id")).as("__ids"))
        .where(size(col("__ids")).between(2, maxDocFreq))
      buckets
        .select(explode(col("__ids")).as("a"), col("__ids"))
        .select(col("a"), explode(col("__ids")).as("b"))
        .where(col("a") < col("b"))
        .distinct()
    }
    time("capped20 candidates") { cappedCandidates(20).count() }
    val cand = cappedCandidates(20).cache(); cand.count()
    def verifyOnly(): Long = {
      val shArr = graft.ops.Dedup.shingleArray(docs)
      val ga = shArr.select(col("doc_id").as("a"), col("grams").as("__ga"))
      val gb = shArr.select(col("doc_id").as("b"), col("grams").as("__gb"))
      cand.join(ga, Seq("a")).join(gb, Seq("b"))
        .select(col("a"), col("b"),
          size(array_intersect(col("__ga"), col("__gb"))).cast("long").as("common"),
          size(col("__ga")).cast("long").as("na"), size(col("__gb")).cast("long").as("nb"))
        .where(col("common") / (col("na") + col("nb") - col("common")) >= 0.5)
        .count()
    }
    time("verify on cached cand") { verifyOnly() }
    def verifyBroadcast(): Long = {
      val shArr = graft.ops.Dedup.shingleArray(docs)
      val ga = broadcast(shArr.select(col("doc_id").as("a"), col("grams").as("__ga")))
      val gb = broadcast(shArr.select(col("doc_id").as("b"), col("grams").as("__gb")))
      cand.join(ga, Seq("a")).join(gb, Seq("b"))
        .select(col("a"), col("b"),
          size(array_intersect(col("__ga"), col("__gb"))).cast("long").as("common"),
          size(col("__ga")).cast("long").as("na"), size(col("__gb")).cast("long").as("nb"))
        .where(col("common") / (col("na") + col("nb") - col("common")) >= 0.5)
        .count()
    }
    time("verify bcast gram maps") { verifyBroadcast() }
    cand.unpersist()

    // candidate volume diagnostics
    val sh = graft.ops.Dedup.shingles(docs)
    val gramDf = sh.groupBy("gram").agg(count("*").as("df"))
    gramDf.select(max("df").as("max_df"), expr("percentile(df, 0.999)").as("p999"),
      sum(col("df") * col("df")).as("sum_df2"), count("*").as("n_grams")).show()
    spark.stop()
  }
}

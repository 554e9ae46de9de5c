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

    // capped full-query variants
    def shArr() = graft.ops.Dedup.shingleArray(docs)
    def bucketCand() = {
      val shx = shArr().select(col("doc_id"), explode(col("grams")).as("gram"))
      shx.groupBy("gram").agg(collect_list(col("doc_id")).as("__ids"))
        .where(size(col("__ids")).between(2, 20))
        .select(explode(col("__ids")).as("a"), col("__ids"))
        .select(col("a"), explode(col("__ids")).as("b"))
        .where(col("a") < col("b"))
    }
    def finish(c: org.apache.spark.sql.DataFrame): Long =
      c.select(col("a"), col("b"),
          size(array_intersect(col("__ga"), col("__gb"))).cast("long").as("common"),
          size(col("__ga")).cast("long").as("na"), size(col("__gb")).cast("long").as("nb"))
        .where(col("common") / (col("na") + col("nb") - col("common")) >= 0.5)
        .count()
    time("V1 full capped20 (current)") { graft.ops.Dedup.jaccardPairs(docs, maxDocFreq = 20).count() }
    time("V2 grpBy+bcast verify") {
      val cand = bucketCand().groupBy("a", "b").agg(count("*").as("cc"))
      finish(cand
        .join(broadcast(shArr().select(col("doc_id").as("a"), col("grams").as("__ga"))), Seq("a"))
        .join(broadcast(shArr().select(col("doc_id").as("b"), col("grams").as("__gb"))), Seq("b")))
    }
    time("V3 distinct+bcast verify") {
      val cand = bucketCand().distinct()
      finish(cand
        .join(broadcast(shArr().select(col("doc_id").as("a"), col("grams").as("__ga"))), Seq("a"))
        .join(broadcast(shArr().select(col("doc_id").as("b"), col("grams").as("__gb"))), Seq("b")))
    }
    time("V5 distinct+repart+bcast") {
      val cand = bucketCand().distinct().repartition(32)
      finish(cand
        .join(broadcast(shArr().select(col("doc_id").as("a"), col("grams").as("__ga"))), Seq("a"))
        .join(broadcast(shArr().select(col("doc_id").as("b"), col("grams").as("__gb"))), Seq("b")))
    }
    time("V6 V5+noDoubleEval") {
      val cand = bucketCand().distinct().repartition(32)
      val joined = cand
        .join(broadcast(shArr().select(col("doc_id").as("a"), col("grams").as("__ga"))), Seq("a"))
        .join(broadcast(shArr().select(col("doc_id").as("b"), col("grams").as("__gb"))), Seq("b"))
      import org.apache.spark.sql.Row
      import org.apache.spark.sql.types._
      val schema = StructType(Seq(StructField("a", LongType), StructField("b", LongType),
        StructField("jaccard", DoubleType)))
      joined.select(col("a").cast("long"), col("b").cast("long"), col("__ga"), col("__gb"))
        .flatMap { r =>
          val ga = r.getSeq[String](2).toSet
          val gb = r.getSeq[String](3)
          val common = gb.count(ga.contains)
          val j = common.toDouble / (ga.size + gb.size - common)
          if (j >= 0.5) Iterator(Row(r.getLong(0), r.getLong(1), j)) else Iterator.empty
        }(org.apache.spark.sql.Encoders.row(schema)).count()
    }
    time("V4 semijoin cand") {
      val sh0 = graft.ops.Dedup.shingles(docs)
      val ok = sh0.groupBy("gram").agg(count("*").as("__df"))
        .where(col("__df").between(2, 20)).select("gram")
      val joinSide = sh0.join(ok, Seq("gram"))
      val cand = joinSide.select(col("doc_id").as("a"), col("gram"))
        .join(joinSide.select(col("doc_id").as("b"), col("gram")), Seq("gram"))
        .where(col("a") < col("b")).select("a", "b").distinct()
      finish(cand
        .join(broadcast(shArr().select(col("doc_id").as("a"), col("grams").as("__ga"))), Seq("a"))
        .join(broadcast(shArr().select(col("doc_id").as("b"), col("grams").as("__gb"))), Seq("b")))
    }

    // candidate volume diagnostics
    val sh = graft.ops.Dedup.shingles(docs)
    val gramDf = sh.groupBy("gram").agg(count("*").as("df"))
    gramDf.select(max("df").as("max_df"), expr("percentile(df, 0.999)").as("p999"),
      sum(col("df") * col("df")).as("sum_df2"), count("*").as("n_grams")).show()
    spark.stop()
  }
}

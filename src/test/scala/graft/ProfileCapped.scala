package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway stage-level profiling for the capped-jaccard regression (r5). */
object ProfileCapped {
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
    println(s"docs: ${docs.count()}")

    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"$label%-40s ${(System.nanoTime() - t0) / 1e9}%8.2f s   rows=$n")
    }

    // whole queries
    time("capped jaccardPairs (full)") {
      graft.ops.Dedup.jaccardPairs(docs, n = 3, threshold = 0.5, maxDocFreq = 20).count()
    }
    time("capped jaccardPairs (again)") {
      graft.ops.Dedup.jaccardPairs(docs, n = 3, threshold = 0.5, maxDocFreq = 20).count()
    }
    time("uncapped jaccardPairs") {
      graft.ops.Dedup.jaccardPairs(docs, n = 3, threshold = 0.5).count()
    }

    // stages of the capped path, replicated
    val shx = graft.ops.Dedup.shingleArray(docs, 3, "doc_id", "text")
      .select(col("doc_id"), size(col("grams")).cast("long").as("n_grams"),
        explode(col("grams")).as("gram"))
    time("shingle+explode only") { shx.count() }

    import org.apache.spark.sql.graft.SqlBridge
    val cappedIds = SqlBridge.column(
      graft.functions.CappedCollectList(
        SqlBridge.expression(col("doc_id")), 20).toAggregateExpression())
    val buckets = shx.groupBy("gram").agg(cappedIds.as("__ids"))
      .where(size(col("__ids")).between(2, 20))
    time("bucket agg (CappedCollectList)") { buckets.count() }

    val plainBuckets = shx.groupBy("gram").agg(collect_list(col("doc_id")).as("__ids"))
      .where(size(col("__ids")).between(2, 20))
    time("bucket agg (plain collect_list)") { plainBuckets.count() }

    val dfCounts = shx.groupBy("gram").agg(count("*").as("df"))
      .where(col("df").between(2, 20))
    time("df count agg (codegen)") { dfCounts.count() }

    val candidates = buckets
      .select(explode(col("__ids")).as("a"), col("__ids"))
      .select(col("a"), explode(col("__ids")).as("b"))
      .where(col("a") < col("b"))
      .distinct()
    time("candidates (explode2+distinct)") { candidates.count() }

    // alternative candidate shape: df-filter + semi-join + self-join
    val kept = shx.join(broadcast(dfCounts.select("gram")), Seq("gram"))
    val ca = kept.select(col("doc_id").as("a"), col("gram"))
    val cb = kept.select(col("doc_id").as("b"), col("gram"))
    val cand2 = ca.join(cb, Seq("gram")).where(col("a") < col("b"))
      .select("a", "b").distinct()
    time("candidates (df-filter self-join)") { cand2.count() }

    // r9: full capped path replicated with the shingle stream PERSISTED
    // (one tokenize pass instead of one per branch)
    {
      val shp = shx.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      time("persisted: materialize shingles") { shp.count() }
      val heavy = shp.groupBy("gram").agg(count(lit(1)).as("__df"))
        .where(col("__df") > 20).select("gram")
      val kp = shp.join(heavy, Seq("gram"), "left_anti")
      val hpd = shp.join(heavy, Seq("gram"), "left_semi")
        .groupBy("doc_id").agg(count(lit(1)).as("__h"))
      val a2 = kp.select(col("doc_id").as("a"), col("n_grams").as("na"), col("gram"))
      val b2 = kp.select(col("doc_id").as("b"), col("n_grams").as("nb"), col("gram"))
      val pairKept = a2.join(b2, Seq("gram"))
        .where(col("a") < col("b") &&
          least(col("na"), col("nb")).cast("double") /
            greatest(col("na"), col("nb")) >= lit(0.5))
        .groupBy("a", "b", "na", "nb").agg(count(lit(1)).as("ck"))
      val wb = pairKept
        .join(hpd.select(col("doc_id").as("a"), col("__h").as("ha")), Seq("a"), "left")
        .join(hpd.select(col("doc_id").as("b"), col("__h").as("hb")), Seq("b"), "left")
        .withColumn("__hmin",
          least(coalesce(col("ha"), lit(0L)), coalesce(col("hb"), lit(0L))))
      val maybe = wb.where(
        (col("ck") + col("__hmin")).cast("double") /
          (col("na") + col("nb") - col("ck") - col("__hmin")) >= lit(0.5))
      time("persisted: capped pipeline to 'maybe'") { maybe.count() }
      time("persisted: full again (warm cache)") { maybe.count() }
      shp.unpersist()
    }

    // r9: same unpersisted pipeline but grams pre-hashed to 64-bit — the
    // shuffle/join/agg keys shrink from ~25-byte strings to longs
    {
      val shh = shx.withColumn("gram", xxhash64(col("gram")))
      val heavy = shh.groupBy("gram").agg(count(lit(1)).as("__df"))
        .where(col("__df") > 20).select("gram")
      val kp = shh.join(heavy, Seq("gram"), "left_anti")
      val hpd = shh.join(heavy, Seq("gram"), "left_semi")
        .groupBy("doc_id").agg(count(lit(1)).as("__h"))
      val a2 = kp.select(col("doc_id").as("a"), col("n_grams").as("na"), col("gram"))
      val b2 = kp.select(col("doc_id").as("b"), col("n_grams").as("nb"), col("gram"))
      val pairKept = a2.join(b2, Seq("gram"))
        .where(col("a") < col("b") &&
          least(col("na"), col("nb")).cast("double") /
            greatest(col("na"), col("nb")) >= lit(0.5))
        .groupBy("a", "b", "na", "nb").agg(count(lit(1)).as("ck"))
      val wb = pairKept
        .join(hpd.select(col("doc_id").as("a"), col("__h").as("ha")), Seq("a"), "left")
        .join(hpd.select(col("doc_id").as("b"), col("__h").as("hb")), Seq("b"), "left")
        .withColumn("__hmin",
          least(coalesce(col("ha"), lit(0L)), coalesce(col("hb"), lit(0L))))
      val maybe = wb.where(
        (col("ck") + col("__hmin")).cast("double") /
          (col("na") + col("nb") - col("ck") - col("__hmin")) >= lit(0.5))
      time("hashed-gram: capped to 'maybe' (cold)") { maybe.count() }
      time("hashed-gram: again (warm)") { maybe.count() }
    }

    spark.stop()
  }
}

package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Throwaway r12 profiling: which STAGING choice makes the capped jaccard
  * fastest end-to-end — two localCheckpoints (the r9 shape), none, only
  * the candidate checkpoint, or a lazy persist of the hashed gram stream.
  * All four variants produce identical output (same algebra, different
  * barriers); the question is pure scheduling cost at bench SF. */
object ProfileCappedStaging {
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
      println(f"$label%-52s ${(System.nanoTime() - t0) / 1e9}%8.2f s   rows=$n")
    }

    import graft.ops.Dedup

    // the full pipeline with pluggable staging of shx and maybe
    def pipeline(stageShx: DataFrame => DataFrame,
                 stageMaybe: DataFrame => DataFrame): DataFrame = {
      val idCol = "doc_id"; val threshold = 0.5; val maxDocFreq = 20
      val shx0 = Dedup.shingleArray(docs, 3, idCol, "text")
        .select(col(idCol), size(col("grams")).cast("long").as("n_grams"),
          explode(col("grams")).as("gram"))
        .withColumn("gram", xxhash64(col("gram")))
      val shxM = stageShx(shx0)
      val heavy = shxM.groupBy("gram").agg(count(lit(1)).as("__df"))
        .where(col("__df") > maxDocFreq).select("gram")
      val kept = shxM.join(heavy, Seq("gram"), "left_anti")
      val heavyPerDoc = shxM.join(heavy, Seq("gram"), "left_semi")
        .groupBy(idCol).agg(count(lit(1)).as("__h"))
      val a = kept.select(col(idCol).as("a"), col("n_grams").as("na"), col("gram"))
      val b = kept.select(col(idCol).as("b"), col("n_grams").as("nb"), col("gram"))
      val pairKept = a.join(b, Seq("gram"))
        .where(col("a") < col("b") &&
          least(col("na"), col("nb")).cast("double") /
            greatest(col("na"), col("nb")) >= lit(threshold))
        .groupBy("a", "b", "na", "nb").agg(count(lit(1)).as("ck"))
      val withBounds = pairKept
        .join(heavyPerDoc.select(col(idCol).as("a"), col("__h").as("ha")), Seq("a"), "left")
        .join(heavyPerDoc.select(col(idCol).as("b"), col("__h").as("hb")), Seq("b"), "left")
        .withColumn("__hmin",
          least(coalesce(col("ha"), lit(0L)), coalesce(col("hb"), lit(0L))))
      val maybe = withBounds.where(
        (col("ck") + col("__hmin")).cast("double") /
          (col("na") + col("nb") - col("ck") - col("__hmin")) >= lit(threshold))
      val maybeM = stageMaybe(maybe)
      val exactNow = maybeM.where(col("__hmin") === 0)
        .select(col("a"), col("b"), col("ck").as("common"), col("na"), col("nb"))
      val needVerify = maybeM.where(col("__hmin") > 0).select("a", "b")
      val candIds = needVerify.select(col("a").as(idCol))
        .unionByName(needVerify.select(col("b").as(idCol))).distinct()
      Dedup.finishJaccard(exactNow, threshold).unionByName(
        Dedup.verifyJaccard(needVerify,
          Dedup.shingleArray(docs.join(candIds, Seq(idCol), "left_semi"), 3, idCol, "text"),
          threshold, idCol))
    }

    val id = (d: DataFrame) => d
    val lc = (d: DataFrame) => d.localCheckpoint()

    (1 to 2).foreach { pass =>
      time(s"V1 both localCheckpoints (pass $pass)") { pipeline(lc, lc).count() }
      time(s"V2 no staging at all (pass $pass)") { pipeline(id, id).count() }
      time(s"V3 only maybe checkpointed (pass $pass)") { pipeline(id, lc).count() }
      time(s"V4 shx persisted lazily + maybe ckpt (pass $pass)") {
        var cached: DataFrame = null
        val out = pipeline(d => {
          cached = d.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
          cached
        }, lc).count()
        cached.unpersist(blocking = false)
        out
      }
      time(s"V5 registered operator as-is (pass $pass)") {
        Dedup.jaccardPairs(docs, n = 3, threshold = 0.5, maxDocFreq = 20).count()
      }
    }
    spark.stop()
  }
}

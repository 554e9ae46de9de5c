package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Focused sf10 re-witness of the four streaming ANN serving tiers —
  * the same 200k×800k config as ScaleProbeSpec's sf10 rows, without the
  * rest of the probe battery, so a kernel-lifetime change (e.g. r19's
  * per-task primitive cache) can be re-measured in minutes on an idle
  * host: `SPARK_DRIVER_MEM=24g sbt "Test/runMain graft.ProbeAnnStreamTiers"`.
  * Prints one line per tier; fold results into SCALE_PROBE.md notes by
  * hand (the row values follow tools/minmerge_probe.py's min convention). */
object ProbeAnnStreamTiers {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .appName("graft-ann-stream-tiers")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.driver.memory", sys.env.getOrElse("SPARK_DRIVER_MEM", "24g"))
      .config("spark.sql.warehouse.dir",
        s"/tmp/graft-anntiers-wh-${ProcessHandle.current().pid()}")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val raised = graft.core.HeapAgg.raisedClone(spark)

    // same data as the ScaleProbeSpec sf10 rows
    val embDir = "/tmp/graft-anntiers-emb"
    spark.range(1000000).selectExpr("id AS vec_id",
      "transform(sequence(0,63), j -> CAST(sin((id % 20000) * (j+1)) " +
        "+ 0.001*sin(id*(j+1)) AS FLOAT)) AS embedding")
      .write.mode("overwrite").parquet(embDir)
    val emb = raised.read.parquet(embDir)
    val q10 = emb.where(col("vec_id") % 5 === 0)
    val c10 = emb.where(col("vec_id") % 5 =!= 0)
    val cents = graft.ops.Similarity.ivfCentroids(c10, nlist = 256)
    val books = graft.ops.Pq.residualCodebooks(c10, cents, m = 8, k = 16)
    val feed = "/tmp/graft-anntiers-feed"
    q10.select(col("vec_id"), col("embedding"),
        (lit("2024-01-01 00:00:00").cast("timestamp") + make_dt_interval(
          lit(0), lit(0), lit(0), pmod(col("vec_id"), lit(7200)))).as("ts"))
      .coalesce(1).write.mode("overwrite").parquet(feed)
    graft.materialize.SessionCatalogWarehouse.dropAny(raised, "anntiers_adc_idx")
    graft.ops.Pq.savePqIndex(raised, c10, cents, books, "anntiers_adc_idx")
    val adcIdx = graft.ops.Pq.loadPqIndex(raised, "anntiers_adc_idx")

    def drain(label: String)(hits: org.apache.spark.sql.DataFrame): Unit = {
      val t0 = System.nanoTime()
      hits.writeStream.format("noop")
        .option("checkpointLocation",
          java.nio.file.Files.createTempDirectory("graft-anntiers-cp").toString)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start().awaitTermination()
      println(f"[ann-tiers] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      graft.streaming.ServingCache.releaseAll()
    }
    def qs() = raised.readStream
      .schema(raised.read.parquet(feed).schema).parquet(feed)
    def ann(bc: Long) = graft.streaming.Streams.streamingAnnTopK(qs(), c10,
      cents, k = 5, nprobe = 8, windowLen = "1 minute",
      watermark = "1 minute", maxBroadcastBytes = bc)
    def adc(bc: Long) = graft.streaming.Streams.streamingAnnAdcTopK(qs(),
      adcIdx, cents, books, k = 5, nprobe = 8, windowLen = "1 minute",
      watermark = "1 minute", maxBroadcastBytes = bc)
    def rerank(bc: Long) = graft.streaming.Streams.streamingAnnRerankTopK(qs(),
      adcIdx, c10, cents, books, k = 5, shortlist = 50, nprobe = 8,
      windowLen = "1 minute", watermark = "1 minute", maxBroadcastBytes = bc)
    drain("float spill tier (200k x 800k, nprobe=8)")(ann(0L))
    drain("float broadcast tier (same)")(ann(1L << 32))
    drain("ADC spill tier (m=8)")(adc(0L))
    drain("ADC broadcast tier (same)")(adc(1L << 32))
    drain("rerank spill shortlist (m=8, shortlist=50)")(rerank(0L))
    drain("rerank broadcast shortlist (same)")(rerank(1L << 32))
    graft.materialize.SessionCatalogWarehouse.dropAny(raised, "anntiers_adc_idx")
    spark.stop()
  }
}

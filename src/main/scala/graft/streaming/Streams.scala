package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import graft.materialize.{Materializer, Warehouse}
import graft.model.Asset

/** Streaming assets (reference pkg/ingestr/operator.go:596-640 streaming
  * brokers, :229-324 CDC): Structured Streaming sources → transforms →
  * sinks. Streams in the reference are process-lifetime source→sink copies
  * with optional merge; here they are real streaming queries:
  *
  *  - broker sources (kafka/kinesis) ↦ `readStream.format("kafka")` — the
  *    file-based source below exercises the identical query shape offline;
  *  - `flush_interval`/`flush_records` ↦ trigger configuration;
  *  - CDC `strategy=merge` ↦ `foreachBatch` + [[Materializer]] merge, the
  *    canonical Spark pattern for upsert sinks.
  */
object Streams {

  /** File-backed event stream with an explicit schema (required by
    * readStream). Stands in for a broker source in tests/local runs.
    * FileStreamSource wants a directory, so a single parquet file is staged
    * behind a symlink dir. */
  def eventStream(spark: SparkSession, path: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val src = java.nio.file.Paths.get(path)
    val dir =
      if (java.nio.file.Files.isDirectory(src)) path
      else {
        val d = java.nio.file.Paths.get(
          s"/tmp/graft-stream-${math.abs(path.hashCode)}")
        java.nio.file.Files.createDirectories(d)
        val link = d.resolve(src.getFileName)
        if (!java.nio.file.Files.exists(link)) java.nio.file.Files.createSymbolicLink(link, src)
        d.toString
      }
    val schema = "event_id BIGINT, ts BIGINT, user_id BIGINT, event_type STRING, value DOUBLE, props STRING"
    spark.readStream.schema(schema).parquet(dir)
      .withColumn("ts", expr("timestamp_micros(ts div 1000)"))
  }

  /** Tumbling-window aggregation with watermark — event-time correctness at
    * scale (late data bounded by the watermark, state store pruned). */
  def windowedCounts(events: DataFrame, window: String = "5 minutes",
                     watermark: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(org.apache.spark.sql.functions.window(col("ts"), window), col("event_type"))
      .agg(count("*").as("n"),
        sum(col("value").cast("decimal(18,4)")).cast("double").as("total_value"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("n"), col("total_value"))

  /** Run a streaming aggregation to completion against a static dir and
    * return the result (memory sink, complete mode) — deterministic batch
    * replay of the streaming plan. */
  def runToCompletion(spark: SparkSession, agg: DataFrame, name: String): DataFrame = {
    val q = agg.writeStream
      .format("memory").queryName(name)
      .outputMode("complete")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.table(name)
  }

  /** CDC-style streaming merge: each micro-batch upserts into the target via
    * the merge materializer (foreachBatch; reference auto-selects
    * strategy=merge for CDC sources, ingestr/operator.go:229-324). */
  def streamingMerge(wh: Warehouse, asset: Asset, events: DataFrame): StreamingQuery =
    events.writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        // the batch lives in a cloned session — hand the DataFrame itself to
        // the materializer instead of going through a temp-view name
        Materializer.executeDf(wh, asset, batch)
      }
      .trigger(Trigger.AvailableNow())
      .start()

  /** flush_interval/flush_records → trigger mapping (helper for asset params). */
  def triggerFor(params: Map[String, String]): Trigger =
    params.get("flush_interval") match {
      case Some(iv) => Trigger.ProcessingTime(iv)
      case scala.None => Trigger.AvailableNow()
    }
}

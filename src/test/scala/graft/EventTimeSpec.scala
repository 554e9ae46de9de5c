package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
import org.scalatest.funsuite.AnyFunSuite

/** Event-time ingestion must be SCHEMA-ADAPTIVE: the engine never assumes a
  * writer's physical timestamp choice. The r8 driver regenerated
  * events.parquet from int64 TIMESTAMP(NANOS) to plain timestamp[us] and
  * three hard-coded sites zeroed the round — these specs pin the fix by
  * reading the SAME logical events through every physical variant a writer
  * plausibly produces: int64-nanos (read as long), timestamp_ntz micros
  * (pyarrow's default), and session-zoned timestamp.
  */
class EventTimeSpec extends AnyFunSuite {
  import SparkTestSession._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  // one logical events table: 2 users, visit-shaped gaps
  private lazy val base = {
    val rows = Seq(
      (1L, ts("2024-01-01 10:00:00"), 7L, "click", 1.25, "{}"),
      (2L, ts("2024-01-01 10:10:00"), 7L, "click", 2.50, "{}"),
      (3L, ts("2024-01-01 13:00:00"), 7L, "buy", 9.99, "{}"),
      (4L, ts("2024-01-01 09:30:00"), 8L, "click", 0.75, "{}"))
    spark.createDataFrame(rows)
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
  }

  /** Writes `base` with ts in the given physical shape; returns the path. */
  private def fixture(shape: String): String = {
    val dir = java.nio.file.Files.createTempDirectory(s"graft-etime-$shape").toString
    val df = shape match {
      case "nanos_long" => base.withColumn("ts",
        expr("unix_micros(ts) * 1000")) // exact epoch nanos as BIGINT
      case "ntz_micros" => base.withColumn("ts", col("ts").cast("timestamp_ntz"))
      case "tz_micros"  => base
    }
    df.coalesce(1).write.mode("overwrite").parquet(dir)
    dir
  }

  test("eventTimeNormalize maps every physical ts variant to the same instants") {
    val expect = base.select(col("event_id"), col("ts")).collect()
      .map(r => r.getLong(0) -> r.getTimestamp(1)).toMap
    for (shape <- Seq("nanos_long", "ntz_micros", "tz_micros")) {
      val raw = spark.read.parquet(fixture(shape))
      // pin the fixtures actually exercise three DIFFERENT physical types
      val physical = raw.schema("ts").dataType
      shape match {
        case "nanos_long" => assert(physical == LongType, s"$shape: $physical")
        case "ntz_micros" => assert(physical == TimestampNTZType, s"$shape: $physical")
        case "tz_micros"  => assert(physical == TimestampType, s"$shape: $physical")
      }
      val norm = graft.core.Tables.eventTimeNormalize(raw)
      assert(norm.schema("ts").dataType == TimestampType, s"$shape not normalized")
      val got = norm.select(col("event_id"), col("ts")).collect()
        .map(r => r.getLong(0) -> r.getTimestamp(1)).toMap
      assert(got == expect, s"$shape: $got")
    }
  }

  test("eventStream sniffs the file schema and normalizes ts for any variant") {
    for (shape <- Seq("nanos_long", "ntz_micros")) {
      val st = graft.streaming.Streams.eventStream(spark, fixture(shape))
      assert(st.isStreaming)
      assert(st.schema("ts").dataType == TimestampType, s"$shape: ${st.schema("ts")}")
      val name = s"t_etime_$shape"
      val q = st.writeStream.format("memory").queryName(name)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
      q.awaitTermination()
      val got = spark.table(name).select(col("event_id"), col("ts")).collect()
        .map(r => r.getLong(0) -> r.getTimestamp(1)).toMap
      assert(got(3L) == ts("2024-01-01 13:00:00"), s"$shape: $got")
      assert(got.size == 4)
    }
  }

  test("userVisitsComplete emits identical visits from nanos-long and ntz-micros sources") {
    import spark.implicits._
    val results = Seq("nanos_long", "ntz_micros").map { shape =>
      val visits = graft.streaming.Streams.userVisitsComplete(
        spark, fixture(shape), gapMinutes = 30)
      // batch replays take the sort-based path — no streaming query to run
      assert(!visits.isStreaming, s"$shape: replay should be batch")
      // the STATEFUL path must read the same physical shape identically —
      // this is the r8 writer-type regression class, and the sentinel-union
      // leg only exists on the incremental path
      val inc = graft.streaming.Streams.userVisitsComplete(
        spark, fixture(shape), gapMinutes = 30, incremental = true)
      assert(inc.isStreaming, s"$shape: incremental path should stream")
      val name = s"t_etime_visits_inc_$shape"
      val q = inc.writeStream.format("memory").queryName(name)
        .outputMode("append")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
      q.awaitTermination()
      val streamed = spark.table(name)
        .as[graft.streaming.Streams.Visit].collect().toSet
      val batch = visits.collect().toSet
      assert(streamed == batch,
        s"$shape: stateful and batch paths disagree: " +
          s"only-stream=${streamed -- batch} only-batch=${batch -- streamed}")
      batch
    }
    assert(results.head.nonEmpty, "no visits emitted")
    // user 7: 10:00-10:10 visit (2 events), 13:00 visit; user 8: one visit
    assert(results.head.map(v => (v.user_id, v.n_events)) ==
      Set((7L, 2L), (7L, 1L), (8L, 1L)), results.head.toString)
    assert(results.head == results(1), s"variants disagree: $results")
  }

  test("embeddingNormalize maps double/int element parquet to the float kernels' type") {
    import org.apache.spark.sql.types.{ArrayType, DoubleType, FloatType}
    val vecs = Seq(
      (1L, Array(1.0f, 0.0f, 0.0f), 0),
      (2L, Array(0.6f, 0.8f, 0.0f), 1),
      (3L, Array(0.0f, 1.0f, 0.0f), 0))
    val float = spark.createDataFrame(vecs).toDF("vec_id", "embedding", "label")
    def run(df: org.apache.spark.sql.DataFrame) =
      graft.ops.Similarity.cosineTopK(graft.core.Tables.embeddingNormalize(df), k = 1)
        .select("a", "b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val expect = run(float)
    assert(expect.nonEmpty)
    // a regenerated file with list<double> elements (r8's failure mode for
    // events, replayed on embeddings) must down-cast at the scan, not CCE
    // inside every ANN kernel
    val dir = java.nio.file.Files.createTempDirectory("graft-emb-double").toString
    float.withColumn("embedding", col("embedding").cast("array<double>"))
      .write.mode("overwrite").parquet(dir)
    val doubled = spark.read.parquet(dir)
    assert(doubled.schema("embedding").dataType == ArrayType(DoubleType, true))
    assert(graft.core.Tables.embeddingNormalize(doubled)
      .schema("embedding").dataType == ArrayType(FloatType, true))
    assert(run(doubled) == expect)
    // already-float files pass through untouched (no redundant cast node)
    assert(graft.core.Tables.embeddingNormalize(float) eq float)
  }

  test("one unreadable table registers the rest instead of poisoning them") {
    val dir = java.nio.file.Files.createTempDirectory("graft-badtbl")
    for (t <- graft.core.Tables.all if t != "events")
      java.nio.file.Files.createSymbolicLink(
        dir.resolve(s"$t.parquet"),
        java.nio.file.Paths.get(s"$sfDir/$t.parquet"))
    java.nio.file.Files.writeString(dir.resolve("events.parquet"), "not parquet")
    try {
      graft.core.Tables.register(spark, dir.toString)
      assert(spark.table("region").count() > 0, "healthy table poisoned")
      intercept[Exception](spark.table("events"))
    } finally {
      // re-point the session's views back at the shared test dir
      graft.core.Tables.register(spark, sfDir)
      assert(spark.table("events").count() > 0)
    }
  }
}

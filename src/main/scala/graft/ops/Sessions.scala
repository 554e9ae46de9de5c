package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event sessionization: split each user's event stream into sessions at
  * inactivity gaps. The classic two-window program — a lag to mark session
  * starts, a running sum to number them — over ONE shuffle on the user key;
  * both windows and the final per-session aggregation share the same
  * (user) partitioning, so Catalyst plans a single Exchange. Deterministic:
  * the order key includes the event id to break timestamp ties.
  */
object Sessions {

  /** Same sessions via Spark's NATIVE session_window aggregation (one
    * SessionWindow operator instead of two windows + regroup; also the
    * streaming-capable form). Window end is last-event + gap by Spark's
    * definition. Cross-validates [[sessionize]] (property-tested on random
    * event sets) with ONE boundary caveat: an event exactly `gap` after
    * its predecessor stays in-session under [[sessionize]]'s strict
    * `> gap` split but starts a new session here (session_window's end is
    * exclusive) — identical everywhere else. */
  def sessionizeNative(events: DataFrame, gapMinutes: Int = 30,
                       userCol: String = "user_id", tsCol: String = "ts",
                       valueCol: String = "value"): DataFrame =
    events
      .groupBy(col(userCol), session_window(col(tsCol), s"$gapMinutes minutes"))
      .agg(
        min(col(tsCol)).as("first_event"),
        max(col(tsCol)).as("last_event"),
        count(lit(1)).as("n_events"),
        sum(col(valueCol).cast("decimal(18,4)")).cast("double").as("sum_value"))
      .select(col(userCol),
        unix_micros(col("session_window.start")).as("start_us"),
        unix_micros(col("session_window.end")).as("end_us"),
        col("n_events"), col("sum_value"))

  /** Per-session rollup: (user, session_no, start, end, n_events, sum_value).
    * `gapMinutes` of inactivity closes a session. */
  def sessionize(events: DataFrame, gapMinutes: Int = 30,
                 userCol: String = "user_id", tsCol: String = "ts",
                 orderCol: String = "event_id", valueCol: String = "value"): DataFrame = {
    val w = Window.partitionBy(userCol).orderBy(col(tsCol), col(orderCol))
    val gapUs = gapMinutes.toLong * 60L * 1000000L
    val prev = lag(unix_micros(col(tsCol)), 1).over(w)
    val newSession = when(prev.isNull ||
      unix_micros(col(tsCol)) - prev > gapUs, 1L).otherwise(0L)
    events
      .withColumn("__new", newSession)
      .withColumn("session_no", sum(col("__new")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col(userCol), col("session_no"))
      .agg(
        min(col(tsCol)).cast("string").as("session_start"),
        max(col(tsCol)).cast("string").as("session_end"),
        count(lit(1)).as("n_events"),
        sum(col(valueCol).cast("decimal(18,4)")).cast("double").as("sum_value"))
  }

  /** Batch form of the streaming sessionizer's [[graft.streaming.Streams.Visit]]
    * output, via the same two-window program as [[sessionize]]. This is the
    * HOT-KEY-SAFE replay path: a sort-based window operator spills to disk,
    * so a user owning half the input costs one external sort, not one
    * executor's heap — whereas the stateful flatMapGroupsWithState fold
    * buffers a user's entire per-batch history in memory when the whole
    * replay arrives as one AvailableNow batch (r9 verdict #1).
    *
    * Semantics are pinned to the streaming operator: same strict `> gap`
    * rule in micros, same integer-cents money, same (first_us, last_us)
    * micros bounds — the two paths must be row-identical on any input. */
  def visits(events: DataFrame, gapMinutes: Int = 30)
      : org.apache.spark.sql.Dataset[graft.streaming.Streams.Visit] = {
    val spark = events.sparkSession
    import spark.implicits._
    val gapUs = gapMinutes.toLong * 60L * 1000000L
    // ties in ts land in the same session under the `>` gap rule whatever
    // their order, so ts alone is a sufficient (and deterministic) sort key
    val w = Window.partitionBy("user_id").orderBy(col("__us"))
    val prev = lag(col("__us"), 1).over(w)
    events
      .select(col("user_id").cast("long").as("user_id"),
        unix_micros(col("ts")).as("__us"),
        round(col("value").cast("double") * 100, 0).cast("long").as("__cents"))
      .withColumn("__new",
        when(prev.isNull || col("__us") - prev > gapUs, 1L).otherwise(0L))
      .withColumn("__sid", sum(col("__new")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("user_id"), col("__sid"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("__cents")).as("total_cents"),
        min(col("__us")).as("first_us"),
        max(col("__us")).as("last_us"))
      .select(col("user_id"), col("n_events"), col("total_cents"),
        col("first_us"), col("last_us"))
      .as[graft.streaming.Streams.Visit]
  }
}

package graft.ops

import org.apache.spark.sql.{DataFrame, Encoder, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataType, IntegerType, LongType, NumericType, StringType, StructField, StructType}

/** Event-sequence analytics: ordered FUNNELS and COHORT RETENTION — the two
  * canonical product-analytics operators over an event stream.
  *
  * Both are one-shuffle designs: funnel sorts each user's (already
  * filtered) step events inside a single grouped pass — per-task memory is
  * one user's step events, never the corpus — and retention is two hash
  * aggregations on compact (user, week) keys. */
object Funnel {

  /** Ordered funnel: for each user reaching step 1, the FIRST time of each
    * step where every step strictly follows the previous one.
    * Output: (user, stage, t1_us … tN_us) — stage = furthest step reached,
    * tK_us = epoch micros of step K (NULL beyond `stage`). Users who never
    * reach step 1 are not funnel entrants and emit no row.
    *
    * One shuffle: events are filtered to the step types at the scan (the
    * predicate pushes down), then each user's surviving events sort in one
    * grouped pass — the classic funnel engine shape, linear per user.
    *
    * Ids keep their FAMILY (the [[Dedup.clusters]] recipe): numeric ids
    * run as longs, anything else — string/UUID-keyed event streams — as
    * strings. Casting every id to long would silently NULL out non-numeric
    * ids and yield an empty funnel with no diagnostic (and throw under
    * ANSI mode); the output `userCol` is long or string accordingly. */
  def funnel(events: DataFrame, steps: Seq[String],
             userCol: String = "user_id", tsCol: String = "ts",
             typeCol: String = "event_type",
             strictOrder: Boolean = true): DataFrame = {
    require(steps.size >= 2, "a funnel needs at least two steps")
    val numericIds = events.select(col(userCol)).schema.head.dataType
      .isInstanceOf[NumericType]
    if (numericIds)
      runFunnel[Long](events, steps, userCol, tsCol, typeCol, LongType, "long",
        strictOrder)(
        Encoders.scalaLong,
        Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong, Encoders.STRING))
    else
      runFunnel[String](events, steps, userCol, tsCol, typeCol, StringType, "string",
        strictOrder)(
        Encoders.STRING,
        Encoders.tuple(Encoders.STRING, Encoders.scalaLong, Encoders.STRING))
  }

  /** One id family's project → group → ladder-walk pass. */
  private def runFunnel[K](events: DataFrame, steps: Seq[String],
                           userCol: String, tsCol: String, typeCol: String,
                           idType: DataType, castType: String,
                           strictOrder: Boolean)(
      implicit keyEnc: Encoder[K], rowEnc: Encoder[(K, Long, String)]): DataFrame = {
    val stepIdx = steps.zipWithIndex.toMap
    // NULL identity or NULL time cannot enter a funnel (and would crash
    // the tuple encoder); the cast is a same-family no-op (long→long,
    // string→string), so no id is nulled by it
    val projected = events
      .where(col(typeCol).isin(steps.map(lit): _*))
      .select(col(userCol).cast(castType).as("__u"),
        unix_micros(col(tsCol)).as("__t"), col(typeCol))
      .where(col("__u").isNotNull && col("__t").isNotNull)
      .as[(K, Long, String)](rowEnc)
    val n = steps.size
    val outSchema = StructType(
      StructField(userCol, idType, nullable = false) +:
      StructField("stage", IntegerType, nullable = false) +:
      (1 to n).map(i => StructField(s"t${i}_us", LongType, nullable = true)))
    projected.groupByKey(_._1)(keyEnc).mapGroups { (user, it) =>
      // one user's step events: sort by (time, step) and walk the ladder
      val evs = it.map { case (_, us, tpe) => (us, stepIdx(tpe)) }.toArray
      java.util.Arrays.sort(evs, Ordering.by[(Long, Int), (Long, Int)](identity))
      val times = new Array[java.lang.Long](n)
      var stage = 0
      var i = 0
      while (i < evs.length && stage < n) {
        val (us, s) = evs(i)
        // strictOrder: the NEXT step fires only strictly after the previous
        // step's time. strictOrder=false admits SAME-timestamp progression
        // — batched trackers often stamp a whole step burst with one clock
        // value; the (time, step-index) sort already puts equal-time steps
        // in ladder order, so `>=` walks them in a single pass
        if (s == stage && (stage == 0 ||
            (if (strictOrder) us > times(stage - 1) else us >= times(stage - 1)))) {
          times(stage) = us
          stage += 1
        }
        i += 1
      }
      Row.fromSeq(user +: stage +: times.toSeq)
    }(Encoders.row(outSchema))
      .where(col("stage") >= 1)
      .toDF()
  }

  /** Cohort retention: users cohorted by the WEEK of their first event
    * (integer weeks since the unix epoch — portable arithmetic, no engine
    * week-truncation differences), counted as retained in every later week
    * they are active. Output: (cohort_week, week_offset, n_users).
    *
    * The user key stays NATIVE (no cast), so string/UUID-keyed streams
    * cohort correctly; NULL users and NULL times are excluded up front —
    * an anonymous NULL key would otherwise collapse into one phantom
    * "user" and distort every cohort it touches. */
  def retention(events: DataFrame, userCol: String = "user_id",
                tsCol: String = "ts"): DataFrame = {
    val week = (unix_micros(col(tsCol)) / lit(7L * 86400L * 1000000L))
      .cast("long")
    val active = events
      .where(col(userCol).isNotNull && col(tsCol).isNotNull)
      .select(col(userCol).as("__u"), week.as("__w")).distinct()
    val cohort = active.groupBy("__u").agg(min("__w").as("__cw"))
    active.join(cohort, Seq("__u"))
      .groupBy(col("__cw").as("cohort_week"),
        (col("__w") - col("__cw")).as("week_offset"))
      // (user, week) pairs are already distinct and the week is fixed per
      // group, so a plain count equals countDistinct without the extra
      // distinct-aggregate expansion pass
      .agg(count(lit(1)).cast("long").as("n_users"))
  }
}

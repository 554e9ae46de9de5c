package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** BUCKETIZED RANGE JOIN — point-in-interval containment without a
  * cartesian product.
  *
  * Spark has no native range-join optimization: `points JOIN intervals ON
  * ts BETWEEN start AND end` with no equi-key plans as
  * BroadcastNestedLoopJoin (or a full cartesian), which is quadratic and
  * the classic OOM/runaway shape at scale. The standard fix is to
  * manufacture the equi-key: quantize time into fixed-width buckets — each
  * point belongs to exactly ONE bucket, each interval EXPLODES to the
  * buckets it overlaps — equi-join on the bucket, then apply the exact
  * containment predicate as a post-filter.
  *
  * Each (point, interval) pair meets exactly once (the point's single
  * bucket appears once in the interval's expansion), so no distinct pass
  * is needed. Cost model: interval expansion is ceil(len/width)+1 rows per
  * interval — pick `widthSeconds` near the median interval length so
  * expansion stays O(1) per interval while each bucket's population stays
  * small. The join is a plain shuffled equi-join: skew only if many
  * intervals overlap one bucket, which the width knob controls. */
object RangeJoin {

  /** Join `points` to every interval containing them:
    * `start <= ts < end`, an equi-join on the time bucket. Empty or
    * inverted intervals (end <= start) contain nothing and are dropped. */
  def pointInInterval(points: DataFrame, intervals: DataFrame,
                      pointTs: String = "ts",
                      startCol: String = "win_start", endCol: String = "win_end",
                      widthSeconds: Long = 86400L): DataFrame = {
    require(widthSeconds > 0, "bucket width must be positive")
    val wUs = widthSeconds * 1000000L
    def bucketOf(c: org.apache.spark.sql.Column) =
      floor(unix_micros(c) / wUs).cast("long") // exact long micros in, no float boundary drift
    val p = points.withColumn("__b", bucketOf(col(pointTs)))
    val iv = intervals
      .where(col(endCol) > col(startCol))
      .withColumn("__b", explode(sequence(
        bucketOf(col(startCol)),
        // end is EXCLUSIVE: the last covered instant is end - 1 microsecond
        floor((unix_micros(col(endCol)) - 1) / wUs).cast("long"))))
    p.join(iv, Seq("__b"))
      .where(col(pointTs) >= col(startCol) && col(pointTs) < col(endCol))
      .drop("__b")
  }

  /** INTERVAL-OVERLAP JOIN: pairs of intervals with
    * `lStart < rEnd && rStart < lEnd` (half-open overlap), same bucket
    * trick — both sides explode to their covered buckets and equi-join.
    * Two overlapping intervals share EVERY bucket in their intersection,
    * so instead of a dedup pass each pair is emitted only from ONE
    * canonical bucket: the later of the two start buckets, which both
    * sides provably cover when they overlap. Expansion cost and skew obey
    * the same `widthSeconds` knob as [[pointInInterval]]. */
  def intervalOverlap(left: DataFrame, right: DataFrame,
                      lStart: String = "l_start", lEnd: String = "l_end",
                      rStart: String = "r_start", rEnd: String = "r_end",
                      widthSeconds: Long = 86400L): DataFrame = {
    require(widthSeconds > 0, "bucket width must be positive")
    val wUs = widthSeconds * 1000000L
    def startBucket(c: org.apache.spark.sql.Column) =
      floor(unix_micros(c) / wUs).cast("long")
    def covered(s: String, e: String) = explode(sequence(
      startBucket(col(s)),
      floor((unix_micros(col(e)) - 1) / wUs).cast("long")))
    val l = left.where(col(lEnd) > col(lStart))
      .withColumn("__sbl", startBucket(col(lStart)))
      .withColumn("__b", covered(lStart, lEnd))
    val r = right.where(col(rEnd) > col(rStart))
      .withColumn("__sbr", startBucket(col(rStart)))
      .withColumn("__b", covered(rStart, rEnd))
    l.join(r, Seq("__b"))
      .where(col(lStart) < col(rEnd) && col(rStart) < col(lEnd) &&
        col("__b") === greatest(col("__sbl"), col("__sbr")))
      .drop("__b", "__sbl", "__sbr")
  }
}

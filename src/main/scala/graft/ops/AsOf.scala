package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** AS-OF (point-in-time) join: each left row matches the LATEST right row
  * with the same key whose time is ≤ (or < when `strict`) the left row's
  * time — the lookup every feature pipeline and slowly-changing-dimension
  * read needs, and one Spark's built-in join operators don't express
  * without an exploding inequality join.
  *
  * Plan: the classic union-and-sweep. Both sides union into one stream
  * tagged (right before left at equal times under ≤), ONE shuffle
  * partitions by the key, and one ordered window sweep carries the most
  * recent right payload forward (`last(..., ignoreNulls)` over
  * rows-unbounded-preceding — an O(n) running accumulator, not a per-row
  * lookback). Compare with the join formulation: `left JOIN right ON key
  * AND rt <= lt` + a per-left-row max-window is |left|×|right-per-key|
  * intermediate rows; the sweep is |left|+|right| with no intermediate
  * blowup, the right shape at 100 TB. Skewed keys cost one window
  * partition each — the same bound as any per-key window — and everything
  * stays in whole-stage codegen except the window itself.
  *
  * Determinism: right rows tying on (key, time) are ordered by `tieCol`
  * (greatest wins); a left row tying with a right row sees it under ≤
  * (tag sorts right first) and not under < (tag order flips). Left rows
  * with no predecessor keep NULL payload columns (left outer semantics).
  *
  * Output: every left column, then `payload` columns from the right side
  * (caller ensures the names don't collide — rename before joining). */
object AsOf {

  def asofJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
               leftTime: String, rightTime: String,
               payload: Seq[String], tieCol: String,
               strict: Boolean = false): DataFrame = {
    require(keys.nonEmpty, "as-of join needs at least one key column")
    require(payload.nonEmpty, "as-of join needs right payload columns")
    val keyCols = keys.map(col)
    // the carried payload travels as ONE struct so a match is atomic —
    // carrying fields through separate last() calls could mix rows when a
    // payload field is legitimately NULL
    val rType = right.select(struct(payload.map(col): _*)).schema.head.dataType
    val lType = left.select(struct(left.columns.map(col): _*)).schema.head.dataType
    // the tie column keeps its NATIVE type: casting to long would NULL out
    // string/UUID ids and silently break the greatest-tie-wins contract
    val tieType = right.select(col(tieCol)).schema.head.dataType
    val (rightTag, leftTag) = if (strict) (1, 0) else (0, 1)
    // a NULL-timestamped right row would sort FIRST under asc (Spark's
    // NULLS FIRST default) and its payload would be swept into every left
    // row with no real predecessor — an "infinitely early" phantom match.
    // It carries no point-in-time meaning; exclude it. NULL-timestamped
    // LEFT rows stay (left-outer contract): they sort first, see no
    // preceding right row, and keep NULL payload columns.
    val r = right.where(col(rightTime).isNotNull).select(keyCols :+
      col(rightTime).as("__t") :+ lit(rightTag).as("__tag") :+
      col(tieCol).as("__tie") :+
      struct(payload.map(col): _*).as("__r") :+
      lit(null).cast(lType).as("__l"): _*)
    val l = left.select(keyCols :+
      col(leftTime).as("__t") :+ lit(leftTag).as("__tag") :+
      lit(null).cast(tieType).as("__tie") :+
      lit(null).cast(rType).as("__r") :+
      struct(left.columns.map(col): _*).as("__l"): _*)
    val w = Window.partitionBy(keyCols: _*)
      .orderBy(col("__t").asc, col("__tag").asc, col("__tie").asc_nulls_first)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val swept = l.unionByName(r)
      .withColumn("__m", last(col("__r"), ignoreNulls = true).over(w))
      .where(col("__tag") === leftTag)
    val leftCols = left.columns.map(c => col(s"__l.$c").as(c))
    val matchCols = payload.map(p => col(s"__m.$p").as(p))
    swept.select(leftCols ++ matchCols: _*)
  }
}

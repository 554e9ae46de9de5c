package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Mergeable-sketch rollups — the 100 TB pattern for distinct counts:
  * per-stratum HLL sketches are small (KBs), additive, and reusable, so
  * daily/partition sketches persist once and every later rollup is a
  * register-wise union instead of a re-scan of raw data. Built on Spark's
  * native Datasketches HLL functions (hll_sketch_agg / hll_union_agg —
  * codegen'd aggregates, order-independent merges, deterministic for a
  * given input set). */
object Sketches {

  /** Per-group distinct estimates PLUS the all-groups rollup row (group =
    * NULL), computed by unioning the per-group sketches — never re-reading
    * the corpus. Output: (group, n_distinct_est, is_rollup). */
  def distinctRollup(df: DataFrame, groupCol: String, valueCol: String): DataFrame = {
    val perGroup = df.groupBy(col(groupCol))
      .agg(hll_sketch_agg(col(valueCol)).as("__sk"))
    val groups = perGroup.select(col(groupCol),
      hll_sketch_estimate(col("__sk")).cast("long").as("n_distinct_est"),
      lit(false).as("is_rollup"))
    // the rollup row keeps the group column's ORIGINAL type (int/date/... 
    // group keys must not be silently re-typed to string by the union)
    val total = perGroup.agg(
      hll_sketch_estimate(hll_union_agg(col("__sk"))).cast("long").as("n_distinct_est"))
      .select(lit(null).cast(df.schema(groupCol).dataType).as(groupCol),
        col("n_distinct_est"), lit(true).as("is_rollup"))
    groups.unionByName(total)
  }
}

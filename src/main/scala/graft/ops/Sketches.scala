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

  /** EXACT heavy hitters over a high-cardinality item stream: every item
    * whose frequency is ≥ `phi` of the non-null stream, with its exact
    * count — without ever shuffling the full distinct-item set.
    *
    * The 100 TB shape, two phases:
    *  1. ONE NARROW PASS: each partition runs a Misra–Gries summary with
    *     k = ⌈1/phi⌉ counters. Pigeonhole gives the soundness: an item with
    *     global count ≥ phi·N must hold ≥ phi·Nₚ of some partition p, and
    *     MG with k counters decrements at most Nₚ/(k+1) < phi·Nₚ times, so
    *     that partition's summary retains the item. The union of survivor
    *     sets is therefore a SUPERSET of the true phi-heavy set, and it is
    *     bounded: ≤ k items per partition (k=500 × 1000 executors = 500k
    *     candidate rows worst-case — broadcastable).
    *  2. EXACT VERIFY: the candidate set broadcasts back; a semi-join
    *     prefilter + groupBy counts only candidate items. Shuffle volume is
    *     ∝ candidates, not distinct items — frequency mining over 10⁹
    *     distinct keys becomes a broadcast filter plus a few-hundred-key
    *     aggregation, where the naive groupBy+HAVING shuffles every
    *     distinct item and Spark's freqItems is approximate with no counts.
    *
    * mapPartitions is justified here (imperative bounded-memory counter
    * state has no Column-expression form); the per-partition summaries are
    * a bounded small frame, and the one driver action is a single-scalar
    * total off that frame (documented-bounded, like the ≤#strata reads in
    * [[Sampling]]). Beyond-reference scope: SURVEY §2.10 training-data ops.
    */
  def heavyHitters(items: DataFrame, itemCol: String = "item",
                   phi: Double = 0.001): DataFrame = {
    require(phi > 0.0 && phi <= 1.0, s"phi must be in (0, 1]: $phi")
    val spark = items.sparkSession
    import spark.implicits._
    val k = math.ceil(1.0 / phi).toInt
    val typed = items.select(col(itemCol).cast("string").as("item"))
      .where(col("item").isNotNull)
    // phase 1: per-partition MG survivors, plus one (null, Nₚ) row per
    // partition so the total comes out of the same pass
    val summaries = typed.as[String].mapPartitions { it =>
      val counters = scala.collection.mutable.HashMap.empty[String, Long]
      var n = 0L
      it.foreach { x =>
        n += 1
        counters.get(x) match {
          case Some(c) => counters(x) = c + 1
          case scala.None if counters.size < k => counters(x) = 1L
          case scala.None =>
            // decrement-all: amortized O(1) per input item overall. Iterate
            // a key snapshot — mutating a HashMap inside its own foreach is
            // documented-undefined even when only values change
            counters.keysIterator.toArray.foreach { w =>
              val c = counters(w)
              if (c == 1L) counters.remove(w) else counters(w) = c - 1
            }
        }
      }
      counters.keysIterator.map(w => (Option(w), 0L)) ++
        Iterator((scala.Option.empty[String], n))
    }.toDF("item", "n")
      // tiny (≤ (k+1)·P rows) but costs a full input pass — eager local
      // checkpoint materializes it ONCE and truncates lineage, so neither
      // the total below nor the lazy candidate join re-runs the MG pass
      // (a persist would be freed before the caller's action runs)
      .localCheckpoint()
    val total = summaries.where(col("item").isNull)
      .agg(coalesce(sum("n"), lit(0L))).head().getLong(0)
    val minCount = math.ceil(phi * total).toLong.max(1L)
    val candidates = summaries.where(col("item").isNotNull).select("item").distinct()
    typed
      .join(broadcast(candidates), Seq("item"), "left_semi")
      .groupBy("item").agg(count(lit(1)).as("n"))
      .where(col("n") >= minCount)
  }
}

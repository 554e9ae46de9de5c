package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-ORDER (Morton-curve) clustering — multi-column data skipping for a
  * plain-parquet warehouse, the analogue of Delta's `OPTIMIZE ZORDER BY` /
  * Iceberg's sort-order rewrite (public technique; no transactional format
  * needed, it is purely a row-layout choice).
  *
  * Why: `cluster_by x` gives tight parquet min/max stats on x only — a
  * filter on y reads everything. Interleaving the bits of each dimension's
  * QUANTILE RANK orders rows along a space-filling curve, so consecutive
  * rows are close in EVERY clustered dimension and a range filter on any
  * of them prunes most row groups.
  *
  * Shape at scale, in three bounded steps:
  *  1. one aggregation pass computes ~2^bits approximate quantile
  *     boundaries per dimension (`approxQuantile`, a driver array of
  *     ≤ 2^bits doubles per column — quantile-RANKED buckets, so skewed
  *     distributions still spread evenly across the curve, where
  *     value-range interleaving would collapse);
  *  2. a codegen'd binary-search `when` tree maps each value to its
  *     bucket (log₂ comparisons per row), and a static expression tree
  *     interleaves the bucket bits into one LONG z-value — no UDF, no
  *     shuffle;
  *  3. `repartitionByRange` on the z-value + an in-partition sort lays the
  *     rows out: one range shuffle, the same cost any global sort-write
  *     pays.
  */
object ZOrder {

  /** Interleave the low `bits` of each bucket column into a Morton code.
    * Static expression tree (k·bits shift/mask/add terms), whole-stage
    * codegen'd. */
  private def interleave(buckets: Seq[Column], bits: Int): Column =
    buckets.zipWithIndex.map { case (b, dim) =>
      (0 until bits).map { i =>
        shiftleft(shiftright(b, i).bitwiseAND(lit(1L)), i * buckets.size + dim)
      }.reduce(_ + _)
    }.reduce(_ + _)

  /** Quantile-bucket rank of `c` against `boundaries` (#boundaries ≤
    * value, in [0, 2^bits)), as a BALANCED BINARY-SEARCH `when` tree:
    * log₂(2^bits) comparisons per row, every node a plain codegen'd
    * CaseWhen. (The obvious `aggregate(array(...))` fold is a
    * CodegenFallback higher-order function — measured ~30× slower on this
    * hot path.) NULLs fail every `>=` and funnel to bucket 0, sorting
    * first. */
  private def bucketOf(c: Column, boundaries: Array[Double]): Column = {
    val v = c.cast("double")
    // bucket ∈ [lo, hi]; boundaries(i-1) is the lower edge of bucket i
    def go(lo: Int, hi: Int): Column =
      if (lo == hi) lit(lo.toLong)
      else {
        val mid = (lo + hi + 1) / 2
        when(v >= boundaries(mid - 1), go(mid, hi)).otherwise(go(lo, mid - 1))
      }
    go(0, boundaries.length)
  }

  /** `df` plus a `__z` Morton code over `cols` (numeric / date / timestamp
    * — z-ordering needs an ordered domain). `bits` per-dimension quantile
    * resolution (2^bits buckets; k·bits must fit a long): the default 6
    * gives 2^(6k) curve cells — far more than any realistic output file
    * count — while keeping the search tree small enough to stay inside
    * whole-stage codegen's method budget (bits=8 measured ~2.6× slower:
    * the 511-node tree trips the huge-method fallback). Raise it only for
    * >4096 output files. */
  def zValue(df: DataFrame, cols: Seq[String], bits: Int = 6): DataFrame = {
    require(cols.nonEmpty, "zValue needs at least one column")
    require(cols.size * bits <= 62, s"${cols.size} dims × $bits bits overflow a long")
    // DATE has no direct double cast (ANSI): route through epoch days; a
    // TIMESTAMP's double cast is epoch seconds — both order-preserving,
    // which is all quantile bucketing needs. Anything else fails FAST: a
    // string column would cast to all-NULLs, funnel every row to bucket 0,
    // and silently contribute nothing to the curve (r9 advice)
    import org.apache.spark.sql.types.{DateType, NumericType, TimestampType, TimestampNTZType}
    def asDouble(c: String): Column = df.schema(c).dataType match {
      case DateType => datediff(col(c), lit("1970-01-01")).cast("double")
      case dt if dt.isInstanceOf[NumericType] ||
        dt == TimestampType || dt == TimestampNTZType => col(c).cast("double")
      case other => throw new IllegalArgumentException(
        s"zValue column `$c` is $other; z-ordering needs a numeric, date, or timestamp domain")
    }
    val numeric = df.select(cols.map(c => asDouble(c).as(c)): _*)
    val probs = (1 until (1 << bits)).map(_.toDouble / (1 << bits)).toArray
    // one pass; relative error 1/2^(bits+2) keeps neighbor buckets honest
    val bounds = numeric.stat.approxQuantile(cols.toArray, probs,
      1.0 / (1 << (bits + 2)))
    val buckets = cols.zip(bounds).map { case (c, b) => bucketOf(asDouble(c), b) }
    df.withColumn("__z", interleave(buckets, bits))
  }

  /** Rows laid out along the z-curve, ready to write: range-partitioned
    * into `numFiles` output tasks and sorted by the code inside each —
    * parquet row-group min/max stats come out tight on EVERY dimension.
    * The helper column is dropped after the sort (projection preserves
    * both the range partitioning and the in-partition order). */
  def cluster(df: DataFrame, cols: Seq[String], numFiles: Int,
              bits: Int = 6): DataFrame = {
    require(numFiles > 0, s"numFiles must be positive: $numFiles")
    zValue(df, cols, bits)
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
  }
}

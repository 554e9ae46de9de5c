package graft.diff

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** data-diff profiling (reference pkg/diff/types.go:11-22 type classes,
  * :437-534 per-class stats; DuckDB impl pkg/duckdb/db.go:479+):
  * every column maps onto one of 7 common classes and gets class-specific
  * stats, computed in ONE aggregation pass per table (all stat expressions
  * in a single agg → one scan, map-side combined).
  */
object DataDiff {

  sealed trait TypeClass { def name: String }
  case object NumericClass  extends TypeClass { val name = "numeric" }
  case object StringClass   extends TypeClass { val name = "string" }
  case object BooleanClass  extends TypeClass { val name = "boolean" }
  case object DatetimeClass extends TypeClass { val name = "datetime" }
  case object BinaryClass   extends TypeClass { val name = "binary" }
  case object JsonClass     extends TypeClass { val name = "json" }
  case object UnknownClass  extends TypeClass { val name = "unknown" }

  def classify(dt: DataType): TypeClass = dt match {
    case _: NumericType => NumericClass
    case StringType => StringClass
    case BooleanType => BooleanClass
    case DateType | TimestampType | TimestampNTZType => DatetimeClass
    case BinaryType => BinaryClass
    case _ => UnknownClass
  }

  final case class ColumnStat(column: String, typeClass: String, stat: String, value: String)

  /** One-pass profile: long-format (column, type_class, stat, value). */
  def profile(df: DataFrame): Seq[ColumnStat] = {
    val fields = df.schema.fields
    val exprs = fields.flatMap { f =>
      val c = col(f.name)
      val tag = f.name
      classify(f.dataType) match {
        case NumericClass => Seq(
          count(c).as(s"$tag::count"),
          sum(when(c.isNull, 1).otherwise(0)).as(s"$tag::null_count"),
          min(c).cast("double").as(s"$tag::min"),
          max(c).cast("double").as(s"$tag::max"),
          round(avg(c.cast("double")), 3).as(s"$tag::avg"),
          round(sum(c.cast("double")), 3).as(s"$tag::sum"),
          round(stddev(c.cast("double")), 3).as(s"$tag::stddev"))
        case StringClass => Seq(
          count(c).as(s"$tag::count"),
          sum(when(c.isNull, 1).otherwise(0)).as(s"$tag::null_count"),
          countDistinct(c).as(s"$tag::distinct"),
          min(length(c)).as(s"$tag::min_length"),
          max(length(c)).as(s"$tag::max_length"),
          round(avg(length(c).cast("double")), 3).as(s"$tag::avg_length"),
          sum(when(c === "", 1).otherwise(0)).as(s"$tag::empty"))
        case BooleanClass => Seq(
          sum(when(c === true, 1).otherwise(0)).as(s"$tag::true_count"),
          sum(when(c === false, 1).otherwise(0)).as(s"$tag::false_count"),
          sum(when(c.isNull, 1).otherwise(0)).as(s"$tag::null_count"))
        case DatetimeClass => Seq(
          count(c).as(s"$tag::count"),
          countDistinct(c).as(s"$tag::unique"),
          min(c).cast("string").as(s"$tag::min"),
          max(c).cast("string").as(s"$tag::max"))
        case BinaryClass => Seq(
          count(c).as(s"$tag::count"),
          round(avg(octet_length(c).cast("double")), 3).as(s"$tag::avg_bytes"))
        case _ => Seq(count(c).as(s"$tag::count"))
      }
    }
    val row = df.agg(exprs.head, exprs.tail.toSeq: _*).head()
    val classByCol = fields.map(f => f.name -> classify(f.dataType).name).toMap
    row.schema.fields.zipWithIndex.map { case (f, i) =>
      val Array(colName, stat) = f.name.split("::", 2)
      ColumnStat(colName, classByCol(colName), stat,
        Option(row.get(i)).map(String.valueOf(_)).orNull)
    }.toSeq
  }

  def profileDf(spark: SparkSession, table: String): DataFrame = {
    import spark.implicits._
    val stats = profile(spark.table(table)) :+
      ColumnStat("*", "table", "row_count", spark.table(table).count().toString)
    stats.toDF("col_name", "type_class", "stat", "value")
  }

  final case class SchemaDiff(column: String, kind: String, detail: String)

  /** Schema comparison (reference pkg/diff/schema.go:98+). */
  def compareSchemas(a: StructType, b: StructType): Seq[SchemaDiff] = {
    val aCols = a.fields.map(f => f.name -> f.dataType).toMap
    val bCols = b.fields.map(f => f.name -> f.dataType).toMap
    val missing = aCols.keySet.diff(bCols.keySet).toSeq.sorted
      .map(c => SchemaDiff(c, "only_in_left", aCols(c).simpleString))
    val added = bCols.keySet.diff(aCols.keySet).toSeq.sorted
      .map(c => SchemaDiff(c, "only_in_right", bCols(c).simpleString))
    val changed = aCols.keySet.intersect(bCols.keySet).toSeq.sorted
      .filter(c => classify(aCols(c)) != classify(bCols(c)))
      .map(c => SchemaDiff(c, "type_class_changed",
        s"${classify(aCols(c)).name} -> ${classify(bCols(c)).name}"))
    missing ++ added ++ changed
  }

  /** DISTRIBUTION DRIFT between two corpus snapshots: per-bucket population
    * shares of a numeric metric plus the bucket's PSI contribution
    * (population stability index, the standard drift monitor:
    * Σ (p_a − p_b) · ln(p_a / p_b); ≥ 0.2 total = actionable shift).
    * Fixed-width buckets (`floor(metric / width)`, clamped into
    * `[0, nBuckets)` on both ends — signed metrics stay in range) so both
    * engines bucket identically — no quantile estimation, which would make
    * the boundaries engine-dependent. Laplace smoothing (+1 per bucket)
    * keeps empty buckets finite. Two B-row aggregates + one
    * broadcast-sized join: each snapshot pays one scan regardless of size,
    * and the emitted frame is at most `nBuckets` rows — per-bucket rows
    * rather than one pre-summed scalar, so the caller (and the oracle
    * compare) never depends on float summation order. */
  def distributionDrift(a: DataFrame, b: DataFrame, metricCol: String,
                        bucketWidth: Double, nBuckets: Int = 20): DataFrame = {
    require(bucketWidth > 0 && nBuckets >= 2, "need width > 0, nBuckets >= 2")
    def shares(df: DataFrame, tag: String) = {
      // clamped BOTH ways: values past nBuckets·width land in the last
      // bucket, negatives in the first — signed metrics stay inside the
      // declared bucket range (and the smoothing denominator stays honest)
      val bucket = greatest(least(floor(col(metricCol).cast("double") / bucketWidth),
        lit(nBuckets - 1)), lit(0)).cast("long").as("bucket")
      df.where(col(metricCol).isNotNull).select(bucket)
        .groupBy("bucket").agg(count(lit(1)).as(s"__c$tag"))
    }
    // totals derive from the bucket counts (every non-null row lands in a
    // bucket), so the whole frame stays LAZY and each snapshot pays its one
    // aggregation scan — no eager driver-side count() actions
    val joined = shares(a, "a").join(shares(b, "b"), Seq("bucket"), "full_outer")
    val totals = joined.agg(
      sum(coalesce(col("__ca"), lit(0L))).cast("double").as("__na"),
      sum(coalesce(col("__cb"), lit(0L))).cast("double").as("__nb"))
    val pa = (coalesce(col("__ca"), lit(0L)) + 1).cast("double") / (col("__na") + nBuckets)
    val pb = (coalesce(col("__cb"), lit(0L)) + 1).cast("double") / (col("__nb") + nBuckets)
    joined.crossJoin(broadcast(totals))
      .select(col("bucket"),
        round(pa, 6).as("share_a"), round(pb, 6).as("share_b"),
        round((pa - pb) * log(pa / pb), 6).as("psi_contrib"))
  }

  /** MULTI-DIRECTION EMBEDDING DRIFT — [[distributionDrift]] generalized
    * to K cosine projections of a vector column, computed in ONE pass per
    * snapshot. A single projection (e.g. cosine to the reference centroid)
    * is blind to any drift that preserves it — a rotation within the
    * centroid's orthogonal complement shifts every vector while the 1-D
    * statistic stays identical — so drift monitors project onto SEVERAL
    * deterministic directions (the centroid plus md5-derived hyperplanes,
    * [[graft.ops.Similarity.planes]]) and alert on the WORST one.
    * Each row explodes to K (direction, cos+1 ∈ [0, 2]) pairs bucketed on
    * a fixed grid; counts aggregate map-side per (direction, bucket), so
    * at 100 TB each snapshot pays one scan and the wire carries
    * K × nBuckets partials — never vectors. Output: per-(direction,
    * bucket) Laplace-smoothed shares and PSI contributions, the
    * [[distributionDrift]] convention keyed by direction (sum within a
    * direction for its PSI; max over directions is the alert statistic).
    * Directions index the caller's `dirs` order. */
  def directionalDrift(a: DataFrame, b: DataFrame, dirs: Seq[Array[Float]],
                       vecCol: String = "embedding",
                       nBuckets: Int = 20): DataFrame =
    directionalDriftFromCounts(directionalShares(a, dirs, vecCol, nBuckets),
      directionalShares(b, dirs, vecCol, nBuckets), nBuckets)

  /** One snapshot's side of [[directionalDrift]]: per-(direction, bucket)
    * counts of the K cosine projections, ONE scan (the explode feeds a
    * map-side-combinable count, so the wire carries K × nBuckets partials
    * — never vectors). Split out so a monitor can PERSIST a reference
    * snapshot's counts once (stamped with the corpus generation) and
    * grade every later window against the artifact via
    * [[directionalDriftFromCounts]] instead of re-scanning the reference
    * per drain. */
  def directionalShares(df: DataFrame, dirs: Seq[Array[Float]],
                        vecCol: String = "embedding",
                        nBuckets: Int = 20): DataFrame = {
    require(dirs.nonEmpty, "need at least one projection direction")
    require(nBuckets >= 2, s"nBuckets must be >= 2: $nBuckets")
    import org.apache.spark.sql.graft.SqlBridge
    val width = 2.0 / nBuckets
    val projections = array(dirs.zipWithIndex.map { case (d, i) =>
      struct(lit(i).as("direction"),
        (SqlBridge.column(graft.functions.CosineSim(
          SqlBridge.expression(col(vecCol)),
          SqlBridge.expression(typedLit(d)))) + 1).as("m"))
    }: _*)
    df.where(col(vecCol).isNotNull)
      .select(explode(projections).as("__p"))
      .select(col("__p.direction").as("direction"),
        greatest(least(floor(col("__p.m") / width), lit(nBuckets - 1)), lit(0))
          .cast("long").as("bucket"))
      .groupBy("direction", "bucket").agg(count(lit(1)).as("cnt"))
  }

  /** The smoothing + PSI arithmetic of [[directionalDrift]] over two
    * ALREADY-AGGREGATED (direction, bucket, cnt) frames — K × nBuckets
    * rows by construction. Per-direction totals come from a window sum
    * over the SAME joined frame (not a separate aggregate joined back),
    * so each input is referenced — and each snapshot scanned — exactly
    * once, without leaning on exchange reuse (ADVICE r19). The smoothing
    * convention is [[distributionDrift]]'s, keyed by direction. */
  def directionalDriftFromCounts(a: DataFrame, b: DataFrame,
                                 nBuckets: Int): DataFrame = {
    require(nBuckets >= 2, s"nBuckets must be >= 2: $nBuckets")
    val ca = a.select(col("direction"), col("bucket"), col("cnt").as("__ca"))
    val cb = b.select(col("direction"), col("bucket"), col("cnt").as("__cb"))
    val joined = ca.join(cb, Seq("direction", "bucket"), "full_outer")
    val byDir = org.apache.spark.sql.expressions.Window.partitionBy("direction")
    val na = sum(coalesce(col("__ca"), lit(0L))).over(byDir).cast("double")
    val nb = sum(coalesce(col("__cb"), lit(0L))).over(byDir).cast("double")
    val pa = (coalesce(col("__ca"), lit(0L)) + 1).cast("double") / (na + nBuckets)
    val pb = (coalesce(col("__cb"), lit(0L)) + 1).cast("double") / (nb + nBuckets)
    joined
      .select(col("direction"), col("bucket"),
        round(pa, 6).as("share_a"), round(pb, 6).as("share_b"),
        round((pa - pb) * log(pa / pb), 6).as("psi_contrib"))
  }

  /** The HAMMING tier's drift statistic: per-bit-position Bernoulli counts
    * of a packed long signature column, in [[directionalDriftFromCounts]]'
    * (direction, bucket, cnt) shape — direction = bit position, bucket =
    * the bit value {0, 1}. Each signature explodes to `sigBits` pairs
    * feeding a map-side-combinable count, so one pass per snapshot puts
    * sigBits × 2 partials on the wire regardless of corpus size; a
    * monitor compares a window's feed signatures against the indexed
    * population and alerts on the worst bit (the categorical analogue of
    * the vector tiers' worst-direction projection PSI — a simhash bit IS
    * a hyperplane side, so a flipped or re-hashed feed shows up as
    * inverted bit shares even when the banded route still matches). */
  def signatureBitCounts(df: DataFrame, sigBits: Int,
                         sigCol: String = "sig"): DataFrame = {
    require(sigBits >= 1 && sigBits <= 63, s"need 1 <= sigBits <= 63: $sigBits")
    val bits = array((0 until sigBits).map { b =>
      struct(lit(b).as("direction"),
        shiftright(col(sigCol), b).bitwiseAND(lit(1L)).cast("long").as("bucket"))
    }: _*)
    df.where(col(sigCol).isNotNull)
      .select(explode(bits).as("__p"))
      .select(col("__p.direction").as("direction"), col("__p.bucket").as("bucket"))
      .groupBy("direction", "bucket").agg(count(lit(1)).as("cnt"))
  }

  /** Categorical twin of [[distributionDrift]]: composition shift of a
    * discrete column (language, source, license) between two snapshots —
    * per-VALUE shares and PSI contributions over the union of observed
    * values. The smoothing denominator counts the union's cardinality, so
    * a value present in only one snapshot gets a finite, strongly positive
    * contribution (the "new source appeared" signal). Same cost shape:
    * one count aggregate per snapshot + a values-sized join. Cardinality
    * is the caller's contract (monitor columns, not free text). */
  def categoricalDrift(a: DataFrame, b: DataFrame, catCol: String): DataFrame = {
    val ca = a.where(col(catCol).isNotNull).groupBy(col(catCol).as("value"))
      .agg(count(lit(1)).as("__ca"))
    val cb = b.where(col(catCol).isNotNull).groupBy(col(catCol).as("value"))
      .agg(count(lit(1)).as("__cb"))
    val joined = ca.join(cb, Seq("value"), "full_outer")
    // totals AND the union cardinality come from one values-sized aggregate
    // over the joined counts, broadcast back in — the whole frame stays
    // LAZY and each snapshot pays its one aggregation scan
    val totals = joined.agg(
      sum(coalesce(col("__ca"), lit(0L))).cast("double").as("__na"),
      sum(coalesce(col("__cb"), lit(0L))).cast("double").as("__nb"),
      count(lit(1)).cast("double").as("__card"))
    val pa = (coalesce(col("__ca"), lit(0L)) + 1).cast("double") / (col("__na") + col("__card"))
    val pb = (coalesce(col("__cb"), lit(0L)) + 1).cast("double") / (col("__nb") + col("__card"))
    joined.crossJoin(broadcast(totals))
      .select(col("value"),
        round(pa, 6).as("share_a"), round(pb, 6).as("share_b"),
        round((pa - pb) * log(pa / pb), 6).as("psi_contrib"))
  }

  /** JENSEN–SHANNON drift between two snapshots of a categorical column —
    * the bounded companion to [[categoricalDrift]]'s PSI: per-value shares
    * plus the value's JSD contribution
    * `½·p·ln(p/m) + ½·q·ln(q/m)` with `m = (p+q)/2`. Total JSD lives in
    * `[0, ln 2]`, so one alert threshold works for every column regardless
    * of cardinality — where PSI is unbounded and its smoothing constant
    * leaks into the score. Raw (unsmoothed) shares: a zero share is exact —
    * `0·ln(0/m) = 0` on the vanished side while the surviving side still
    * contributes `½·p·ln 2` — so no smoothing denominator is needed and
    * one-sided values register with the maximal per-value signal.
    *
    * Same cost shape as the PSI monitors: one count aggregate per snapshot,
    * a values-sized full-outer join, totals broadcast back in — fully lazy,
    * each snapshot pays exactly one aggregation scan, the emitted frame is
    * per-value rows (never a pre-summed scalar, so the compare is free of
    * float summation order). */
  def jsDivergence(a: DataFrame, b: DataFrame, catCol: String): DataFrame = {
    val ca = a.where(col(catCol).isNotNull).groupBy(col(catCol).as("value"))
      .agg(count(lit(1)).as("__ca"))
    val cb = b.where(col(catCol).isNotNull).groupBy(col(catCol).as("value"))
      .agg(count(lit(1)).as("__cb"))
    val joined = ca.join(cb, Seq("value"), "full_outer")
    val totals = joined.agg(
      sum(coalesce(col("__ca"), lit(0L))).cast("double").as("__na"),
      sum(coalesce(col("__cb"), lit(0L))).cast("double").as("__nb"))
    // an EMPTY snapshot has no share distribution at all: guard the 0/0 so
    // its shares surface as NULL (not NaN silently poisoning downstream
    // comparisons — ADVICE r13) while the surviving side still contributes
    // as if the missing side carried zero mass everywhere
    val pa = when(col("__na") > 0,
      coalesce(col("__ca"), lit(0L)).cast("double") / col("__na"))
    val pb = when(col("__nb") > 0,
      coalesce(col("__cb"), lit(0L)).cast("double") / col("__nb"))
    val m = (coalesce(pa, lit(0.0)) + coalesce(pb, lit(0.0))) / 2
    // x·ln(x/m) with the x=0 limit made explicit (ln would yield -Inf·0=NaN);
    // a NULL share (empty snapshot) contributes 0 the same way
    def kl(x: Column) = when(x > 0, x * log(x / m)).otherwise(lit(0.0))
    joined.crossJoin(broadcast(totals))
      .select(col("value"),
        round(pa, 6).as("share_a"), round(pb, 6).as("share_b"),
        round((kl(pa) + kl(pb)) / 2, 6).as("jsd_contrib"))
  }

  /** Numeric twin of [[jsDivergence]]: the same fixed-width clamped
    * bucketing as [[distributionDrift]] (engine-identical boundaries, no
    * quantile estimation) feeding the bounded JSD — per-bucket shares and
    * contributions, total ∈ [0, ln 2] whatever the bucket count. */
  def jsDivergenceNumeric(a: DataFrame, b: DataFrame, metricCol: String,
                          bucketWidth: Double, nBuckets: Int = 20): DataFrame = {
    require(bucketWidth > 0 && nBuckets >= 2, "need width > 0, nBuckets >= 2")
    def buckets(df: DataFrame) = df.where(col(metricCol).isNotNull)
      .select(greatest(least(floor(col(metricCol).cast("double") / bucketWidth),
        lit(nBuckets - 1)), lit(0)).cast("long").as("bucket"))
    jsDivergence(buckets(a), buckets(b), "bucket")
  }

  /** Vocabulary drift: [[categoricalDrift]] over the word stream of two
    * corpus snapshots — per-word shares and PSI contributions over the
    * union vocabulary. The "did the token distribution move" monitor for
    * recurring corpus refreshes; a newly dominant or vanished word carries
    * a strong signed contribution. Each snapshot pays one explode + one
    * word-cardinality aggregate; the emitted frame is vocab-sized (per-word
    * rows, never a pre-summed scalar — same float-order-free convention as
    * the PSI monitors). */
  def vocabularyDrift(a: DataFrame, b: DataFrame,
                      textCol: String = "text"): DataFrame = {
    def ws(df: DataFrame) = df
      .select(explode(graft.ops.TextAnalysis.words(col(textCol))).as("word"))
      .where(col("word") =!= "")
    categoricalDrift(ws(a), ws(b), "word")
  }

  /** KEYED ROW DIFF between two snapshots of the same table: one full-outer
    * join on the primary key, one aggregation pass — added / removed /
    * changed / unchanged row counts plus a per-compared-column changed
    * count, all in a single emitted row. This is the row-level companion to
    * the profile diff: "how many rows moved, and in which columns" instead
    * of "did the aggregate stats move".
    *
    * Scale: the join shuffles both sides by key once (sort-merge at scale,
    * AQE free to broadcast a small side); the aggregate is a map-side
    * combinable global sum — nothing collects, no window, no second pass.
    * Comparisons are null-safe (`<=>`): a NULL↔value flip counts as a
    * change, NULL↔NULL does not. Presence markers (not key nullability)
    * decide added/removed, so NULL key components behave like values. */
  def keyedDiff(a: DataFrame, b: DataFrame, keys: Seq[String],
                compareCols: Seq[String]): DataFrame = {
    require(keys.nonEmpty, "keyedDiff needs key columns")
    require(compareCols.nonEmpty, "keyedDiff needs columns to compare")
    val la = a.select((keys ++ compareCols).map(col): _*)
      .withColumn("__lp", lit(true)).alias("l")
    val rb = b.select((keys ++ compareCols).map(col): _*)
      .withColumn("__rp", lit(true)).alias("r")
    val cond = keys.map(k => col(s"l.$k") <=> col(s"r.$k")).reduce(_ && _)
    val joined = la.join(rb, cond, "full_outer")
    val both = col("__lp").isNotNull && col("__rp").isNotNull
    val colChanged = compareCols.map(c => !(col(s"l.$c") <=> col(s"r.$c")))
    val anyChanged = colChanged.reduce(_ || _)
    def cnt(p: Column) = sum(when(p, 1L).otherwise(0L))
    val aggs = Seq(
      cnt(col("__lp").isNull).as("n_added"),
      cnt(col("__rp").isNull).as("n_removed"),
      cnt(both && anyChanged).as("n_changed"),
      cnt(both && !anyChanged).as("n_unchanged")) ++
      compareCols.zip(colChanged).map { case (c, ch) =>
        cnt(both && ch).as(s"changed_$c")
      }
    joined.agg(aggs.head, aggs.tail: _*)
  }

  /** Full table diff: schema diffs + per-column stat deltas. */
  def diffTables(spark: SparkSession, left: String, right: String): DataFrame = {
    import spark.implicits._
    val l = profile(spark.table(left)).map(s => (s.column, s.stat) -> s.value).toMap
    val r = profile(spark.table(right)).map(s => (s.column, s.stat) -> s.value).toMap
    val keys = (l.keySet ++ r.keySet).toSeq.sorted
    keys.map { k =>
      (k._1, k._2, l.get(k).orNull, r.get(k).orNull,
        l.get(k) == r.get(k))
    }.toDF("column", "stat", "left", "right", "equal")
  }
}

package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling for training-data pipelines. Spark's native
  * `sample()`/`sampleBy()` are seed-dependent on partitioning, so two runs
  * (or two engines) disagree; these operators derive the keep/split decision
  * from a portable md5 hash of the ROW ID — the same row lands in the same
  * split on any engine, any cluster size, any day. Pure projections +
  * filters: no shuffle, scan-speed at 100 TB, and fully pushdown-friendly.
  */
object Sampling {

  /** Portable per-row bucket in [0, 100): first 8 md5 hex chars of the id
    * rendered as a number. Uniform (md5), deterministic, engine-agnostic —
    * the DuckDB twin is `CAST('0x' || substr(md5(id), 1, 8) AS BIGINT) % 100`. */
  def hashBucket(id: Column): Column =
    conv(substring(md5(id.cast("string")), 1, 8), 16, 10).cast("long") % 100

  /** Stratified sample: per-stratum keep-percentages (0-100). Strata missing
    * from `rates` keep `defaultRate`. A 30%-of-'en', 100%-of-'de' config is
    * `Map("en" -> 30, "de" -> 100)` — rebalancing a skewed corpus without a
    * shuffle (the classic downsample-the-head training-data move). */
  def stratified(df: DataFrame, strataCol: String, rates: Map[String, Int],
                 defaultRate: Int = 0, idCol: String = "doc_id"): DataFrame = {
    val rate = rates.foldLeft(lit(defaultRate)) { case (acc, (k, v)) =>
      when(col(strataCol) === k, lit(v)).otherwise(acc)
    }
    df.where(hashBucket(col(idCol)) < rate)
  }

  /** Deterministic train/valid/test split: bucket < trainPct → train,
    * < trainPct+validPct → valid, else test. Same row, same split, forever —
    * the property that keeps eval sets uncontaminated across pipeline runs. */
  def split(df: DataFrame, trainPct: Int = 80, validPct: Int = 10,
            idCol: String = "doc_id"): DataFrame = {
    val b = hashBucket(col(idCol))
    df.withColumn("split",
      when(b < trainPct, "train")
        .when(b < trainPct + validPct, "valid")
        .otherwise("test"))
  }

  /** Fine-grained portable keep-fraction in [0, 1): six md5-derived decimal
    * digits — enough resolution for the data-driven rates `mixture` computes
    * (rates are rounded to the same 6 decimals, so both engines compare the
    * same numbers). */
  def hashFrac(id: Column): Column =
    (conv(substring(md5(id.cast("string")), 1, 8), 16, 10).cast("long")
      % 1000000L).cast("double") / 1000000.0

  /** MIXTURE REBALANCE — downsample a multi-source corpus to target mixture
    * WEIGHTS (the training-data "data mixing" step: e.g. 60% web / 20% code /
    * 20% books). Unlike [[stratified]] (caller fixes per-stratum rates), the
    * rates here are DERIVED from the corpus: capacity = min over weighted
    * strata of n_s / w_s (the largest total volume reachable without
    * upsampling any stratum), target_s = w_s · capacity, rate_s = target_s /
    * n_s — the binding stratum keeps 100%, everything else downsamples to
    * proportion. Per-row keep decision is the portable md5 fraction, so the
    * same row survives on any engine and any cluster size.
    *
    * Plan shape: one map-side-combinable groupBy over the stratum key (≤
    * #strata rows), one scalar min, and a broadcast join of the ≤ #strata
    * rate table back onto the scan — the corpus itself is touched by exactly
    * one filter pass, no shuffle of data rows at any scale. Strata absent
    * from `weights` (or weighted 0) are dropped. */
  def mixture(df: DataFrame, strataCol: String, weights: Map[String, Double],
              idCol: String = "doc_id"): DataFrame = {
    require(weights.values.forall(_ >= 0), "mixture weights must be >= 0")
    val w = weights.foldLeft(lit(0.0)) { case (acc, (k, v)) =>
      when(col(strataCol) === k, lit(v)).otherwise(acc)
    }
    val counts = df.groupBy(strataCol).agg(count("*").as("__n"))
      .withColumn("__w", w).where(col("__w") > 0)
    val capacity = counts.agg(min(col("__n").cast("double") / col("__w")).as("__cap"))
    val rates = counts.crossJoin(broadcast(capacity))
      .withColumn("__rate",
        round(least(lit(1.0), col("__w") * col("__cap") / col("__n")), 6))
      .select(col(strataCol), col("__rate"))
    df.join(broadcast(rates), Seq(strataCol))
      .where(hashFrac(col(idCol)) < col("__rate"))
      .drop("__rate")
  }

  /** TOKEN-MASS MIXTURE — [[mixture]] with weights over a MASS column
    * (token counts, bytes) instead of document counts: real training
    * mixtures are specified in token share ("60% web tokens"), and under
    * per-source length skew the two differ badly. Capacity = min over
    * weighted strata of mass_s / w_s, rate_s = w_s · capacity / mass_s;
    * the keep decision stays the per-ROW portable md5 fraction, so the
    * expected kept mass per stratum is exactly w_s · capacity while the
    * same rows survive on any engine (exact token quotas are
    * [[selectByBudget]]'s cumsum job, not a sampling rate's).
    *
    * Same plan shape: one map-side-combinable mass aggregate (≤ #strata
    * rows), one scalar min, one broadcast rate join onto the single scan. */
  def mixtureByMass(df: DataFrame, strataCol: String, weights: Map[String, Double],
                    massCol: String, idCol: String = "doc_id"): DataFrame = {
    require(weights.values.forall(_ >= 0), "mixture weights must be >= 0")
    val w = weights.foldLeft(lit(0.0)) { case (acc, (k, v)) =>
      when(col(strataCol) === k, lit(v)).otherwise(acc)
    }
    val masses = df.groupBy(strataCol)
      .agg(sum(col(massCol).cast("long")).as("__m"))
      .withColumn("__w", w).where(col("__w") > 0 && col("__m") > 0)
    val capacity = masses.agg(min(col("__m").cast("double") / col("__w")).as("__cap"))
    val rates = masses.crossJoin(broadcast(capacity))
      .withColumn("__rate",
        round(least(lit(1.0), col("__w") * col("__cap") / col("__m")), 6))
      .select(col(strataCol), col("__rate"))
    df.join(broadcast(rates), Seq(strataCol))
      .where(hashFrac(col(idCol)) < col("__rate"))
      .drop("__rate")
  }

  /** EPOCH MIXTURE — the UPSAMPLING counterpart of [[mixture]]: each
    * stratum is repeated `epochs_s` times per training pass (the Llama-
    * style data recipe: wikipedia 3×, books 1×, web 0.5×). Integer part =
    * whole copies of every row; fractional part = one extra copy for the
    * deterministic md5-fraction share of rows — so expected volume is
    * exactly epochs_s · n_s and the SAME rows replicate on any engine or
    * cluster. Each output row carries its `copy` index (distinct rows for
    * downstream shuffling/sharding).
    *
    * Scale: a pure projection + explode — NO shuffle, no aggregation; the
    * fan-out is bounded by max(epochs). Strata without a declared weight
    * drop (epochs 0), matching [[mixture]]'s contract. */
  def epochMixture(df: DataFrame, strataCol: String,
                   epochs: Map[String, Double],
                   idCol: String = "doc_id"): DataFrame = {
    require(epochs.values.forall(_ >= 0), "epoch counts must be >= 0")
    val e = epochs.foldLeft(lit(0.0)) { case (acc, (k, v)) =>
      when(col(strataCol) === k, lit(v)).otherwise(acc)
    }
    df.withColumn("__e", e)
      .withColumn("__copies",
        (floor(col("__e")) +
          when(hashFrac(col(idCol)) < col("__e") - floor(col("__e")), 1)
            .otherwise(0)).cast("int"))
      .where(col("__copies") > 0)
      .withColumn("copy", explode(sequence(lit(0), col("__copies") - 1)))
      .drop("__e", "__copies")
  }

  /** TEMPERATURE-SCALED MIXTURE (the XLM-R/mBERT exponential-smoothing
    * recipe): target weights derived from the corpus itself,
    * w_s ∝ (n_s/N)^alpha — alpha < 1 up-weights rare strata (languages,
    * sources) relative to their natural frequency; alpha = 1 reproduces
    * the corpus as-is. One count aggregate (≤ #strata scalars reach the
    * driver), weights rounded to 6 decimals for engine-portable capacity
    * arithmetic, then the same deterministic capacity-bound thinning as
    * [[mixture]]. */
  def temperatureMixture(df: DataFrame, strataCol: String, alpha: Double = 0.3,
                         idCol: String = "doc_id"): DataFrame = {
    require(alpha > 0 && alpha <= 1, "alpha must be in (0, 1]")
    val spark = df.sparkSession
    import spark.implicits._
    // ONE count aggregate; rates are pure driver arithmetic from there.
    // Weights stay UNROUNDED (rounding them skews the capacity and breaks
    // the alpha=1 identity by one part in 10^6); only the final rate is
    // rounded, and at alpha=1 rate = cap/N = 1 ± 1e-16, which 6-decimal
    // rounding restores to exactly 1. NULL strata carry no weight and are
    // excluded up front (a NULL key cannot equal anything downstream).
    val counts = df.where(col(strataCol).isNotNull)
      .groupBy(strataCol).agg(count(lit(1)).as("__n"))
      .collect().map(r => String.valueOf(r.get(0)) -> r.getLong(1))
    require(counts.nonEmpty, "temperature mixture needs a non-empty corpus")
    val total = counts.map(_._2).sum.toDouble
    val w = counts.map { case (k, n) => k -> math.pow(n / total, alpha) }.toMap
    val cap = counts.map { case (k, n) => n / w(k) }.min
    val rates = counts.map { case (k, n) =>
      (k, math.rint(math.min(1.0, w(k) * cap / n) * 1e6) / 1e6)
    }.toSeq.toDF("__k", "__rate")
    df.join(broadcast(rates), col(strataCol).cast("string") === col("__k"))
      .where(hashFrac(col(idCol)) < col("__rate"))
      .drop("__k", "__rate")
  }

  /** QUALITY-RANKED TOKEN-BUDGET SELECTION — "give me the best N tokens":
    * order the corpus by (score desc, id) and keep the greedy prefix whose
    * PRECEDING token total stays under `tokenBudget` — how a training run
    * fills a fixed token budget from a quality-scored corpus.
    *
    * The global ordered cumsum is computed scale-safely by RANGE
    * partitioning on the full sort key (score desc nulls-last, id): the
    * partitioner samples actual rows, so its boundaries are (score, id)
    * PAIRS — a corpus whose scores concentrate on one value (a classifier
    * that says ~0.9 for everything, coarse heuristic scores) still splits
    * evenly by id, where any score-VALUE bucketing scheme collapses into
    * one giant bucket and resurrects the single-partition global window
    * this design exists to avoid. Each range partition computes a local
    * prefix sum in one ordered window; the ≤ `buckets` per-partition
    * totals prefix-sum inside the plan (a window over the tiny slice
    * aggregate — partition 0 holds the top scores under the desc sort) and
    * broadcast-join back: ZERO driver traffic, one action. Partition ids
    * are replay-stable within the operator: the range boundaries come from
    * seed-deterministic sampling of the same input, and the explicit
    * partition count is never AQE-coalesced. Adds `cum_tokens_before`.
    *
    * `cache = true` (default) persists the range-partitioned rows
    * (memory-then-disk): Catalyst prunes the totals branch to narrower
    * columns than the output branch, which defeats exchange reuse — so
    * without the cache the input lineage (scan + range shuffle, plus
    * whatever scored the corpus upstream) would run twice. Disable for a
    * cheap-to-rescan raw input if local disk is tighter than a second
    * scan. Caller may `spark.catalog.clearCache()` when done. */
  def selectByBudget(df: DataFrame, tokenBudget: Long,
                     scoreCol: String = "quality_score",
                     tokensCol: String = "n_words",
                     idCol: String = "doc_id",
                     buckets: Int = 256,
                     cache: Boolean = true): DataFrame =
    selectByBudgetImpl(df, tokenBudget, scoreCol, tokensCol, idCol, buckets, cache)._1

  /** [[selectByBudget]] with the persisted slice SCOPED to `use`: the
    * handle unpersists when `use` returns, so a long-lived session running
    * many budget selections doesn't accumulate cached partitions (r8
    * verdict nit #6). Run the terminal action inside `use`. */
  def selectByBudgetScoped[T](df: DataFrame, tokenBudget: Long,
                              scoreCol: String = "quality_score",
                              tokensCol: String = "n_words",
                              idCol: String = "doc_id",
                              buckets: Int = 256)(use: DataFrame => T): T = {
    val (out, handle) = selectByBudgetImpl(
      df, tokenBudget, scoreCol, tokensCol, idCol, buckets, cache = true)
    try use(out) finally handle.foreach(_.unpersist())
  }

  private def selectByBudgetImpl(df: DataFrame, tokenBudget: Long,
                                 scoreCol: String, tokensCol: String,
                                 idCol: String, buckets: Int,
                                 cache: Boolean): (DataFrame, Option[DataFrame]) = {
    require(tokenBudget >= 0 && buckets > 0)
    import org.apache.spark.sql.expressions.Window
    // NULL scores sort LAST (plain ORDER BY ... DESC semantics on both
    // engines), so they only consume budget after the whole scored corpus
    val ord = Seq(col(scoreCol).desc_nulls_last, col(idCol).asc)
    val parted0 = df.repartitionByRange(buckets, ord: _*)
      .withColumn("__pid", spark_partition_id())
    val parted =
      if (cache) parted0.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      else parted0
    val w = Window.partitionBy("__pid").orderBy(ord: _*)
      .rowsBetween(Window.unboundedPreceding, -1)
    val local = parted.withColumn("__local",
      coalesce(sum(col(tokensCol).cast("long")).over(w), lit(0L)))
    // one total per range partition; offsets = exclusive prefix sum in
    // __pid order, computed in-plan over the ≤ `buckets`-row aggregate
    val wOff = Window.orderBy("__pid").rowsBetween(Window.unboundedPreceding, -1)
    val offs = parted.groupBy("__pid")
      .agg(sum(col(tokensCol).cast("long")).as("__t"))
      .withColumn("__off", coalesce(sum("__t").over(wOff), lit(0L)))
      .drop("__t")
    val out = local.join(broadcast(offs), Seq("__pid"))
      .withColumn("cum_tokens_before", col("__local") + col("__off"))
      .where(col("cum_tokens_before") < tokenBudget)
      .drop("__pid", "__local", "__off")
    (out, if (cache) Some(parted) else None)
  }

  /** Exact k smallest rows per group under the lexicographic order of
    * `sortExprs` (ascending; negate a numeric expression for descending) —
    * per-group top-k WITHOUT the window-rank shape. `row_number() OVER
    * (PARTITION BY g ORDER BY ...)` lands each group on one task and sorts
    * it there; with few huge groups (languages, sources, strata) that is a
    * full per-group single-task sort. Here a bounded-heap aggregate
    * ([[graft.functions.BoundedTopK]]) keeps ≤ k elements in every map-side
    * partial, so the shuffle carries at most k rows per group per map task
    * and no task ever holds more than k elements per group.
    *
    * Only `sortExprs` are compared — the payload row rides along opaquely
    * (so map-typed or otherwise non-orderable payload columns are fine).
    * Callers should make `sortExprs` a TOTAL order (append a unique id):
    * rows tied on every sort key keep an arbitrary (heap) relative order.
    * Null sort values sort FIRST (struct field ordering) — the opposite of
    * SQL's `ORDER BY ... DESC NULLS LAST`; coalesce them away if that
    * matters.
    * Output columns = input columns, k rows per group, ordered within each
    * group by the sort key. */
  def groupTopK(df: DataFrame, groupCols: Seq[String],
                sortExprs: Seq[Column], k: Int): DataFrame = {
    require(groupCols.nonEmpty && sortExprs.nonEmpty && k >= 1,
      "groupTopK needs group columns, sort expressions, and k >= 1")
    import org.apache.spark.sql.graft.SqlBridge
    val keyed = struct(
      sortExprs.zipWithIndex.map { case (c, i) => c.as(s"__s$i") } :+
        struct(df.columns.map(col): _*).as("__p"): _*)
    val topK = SqlBridge.column(graft.functions.BoundedTopK(
      SqlBridge.expression(keyed), k,
      sortFields = sortExprs.length).toAggregateExpression())
    df.groupBy(groupCols.map(col): _*)
      .agg(topK.as("__top"))
      .select(explode(col("__top")).as("__row"))
      .select(col("__row.__p.*"))
  }

  /** Exact-k-per-group RESERVOIR sample, deterministic: the k docs with the
    * smallest md5(seed:id) per group — the "give me exactly 100 docs per
    * source, same 100 every run and every engine" ask that fraction-based
    * [[stratified]] can't express. Same bounded-heap shape as [[groupTopK]]. */
  def reservoirByGroup(df: DataFrame, groupCol: String, k: Int,
                       seed: String = "graft",
                       idCol: String = "doc_id"): DataFrame =
    groupTopK(df, Seq(groupCol),
      Seq(md5(concat_ws(":", lit(seed), col(idCol).cast("string"))), col(idCol)), k)

  /** DETERMINISTIC WEIGHTED SAMPLING WITHOUT REPLACEMENT (Efraimidis &
    * Spirakis 2006, A-ES): each row gets the key ln(u) / w with u a strict
    * (0,1) uniform and w its positive weight; the k LARGEST keys are a
    * weighted sample without replacement (ln(u)/w ⇔ u^(1/w) — the paper's
    * key — under the monotone ln). The canonical "sample 1M docs
    * proportional to quality score" selection step.
    *
    * u derives from the portable md5 fraction of the row id (the
    * [[hashFrac]] family), so the SAME rows are drawn on any engine or
    * cluster size — the oracle recomputes the keys in SQL and must pick the
    * identical sample. Keys are rounded to the same 6 decimals on both
    * sides and ties break by id, so the selected SET matches exactly.
    *
    * Scale: one projection + a distributed TakeOrdered (per-partition
    * top-k heaps, k rows per task to the driver merge) — never a global
    * sort. Zero-or-negative weights are excluded (they have probability 0
    * in the A-ES scheme). */
  def weightedTopK(df: DataFrame, k: Int, weightCol: String,
                   idCol: String = "doc_id"): DataFrame = {
    require(k > 0, "k must be positive")
    // (m + 0.5) / 1e6 keeps u strictly inside (0,1) so ln(u) is finite
    val u = (hashFrac(col(idCol)) * 1000000.0 + 0.5) / 1000000.0
    df.where(col(weightCol).isNotNull && col(weightCol) > 0)
      .withColumn("es_key", round(log(u) / col(weightCol).cast("double"), 6))
      .orderBy(col("es_key").desc, col(idCol).asc)
      .limit(k)
  }

  /** DETERMINISTIC GLOBAL SHUFFLE + SHARDING — the training-export layout
    * step: give every row a portable pseudo-random order key
    * (md5(seed:id)), assign it to one of `nShards` output shards, and
    * number its position within the shard. Same seed ⇒ identical layout on
    * any engine or cluster size; a new seed is a fresh epoch-level
    * reshuffle. One shuffle on the shard key + one in-shard sort (spillable,
    * ~corpus/nShards rows per task — size nShards to the target file size,
    * not the cluster). */
  def shardAssign(df: DataFrame, nShards: Int, seed: String = "graft",
                  idCol: String = "doc_id"): DataFrame = {
    require(nShards > 0, "nShards must be positive")
    import org.apache.spark.sql.expressions.Window
    val key = md5(concat_ws(":", lit(seed), col(idCol).cast("string")))
    df.withColumn("shuffle_key", key)
      .withColumn("shard_id",
        (conv(substring(col("shuffle_key"), 1, 8), 16, 10).cast("long")
          % nShards).cast("int"))
      .withColumn("shard_pos", row_number().over(
        Window.partitionBy("shard_id").orderBy("shuffle_key", idCol))
        .cast("long"))
  }
}

package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** r21 same-JVM A/B probe for the flag-less changes (MAD fusion, DSIR
  * raw-side derivation, curation narrow gate checkpoint): the OLD
  * implementations are copied inline so both plans run interleaved in ONE
  * JVM under the bench's `.count()` action — the r20 lesson is that
  * cross-JVM focused runs drift 10-20% with host conditions and cannot
  * settle a same-magnitude delta.
  *
  * OUTCOMES (min-of-8, idle host, recorded in OPTIMIZATION_r21.md): the
  * MAD fusion and the DSIR derivation LOST and were reverted — so mad/old
  * vs mad/new and dsir/old vs dsir/new now compare identical plans on a
  * re-run; only curation/old-vs-new (the kept narrow gate checkpoint)
  * still differs. Kept as the methodology record + the harness for any
  * future re-probe.
  *
  *   sbt "Test/runMain graft.ABProbeR21 [runs]"
  */
object ABProbeR21 {
  def main(args: Array[String]): Unit = {
    val runs = if (args.nonEmpty) args(0).toInt else 8
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark0 = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.warehouse.dir",
        s"/tmp/graft-wh-abprobe-${ProcessHandle.current().pid()}")
      .getOrCreate()
    spark0.sparkContext.setLogLevel("ERROR")
    // curation runs capped-heap aggregates — raised clone like Bench
    val spark = graft.core.HeapAgg.raisedClone(spark0)
    graft.core.Tables.register(spark, sfDir)
    def docs = spark.table("documents")
    def events = spark.table("events")

    // ---- OLD byMad (pre-r21): two full-input percentile passes ----------
    def oldByMad(df: DataFrame, valueCol: String, groupCols: Seq[String],
                 k: Double = 3.5): DataFrame = {
      val g = groupCols.map(col)
      val aliases = groupCols.map(c => s"__k_$c")
      def statKeys(stats: DataFrame) = stats.select(
        groupCols.zip(aliases).map { case (c, a) => col(c).as(a) } :+
          stats.columns.filterNot(groupCols.contains).map(col).head: _*)
      def joinStats(rows: DataFrame, stats: DataFrame) = {
        val s = statKeys(stats)
        val cond = groupCols.zip(aliases)
          .map { case (c, a) => rows(c) <=> s(a) }.reduce(_ && _)
        rows.join(s, cond).drop(aliases: _*)
      }
      val med = df.groupBy(g: _*)
        .agg(percentile(col(valueCol), lit(0.5)).as("__med"))
      val withMed = joinStats(df, med)
      val mad = withMed.groupBy(g: _*)
        .agg(percentile(abs(col(valueCol) - col("__med")), lit(0.5)).as("__mad"))
      joinStats(withMed, mad)
        .withColumn("robust_z",
          when(col("__mad") > 0,
            round(abs(col(valueCol) - col("__med")) /
              (lit(1.4826) * col("__mad")), 6)))
        .withColumn("is_outlier",
          when(col("__mad") > 0, col("robust_z") > k)
            .otherwise(col(valueCol) =!= col("__med")))
        .withColumn("group_median", round(col("__med"), 6))
        .withColumn("group_mad", round(col("__mad"), 6))
        .drop("__med", "__mad")
    }

    // ---- OLD Dsir.scores (pre-r21): separate raw bucketLogProbs lineage --
    def oldDsirScores(raw: DataFrame, target: DataFrame): DataFrame = {
      val buckets = 1024
      def hashB(c: org.apache.spark.sql.Column) =
        conv(substring(md5(c), 1, 8), 16, 10).cast("long") % buckets
      def grams(df: DataFrame): DataFrame = {
        val projected = df.select(col("doc_id"),
          graft.ops.TextAnalysis.words(col("text")).as("__ws"))
        val ws = col("__ws")
        val bigrams = when(size(ws) >= 2,
          transform(sequence(lit(0), size(ws) - 2),
            i => concat_ws(" ", element_at(ws, i + 1), element_at(ws, i + 2))))
          .otherwise(array().cast("array<string>"))
        projected.select(col("doc_id"), explode(concat(ws, bigrams)).as("gram"))
      }
      import org.apache.spark.sql.expressions.Window
      def blp(df: DataFrame): DataFrame = {
        val counts = grams(df)
          .select(hashB(col("gram")).as("bucket"))
          .groupBy("bucket").agg(count(lit(1)).as("c"))
        val everyBucket = spark.range(buckets).toDF("bucket")
          .join(counts, Seq("bucket"), "left")
          .select(col("bucket"), coalesce(col("c"), lit(0L)).as("c"))
        val n = sum("c").over(Window.partitionBy())
        everyBucket.select(col("bucket"),
          log((col("c") + 1).cast("double") / (n + buckets)).as("logp"))
      }
      val lam = blp(target).withColumnRenamed("logp", "lt")
        .join(blp(raw), Seq("bucket"))
        .select(col("bucket"), (col("lt") - col("logp")).as("lam"))
      val perDoc = grams(raw)
        .withColumn("bucket", hashB(col("gram")))
        .join(broadcast(lam), Seq("bucket"))
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_grams"), sum("lam").as("log_importance"))
      val u = (graft.ops.Sampling.hashFrac(col("doc_id")) * 1000000.0 + 0.5) / 1000000.0
      perDoc.withColumn("gumbel_key", col("log_importance") - log(-log(u)))
    }

    // ---- curation capstone: gate checkpoint + wide-vs-narrow stage pins --
    // mode 0 = r20 shape (no gate ckpt, WIDE fuzzy/decon checkpoints)
    // mode 1 = narrow gate ckpt, wide stages (the kept r21 change)
    // mode 2 = narrow gate ckpt + NARROW loser/dirty id checkpoints; fuzzy
    //          and decon stay lazy anti-joins against the `cleaned` leaf —
    //          the corpus text is serialized ONCE (cleaned) instead of 3x
    def curation(mode: Int): DataFrame = {
      val d = docs
      val gateIds0 = graft.ops.TextAnalysis.gopherFilter(d)
        .where(col("passes_gopher")).select("doc_id")
      val gateIds = if (mode >= 1) gateIds0.localCheckpoint() else gateIds0
      val gated = d.join(gateIds, Seq("doc_id"))
      val lined = graft.ops.TextAnalysis.lineDedup(
        gated.withColumn("text", regexp_replace(col("text"), " (the|a) ", "\n")),
        minDf = 3, hashKeys = true)
      val cleaned = gated.drop("text").join(
        lined.where(col("n_lines_kept") >= 1)
          .select(col("doc_id"), col("text_deduped").as("text")), Seq("doc_id"))
        .localCheckpoint()
      val losers0 = graft.ops.Dedup.jaccardPairs(cleaned, n = 3, threshold = 0.5,
          maxDocFreq = 20)
        .select(col("b").as("doc_id")).distinct()
      val losers = if (mode == 2) losers0.localCheckpoint() else losers0
      val fuzzy0 = cleaned.join(losers, Seq("doc_id"), "left_anti")
      val fuzzy = if (mode == 2) fuzzy0 else fuzzy0.localCheckpoint()
      val b = graft.ops.Sampling.hashBucket(col("doc_id"))
      val train = fuzzy.where(b >= 10)
      val dirty0 = graft.ops.Dedup.contamination(train, fuzzy.where(b < 10), n = 5)
        .select("doc_id")
      val dirty = if (mode == 2) dirty0.localCheckpoint() else dirty0
      val decon0 = train.join(dirty, Seq("doc_id"), "left_anti")
      val decon = if (mode == 2) decon0 else decon0.localCheckpoint()
      val mixed = graft.ops.Sampling.mixture(decon, "lang",
        Map("en" -> 0.4, "de" -> 0.2, "es" -> 0.2, "fr" -> 0.1, "zh" -> 0.1))
      graft.ops.Sampling.split(mixed)
        .groupBy("split", "lang")
        .agg(count("*").cast("long").as("n_docs"),
          sum("n_chars").cast("long").as("sum_chars"))
    }

    val variants: Seq[(String, () => DataFrame)] = Seq(
      "mad/old" -> (() => oldByMad(events, "value", Seq("event_type"))
        .where(col("is_outlier"))
        .select(col("event_id"), col("event_type"), col("value"), col("robust_z"))),
      "mad/new" -> (() => graft.ops.Outliers.byMad(events, "value", Seq("event_type"))
        .where(col("is_outlier"))
        .select(col("event_id"), col("event_type"), col("value"), col("robust_z"))),
      "dsir/old" -> (() => oldDsirScores(docs, docs.where(col("lang") === "en"))),
      "dsir/new" -> (() => graft.ops.Dsir.scores(docs, docs.where(col("lang") === "en"))),
      "curation/old" -> (() => curation(0)),
      "curation/new" -> (() => curation(1)),
      "curation/narrow" -> (() => curation(2)))

    variants.foreach { case (name, mk) =>
      spark.sparkContext.setJobDescription(s"warmup:$name"); mk().count()
    }
    val times = scala.collection.mutable.LinkedHashMap(
      variants.map { case (n, _) => n -> scala.collection.mutable.ArrayBuffer.empty[Double] }: _*)
    for (r <- 1 to runs; (name, mk) <- variants) {
      spark.sparkContext.setJobDescription(s"abprobe:$name:$r")
      val t0 = System.nanoTime()
      mk().count()
      times(name) += (System.nanoTime() - t0) / 1e9
    }
    times.foreach { case (name, ts) =>
      println(f"[abprobe] $name%-14s min=${ts.min}%6.3f  " +
        ts.map(t => f"$t%.3f").mkString("[", ", ", "]"))
    }
    spark0.stop()
  }
}

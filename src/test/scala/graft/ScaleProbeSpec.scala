package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Capability probe at ~sf1 on an ADVERSARIAL corpus (r5 verdict task #6):
  * the 100×-scale claims in Dedup/Streams were argued from plan shape; this
  * measures them on a corpus 10× the bench SF with a boilerplate paragraph
  * injected into 30% of documents — the skew pattern that makes uncapped
  * candidate generation quadratic. Uniform synthetic data never exercises
  * the cap, so the skew injection is the point.
  *
  * Env-gated (`GRAFT_SCALE_PROBE=1 sbt "testOnly graft.ScaleProbeSpec"`)
  * because it runs minutes, not seconds; it records its timing table to
  * SCALE_PROBE.md so the measurement survives in the repo.
  */
class ScaleProbeSpec extends AnyFunSuite {

  test("sf1 skewed-corpus probe: capped dedup + CDC state fold stay bounded") {
    val enabled = sys.env.contains("GRAFT_SCALE_PROBE")
    assume(enabled, "set GRAFT_SCALE_PROBE=1 to run the sf1 capability probe")
    val spark = SparkSession.builder()
      .master("local[32]")
      .appName("graft-scale-probe")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.warehouse.dir",
        s"/tmp/graft-scale-wh-${ProcessHandle.current().pid()}")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // every timed probe exercises k-bounded heaps (dedup caps, ANN
    // merges), so the whole probe runs on a raised CLONE — the same
    // configuration Bench/Verify apply per bounded-heap query
    try runProbe(graft.core.HeapAgg.raisedClone(spark))
    finally spark.stop()
  }

  private def runProbe(spark: SparkSession): Unit = {
    graft.core.Tables.register(spark, "/root/testdata/sf0.1")
    val results = scala.collection.mutable.ArrayBuffer.empty[(String, Double, String)]
    def t[A](label: String, note: String = "")(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      val sec = (System.nanoTime() - t0) / 1e9
      results += ((label, sec, note))
      println(f"[scale-probe] $label: $sec%.2f s  $note"); r
    }

    // ---- corpus: 10 shifted copies of sf0.1 documents (50k docs), 30%
    // prefixed with a shared boilerplate paragraph, materialized to parquet
    // so every operator pays a real scan
    val boiler = "this document is provided under the standard terms of " +
      "service all content herein is offered without warranty of any kind " +
      "either expressed or implied including fitness for purpose "
    val corpusDir = "/tmp/graft-scale-sf1-documents"
    val base = spark.table("documents").select("doc_id", "text")
    (0 until 10).map(k => base.select(
        (col("doc_id") + lit(k * 1000000L)).as("doc_id"), col("text")))
      .reduce(_ unionByName _)
      .withColumn("text",
        when(pmod(col("doc_id"), lit(10)) < 3, concat(lit(boiler), col("text")))
          .otherwise(col("text")))
      .write.mode("overwrite").parquet(corpusDir)
    val docs = spark.read.parquet(corpusDir)
    val nDocs = docs.count()
    println(s"[scale-probe] corpus: $nDocs docs, 30% boilerplate-prefixed")

    // ---- what the UNCAPPED generator would have paid (analytic, not run:
    // the candidate join's output volume is Σ_gram df·(df−1)/2 — at a 15k
    // boilerplate clique that is billions of rows, which is the point)
    val uncappedVolume = graft.ops.Dedup.shingles(docs)
      .groupBy("gram").agg(count("*").as("df"))
      .agg(sum(col("df") * (col("df") - 1) / 2)).head().getDouble(0)
    results += (("uncapped candidate volume (analytic)", -1.0,
      f"$uncappedVolume%.3g candidate rows — NOT run"))

    // ---- capped dedup family
    val pairs = t("jaccardPairs capped (maxDocFreq=20)",
      "one capped shuffle + length prefilter + exact verify") {
      val p = graft.ops.Dedup.jaccardPairs(docs, n = 3, threshold = 0.5,
        maxDocFreq = 20).cache()
      val n = p.count(); println(s"  pairs: $n"); p
    }
    t("clusters over capped edges", "driver union-find fast path") {
      graft.ops.Dedup.clusters(docs, pairs).count()
    }
    t("simhash 60-bit", "zero-shuffle JVM pass") {
      graft.ops.Dedup.simhash(docs).count()
    }
    t("exact dedup (md5)", "hash groupBy") {
      graft.ops.Dedup.exact(docs).count()
    }
    t("minhashLsh threshold-matched banding (32 bands x 4 rows)",
      "r=2 banding targets j~0.125 and over-generates on boilerplate; " +
        "r=4 targets j~0.42") {
      graft.ops.Dedup.minhashLsh(docs, n = 3, numHashes = 128,
        rowsPerBand = 4, threshold = 0.5).count()
    }
    t("minhashLsh default banding + bucket cap (64 bands x 2, maxBucket=20)",
      "near-exhaustive banding made skew-safe by the capped bucket stage") {
      graft.ops.Dedup.minhashLsh(docs, n = 3, numHashes = 128,
        rowsPerBand = 2, threshold = 0.5, maxBucket = 20).count()
    }
    t("minhashLsh OPH signatures, same banding + cap (one hash per gram)",
      "O(grams+k) one-permutation signatures vs O(grams*128) classic") {
      graft.ops.Dedup.minhashLsh(docs, n = 3, numHashes = 128,
        rowsPerBand = 2, threshold = 0.5, maxBucket = 20, oph = true).count()
    }
    pairs.unpersist()
    t("containmentPairs capped (threshold=0.8, maxDocFreq=20)",
      "subset-dup axis: same subtractive cap, no size-ratio prune") {
      graft.ops.Dedup.containmentPairs(docs, n = 3, threshold = 0.8,
        maxDocFreq = 20).count()
    }
    t("novelty score (df=1 gram fraction per doc)",
      "one full-gram-stream exchange; df=1 subset + doc-sized frames after") {
      graft.ops.TextAnalysis.novelty(docs).count()
    }
    t("tf-idf cosine (top-10 terms, kept-df cap 20)",
      "capped candidate join + exact full-vector verify — the 30% " +
        "boilerplate clique shares top terms, the adversarial input the " +
        "cap exists for") {
      val n = graft.ops.TextAnalysis.tfIdfCosine(docs, topTerms = 10,
        threshold = 0.3, maxKeptDf = 20).count()
      println(s"  pairs: $n"); n
    }
    t("group top-k (5 per source-prefix over the sf1 corpus)",
      "bounded-heap aggregate: <= k rows per group per map task, no window") {
      graft.ops.Sampling.groupTopK(
        docs.withColumn("grp", pmod(col("doc_id"), lit(64))),
        Seq("grp"), Seq((-length(col("text"))).as("nl"), col("doc_id").as("i")),
        k = 5).count()
    }
    // 10 shifted corpus copies mean every span has df >= 10, so maxDf=20
    // separates structural duplication (10 copies, kept) from the planted
    // boilerplate (15k docs, dropped) — the C4 removal target
    t("boilerplate span removal (C4, 5-word spans, maxDf=20)",
      "pure-projection segmentation + anti-join against heavy spans") {
      graft.ops.TextAnalysis.spanDedup(docs, spanTokens = 5, maxDf = 20).count()
    }
    t("exact substring dup spans (w=30 chars, minCount=2)",
      "O(chars) rolling window hashes + semi-join + island merge") {
      graft.ops.Dedup.substringDupSpans(docs).count()
    }

    // ---- the r7 corpus operators on the same adversarial corpus: the
    // boilerplate paragraph becomes corpus-frequent LINES under the induced
    // segmentation — exactly the heavy-set case lineDedup's anti-join must
    // bound — and the per-doc signal batteries must hold scan speed
    t("line-level corpus dedup (induced lines, boilerplate-heavy)",
      "line-df count + heavy-set anti-join + ordered reassembly") {
      val lined = docs.withColumn("text",
        regexp_replace(col("text"), " (the|a|of) ", "\n"))
      graft.ops.TextAnalysis.lineDedup(lined, minDf = 30).count()
    }
    t("gopher repetition battery (11 signals)",
      "zero-shuffle per-doc JVM pass, O(words x 9) hashing") {
      graft.ops.TextAnalysis.gopherRepetition(
        docs.withColumn("text", regexp_replace(col("text"), " (the|a) ", "\n"))).count()
    }
    t("c4 filter", "pure codegen projection at scan speed") {
      graft.ops.TextAnalysis.c4Filter(
        docs.withColumn("text", regexp_replace(col("text"), " (the|a) ", ".\n"))).count()
    }
    t("corpus overlap matrix (20 strata)",
      "per-gram fan-out bounded by G^2, never doc-pairs") {
      graft.ops.Dedup.corpusOverlap(
        docs.withColumn("src", concat(lit("s"), pmod(col("doc_id"), lit(20)))),
        groupCol = "src").count()
    }
    t("dsir scores (target = 10% stratum, B=1024)",
      "two B-row aggs + broadcast log-ratio join + one doc-keyed agg") {
      graft.ops.Dsir.scores(docs,
        docs.where(pmod(col("doc_id"), lit(10)) === 0)).count()
    }

    // ---- banded hamming near-dup at sf1: the boilerplate-prefixed docs
    // form simhash-close cliques; the bucket cap keeps the band join's
    // fan-out bounded under exactly that clique pressure
    t("simhash + banded hamming join (d<=7, 8 bands, maxBucket=200)",
      "zero-shuffle signatures + one band-keyed equi-join + bit_count verify") {
      val n = graft.ops.Dedup.hammingPairs(graft.ops.Dedup.simhash(docs),
        maxHamming = 7, bands = 8, maxBucket = 200).count()
      println(s"  pairs: $n"); n
    }

    // ---- heavy hitters over the sf1 word stream (~8M word instances):
    // the Misra–Gries candidate pass bounds the exact-verify shuffle to
    // candidate keys — the naive groupBy+HAVING would shuffle every
    // distinct word
    t("heavy hitters (phi=0.002, exploded sf1 words)",
      "per-partition MG candidates + broadcast exact verify") {
      val words = docs.select(
        explode(graft.ops.TextAnalysis.words(col("text"))).as("word"))
        .where(col("word") =!= "")
      val n = graft.ops.Sketches.heavyHitters(words, "word", phi = 0.002).count()
      println(s"  heavy words: $n"); n
    }

    // ---- the r9 six-stage curation capstone on the SAME adversarial
    // corpus (lang/n_chars synthesized): the gate, the heavy-line anti-join,
    // the df-capped fuzzy dedup, the gram-keyed decontamination, and the
    // broadcast mixture/split must all stay bounded under the boilerplate
    // skew — each stage checkpointed like a materialized asset
    t("curation capstone (gate→line→fuzzy→decontam→mixture→split)",
      "six stages, stage-boundary checkpoints, hashed 64-bit gram keys") {
      val full = docs
        .withColumn("lang", element_at(
          array(lit("en"), lit("de"), lit("es"), lit("fr"), lit("zh")),
          (pmod(col("doc_id"), lit(5)) + 1).cast("int")))
        .withColumn("n_chars", length(col("text")).cast("long"))
      val gateIds = graft.ops.TextAnalysis.gopherFilter(full)
        .where(col("passes_gopher")).select("doc_id")
      val gated = full.join(gateIds, Seq("doc_id"))
      val lined = graft.ops.TextAnalysis.lineDedup(
        gated.withColumn("text", regexp_replace(col("text"), " (the|a) ", "\n")),
        minDf = 30, hashKeys = true)
      val cleaned = gated.drop("text").join(
        lined.where(col("n_lines_kept") >= 1)
          .select(col("doc_id"), col("text_deduped").as("text")), Seq("doc_id"))
        .localCheckpoint()
      val losers = graft.ops.Dedup.jaccardPairs(cleaned, n = 3,
          threshold = 0.5, maxDocFreq = 20)
        .select(col("b").as("doc_id")).distinct()
      val fuzzy = cleaned.join(losers, Seq("doc_id"), "left_anti").localCheckpoint()
      val b = graft.ops.Sampling.hashBucket(col("doc_id"))
      val train = fuzzy.where(b >= 10)
      val dirty = graft.ops.Dedup.contamination(train, fuzzy.where(b < 10), n = 5)
        .select("doc_id")
      val decon = train.join(dirty, Seq("doc_id"), "left_anti").localCheckpoint()
      val mixed = graft.ops.Sampling.mixture(decon, "lang",
        Map("en" -> 0.4, "de" -> 0.2, "es" -> 0.2, "fr" -> 0.1, "zh" -> 0.1))
      val n = graft.ops.Sampling.split(mixed)
        .groupBy("split", "lang").count().count()
      println(s"  (split,lang) cells: $n"); n
    }

    // ---- semantic dedup at 100k vectors: 2000 planted near-dup cliques
    // (50 members each, 0.001-scale jitter); brute force is N(N−1)/2 ≈
    // 5.0e9 cosines — the clustered path does ~probes²/nlist of that, with
    // per-task memory one cluster
    val embDir = "/tmp/graft-scale-sf1-embeddings"
    spark.range(100000).selectExpr("id AS vec_id",
      "transform(sequence(0,63), j -> CAST(sin((id % 2000) * (j+1)) " +
        "+ 0.001*sin(id*(j+1)) AS FLOAT)) AS embedding")
      .write.mode("overwrite").parquet(embDir)
    val emb = spark.read.parquet(embDir)
    results += (("brute-force cosine volume (analytic)", -1.0,
      "5.0e9 pair cosines — NOT run"))
    t("semantic near-dup (100k vecs, nlist=256, probes=2)",
      "learned quantizer + in-cluster exact cosine ≥ 0.95") {
      val n = graft.ops.Similarity.semanticNearDup(emb, threshold = 0.95,
        nlist = 256, probes = 2).count()
      println(s"  pairs: $n"); n
    }

    // ---- bipartite KNN join on the same 100k vectors: 20k queries fetch
    // top-5 of an 80k corpus through the blocked grid — brute force is
    // 1.6e9 pair cosines run as Q×S memory-bounded cells, never a
    // broadcast of either side
    t("knn join (20k queries x 80k corpus, k=5, blocked grid)",
      "per-cell primitive-loop scoring; <= k*S candidate rows per query") {
      val n = graft.ops.Similarity.knnJoin(
        emb.where(col("vec_id") % 5 === 0), emb.where(col("vec_id") % 5 =!= 0),
        k = 5).count()
      println(s"  rows: $n"); n
    }
    // the IVF-routed scale tier over the SAME bipartite problem: the exact
    // grid pays 1.6e9 cosines however it shards; routing through 256
    // inverted lists at nprobe=8 cuts per-query compute to ~nprobe/nlist
    // (~3%) of brute force — the row that justifies the approximate tier
    t("knn join IVF-routed (same 20k x 80k, nlist=256, nprobe=8)",
      "build-once quantizer; corpus sharded by list, queries replicate " +
        "to probed lists only — ~nprobe/nlist of the exact compute") {
      val n = graft.ops.Similarity.knnJoinIvf(
        emb.where(col("vec_id") % 5 === 0), emb.where(col("vec_id") % 5 =!= 0),
        k = 5, nlist = 256, nprobe = 8).count()
      println(s"  rows: $n"); n
    }
    // the PERSISTED-INDEX tier over the same problem: knnJoinIvf re-maps
    // the full corpus through nearestCentroid on EVERY invocation (the r14
    // design note — at 100 TB that assignment pass dominates each query
    // batch); saveIndex pays it once, and the warm routed join reads
    // pre-hashed bucket files with zero corpus-side exchange
    t("ivf index build (80k corpus -> bucketed inverted lists, nlist=256)",
      "assignment map + bucketed write + quantizer artifact — paid ONCE per corpus") {
      val corpus = emb.where(col("vec_id") % 5 =!= 0)
      val cents = graft.ops.Similarity.ivfCentroids(corpus, nlist = 256)
      graft.ops.Similarity.saveCentroids(spark, cents, "g_probe_ivf_cents")
      graft.ops.Similarity.saveIndex(spark, corpus, cents, "g_probe_ivf_index")
    }
    t("knn join over the persisted index (same 20k x 80k, nprobe=8, warm)",
      "zero per-batch assignment work: list-keyed cogroup over pre-assigned lists") {
      val cents = graft.ops.Similarity.loadCentroids(spark, "g_probe_ivf_cents")
      val n = graft.ops.Similarity.knnJoinIvfIndexed(
        emb.where(col("vec_id") % 5 === 0),
        graft.ops.Similarity.loadIndex(spark, "g_probe_ivf_index"),
        cents, k = 5, nprobe = 8).count()
      println(s"  rows: $n"); n
    }

    // ---- KMV distinct over ~900k event rows: the distinct-set shuffle is
    // the only data-sized stage; the sketch itself is <= k longs per group
    t("kmv distinct (900k rows, 64 groups, k=256)",
      "distinct shuffle + bounded-heap k-minima per group, no window") {
      val ev = (0 until 9).map(k => spark.table("events")
          .select((col("event_id") + lit(k * 10000000L)).as("event_id"),
            col("user_id")))
        .reduce(_ unionByName _)
        .withColumn("grp", pmod(col("event_id"), lit(64)))
      graft.ops.Sketches.kmvDistinct(ev, "grp", "user_id", k = 256).count()
    }

    // ---- BPE induction on the skewed corpus: the loop runs over the
    // word-frequency table, so corpus size only prices the first pass
    t("bpe merges (16 rounds, skewed sf1 corpus)",
      "corpus pass + 16 argmax rounds over the word-frequency table") {
      graft.ops.Bpe.bpeMerges(docs, numMerges = 16).count()
    }

    // ---- as-of join at ~900k events: union-and-sweep is |L|+|R| rows,
    // one shuffle — no inequality-join blowup to measure
    val events10 = (0 until 10).map(k => spark.table("events")
        .select((col("event_id") + lit(k * 10000000L)).as("event_id"),
          col("user_id"), col("ts"), col("event_type"), col("value")))
      .reduce(_ unionByName _)
    t("range join (~900k events vs 25 overlapping windows)",
      "bucket equi-join, no nested-loop") {
      val t0 = to_timestamp(lit("2024-01-01 00:00:00"))
      val windows = spark.table("nation").select(
        col("n_nationkey").cast("long").as("win_id"),
        (t0 + make_dt_interval(col("n_nationkey"))).as("win_start"),
        (t0 + make_dt_interval(col("n_nationkey") + 3)).as("win_end"))
      graft.ops.RangeJoin.pointInInterval(
        events10.select("event_id", "ts"), windows).count()
    }
    t("z-order layout (~900k events, 2 dims, 64 files)",
      "one quantile pass + codegen bucket tree + one range shuffle") {
      graft.ops.ZOrder.cluster(
        events10.select(col("user_id"), col("value"), col("event_id")),
        Seq("user_id", "value"), numFiles = 64).count()
    }
    t("funnel view->click->purchase (~900k events)",
      "step-filtered scan + one grouped ladder pass") {
      graft.ops.Funnel.funnel(events10, Seq("view", "click", "purchase")).count()
    }
    t("as-of join (~900k events, clicks vs latest purchase)",
      "one shuffle + ordered sweep") {
      val clicks = events10.where(col("event_type") === "click")
        .select(col("event_id"), col("user_id"), col("ts"), col("value"))
      val purchases = events10.where(col("event_type") === "purchase")
        .select(col("user_id"), col("ts").as("p_ts"),
          col("event_id").as("p_event_id"), col("value").as("p_value"))
      graft.ops.AsOf.asofJoin(clicks, purchases, Seq("user_id"), "ts", "p_ts",
        payload = Seq("p_event_id", "p_value"), tieCol = "p_event_id").count()
    }

    // ---- CDC state fold at 1.5M keys: snapshot batch (wide → atomic
    // bucketed rebuild), then a key-LOCALIZED batch that must cost
    // O(touched buckets), not O(state)
    val wh = new graft.materialize.SessionCatalogWarehouse(spark)
    graft.materialize.SessionCatalogWarehouse.dropAny(spark, "probe_cdc__cdc_state")
    spark.sql("DROP VIEW IF EXISTS probe_cdc")
    val orders10 = (0 until 10).map(k => spark.table("orders")
        .select((col("o_orderkey") + lit(k * 100000000L)).as("k"),
          col("o_totalprice").as("v")))
      .reduce(_ unionByName _)
    import org.apache.spark.sql.expressions.Window
    val win = Window.partitionBy(col("k")).orderBy(col("seq").desc, col("op").desc)
    def latestOf(df: DataFrame) = df
      .withColumn("__rn", row_number().over(win)).where(col("__rn") === 1).drop("__rn")
    val writer = new graft.streaming.Streams.BucketedStateWriter(Seq("k"), Some(64))
    // materialize each batch OUTSIDE the timer, like foreachBatch hands the
    // writer a computed micro-batch — otherwise the writer's touched-bucket
    // probe + merge re-run the 10-way union scan 2-3× and the "localized"
    // row prices the probe's input construction, not the fold
    val snap = latestOf(orders10.withColumn("op", lit("r"))
      .withColumn("seq", lit(0L))).localCheckpoint()
    val nKeys = snap.count()
    t(s"cdc snapshot fold ($nKeys keys, 64 buckets)", "wide batch → rebuild") {
      writer.upsert(wh, "probe_cdc__cdc_state", snap, latestOf, Nil, Nil)
    }
    // localized: only keys hashing into 2 of 64 buckets
    val localized = snap.where(pmod(hash(col("k")), lit(64)).isin(0, 1))
      .withColumn("op", lit("u")).withColumn("seq", lit(1L)).localCheckpoint()
    val nLoc = localized.count()
    t(s"cdc localized fold ($nLoc keys, 2/64 buckets)",
      "incremental partition overwrite") {
      writer.upsert(wh, "probe_cdc__cdc_state", localized, latestOf, Nil, Nil)
    }
    val stateRows = spark.table("probe_cdc__cdc_state").count()
    assert(stateRows == nKeys, s"state must stay one row per key: $stateRows")
    graft.materialize.SessionCatalogWarehouse.dropAny(spark, "probe_cdc__cdc_state")

    // the OVERLAY writer at the same scale: per-batch cost stays O(touched)
    // AND the commit is atomic (one view swap) — measured, not argued
    graft.materialize.SessionCatalogWarehouse.dropAny(spark, "probe_ov__cdc_state")
    val ovWriter = new graft.streaming.Streams.OverlayStateWriter(Seq("k"), Some(64))
    t(s"cdc overlay snapshot fold ($nKeys keys, 64 buckets)", "base table write") {
      ovWriter.upsert(wh, "probe_ov__cdc_state", snap, latestOf, Nil, Nil)
    }
    t(s"cdc overlay localized fold ($nLoc keys, 2/64 buckets)",
      "overlay table + atomic view swap") {
      ovWriter.upsert(wh, "probe_ov__cdc_state", localized, latestOf, Nil, Nil)
    }
    val ovRows = spark.table("probe_ov__cdc_state").count()
    assert(ovRows == nKeys, s"overlay state must stay one row per key: $ovRows")
    graft.materialize.SessionCatalogWarehouse.dropAny(spark, "probe_ov__cdc_state")

    // ---- sf3 trend rows (GRAFT_SCALE_PROBE=3): the fold and capstone
    // paths again at 3× the sf1 probe, staged so a future regression shows
    // up as a per-stage trend (r9 verdict #7), not a single opaque number
    val probeLevel = sys.env.get("GRAFT_SCALE_PROBE")
    if (probeLevel.exists(v => v == "3" || v == "10"))
      runSf3(spark, wh, results)
    // ---- sf10 trend rows (GRAFT_SCALE_PROBE=10): ONLY the two
    // scale-dominant stages (fuzzy jaccard, minhash banding) at one more
    // decade — 500k docs — with the SHUFFLE ROW count recorded alongside
    // seconds, so the cap²-not-corpus² claim is witnessed in the metric
    // it is actually about
    if (probeLevel.contains("10"))
      runSf10(spark, results)

    // ---- record the table
    val md = new StringBuilder
    md ++= "# Scale probe — sf1 (10× bench SF), boilerplate-skewed corpus\n\n"
    md ++= s"Generated by `GRAFT_SCALE_PROBE=1 sbt \"testOnly graft.ScaleProbeSpec\"` " +
      s"at local[32]; $nDocs documents, 30% sharing a boilerplate paragraph " +
      "(the adversarial input for candidate generation). " +
      "`GRAFT_SCALE_PROBE=3` appends the sf3 trend rows (150k docs, " +
      "4.5M CDC keys; capstone staged per-checkpoint); `=10` additionally " +
      "appends the sf10 rows (500k docs) for the two scale-dominant " +
      "stages, with shuffle-write record counts.\n\n"
    md ++= "| step | seconds | note |\n|---|---|---|\n"
    results.foreach { case (l, s, n) =>
      md ++= (if (s < 0) s"| $l | — | $n |\n" else f"| $l | $s%.2f | $n |\n")
    }
    md ++= "\nThe capped generator's advantage is structural: the uncapped " +
      "self-join would materialize the analytic candidate volume above as " +
      "actual shuffle rows; the capped path never creates them. The CDC rows " +
      "witness per-batch cost tracking the batch's bucket footprint, not " +
      "total state size.\n"
    md ++= "\nStreaming fresh-run elevation (r16 watch item, CLOSED r17 as " +
      "ENVIRONMENTAL): the five windowed-state keys (`stream_window_topk`, " +
      "`stream_heavy_hitters`, `stream_quantile_histogram`, " +
      "`stream_distinct_kmv`, `stream_enriched_counts`) ran a three-arm " +
      "clean-process A/B at sf0.1. (a) ISOLATED fresh JVM, only the five " +
      "keys: mins 2.72-3.35 s — already at the r16 'regressed' level with " +
      "ZERO ANN keys loaded, so shared-JVM crowding cannot be the cause. " +
      "(b) CROWDED: the same five keys after the seven heavy streaming-ANN " +
      "keys in one JVM (with r17's per-query ServingCache.releaseAll): " +
      "2.59-3.26 s — no crowding penalty at all; the release keeps the " +
      "block manager flat. (c) r15-HEAD BINARY on the same day/host: " +
      "3.02-3.81 s — the OLD code reproduces the elevation (and the " +
      "r15->r16 diff touches zero shared streaming machinery), so the " +
      "r15-vs-r16 fresh-run delta is host-generation variance on the " +
      "trigger/checkpoint latency path (batch CPU-bound keys stay flat, " +
      "fsync probe 0.54 ms). The committed sidecar mins remain the " +
      "record; fold caches are now released per query in Bench/Verify.\n"
    md ++= "\n`stream_cdc_apply` floor (r12-carried chase, closed r15): the " +
      "bench key is 3 micro-batches through the n=1 overlay writer, i.e. " +
      "three mandatory state rewrites. GRAFT_CDC_TIMING decomposition on the " +
      "r15 build host (warm): snapshot write 0.88 s + two compactions at " +
      "~0.6 s fold+write and ~0.1 s resize-count each ≈ 2.2 s of " +
      "irreducible fold/write work, plus ~1.2 s of micro-batch machinery " +
      "(trigger + checkpoint setup, per-batch isEmpty probes, final read). " +
      "The r15 skips (touched-probe and batch cache elided at n=1; catalog " +
      "listing only on the writer's first compaction) removed the " +
      "removable tier: 4.45 -> 3.43 s same-machine A/B (-23%), projecting " +
      "~2.2 s at the sidecar host's 1.5x speed factor — under the 2.5 s " +
      "target; the sidecar min updates when a fast-host pass records it.\n"
    java.nio.file.Files.writeString(java.nio.file.Paths.get("SCALE_PROBE.md"), md.toString)
    println("[scale-probe] wrote SCALE_PROBE.md")
  }

  /** sf3 section: the curation capstone per-stage and the CDC folds at 3×
    * the sf1 probe volumes (150k docs, 4.5M state keys). Each capstone
    * stage ends at its localCheckpoint so the row prices exactly that
    * stage's shuffles — the trend rows that catch a fold/capstone
    * regression before it reaches a real cluster. */
  private def runSf3(spark: SparkSession, wh: graft.materialize.Warehouse,
      results: scala.collection.mutable.ArrayBuffer[(String, Double, String)]): Unit = {
    import org.apache.spark.sql.expressions.Window
    def t[A](label: String, note: String = "")(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      val sec = (System.nanoTime() - t0) / 1e9
      results += ((label, sec, note))
      println(f"[scale-probe] $label: $sec%.2f s  $note"); r
    }
    val boiler = "this document is provided under the standard terms of " +
      "service all content herein is offered without warranty of any kind " +
      "either expressed or implied including fitness for purpose "
    val corpusDir = "/tmp/graft-scale-sf3-documents"
    val base = spark.table("documents").select("doc_id", "text")
    (0 until 30).map(k => base.select(
        (col("doc_id") + lit(k * 1000000L)).as("doc_id"), col("text")))
      .reduce(_ unionByName _)
      .withColumn("text",
        when(pmod(col("doc_id"), lit(10)) < 3, concat(lit(boiler), col("text")))
          .otherwise(col("text")))
      .write.mode("overwrite").parquet(corpusDir)
    val docs = spark.read.parquet(corpusDir)
    val nDocs = docs.count()
    println(s"[scale-probe] sf3 corpus: $nDocs docs")

    // capstone, one row per stage (same program as the sf1 composite row)
    val full = docs
      .withColumn("lang", element_at(
        array(lit("en"), lit("de"), lit("es"), lit("fr"), lit("zh")),
        (pmod(col("doc_id"), lit(5)) + 1).cast("int")))
      .withColumn("n_chars", length(col("text")).cast("long"))
    val gated = t("sf3 capstone stage 1/6: gopher gate",
      "pure-projection rule battery + id semi-join") {
      val gateIds = graft.ops.TextAnalysis.gopherFilter(full)
        .where(col("passes_gopher")).select("doc_id")
      full.join(gateIds, Seq("doc_id")).localCheckpoint()
    }
    val cleaned = t("sf3 capstone stage 2/6: line dedup",
      "line-df count + heavy-set anti-join + reassembly") {
      val lined = graft.ops.TextAnalysis.lineDedup(
        gated.withColumn("text", regexp_replace(col("text"), " (the|a) ", "\n")),
        minDf = 90, hashKeys = true)
      gated.drop("text").join(
        lined.where(col("n_lines_kept") >= 1)
          .select(col("doc_id"), col("text_deduped").as("text")), Seq("doc_id"))
        .localCheckpoint()
    }
    val fuzzy = t("sf3 capstone stage 3/6: fuzzy jaccard dedup",
      "df-capped gram join; cap 60 = 2x the 30 structural copies, " +
        "candidate volume ~ cap^2 per gram") {
      val losers = graft.ops.Dedup.jaccardPairs(cleaned, n = 3,
          threshold = 0.5, maxDocFreq = 60)
        .select(col("b").as("doc_id")).distinct()
      cleaned.join(losers, Seq("doc_id"), "left_anti").localCheckpoint()
    }
    val decon = t("sf3 capstone stage 4/6: decontamination",
      "gram-keyed contamination screen vs 10% holdout") {
      val b = graft.ops.Sampling.hashBucket(col("doc_id"))
      val train = fuzzy.where(b >= 10)
      val dirty = graft.ops.Dedup.contamination(train, fuzzy.where(b < 10), n = 5)
        .select("doc_id")
      train.join(dirty, Seq("doc_id"), "left_anti").localCheckpoint()
    }
    t("sf3 capstone stages 5-6/6: mixture + split",
      "broadcast rate table + in-plan hash split") {
      val mixed = graft.ops.Sampling.mixture(decon, "lang",
        Map("en" -> 0.4, "de" -> 0.2, "es" -> 0.2, "fr" -> 0.1, "zh" -> 0.1))
      val n = graft.ops.Sampling.split(mixed)
        .groupBy("split", "lang").count().count()
      println(s"  (split,lang) cells: $n"); n
    }

    // CDC folds at 4.5M keys
    graft.materialize.SessionCatalogWarehouse.dropAny(spark, "probe3_cdc__cdc_state")
    val orders30 = (0 until 30).map(k => spark.table("orders")
        .select((col("o_orderkey") + lit(k * 100000000L)).as("k"),
          col("o_totalprice").as("v")))
      .reduce(_ unionByName _)
    val win = Window.partitionBy(col("k")).orderBy(col("seq").desc, col("op").desc)
    def latestOf(df: DataFrame) = df
      .withColumn("__rn", row_number().over(win)).where(col("__rn") === 1).drop("__rn")
    val writer = new graft.streaming.Streams.BucketedStateWriter(Seq("k"), Some(64))
    // materialized like a real foreachBatch micro-batch (see sf1 note)
    val snap = latestOf(orders30.withColumn("op", lit("r"))
      .withColumn("seq", lit(0L))).localCheckpoint()
    val nKeys = snap.count()
    t(s"sf3 cdc snapshot fold ($nKeys keys, 64 buckets)", "wide batch → rebuild") {
      writer.upsert(wh, "probe3_cdc__cdc_state", snap, latestOf, Nil, Nil)
    }
    val localized = snap.where(pmod(hash(col("k")), lit(64)).isin(0, 1))
      .withColumn("op", lit("u")).withColumn("seq", lit(1L)).localCheckpoint()
    val nLoc = localized.count()
    t(s"sf3 cdc localized fold ($nLoc keys, 2/64 buckets)",
      "incremental partition overwrite") {
      writer.upsert(wh, "probe3_cdc__cdc_state", localized, latestOf, Nil, Nil)
    }
    val stateRows = spark.table("probe3_cdc__cdc_state").count()
    assert(stateRows == nKeys, s"sf3 state must stay one row per key: $stateRows")
    graft.materialize.SessionCatalogWarehouse.dropAny(spark, "probe3_cdc__cdc_state")

    // OVERLAY restart at probe scale (r12 brief #4): the restart net runs
    // at fixture scale; these rows re-run its core — a FRESH writer
    // recovering the composition from the view text alone, mid-chain — at
    // the same 4.5M keys, timing the first post-restart localized fold.
    // The timing claim under test: recovery + fold cost tracks the BATCH'S
    // bucket footprint (2/64 buckets ≈ 140k keys), never total state size.
    graft.materialize.SessionCatalogWarehouse.dropAny(spark, "probe3_cdcov__cdc_state")
    val ovWriter = new graft.streaming.Streams.OverlayStateWriter(Seq("k"), Some(64))
    t(s"sf3 overlay snapshot fold ($nKeys keys, 64 buckets)",
      "wide batch → atomic base build") {
      ovWriter.upsert(wh, "probe3_cdcov__cdc_state", snap, latestOf, Nil, Nil)
    }
    val loc2 = snap.where(pmod(hash(col("k")), lit(64)).isin(2, 3))
      .withColumn("op", lit("u")).withColumn("seq", lit(2L)).localCheckpoint()
    val nLoc2 = loc2.count()
    t(s"sf3 overlay localized fold ($nLoc2 keys, 2/64 buckets)",
      "overlay append + view swap, same writer") {
      ovWriter.upsert(wh, "probe3_cdcov__cdc_state", loc2, latestOf, Nil, Nil)
    }
    val restarted = new graft.streaming.Streams.OverlayStateWriter(Seq("k"), Some(64))
    val loc3 = snap.where(pmod(hash(col("k")), lit(64)).isin(4, 5))
      .withColumn("op", lit("u")).withColumn("seq", lit(3L)).localCheckpoint()
    val nLoc3 = loc3.count()
    t(s"sf3 overlay POST-RESTART localized fold ($nLoc3 keys, 2/64 buckets)",
      "fresh writer: composition recovered from the view text, then overlay append") {
      restarted.upsert(wh, "probe3_cdcov__cdc_state", loc3, latestOf, Nil, Nil)
    }
    // the restart property itself, green at probe scale: one row per key,
    // each key carrying exactly the seq its bucket's last batch wrote
    val st = spark.table("probe3_cdcov__cdc_state")
      .withColumn("b", pmod(hash(col("k")), lit(64)))
      .withColumn("want", when(col("b").isin(2, 3), 2L)
        .when(col("b").isin(4, 5), 3L).otherwise(0L))
    val nState = st.count()
    val bad = st.where(col("seq") =!= col("want")).count()
    assert(nState == nKeys && bad == 0,
      s"sf3 overlay restart diverged: rows=$nState (want $nKeys), badSeq=$bad")
    graft.materialize.SessionCatalogWarehouse.dropAny(spark, "probe3_cdcov__cdc_state")
  }

  /** sf10 section: the two SCALE-DOMINANT stages — the df-capped fuzzy
    * jaccard join and the banded minhash candidate stage — at 500k docs
    * (100 structural copies), one decade past the sf1 probe. The rows
    * record total SHUFFLE-WRITE RECORDS next to seconds: the cap²
    * scaling law lives in the candidate/pair shuffle volume (copies² ×
    * originals when the cap tracks 2× the copy count), so the shuffle
    * counter — not wall-clock, which folds in constant scan costs — is
    * the number a regression would bend. */
  private def runSf10(spark: SparkSession,
      results: scala.collection.mutable.ArrayBuffer[(String, Double, String)]): Unit = {
    // seconds + shuffle records for one block; listener events are posted
    // async, so drain with a short bounded wait after the job completes
    def tShuffle[A](label: String, note: String)(f: => A): A = {
      val acc = new java.util.concurrent.atomic.AtomicLong(0L)
      val listener = new org.apache.spark.scheduler.SparkListener {
        override def onStageCompleted(
            sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit =
          acc.addAndGet(sc.stageInfo.taskMetrics.shuffleWriteMetrics.recordsWritten)
      }
      spark.sparkContext.addSparkListener(listener)
      val t0 = System.nanoTime()
      val r =
        try f
        finally {
          Thread.sleep(2000) // bounded drain of the async listener bus
          spark.sparkContext.removeSparkListener(listener)
        }
      val sec = (System.nanoTime() - t0) / 1e9 - 2.0
      val rows = acc.get()
      results += ((label, sec, f"$note; shuffle rows $rows%,d"))
      println(f"[scale-probe] $label: $sec%.2f s, shuffle rows $rows%,d"); r
    }
    val boiler = "this document is provided under the standard terms of " +
      "service all content herein is offered without warranty of any kind " +
      "either expressed or implied including fitness for purpose "
    val corpusDir = "/tmp/graft-scale-sf10-documents"
    val base = spark.table("documents").select("doc_id", "text")
    (0 until 100).map(k => base.select(
        (col("doc_id") + lit(k * 1000000L)).as("doc_id"), col("text")))
      .reduce(_ unionByName _)
      .withColumn("text",
        when(pmod(col("doc_id"), lit(10)) < 3, concat(lit(boiler), col("text")))
          .otherwise(col("text")))
      .write.mode("overwrite").parquet(corpusDir)
    val docs = spark.read.parquet(corpusDir)
    val nDocs = docs.count()
    println(s"[scale-probe] sf10 corpus: $nDocs docs")
    // cap tracks 2× the structural copy count (same rule as sf1/sf3), so
    // per-gram candidate volume is C(copies, 2) — the cap² term
    tShuffle(s"sf10 fuzzy jaccard dedup ($nDocs docs, cap 200)",
      "df-capped gram join; per-gram candidates ~ copies^2") {
      val n = graft.ops.Dedup.jaccardPairs(docs, n = 3, threshold = 0.5,
        maxDocFreq = 200).count()
      println(s"  pairs: $n"); n
    }
    tShuffle(s"sf10 prefix-filtered jaccard ($nDocs docs, cap 200)",
      "heavy-corrected prefix filter + full-set verify") {
      val n = graft.ops.Dedup.jaccardPairsPrefix(docs, n = 3, threshold = 0.5,
        maxDocFreq = 200).count()
      println(s"  pairs: $n"); n
    }
    // the nightly-crawl shape at the same decade: a 10% batch deduped
    // against the other 90% as the reference corpus. The batch slice is
    // the non-boilerplate residue class, so the heavy-gram machinery is
    // exercised purely from the corpus side — the production shape
    // (yesterday's corpus defines what is ubiquitous, not the new crawl).
    val batch10 = docs.where(pmod(col("doc_id"), lit(10)) === 3)
    val corpus90 = docs.where(pmod(col("doc_id"), lit(10)) =!= 3)
    tShuffle(s"sf10 incremental dedup, 10% batch vs 90% corpus (cap 200)",
      "corpus-df-capped batch-gram join") {
      val n = graft.ops.Dedup.jaccardAgainst(batch10, corpus90, n = 3,
        threshold = 0.5, maxDocFreq = 200).count()
      println(s"  pairs: $n"); n
    }
    tShuffle(s"sf10 prefix-filtered incremental dedup (cap 200)",
      "two-sided heavy-corrected prefix + full-set verify") {
      val n = graft.ops.Dedup.jaccardAgainstPrefix(batch10, corpus90, n = 3,
        threshold = 0.5, maxDocFreq = 200).count()
      println(s"  pairs: $n"); n
    }
    // the subset-dup axis at the same decade: capped vs asymmetric-prefix
    // containment over the identical corpus — the r12 verdict's named
    // next-step (the containment family was the one dedup family joining
    // ALL kept grams)
    tShuffle(s"sf10 containment pairs ($nDocs docs, cap 200)",
      "subtractive df-cap, all kept grams join") {
      val n = graft.ops.Dedup.containmentPairs(docs, n = 3, threshold = 0.8,
        maxDocFreq = 200).count()
      println(s"  pairs: $n"); n
    }
    tShuffle(s"sf10 prefix-filtered containment ($nDocs docs, cap 200)",
      "smaller-side prefix x full kept stream + full-set verify") {
      val n = graft.ops.Dedup.containmentPairsPrefix(docs, n = 3,
        threshold = 0.8, maxDocFreq = 200).count()
      println(s"  pairs: $n"); n
    }
    tShuffle(s"sf10 incremental containment, 10% batch vs 90% corpus (cap 200)",
      "corpus-df-capped batch-gram join, containment scoring") {
      val n = graft.ops.Dedup.containmentAgainst(batch10, corpus90, n = 3,
        threshold = 0.8, maxDocFreq = 200).count()
      println(s"  pairs: $n"); n
    }
    tShuffle(s"sf10 prefix-filtered incremental containment (cap 200)",
      "two-sided asymmetric prefix + full-set verify") {
      val n = graft.ops.Dedup.containmentAgainstPrefix(batch10, corpus90,
        n = 3, threshold = 0.8, maxDocFreq = 200).count()
      println(s"  pairs: $n"); n
    }
    // maxBucket stays at the sf1/sf3 value 20, NOT 2× the copy count: at
    // 100 structural copies every identical-signature clique fills its
    // band buckets past any cap proportional to the copies, and letting
    // cliques through (maxBucket=200 was tried) sends ~25M clique pairs
    // into the string-array verify — ~60 GB of shuffle that filled the
    // probe host's disk. Exact-dup cliques are [[Dedup.exact]]'s job; the
    // banding row measures the signature + capped candidate stages.
    tShuffle(s"sf10 minhash OPH banding + cap ($nDocs docs, 64x2, maxBucket=20)",
      "one-permutation signatures + capped bucket pair stage") {
      graft.ops.Dedup.minhashLsh(docs, n = 3, numHashes = 128,
        rowsPerBand = 2, threshold = 0.5, maxBucket = 20, oph = true).count()
    }
    // the portable-estimator sketch tier one decade up (r13 brief #7): the
    // shuffle counter witnesses the bounded-heap / bucket-frame claims —
    // KMV's only data-sized stage is the distinct-fingerprint shuffle
    // (state is <= k longs per group however the input grows), and the
    // histogram's exchange carries only (group x occupied-bucket) counts
    val ev50 = (0 until 50).map(k => spark.table("events")
        .select((col("event_id") + lit(k * 10000000L)).as("event_id"),
          col("user_id"), col("value")))
      .reduce(_ unionByName _)
      .withColumn("grp", pmod(col("event_id"), lit(512)))
    tShuffle("sf10 kmv distinct (5M rows, 512 groups, k=256)",
      "distinct shuffle + bounded-heap k-minima; no window, no sort") {
      graft.ops.Sketches.kmvDistinct(ev50, "grp", "user_id", k = 256).count()
    }
    tShuffle("sf10 histogram quantiles (5M rows, 512 groups, 256 buckets)",
      "exchange carries only group x occupied-bucket counts (<= 131k rows)") {
      graft.ops.Sketches.histogramQuantiles(ev50, "grp", "value",
        bucketWidth = 2.0, nBuckets = 256).count()
    }
    // ---- the newest capped-candidate operator one decade up (r14 brief
    // #7): weighted lexical cosine over the 500k-doc corpus. The cap
    // follows the jaccard-family rule (2x the structural copy count), and
    // the shuffle counter is the number an uncapped candidate stage would
    // bend: every term shared corpus-wide would otherwise join all its
    // postings pairwise.
    tShuffle(s"sf10 tf-idf cosine ($nDocs docs, top-10 terms, kept-df cap 200)",
      "capped candidate join + exact full-vector verify; 30% boilerplate clique") {
      val n = graft.ops.TextAnalysis.tfIdfCosine(docs, topTerms = 10,
        threshold = 0.3, maxKeptDf = 200).count()
      println(s"  pairs: $n"); n
    }
    graft.core.Fs.deleteRecursively(java.nio.file.Paths.get(corpusDir))

    // ---- routed ANN one decade up (r14 brief #6): 200k queries x 800k
    // corpus. The exact bipartite volume (1.6e11 cosines) is structurally
    // absent; the routed tier's only vector shuffles are the corpus C rows
    // (one list each) + Q*nprobe probe rows — the claim the shuffle
    // counter witnesses at the decade that matters.
    val embDir10 = "/tmp/graft-scale-sf10-embeddings"
    spark.range(1000000).selectExpr("id AS vec_id",
      "transform(sequence(0,63), j -> CAST(sin((id % 20000) * (j+1)) " +
        "+ 0.001*sin(id*(j+1)) AS FLOAT)) AS embedding")
      .write.mode("overwrite").parquet(embDir10)
    val emb10 = spark.read.parquet(embDir10)
    val q10 = emb10.where(col("vec_id") % 5 === 0)
    val c10 = emb10.where(col("vec_id") % 5 =!= 0)
    results += (("sf10 exact bipartite knn volume (analytic)", -1.0,
      "1.6e11 pair cosines — NOT run"))
    val cents10 = graft.ops.Similarity.ivfCentroids(c10, nlist = 256)
    tShuffle("sf10 knn join IVF-routed (200k x 800k, nlist=256, nprobe=8)",
      "C + Q*nprobe vector shuffle rows; per-task memory one inverted list") {
      val n = graft.ops.Similarity.knnJoinIvf(q10, c10, k = 5, nlist = 256,
        nprobe = 8, prebuilt = Some(cents10)).count()
      println(s"  rows: $n"); n
    }
    // ---- the IVFADC route at the same decade (r15 brief #5): residual
    // PQ codes cut per-candidate vector traffic d·4/m× (64-dim float →
    // 8 bytes at m=8), so the probed-list scan is memory-bound on CODES;
    // the rerank row adds the production two-stage serving shape (ADC
    // shortlist over codes, exact rerank of Q·shortlist survivors only).
    val books10 = graft.ops.Pq.residualCodebooks(c10, cents10, m = 8, k = 16)
    tShuffle("sf10 knn join IVF-PQ-routed (200k x 800k, nlist=256, nprobe=8, m=8)",
      "corpus side shuffles m-byte CODES, not float vectors (d*4/m = 32x " +
        "less per-candidate traffic); C + Q*nprobe shuffle rows") {
      val n = graft.ops.Pq.knnJoinIvfPq(q10, c10, topK = 5, nlist = 256,
        nprobe = 8, m = 8, prebuiltCentroids = Some(cents10),
        prebuiltBooks = Some(books10)).count()
      println(s"  rows: $n"); n
    }
    tShuffle("sf10 knn join IVF-PQ + exact rerank (same config, shortlist 50)",
      "ADC shortlist over codes, then exact native-cosine rerank of the " +
        "Q*shortlist survivors — compression error affects recall, never " +
        "reported similarity") {
      val n = graft.ops.Pq.knnJoinIvfPqRerank(q10, c10, topK = 5,
        shortlist = 50, nlist = 256, nprobe = 8, m = 8,
        prebuiltCentroids = Some(cents10), prebuiltBooks = Some(books10)).count()
      println(s"  rows: $n"); n
    }
    // the streaming serving shape at the same decade: the query set as a
    // file-backed stream routed under the same pinned quantizer against
    // the static corpus. AvailableNow ends before the final watermark, so
    // the row prices the full ROUTE (route flatMap, stream-static list
    // join, native cosine, bounded-heap state writes) — emission closes in
    // steady state, cost is the measured quantity.
    val feed10 = "/tmp/graft-scale-sf10-annfeed"
    q10.select(col("vec_id"), col("embedding"),
        (lit("2024-01-01 00:00:00").cast("timestamp") + make_dt_interval(
          lit(0), lit(0), lit(0), pmod(col("vec_id"), lit(7200)))).as("ts"))
      .coalesce(1).write.mode("overwrite").parquet(feed10)
    def annStream(label: String, note: String, bcBytes: Long): Unit =
      tShuffle(label, note) {
        val qs = spark.readStream
          .schema(spark.read.parquet(feed10).schema).parquet(feed10)
        val hits = graft.streaming.Streams.streamingAnnTopK(qs, c10, cents10,
          k = 5, nprobe = 8, windowLen = "1 minute", watermark = "1 minute",
          maxBroadcastBytes = bcBytes)
        hits.writeStream.format("noop")
          .option("checkpointLocation",
            java.nio.file.Files.createTempDirectory("graft-ann10-cp").toString)
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start().awaitTermination()
      }
    annStream("sf10 streaming ANN top-k, packed-list spill tier (200k x 800k, nprobe=8)",
      "spill tier forced: index folded to one flat-packed row per list " +
        "(persisted static fold), stream-static join moves Q*nprobe query " +
        "ROWS, scored per (task, list) through the cached-primitive " +
        "ann_list_top_k at one-list-per-partition join granularity. r18 " +
        "decomposition of the r17 48.7 s (vs broadcast 24.0): accessor " +
        "kernel 839 CPU-s vs 495 primitive (Platform.getFloat defeats " +
        "SIMD) + 256-lists-into-32-partitions straggler (max task 38 s vs " +
        "med 27); the per-(task,list) primitive cache + nlist-partition " +
        "join cut the scoring stage to 422 CPU-s / max task 7.7 s — " +
        "spill now at broadcast parity; r19 scoped cache entries to ONE " +
        "task attempt (the amortization is within-task by construction) " +
        "and re-witnessed 25.09 s. History: r15 pair stream 430.8 s, " +
        "tuple-packed 121 s, flat+typed 94 s, in-place accessor 48.7 s", bcBytes = 0L)
    annStream("sf10 streaming ANN top-k, broadcast serving tier (same 200k x 800k)",
      "RAM-resident index (204 MB raw, ~816 MB heap-estimated under the 4x " +
        "gate factor): primitive-kernel scoring emits <= k rows/query into " +
        "the windowed aggregate — the (nprobe/nlist)*C*Q pair stream never " +
        "exists", bcBytes = 1L << 32)
    // the IVFADC serving twins at the same decade: the persisted code
    // index is m/(d·4) of the float index (~6.4 MB of codes vs ~204 MB of
    // vectors at m=8), so the broadcast tier's RAM gate covers 32× more
    // corpus before spilling — and the spill twin keeps ADC semantics via
    // the packed-code join + in-place expression
    graft.ops.Pq.savePqIndex(spark, c10, cents10, books10, "probe_adc_idx")
    val adcIdx = graft.ops.Pq.loadPqIndex(spark, "probe_adc_idx")
    def adcStream(label: String, note: String, bcBytes: Long): Unit =
      tShuffle(label, note) {
        val qs = spark.readStream
          .schema(spark.read.parquet(feed10).schema).parquet(feed10)
        val hits = graft.streaming.Streams.streamingAnnAdcTopK(qs, adcIdx,
          cents10, books10, k = 5, nprobe = 8, windowLen = "1 minute",
          watermark = "1 minute", maxBroadcastBytes = bcBytes)
        hits.writeStream.format("noop")
          .option("checkpointLocation",
            java.nio.file.Files.createTempDirectory("graft-adc10-cp").toString)
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start().awaitTermination()
      }
    adcStream("sf10 streaming IVFADC top-k, broadcast code tier (200k x 800k, m=8)",
      "RAM-resident CODE index (~6.4 MB codes vs 204 MB floats — the " +
        "32x gate-reach claim): per (query, cell) one m x k distance " +
        "table, m lookups per candidate", bcBytes = 1L << 32)
    adcStream("sf10 streaming IVFADC top-k, packed-code spill tier (same 200k x 800k)",
      "gate forced to 0: one (ids, flat codes) row per list, rows-only " +
        "stream-static join, in-place ann_adc_list_top_k scoring — the " +
        "float spill shape with the static payload 32x smaller", bcBytes = 0L)
    // the TWO-STAGE rerank at the same decade (r17 brief #6), both tiers:
    // r17 composed the packed-code spill shortlist past the broadcast
    // gate, so the spill row prices the previously-refused route
    def rerankStream(label: String, note: String, bcBytes: Long): Unit =
      tShuffle(label, note) {
        val qs = spark.readStream
          .schema(spark.read.parquet(feed10).schema).parquet(feed10)
        val hits = graft.streaming.Streams.streamingAnnRerankTopK(qs, adcIdx,
          c10, cents10, books10, k = 5, shortlist = 50, nprobe = 8,
          windowLen = "1 minute", watermark = "1 minute",
          maxBroadcastBytes = bcBytes)
        hits.writeStream.format("noop")
          .option("checkpointLocation",
            java.nio.file.Files.createTempDirectory("graft-rr10-cp").toString)
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start().awaitTermination()
      }
    rerankStream("sf10 streaming two-stage rerank, broadcast shortlist " +
      "(200k x 800k, m=8, shortlist=50)",
      "ADC shortlist over the RAM-resident flat-packed code map, ONE heap " +
        "per query across its probed cells (the FAISS refine contract the " +
        "batch twin already had); survivors equi-join their float vectors " +
        "BY ID, exact native-cosine rerank — the per-(query,cell) form " +
        "measured 244.1 s / 87.4M shuffle rows on this config, an nprobe x " +
        "self-inflicted stage-2 volume", bcBytes = 1L << 32)
    rerankStream("sf10 streaming two-stage rerank, packed-code spill shortlist " +
      "(same config)",
      "gate forced to 0: the r16 refusal replaced by the composed " +
        "packed-code spill shortlist (in-place ADC expression, " +
        "k=shortlist), per-query squeeze via stateless co-locate-by-q + " +
        "bounded-heap merge of the per-cell hit arrays — the unsqueezed " +
        "form measured 213.5 s / 89.0M shuffle rows on this config", bcBytes = 0L)
    graft.materialize.SessionCatalogWarehouse.dropAny(spark, "probe_adc_idx")
    // ---- streaming index MAINTENANCE at the decade (r18, VERDICT r17
    // #7): the O(batch) claim witnessed — a 10% ingest batch (80k new
    // vectors) streamed through streamingIndexAppend against the 800k
    // float artifact. Routing + append cost must scale with the BATCH
    // (80k route flatMap + 80k-row bucketed append), never the corpus;
    // the shuffle counter is the witness (corpus-sized maintenance would
    // move ~880k vector rows, the rebuild shape).
    val appDir10 = "/tmp/graft-scale-sf10-appfeed"
    spark.range(1000000, 1080000).selectExpr("id AS vec_id",
      "transform(sequence(0,63), j -> CAST(sin((id % 20000) * (j+1)) " +
        "+ 0.001*sin(id*(j+1)) AS FLOAT)) AS embedding")
      .coalesce(4).write.mode("overwrite").parquet(appDir10)
    graft.ops.Similarity.saveIndex(spark, c10, cents10, "probe_vec_idx")
    tShuffle("sf10 streaming index append (80k batch into the 800k float index)",
      "route ONLY the batch under the frozen stamped quantizer, " +
        "bucket-compatible append — O(batch) per trigger, never O(corpus)") {
      val qs = spark.readStream
        .schema(spark.read.parquet(appDir10).schema).parquet(appDir10)
      graft.streaming.Streams.streamingIndexAppend(qs, "probe_vec_idx",
        cents10, checkpoint = Some(java.nio.file.Files
          .createTempDirectory("graft-app10-cp").toString))
        .awaitTermination()
    }
    val grownIdx = spark.table("probe_vec_idx").count()
    assert(grownIdx == 880000L, s"maintained index must hold corpus+batch: $grownIdx")
    graft.materialize.SessionCatalogWarehouse.dropAny(spark, "probe_vec_idx")
    graft.core.Fs.deleteRecursively(java.nio.file.Paths.get(appDir10))
    graft.core.Fs.deleteRecursively(java.nio.file.Paths.get(embDir10))
    graft.core.Fs.deleteRecursively(java.nio.file.Paths.get(feed10))

    // ---- streaming hamming near-dup at the 500k-doc decade (r17 brief
    // #6): 450k synthetic 63-bit signatures indexed (planted near-dup
    // groups of 10, one flipped bit each), 50k stream in under the frozen
    // geometry — the corpus is never re-banded, state is (window x pair)
    val sigDir10 = "/tmp/graft-scale-sf10-sigfeed"
    val sigs10 = spark.range(500000).selectExpr("id AS doc_id",
      // 63-bit group base ^ one planted bit flip; the split bucket is an
      // ORTHOGONAL hash (group stride 50000 ≡ 0 mod 10 — a modular split
      // would never cross groups, the b397fde vacuous-oracle trap)
      "(xxhash64(CAST(id % 50000 AS STRING)) & 9223372036854775807L) ^ " +
        "shiftleft(CAST(1 AS BIGINT), CAST(pmod(xxhash64(CAST(id AS STRING)), 60) AS INT)) AS phash",
      "pmod(xxhash64(concat(CAST(id AS STRING), 'split')), 10) AS bkt")
    tShuffle("sf10 signature index build (450k sigs, 9 bands / 63 bits)",
      "band keys precomputed once at build, bucketBy(bk), geometry stamped") {
      graft.ops.Dedup.saveSignatureIndex(spark, sigs10.where(col("bkt") =!= 0),
        "probe_sig_idx", maxHamming = 8, bands = 9, sigBits = 63,
        idCol = "doc_id", sigCol = "phash")
    }
    sigs10.where(col("bkt") === 0)
      .select(col("doc_id"), col("phash"),
        (lit("2024-01-01 00:00:00").cast("timestamp") + make_dt_interval(
          lit(0), lit(0), lit(0), pmod(col("doc_id"), lit(7200)))).as("ts"))
      .coalesce(1).write.mode("overwrite").parquet(sigDir10)
    tShuffle("sf10 streaming hamming near-dup (50k stream x 450k indexed, 9 bands)",
      "stream rows band under the frozen stamped geometry, stream-static " +
        "join on precomputed band keys, exact bit_count verify, windowed " +
        "multi-band collapse — the indexed corpus is never re-banded") {
      val qs = spark.readStream
        .schema(spark.read.parquet(sigDir10).schema).parquet(sigDir10)
      val flagged = graft.streaming.Streams.streamingHammingNearDup(qs,
        graft.ops.Dedup.loadSignatureIndex(spark, "probe_sig_idx"),
        maxHamming = 8, bands = 9, sigBits = 63,
        idCol = "doc_id", sigCol = "phash",
        windowLen = "1 minute", watermark = "1 minute")
      flagged.writeStream.format("noop")
        .option("checkpointLocation",
          java.nio.file.Files.createTempDirectory("graft-hnd10-cp").toString)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start().awaitTermination()
    }
    // signature-family maintenance at the decade (r18, VERDICT r17 #7):
    // a 10% crawl batch (50k sigs) streamed through
    // streamingSignatureAppend under the artifact's frozen stamped
    // geometry — banding/append cost O(batch·bands), never a corpus
    // re-band (the shuffle counter would show ~4M re-banded rows)
    tShuffle("sf10 streaming signature index append (50k batch into 450k sigs)",
      "band ONLY the batch under the frozen geometry (9 bands), " +
        "bucket-compatible append — O(batch) per trigger") {
      val qs = spark.readStream
        .schema(spark.read.parquet(sigDir10).schema).parquet(sigDir10)
      graft.streaming.Streams.streamingSignatureAppend(qs, "probe_sig_idx",
        idCol = "doc_id", sigCol = "phash",
        checkpoint = Some(java.nio.file.Files
          .createTempDirectory("graft-sapp10-cp").toString))
        .awaitTermination()
    }
    val grownSig = spark.table("probe_sig_idx").select(col("id")).distinct().count()
    assert(grownSig == 500000L, s"maintained signature index must hold corpus+batch ids: $grownSig")
    graft.materialize.SessionCatalogWarehouse.dropAny(spark, "probe_sig_idx")
    graft.core.Fs.deleteRecursively(java.nio.file.Paths.get(sigDir10))
  }
}

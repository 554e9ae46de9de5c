package graft.exec

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.Trigger
import graft.materialize.Warehouse
import graft.model.Asset
import graft.streaming.Streams

/** DECLARATIVE RETRIEVAL SERVING — the streaming half of the `index:`
  * asset family. r16 made index BUILDS reachable from `.sql` assets
  * (`index: ivf|ivfpq|signature`, [[graft.materialize.Materializer]]);
  * this module makes the SERVING tiers reachable the same way, so a
  * pipeline author runs a retrieval stream without writing Scala — the
  * reference's `bruin run --stream` foreground precedent
  * (reference cmd/run.go:918-946) applied to retrieval instead of ingest.
  *
  * A serving asset is a table asset with a `serve:` parameter and a
  * streaming query feed (`source_uri` + `source_stream: true` — the same
  * routing rule the ingest path uses):
  *
  * {{{
  * parameters:
  *   serve: ann | ivfadc | rerank | hamming
  *   serve_index: vec_index            # the persisted index asset/table
  *   source_uri: file:///path/queries.parquet
  *   source_stream: "true"
  *   serve_k: "5"                      # ann/ivfadc/rerank
  *   serve_nprobe: "4"                 # ann/ivfadc/rerank
  *   serve_shortlist: "50"             # rerank stage-1 width
  *   serve_corpus: corpus_vecs         # rerank stage-2 float vectors
  *   serve_max_hamming: "3"            # hamming verify radius
  *   serve_window / serve_watermark    # event-time horizon (defaults 5m/10m)
  *   serve_id_col / serve_vec_col      # query feed columns (vec_id/embedding)
  *   serve_sig_col                     # hamming feed signature column
  *   flush_interval: "5 seconds"       # foreground trigger; absent = drain once
  *   serve_recall_min: "0.9"           # recall monitor threshold (vector tiers)
  *   serve_recall_sample: "50"         # queries re-scored exactly per run
  *   serve_recall_corpus: corpus_vecs  # float vectors for the exact side (ivfadc)
  * }}}
  *
  * Hits append to the asset's own table (the sink), through the stable
  * per-table checkpoint, so scheduled re-runs resume from committed
  * offsets. All quantizer/geometry STAMP CHECKS run before serving — the
  * tiers themselves verify pairing (a mismatched artifact fails fast, it
  * never silently loses recall), and the hamming geometry is read from
  * the artifact's own stamp rather than re-declared. The whole run
  * executes under the scoped bounded-heap raise
  * ([[graft.core.HeapAgg]]): every serving tier merges through a
  * k-bounded heap by construction. */
object Serving {

  /** Is this asset a retrieval-serving asset? */
  def isServing(asset: Asset): Boolean = asset.parameters.contains("serve")

  val Kinds = Set("ann", "ivfadc", "rerank", "hamming")

  /** Run the serving stream. `foreground = true` honors `flush_interval`
    * as a continuous trigger (blocks until stopped); otherwise — or with
    * no `flush_interval` — the feed drains once and the call returns
    * (the scheduled-run contract). `physicalName` maps logical table
    * names (index / corpus / sink) into the environment's namespace, the
    * same rename discipline the batch runner applies. */
  private val runSeq = new java.util.concurrent.atomic.AtomicLong(0)

  def run(wh: Warehouse, asset: Asset, foreground: Boolean = false,
          physicalName: String => String = identity): Unit = {
    // the whole serve — plan build and stream — runs on a RAISED CLONE
    // session (every serving tier merges through a k-bounded heap by
    // construction, and the clone keeps the shared session's object-agg
    // valve armed for every concurrently-scheduled asset; through r17
    // this was a set/restore on the shared conf, which two concurrent
    // assets could interleave into a permanent raise — ADVICE r17 #1)
    val spark = graft.core.HeapAgg.raisedClone(wh.spark)
    val p = asset.parameters
    val kind = p("serve")
    require(Kinds.contains(kind),
      s"${asset.name}: unknown serve '$kind' (supported: ${Kinds.toSeq.sorted.mkString(", ")})")
    def req(key: String): String = p.getOrElse(key,
      throw new IllegalArgumentException(
        s"${asset.name}: serve: $kind requires parameter '$key'"))
    val indexTable = physicalName(req("serve_index"))
    val k = p.get("serve_k").map(_.toInt).getOrElse(5)
    val nprobe = p.get("serve_nprobe").map(_.toInt).getOrElse(4)
    val windowLen = p.getOrElse("serve_window", "5 minutes")
    val watermark = p.getOrElse("serve_watermark", "10 minutes")
    val qidCol = p.getOrElse("serve_id_col",
      if (kind == "hamming") "doc_id" else "vec_id")
    val vecCol = p.getOrElse("serve_vec_col", "embedding")
    val maxBroadcast =
      p.get("serve_max_broadcast_bytes").map(_.toLong).getOrElse(256L << 20)

    // the query feed: same URI routing as ingest (file:// is the broker
    // stand-in; a kafka:// feed would resolve through the same registry)
    val resolved = graft.sources.Ingest.brokerResolved(asset).getOrElse(
      throw new IllegalArgumentException(
        s"${asset.name}: a serving asset needs a streaming query feed — " +
          "set source_uri (file:///path with source_stream: true, or a " +
          "broker scheme)"))
    require(!resolved.cdc,
      s"${asset.name}: a CDC feed cannot drive retrieval serving")
    val queries: DataFrame = resolved.source.load(spark, resolved.uri,
      Streams.sourceOptionsFor(p))

    // folds persisted during THIS serve's plan build register under its
    // own token, so stopping this stream releases exactly its folds —
    // a concurrent serve asset on the same session keeps its caches
    // (through r17 the only release was global: stopping one serve
    // degraded every other to a corpus re-fold per micro-batch)
    val cacheToken = s"serve:${asset.name}:${runSeq.incrementAndGet()}"
    val hits: DataFrame = graft.streaming.ServingCache.withOwner(cacheToken) { kind match {
      case "ann" =>
        // float IVF tier over the persisted inverted-list index; the
        // pairing stamp is verified inside streamingAnnTopK
        val centroids =
          graft.ops.Similarity.loadCentroids(spark, s"${indexTable}_centroids")
        val idx = graft.ops.Similarity.loadIndex(spark, indexTable)
        Streams.streamingAnnTopK(queries, idx, centroids, k, nprobe,
          qidCol, vecCol, cidCol = p.getOrElse("serve_index_id_col", "vec_id"),
          windowLen, watermark, prebuiltIndex = Some(idx),
          maxBroadcastBytes = maxBroadcast)
      case "ivfadc" =>
        val centroids =
          graft.ops.Similarity.loadCentroids(spark, s"${indexTable}_centroids")
        val books = graft.ops.Pq.loadCodebooks(spark, s"${indexTable}_codebooks")
        Streams.streamingAnnAdcTopK(queries,
          graft.ops.Pq.loadPqIndex(spark, indexTable), centroids, books,
          k, nprobe, qidCol, vecCol,
          cidCol = p.getOrElse("serve_index_id_col", "vec_id"),
          windowLen = windowLen, watermark = watermark,
          maxBroadcastBytes = maxBroadcast)
      case "rerank" =>
        val centroids =
          graft.ops.Similarity.loadCentroids(spark, s"${indexTable}_centroids")
        val books = graft.ops.Pq.loadCodebooks(spark, s"${indexTable}_codebooks")
        val corpus = spark.table(physicalName(req("serve_corpus")))
        Streams.streamingAnnRerankTopK(queries,
          graft.ops.Pq.loadPqIndex(spark, indexTable), corpus, centroids,
          books, k, shortlist = p.get("serve_shortlist").map(_.toInt).getOrElse(50),
          nprobe = nprobe, qidCol = qidCol, vecCol = vecCol,
          cidCol = p.getOrElse("serve_index_id_col", "vec_id"),
          windowLen = windowLen, watermark = watermark,
          maxBroadcastBytes = maxBroadcast)
      case "hamming" =>
        // geometry comes from the artifact's own stamp — never re-declared
        val idx = graft.ops.Dedup.loadSignatureIndex(spark, indexTable)
        val (bands, sigBits) =
          graft.ops.Dedup.signatureGeometry(idx, indexTable)
        Streams.streamingHammingNearDup(queries, idx,
          maxHamming = p.get("serve_max_hamming").map(_.toInt).getOrElse(3),
          bands = bands, sigBits = sigBits,
          idCol = qidCol, sigCol = p.getOrElse("serve_sig_col", "simhash"),
          windowLen = windowLen, watermark = watermark)
    } }

    val trigger =
      if (foreground) Streams.triggerFor(p) else Trigger.AvailableNow()
    wh.ensureSchema(asset.name)
    // pre-drain sink size: the recall monitor grades only what THIS drain
    // served; a no-new-data re-run must not re-grade an old window against
    // a possibly-rebuilt index
    val sinkRowsBefore: Long =
      if (p.contains("serve_recall_min") && wh.exists(asset.name))
        spark.table(asset.name).count()
      else 0L
    try
      Streams.runAppendToTable(spark, hits, asset.name,
        checkpoint = p.get("checkpoint_location"), trigger = trigger)
    finally
      // this invocation's stream is done (drain mode) or stopped — release
      // the persisted static folds IT pinned (and only those: a concurrent
      // serve asset's folds stay cached)
      graft.streaming.ServingCache.release(cacheToken)
    // the stream wrote through the CLONE — a parent session that cached
    // the sink's file listing before this drain would read STALE results
    // (the Warehouse cross-session-write refresh discipline applied to the
    // streaming toTable sink; both sessions refresh so the recall monitor
    // below and any later parent read see this drain's appends)
    wh.spark.catalog.refreshTable(asset.name)
    spark.catalog.refreshTable(asset.name)
    // the recall monitor runs AFTER the drain, against what this run
    // actually served — a blocking quality check in the reference's
    // checks-gate-downstream sense (pkg/scheduler/scheduler.go:680-715):
    // a degraded index (stale quantizers, too-lossy m, too-small nprobe)
    // fails the asset instead of silently losing recall in production
    if (p.contains("serve_recall_min"))
      recallMonitor(wh, spark, asset, kind, indexTable, k, qidCol, vecCol,
        physicalName, resolved.uri, sinkRowsBefore)
  }

  /** SERVING RECALL MONITOR — re-scores a bounded sample of the queries
    * this run served EXACTLY and gates on mean recall@k, the production
    * guardrail every nprobe/m/nlist knob is tuned by
    * ([[graft.ops.Similarity.recallAtK]] wired to the serving surface).
    *
    * Exact side per tier, matching each tier's own ranking metric:
    *   - `ann`: full-probe cosine over the SAME inverted-list index
    *     (`nprobe = nlist` provably covers the corpus — no extra config);
    *   - `rerank`: exact bipartite cosine over the stage-2 float corpus;
    *   - `ivfadc`: exact squared-L2 over `serve_recall_corpus` (falls back
    *     to `serve_corpus`) — the PQ index holds no float vectors, and the
    *     ADC tier ranks by dist2, so a cosine baseline would grade the
    *     wrong order on unnormalized vectors.
    *
    * Scale: the sample is bounded (`serve_recall_sample`, default 50, hard
    * cap [[graft.ops.Similarity.MaxRecallSample]]); the exact side is one
    * corpus/index pass scored through k-bounded heaps; both recall inputs
    * are Q·k-row frames. Monitor rows land in `<asset>_recall` (overwrite
    * per run — the freshest window's verdict) BEFORE the gate throws, so a
    * failing run leaves its evidence queryable. Only the latest served
    * window is graded — older windows were served by older index states —
    * and a drain that appended NOTHING skips the monitor entirely (grading
    * a previous run's window against the CURRENT index state would be
    * apples-to-oranges after an index rebuild). The ivfadc/rerank tiers
    * exclude the self-pair (b == query id) by contract, so their exact
    * baselines exclude it too — otherwise a corpus-member query feed caps
    * healthy recall at (k-1)/k and a perfect index trips the gate.
    * Needs a batch-readable (file://) feed to recover query vectors. */
  private def recallMonitor(wh: Warehouse,
                            spark: org.apache.spark.sql.SparkSession,
                            asset: Asset, kind: String, indexTable: String,
                            k: Int, qidCol: String, vecCol: String,
                            physicalName: String => String,
                            feedUri: java.net.URI,
                            sinkRowsBefore: Long): Unit = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.expressions.Window
    val p = asset.parameters
    require(kind != "hamming",
      s"${asset.name}: recall monitoring applies to the vector tiers, not hamming")
    val minRecall = p("serve_recall_min").trim.toDouble
    val sample = p.get("serve_recall_sample").map(_.trim.toInt).getOrElse(50)
    require(sample >= 1 && sample <= graft.ops.Similarity.MaxRecallSample,
      s"${asset.name}: serve_recall_sample must be in [1, ${graft.ops.Similarity.MaxRecallSample}]")
    require(feedUri.getScheme == "file",
      s"${asset.name}: the recall monitor re-reads the query feed in batch — file:// feeds only")
    val served = spark.table(asset.name)
    val sinkRows = served.count()
    if (sinkRows == 0) {
      println(s"[serve] ${asset.name}: recall monitor skipped — nothing served yet " +
        "(windows still open remain in state and emit on the next drain)")
      return
    }
    if (sinkRows == sinkRowsBefore) {
      println(s"[serve] ${asset.name}: recall monitor skipped — this drain served " +
        "nothing new (existing windows were emitted by earlier index states)")
      return
    }
    val latest = served.agg(max("window_start")).head().getTimestamp(0)
    val servedLatest = served.where(col("window_start") === lit(latest))
    val sampleIds = servedLatest.select(col("q")).distinct()
      .orderBy("q").limit(sample)
    // recover the sampled queries' vectors from the feed (batch re-read of
    // the parquet the file stand-in streams); one row per query id. Columns
    // normalize to the INDEX's (id, vector) names so every exact helper
    // sees one consistent pair regardless of serve_id_col/serve_vec_col.
    val cidCol = p.getOrElse("serve_index_id_col", "vec_id")
    val feedVecs = spark.read.parquet(feedUri.getPath)
      .where(col(vecCol).isNotNull)
      .select(col(qidCol).cast("long").as("vec_id"), col(vecCol).as("embedding"))
      .dropDuplicates("vec_id")
    val sampleVecs = feedVecs.join(
      sampleIds.withColumnRenamed("q", "vec_id"), Seq("vec_id"))
    def normCorpus(name: String) = spark.table(physicalName(name))
      .select(col(cidCol).cast("long").as("vec_id"), col(vecCol).as("embedding"))
    val exact: DataFrame = kind match {
      case "ann" =>
        // the float tier scores self-pairs (bipartite contract) — the
        // exact side keeps them too. Index columns normalize to the
        // helper's names (the artifact carries its build-time names).
        val centroids =
          graft.ops.Similarity.loadCentroids(spark, s"${indexTable}_centroids")
        val idx = graft.ops.Similarity.loadIndex(spark, indexTable)
          .select(col("list_id"), col(cidCol).cast("long").as("vec_id"),
            col(vecCol).as("embedding"))
        graft.ops.Similarity.knnJoinIvfIndexed(sampleVecs, idx, centroids,
          k = k, nprobe = centroids.length)
      case "rerank" =>
        // the tier self-excludes (b == query id never serves) — rank k+1
        // exactly, drop self-pairs, re-rank to k
        val raw = graft.ops.Similarity.knnJoin(sampleVecs,
          normCorpus(p("serve_corpus")), k = k + 1)
        raw.where(col("b") =!= col("q"))
          .withColumn("rank", row_number().over(
            Window.partitionBy("q").orderBy(col("cos").desc, col("b"))))
          .where(col("rank") <= k)
      case "ivfadc" =>
        val corpusName = p.get("serve_recall_corpus").orElse(p.get("serve_corpus"))
          .getOrElse(throw new IllegalArgumentException(
            s"${asset.name}: recall monitoring over ivfadc needs serve_recall_corpus " +
              "(the PQ index has no float vectors to re-score exactly)"))
        // the ADC tier self-excludes — so does the exact L2 baseline
        graft.ops.Similarity.bruteForceL2TopK(sampleVecs, normCorpus(corpusName),
          k = k, excludeSelf = true)
    }
    val approx = servedLatest
      .join(sampleIds, Seq("q"))
      .select(col("q"), col("b"), col("rank"))
    val recall = graft.ops.Similarity.recallAtK(approx, exact, k, qCol = "q")
      .withColumn("window_start", lit(latest))
      .select(col("window_start"), col("q"), col("hits"), col("n_exact"), col("recall"))
    // evidence first, gate second — a failing run leaves its verdict table
    val recallTable = s"${asset.name}_recall"
    recall.write.mode("overwrite").saveAsTable(recallTable)
    // the verdict write went through this (possibly cloned) session — keep
    // the parent's relation cache honest, same as the sink refresh above
    wh.spark.catalog.refreshTable(recallTable)
    val verdictAgg = spark.table(recallTable)
      .agg(avg(col("recall")), count(lit(1))).head()
    if (verdictAgg.isNullAt(0))
      throw new IllegalStateException(
        s"${asset.name}: recall monitor found no exact baseline rows — is the " +
          s"exact-side table empty, or are the feed's $qidCol ids disjoint " +
          "from what this drain served?")
    val mean = verdictAgg.getDouble(0)
    println(f"[serve] ${asset.name}: recall@$k over ${verdictAgg.getLong(1)} sampled " +
      f"queries = $mean%.4f (threshold $minRecall)")
    if (mean < minRecall)
      throw new IllegalStateException(
        f"${asset.name}: serving recall@$k $mean%.4f fell below " +
          f"serve_recall_min $minRecall — the index is too lossy for this " +
          "feed (raise serve_nprobe, rebuild with more lists/finer codes, " +
          s"or inspect $recallTable)")
  }
}

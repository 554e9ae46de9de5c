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
  def run(wh: Warehouse, asset: Asset, foreground: Boolean = false,
          physicalName: String => String = identity): Unit = {
    val spark = wh.spark
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

    val hits: DataFrame = kind match {
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
    }

    val trigger =
      if (foreground) Streams.triggerFor(p) else Trigger.AvailableNow()
    wh.ensureSchema(asset.name)
    // every serving tier merges through a k-bounded heap — scope the
    // object-agg raise around exactly this stream's lifetime
    graft.core.HeapAgg.withRaised(spark) {
      Streams.runAppendToTable(spark, hits, asset.name,
        checkpoint = p.get("checkpoint_location"), trigger = trigger)
    }
    // this invocation's stream is done (drain mode) or stopped — release
    // the persisted static folds it pinned
    graft.streaming.ServingCache.releaseAll()
  }
}

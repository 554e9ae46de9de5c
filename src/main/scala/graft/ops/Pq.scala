package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Product quantization (the faiss `PQm` scheme): split each d-dim vector
  * into `m` subvectors, learn a small k-means codebook PER SUBSPACE, and
  * store each vector as `m` one-byte centroid indices — d·4 bytes become
  * m bytes (e.g. 64-dim float → 8 bytes at m=8), the compression that makes
  * billion-vector ANN indexes fit in memory.
  *
  * Scale design mirrors [[Similarity.ivfCentroids]]: training runs Lloyd
  * iterations over a BOUNDED driver sample (standard PQ practice — the
  * codebook is tiny and converges from a sample; encoding stays fully
  * distributed), deterministic init (lowest ids, first distinct
  * subvectors), deterministic ties (lowest centroid index wins). Encoding
  * is a narrow typed map under one broadcast codebook — scan-speed over
  * any corpus, no shuffle. */
object Pq {

  /** codebooks(sub)(centroid) = subvector centroid. */
  def pqTrain(emb: DataFrame, m: Int = 8, k: Int = 16,
              idCol: String = "vec_id", vecCol: String = "embedding",
              iterations: Int = 5, maxTrainSample: Int = 10000): Array[Array[Array[Float]]] = {
    val spark = emb.sparkSession
    import spark.implicits._
    val sample = emb.select(col(idCol).cast("long"), col(vecCol))
      .as[(Long, Array[Float])]
      .orderBy(idCol).limit(maxTrainSample).collect().map(_._2)
    require(sample.nonEmpty, "cannot train PQ on an empty table")
    val d = sample.head.length
    require(d % m == 0, s"dims ($d) must divide evenly into m=$m subspaces")
    val dsub = d / m
    Array.tabulate(m) { sub =>
      val train = sample.map(v => java.util.Arrays.copyOfRange(v, sub * dsub, (sub + 1) * dsub))
      var centroids = train.map(_.toSeq).distinct.take(k).map(_.toArray)
      var iter = 0
      while (iter < iterations) {
        val sums = Array.fill(centroids.length)(new Array[Double](dsub))
        val counts = new Array[Long](centroids.length)
        train.foreach { v =>
          val c = nearestL2(v, centroids)
          counts(c) += 1
          var i = 0
          while (i < dsub) { sums(c)(i) += v(i); i += 1 }
        }
        centroids = centroids.indices.map { c =>
          if (counts(c) == 0) centroids(c)
          else sums(c).map(x => (x / counts(c)).toFloat)
        }.toArray
        iter += 1
      }
      centroids
    }
  }

  /** Persist trained PQ codebooks as a catalog table — one row per
    * (subspace, code) with its sub-centroid. The cross-JOB face of the
    * build-once artifact contract ([[graft.ops.Similarity.saveCentroids]]'s
    * PQ twin): encode today's corpus, save, and every later session encodes
    * queries against the SAME codebooks — retraining silently remaps code
    * ids, which corrupts every stored code. Parquet float arrays round-trip
    * bit-exactly (`emb_pq_index_roundtrip` oracle-pins ADC search under a
    * reloaded artifact). */
  def saveCodebooks(spark: org.apache.spark.sql.SparkSession,
                    books: Array[Array[Array[Float]]], table: String): Unit = {
    import spark.implicits._
    require(books.nonEmpty && books.forall(_.nonEmpty), "cannot save empty codebooks")
    books.zipWithIndex.flatMap { case (book, sub) =>
      book.zipWithIndex.map { case (c, code) => (sub, code, c.toSeq) }
    }.toSeq.toDF("sub_id", "code_id", "centroid")
      .coalesce(1) // m*k rows — one artifact file
      .write.mode(org.apache.spark.sql.SaveMode.Overwrite).saveAsTable(table)
  }

  /** Load a [[saveCodebooks]] artifact back into the m × k × dsub form
    * every PQ entry point takes. Driver collect is bounded by the artifact
    * size (m·k codebook rows, never corpus vectors). */
  def loadCodebooks(spark: org.apache.spark.sql.SparkSession,
                    table: String): Array[Array[Array[Float]]] = {
    import spark.implicits._
    val rows = spark.table(table)
      .select(col("sub_id").cast("int"), col("code_id").cast("int"), col("centroid"))
      .as[(Int, Int, Array[Float])].collect()
    require(rows.nonEmpty, s"$table holds no codebook rows")
    val bySub = rows.groupBy(_._1).toSeq.sortBy(_._1)
    // a torn/partial artifact (missing subspaces or code ids) would silently
    // renumber codes and corrupt every stored encoding — fail fast instead
    require(bySub.map(_._1) == bySub.indices,
      s"$table is not a contiguous 0..m-1 subspace artifact")
    bySub.map { case (_, g) =>
      val codes = g.sortBy(_._2)
      require(codes.map(_._2).toSeq == codes.indices,
        s"$table: subspace code ids are not contiguous 0..k-1")
      codes.map(_._3)
    }.toArray
  }

  /** Squared-L2 nearest centroid, lowest index on ties. */
  private def nearestL2(v: Array[Float], cs: Array[Array[Float]]): Int = {
    var best = 0
    var bestD = Double.MaxValue
    var c = 0
    while (c < cs.length) {
      var d2 = 0.0
      var i = 0
      val cc = cs(c)
      val n = math.min(v.length, cc.length)
      while (i < n) { val t = v(i).toDouble - cc(i); d2 += t * t; i += 1 }
      if (d2 < bestD) { bestD = d2; best = c }
      c += 1
    }
    best
  }

  /** Encode every vector to its m centroid indices + the reconstruction
    * squared error (how much signal the codes keep — the quality number a
    * PQ deployment monitors). Output: (id, codes: Array[Int], recon_err). */
  def pqEncode(emb: DataFrame, codebooks: Array[Array[Array[Float]]],
               idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val spark = emb.sparkSession
    import spark.implicits._
    val m = codebooks.length
    val bc = spark.sparkContext.broadcast(codebooks)
    emb.select(col(idCol).cast("long"), col(vecCol))
      .as[(Long, Array[Float])]
      .map { case (id, v) =>
        val books = bc.value
        val dsub = books(0)(0).length
        val codes = new Array[Int](m)
        var err = 0.0
        var sub = 0
        while (sub < m) {
          // ragged (shorter-than-trained) vectors: clamp BOTH bounds — an
          // out-of-range 'from' throws, unlike the silently-clamped 'to'
          val from = math.min(sub * dsub, v.length)
          val sv = java.util.Arrays.copyOfRange(v, from,
            math.max(from, math.min((sub + 1) * dsub, v.length)))
          val c = nearestL2(sv, books(sub))
          codes(sub) = c
          val cc = books(sub)(c)
          var i = 0
          while (i < sv.length) { val t = sv(i).toDouble - cc(i); err += t * t; i += 1 }
          sub += 1
        }
        (id, codes.toSeq, err)
      }
      .toDF(idCol, "codes", "recon_err2")
  }

  /** Query-to-centroid distance table: dt(sub)(c) = ||q_sub − centroid||²,
    * clamped for ragged (shorter-than-trained) query vectors. */
  private[graft] def distTable(qv: Array[Float], books: Array[Array[Array[Float]]]): Array[Array[Double]] = {
    val dsub = books(0)(0).length
    Array.tabulate(books.length) { sub =>
      val from = math.min(sub * dsub, qv.length)
      val sv = java.util.Arrays.copyOfRange(qv, from,
        math.max(from, math.min((sub + 1) * dsub, qv.length)))
      books(sub).map { cc =>
        var d2 = 0.0
        var i = 0
        val n = math.min(sv.length, cc.length)
        while (i < n) { val t = sv(i).toDouble - cc(i); d2 += t * t; i += 1 }
        d2
      }
    }
  }

  /** Stream corpus codes against one query's distance table, keeping the
    * (dist asc, id asc) top-k. One ordering instance per call — not inside
    * the O(corpus) loop. */
  private[graft] def adcTopK(qid: Long, dt: Array[Array[Double]], topK: Int,
                      codes: Iterator[(Long, Array[Int])]): Iterator[(Long, Long, Double)] = {
    val m = dt.length
    val ord = Ordering.Tuple2(Ordering[Double], Ordering[Long])
    val top = scala.collection.mutable.PriorityQueue.empty[(Double, Long)](ord)
    codes.foreach { case (bid, bcodes) =>
      if (bid != qid) {
        var dist = 0.0
        var sub = 0
        while (sub < m) { dist += dt(sub)(bcodes(sub)); sub += 1 }
        if (top.size < topK) top.enqueue((dist, bid))
        else if (ord.lt((dist, bid), top.head)) {
          top.dequeue(); top.enqueue((dist, bid))
        }
      }
    }
    val ordered: Seq[(Double, Long)] = top.dequeueAll
    ordered.reverseIterator.map { case (dist, bid) => (qid, bid, dist) }
  }

  /** ADC (asymmetric distance computation) top-k: exact queries scored
    * against PQ-compressed corpus codes. Each task builds the m×k
    * query-to-centroid distance table once per query, then every corpus
    * vector costs m table lookups instead of d multiplications — the PQ
    * search payoff. Ranking is deterministic ((dist asc, id asc)).
    *
    * Two physical layouts behind one result:
    *  - code table ≤ `maxBroadcastCodes`: BROADCAST (codes are m ints/
    *    vector — the point of PQ; 4M × 8 × 4B ≈ 128 MB of primitive
    *    arrays). The probe collect is itself bounded by `limit(cap + 1)`,
    *    so an over-cap corpus can no longer OOM the driver before the size
    *    check fires.
    *  - past the cap: BLOCKED GRID (the [[Similarity.cosineTopK]] layout)
    *    — the code table shards by id, queries replicate per shard, each
    *    cell keeps a per-shard (dist, id) top-k heap, and one per-query
    *    window merges the ≤ k·S candidates to the global top-k. Identical
    *    output (per-cell selection uses the same total order); a corpus
    *    past the broadcast cliff DEGRADES to the shuffle plan instead of
    *    throwing. */
  def pqTopK(emb: DataFrame, codebooks: Array[Array[Array[Float]]], topK: Int = 5,
             idCol: String = "vec_id", vecCol: String = "embedding",
             maxBroadcastCodes: Long = 4000000L,
             shardCodes: Int = 1 << 20): DataFrame = {
    val spark = emb.sparkSession
    import spark.implicits._
    require(topK > 0 && maxBroadcastCodes > 0 && shardCodes > 0)
    val cap = math.min(maxBroadcastCodes, (Int.MaxValue - 8).toLong).toInt
    val encoded = pqEncode(emb, codebooks, idCol, vecCol)
      .select(col(idCol), col("codes").cast("array<int>"))
      .as[(Long, Array[Int])]
    // bounded probe: at most cap+1 PRIMITIVE-array rows reach the driver
    val probe = encoded.limit(cap + 1).collect()
    val queries = emb.select(col(idCol).cast("long"), col(vecCol))
      .as[(Long, Array[Float])]
    val bcBooks = spark.sparkContext.broadcast(codebooks)
    if (probe.length <= cap) {
      // broadcast path: per-query candidates are already the global top-k
      // in (dist, id) order — rank inline, zero shuffles
      val bcCodes = spark.sparkContext.broadcast(probe)
      queries.flatMap { case (qid, qv) =>
        adcTopK(qid, distTable(qv, bcBooks.value), topK, bcCodes.value.iterator)
          .zipWithIndex.map { case ((a, b, d), i) => (a, b, d, i + 1) }
      }.toDF("a", "b", "adc_dist2", "rank")
    } else {
        // blocked grid: shard s = id mod S meets query group g = id mod G
        // in cell g·S + s — every (query, code) pair exactly once
        // size shards from the INPUT row count (parquet metadata-fast),
        // not encoded.count() — counting `encoded` would replay the whole
        // distributed encode just to size the grid
        val sShards = ((probe.length.toLong.max(emb.count()) + shardCodes - 1)
          / shardCodes).toInt
        val par = spark.sparkContext.defaultParallelism
        val qGroups = math.max(1, math.ceil(2.0 * par / sShards).toInt)
        val codeSide = encoded.flatMap { case (id, cs) =>
          val s = math.floorMod(id, sShards.toLong).toInt
          Iterator.range(0, qGroups).map(g => (g * sShards + s, 0, id, cs, null: Array[Float]))
        }
        val querySide = queries.flatMap { case (id, v) =>
          val g = math.floorMod(id, qGroups.toLong).toInt
          Iterator.range(0, sShards).map(sh => (g * sShards + sh, 1, id, null: Array[Int], v))
        }
        val perShard = codeSide.union(querySide)
          .groupByKey(_._1)
          .flatMapSortedGroups(col("_2")) { (_, it) =>
            // tag-sorted: the shard's code rows lead, query rows stream —
            // per-task memory is one shard's codes, never the corpus
            val buf = it.buffered
            val shard = scala.collection.mutable.ArrayBuffer.empty[(Long, Array[Int])]
            while (buf.hasNext && buf.head._2 == 0) {
              val r = buf.next()
              shard += ((r._3, r._4))
            }
            val arr = shard.toArray
            buf.flatMap { r =>
              adcTopK(r._3, distTable(r._5, bcBooks.value), topK, arr.iterator)
            }
          }
        import org.apache.spark.sql.expressions.Window
        // merge the ≤ k·S per-shard candidates per query to the global
        // top-k — identical to the single-scan ranking because per-cell
        // selection used the same (dist asc, id asc) total order
        perShard.toDF("a", "b", "adc_dist2")
          .withColumn("rank", row_number().over(
            Window.partitionBy("a").orderBy(col("adc_dist2").asc, col("b").asc)))
          .where(col("rank") <= topK)
          .select(col("a"), col("b"), col("adc_dist2"), col("rank").cast("int").as("rank"))
      }
  }

  /** v − centroid, zero-padded past the centroid's length (ragged-safe). */
  private[graft] def residualOf(v: Array[Float], c: Array[Float]): Array[Float] = {
    val out = new Array[Float](v.length)
    var i = 0
    while (i < v.length) {
      out(i) = v(i) - (if (i < c.length) c(i) else 0f); i += 1
    }
    out
  }

  /** PQ-encode one residual against the codebooks (ragged-clamped). */
  private def encodeRes(res: Array[Float], bks: Array[Array[Array[Float]]]): Array[Int] = {
    val dsub = bks(0)(0).length
    Array.tabulate(bks.length) { sub =>
      val from = math.min(sub * dsub, res.length)
      nearestL2(java.util.Arrays.copyOfRange(res, from,
        math.max(from, math.min((sub + 1) * dsub, res.length))), bks(sub))
    }
  }

  /** IVF-PQ approximate top-k — the composed billion-vector index shape
    * (faiss `IVFnlist,PQm` / IVFADC): the coarse quantizer
    * ([[Similarity.ivfCentroids]]) routes every vector to ONE inverted
    * list; PQ encodes each vector's RESIDUAL (v − its cell centroid), so
    * the codebooks spend their resolution on within-cell structure instead
    * of re-describing cell position; a query probes its `nprobe` nearest
    * lists and ADC-ranks only those lists' codes against a per-cell
    * residual distance table. Distances ARE globally comparable across
    * probed cells: ‖q − (centroid_c + recon)‖² = ‖q_res_c − recon‖².
    *
    * Per-query compute drops to ~(nprobe/nlist) of the corpus over m-BYTE
    * codes — the multiplicative combination of IVF's pruning and PQ's
    * compression. Shape: both quantizers train on bounded samples and
    * broadcast; list build and search are one cogroup on the cell key
    * (per-task memory = one inverted list of codes); one window merges the
    * ≤ k·nprobe per-cell winners. `prebuiltCentroids`/`prebuiltBooks`
    * accept the build-once artifacts for retrain-free per-batch search. */
  def ivfPqTopK(emb: DataFrame, topK: Int = 5, nlist: Int = 16, nprobe: Int = 4,
                m: Int = 8, k: Int = 16,
                idCol: String = "vec_id", vecCol: String = "embedding",
                iterations: Int = 5, maxTrainSample: Int = 10000,
                prebuiltCentroids: Option[Array[Array[Float]]] = None,
                prebuiltBooks: Option[Array[Array[Array[Float]]]] = None): DataFrame = {
    val spark = emb.sparkSession
    import spark.implicits._
    require(nprobe >= 1 && nprobe <= nlist, s"nprobe must be in [1, nlist]: $nprobe")
    val centroids = prebuiltCentroids.getOrElse(
      Similarity.ivfCentroids(emb, nlist, idCol, vecCol, iterations, maxTrainSample))
    val bcC = spark.sparkContext.broadcast(centroids)
    val base = emb.select(col(idCol).cast("long"), col(vecCol))
      .as[(Long, Array[Float])]
    val books = prebuiltBooks.getOrElse {
      // PQ trains on RESIDUALS — a bounded deterministic sample of them,
      // exactly pqTrain's contract, fed through a residualized frame
      val resDF = base.map { case (id, v) =>
        (id, residualOf(v, bcC.value(Similarity.nearestCentroid(v, bcC.value))))
      }.toDF(idCol, vecCol)
      pqTrain(resDF, m, k, idCol, vecCol, iterations, maxTrainSample)
    }
    val bcB = spark.sparkContext.broadcast(books)
    val members = base.map { case (id, v) =>
      val cell = Similarity.nearestCentroid(v, bcC.value)
      (cell, id, encodeRes(residualOf(v, bcC.value(cell)), bcB.value))
    }
    val queries = base.flatMap { case (id, v) =>
      Similarity.nearestCentroids(v, bcC.value, nprobe).iterator.map(c => (c, id, v))
    }
    members.groupByKey(_._1).cogroup(queries.groupByKey(_._1)) { (cell, mIt, qIt) =>
      val list = mIt.map { case (_, id, codes) => (id, codes) }.toArray
      qIt.flatMap { case (_, qid, qv) =>
        adcTopK(qid, distTable(residualOf(qv, bcC.value(cell)), bcB.value), topK, list.iterator)
      }
    }.toDF("a", "b", "adc_dist2")
      .withColumn("rank", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy("a").orderBy(col("adc_dist2").asc, col("b").asc)))
      .where(col("rank") <= topK)
      .select(col("a"), col("b"), col("adc_dist2"), col("rank").cast("int").as("rank"))
  }

  /** IVF-PQ-ROUTED BIPARTITE KNN JOIN — the 100 TB RAG retrieval join over
    * m-BYTE codes: [[graft.ops.Similarity.knnJoinIvf]] prunes compute to
    * ~(nprobe/nlist)·C cosines but still moves and scores FULL float
    * vectors inside each probed list (d·4 bytes of memory traffic per
    * candidate); this composes the coarse router with [[pqTrain]]'s
    * residual codebooks so each corpus candidate costs m table lookups over
    * m bytes (~d·4/m× less traffic — the faiss IVFADC shape, bipartite).
    * Both quantizers train on the CORPUS (bounded samples, deterministic) —
    * queries are routed and residualized under the corpus's geometry, never
    * trained on. Per-task memory is one inverted list of CODES (m bytes per
    * vector — another d·4/m× over the float-vector lists); the per-list
    * (dist asc, id asc) winners merge through one bounded ≤ topK·nprobe
    * window. Distances are globally comparable across probed cells
    * (‖q−(centroid_c+recon)‖² = ‖q_res_c−recon‖²), ranking is
    * deterministic, NULL vectors are excluded on both sides.
    *
    * Exactness reduction: a single ZERO coarse centroid (residual ≡ the
    * vector, bit-for-bit) + the m=1 identity codebook (full-coverage
    * sample, zero Lloyd iterations ⇒ reconstruction is exact) makes ADC
    * distances exact squared-L2 and nprobe=1 exhaustive — the whole routed
    * path must then reproduce the brute-force bipartite L2 rank, which is
    * how `ann_knn_join_ivfpq_exact` oracle-pins it. The production
    * nlist/nprobe/m config is the same code path, recall-gated in
    * DataOpsSpec and benched as `ann_knn_join_ivfpq`.
    * `prebuiltCentroids`/`prebuiltBooks` take the [[saveCodebooks]]/
    * [[Similarity.saveCentroids]] artifacts for retrain-free query batches. */
  def knnJoinIvfPq(queries: DataFrame, corpus: DataFrame, topK: Int = 5,
                   nlist: Int = 16, nprobe: Int = 4, m: Int = 8, k: Int = 16,
                   idCol: String = "vec_id", vecCol: String = "embedding",
                   iterations: Int = 5, maxTrainSample: Int = 10000,
                   prebuiltCentroids: Option[Array[Array[Float]]] = None,
                   prebuiltBooks: Option[Array[Array[Array[Float]]]] = None): DataFrame = {
    val spark = queries.sparkSession
    import spark.implicits._
    require(topK >= 1, s"topK must be >= 1: $topK")
    require(nprobe >= 1, s"nprobe must be >= 1: $nprobe")
    val corp = corpus.where(col(vecCol).isNotNull)
      .select(col(idCol).cast("long"), col(vecCol)).as[(Long, Array[Float])]
    val centroids = prebuiltCentroids.getOrElse(
      Similarity.ivfCentroids(corpus.where(col(vecCol).isNotNull), nlist,
        idCol, vecCol, iterations, maxTrainSample))
    val np = math.min(nprobe, centroids.length) // clamp to the RESOLVED artifact
    val bcC = spark.sparkContext.broadcast(centroids)
    val books = prebuiltBooks.getOrElse(
      residualCodebooks(corpus, centroids, m, k, idCol, vecCol,
        iterations, maxTrainSample))
    val bcB = spark.sparkContext.broadcast(books)
    // corpus: ONE inverted list per vector, holding only its m-byte codes
    val members = corp.map { case (id, v) =>
      val cell = Similarity.nearestCentroid(v, bcC.value)
      (cell, id, encodeRes(residualOf(v, bcC.value(cell)), bcB.value))
    }
    // queries: replicated to their nprobe nearest lists only — the float
    // vector rides with the probe (one distance table per (query, cell))
    val probes = queries.where(col(vecCol).isNotNull)
      .select(col(idCol).cast("long"), col(vecCol)).as[(Long, Array[Float])]
      .flatMap { case (id, v) =>
        Similarity.nearestCentroids(v, bcC.value, np).iterator.map(c => (c, id, v))
      }
    members.groupByKey(_._1).cogroup(probes.groupByKey(_._1)) { (cell, mIt, qIt) =>
      val list = mIt.map { case (_, id, codes) => (id, codes) }.toArray
      qIt.flatMap { case (_, qid, qv) =>
        adcTopK(qid, distTable(residualOf(qv, bcC.value(cell)), bcB.value),
          topK, list.iterator)
      }
    }.toDF("q", "b", "adc_dist2")
      .withColumn("rank", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy("q").orderBy(col("adc_dist2").asc, col("b").asc)))
      .where(col("rank") <= topK)
      .select(col("q"), col("b"), col("adc_dist2"), col("rank").cast("int").as("rank"))
  }

  /** Train PQ codebooks on the RESIDUALS of a corpus under a frozen coarse
    * quantizer — the codebook tier of an IVFADC build (IVF-PQ stores
    * `v − centroid(v)`, whose energy is a fraction of the raw vector's, so
    * the same code budget buys more precision). The residual map is a
    * narrow distributed pass; training itself samples `maxTrainSample`
    * rows onto the driver ([[pqTrain]]'s bounded-sample contract). Pair
    * the result with the SAME centroids in [[savePqIndex]] /
    * [[knnJoinIvfPq]] — the pairing stamp enforces it at search time. */
  def residualCodebooks(corpus: DataFrame, centroids: Array[Array[Float]],
                        m: Int = 8, k: Int = 16,
                        idCol: String = "vec_id", vecCol: String = "embedding",
                        iterations: Int = 5,
                        maxTrainSample: Int = 10000): Array[Array[Array[Float]]] = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val bcC = spark.sparkContext.broadcast(centroids)
    val resDF = corpus.where(col(vecCol).isNotNull)
      .select(col(idCol).cast("long"), col(vecCol)).as[(Long, Array[Float])]
      .map { case (id, v) =>
        (id, residualOf(v, bcC.value(Similarity.nearestCentroid(v, bcC.value))))
      }.toDF(idCol, vecCol)
    pqTrain(resDF, m, k, idCol, vecCol, iterations, maxTrainSample)
  }

  /** Persist the PQ-CODED inverted lists — (list_id, id, codes) with the
    * corpus routed AND residual-encoded — as a catalog table bucketed by
    * list_id: the full IVFADC index artifact.
    * [[graft.ops.Similarity.saveIndex]] removed the per-batch assignment
    * pass for float lists; [[knnJoinIvfPq]] still re-encoded the whole
    * corpus per invocation, which at 100 TB costs a corpus scan × m
    * sub-quantizer searches every query batch. This pays assignment AND
    * encoding once; a query batch then reads m-byte codes (d·4/m× smaller
    * than the float index on disk too). Atomic generation-swap write; NULL
    * vectors excluded. Requires the SAME centroids/books artifacts at
    * search time — persist them with [[Similarity.saveCentroids]] /
    * [[saveCodebooks]] (a retrain would remap code ids and corrupt every
    * stored code — their fail-fast note). */
  def savePqIndex(spark: org.apache.spark.sql.SparkSession, corpus: DataFrame,
                  centroids: Array[Array[Float]], books: Array[Array[Array[Float]]],
                  table: String, idCol: String = "vec_id",
                  vecCol: String = "embedding", buckets: Int = 8): Unit = {
    import spark.implicits._
    require(centroids.nonEmpty && books.nonEmpty, "empty quantizer artifacts")
    require(buckets >= 1, s"buckets must be >= 1: $buckets")
    val bcC = spark.sparkContext.broadcast(centroids)
    val bcB = spark.sparkContext.broadcast(books)
    // pairing stamp covers BOTH quantizer tiers: centroids route, books
    // code — a retrain of either silently corrupts stored codes
    val stamp = Similarity.quantizerMd5(centroids, books)
    val lists = corpus.where(col(vecCol).isNotNull)
      .select(col(idCol).cast("long"), col(vecCol)).as[(Long, Array[Float])]
      .map { case (id, v) =>
        val cell = Similarity.nearestCentroid(v, bcC.value)
        (cell, id, encodeRes(residualOf(v, bcC.value(cell)), bcB.value).toSeq)
      }
      .toDF("list_id", idCol, "codes")
      .withColumn("__quantizer_md5", lit(stamp))
    new graft.materialize.SessionCatalogWarehouse(spark).createOrReplace(
      table, lists, partitionBy = Nil, clusterBy = Nil,
      bucketBy = Seq("list_id"), buckets = buckets)
  }

  /** INCREMENTAL maintenance for the IVFADC artifact —
    * [[graft.ops.Similarity.appendToIndex]]'s move applied to the CODE
    * index: route AND residual-encode only a new corpus batch under BOTH
    * frozen quantizer tiers (centroids route, books code) and append its
    * (list_id, id, codes) rows to the existing [[savePqIndex]] table. The
    * float index gained this in r15; without it a nightly ingest batch
    * forced a full re-encode+rebuild — assignment plus m sub-quantizer
    * searches over the ENTIRE corpus for a corpus-fraction of new rows.
    * This pays O(batch), never O(corpus), per ingest.
    *
    * Both a vector's list AND its codes depend only on the frozen
    * (centroids, books) pair, so an appended index is row-identical to a
    * full rebuild over the combined corpus —
    * `ann_knn_join_ivfpq_index_append` oracle-pins exactly that (ADC
    * search over 90%-built + 10%-appended ≡ brute-force bipartite L2
    * under the degenerate quantizers). The dual-tier pairing stamp is
    * verified BEFORE writing: appending rows encoded under a retrained
    * quantizer would silently corrupt every stored code (the
    * [[Similarity.quantizerMd5]] fail-fast). Bucket count follows the
    * EXISTING table's catalog metadata, `buckets` only the metadata-less
    * fallback (the ADVICE r15 appendToIndex rule). */
  def appendToPqIndex(spark: org.apache.spark.sql.SparkSession, newBatch: DataFrame,
                      centroids: Array[Array[Float]], books: Array[Array[Array[Float]]],
                      table: String, idCol: String = "vec_id",
                      vecCol: String = "embedding", buckets: Int = 8): Unit = {
    import spark.implicits._
    require(centroids.nonEmpty && books.nonEmpty, "empty quantizer artifacts")
    val existing = spark.table(table)
    Similarity.requireQuantizerMatch(existing, centroids, books,
      s"PQ-code index $table")
    val nBuckets = graft.materialize.SessionCatalogWarehouse
      .backingTable(spark, table).flatMap(t =>
        org.apache.spark.sql.graft.SqlBridge.bucketCount(spark, t))
      .getOrElse(buckets)
    val bcC = spark.sparkContext.broadcast(centroids)
    val bcB = spark.sparkContext.broadcast(books)
    val stamp = Similarity.quantizerMd5(centroids, books)
    val lists0 = newBatch.where(col(vecCol).isNotNull)
      .select(col(idCol).cast("long"), col(vecCol)).as[(Long, Array[Float])]
      .map { case (id, v) =>
        val cell = Similarity.nearestCentroid(v, bcC.value)
        (cell, id, encodeRes(residualOf(v, bcC.value(cell)), bcB.value).toSeq)
      }
      .toDF("list_id", idCol, "codes")
    // a pre-stamp artifact has no fingerprint column — append schema-compatibly
    val lists =
      if (existing.columns.contains("__quantizer_md5"))
        lists0.withColumn("__quantizer_md5", lit(stamp))
      else lists0
    new graft.materialize.SessionCatalogWarehouse(spark).append(
      table, lists, partitionBy = Nil, clusterBy = Nil,
      bucketBy = Seq("list_id"), buckets = nBuckets)
  }

  /** Load a [[savePqIndex]] artifact. Fail-fast on a frame without the
    * routing/code columns. */
  def loadPqIndex(spark: org.apache.spark.sql.SparkSession, table: String): DataFrame = {
    val df = spark.table(table)
    require(df.columns.contains("list_id") && df.columns.contains("codes"),
      s"$table is not a PQ-coded index artifact (need list_id + codes): " +
        df.columns.mkString(", "))
    df
  }

  /** [[knnJoinIvfPq]] OVER A PERSISTED CODE INDEX — zero per-batch corpus
    * work: the (list_id, id, codes) assignment reads from the
    * [[savePqIndex]] artifact, so a query batch pays only its own routing,
    * the per-(query, cell) residual distance tables, and m lookups per
    * candidate code. Ranking, determinism, and NULL conventions are
    * [[knnJoinIvfPq]]'s; `nprobe` clamps to the resolved quantizer. The
    * degenerate config (zero coarse centroid + m=1 identity codebook)
    * again reduces ADC to exact squared-L2, which is how
    * `ann_knn_join_ivfpq_indexed` oracle-pins the save → load → route →
    * ADC path end to end (codes round-trip parquet bit-exactly). */
  def knnJoinIvfPqIndexed(queries: DataFrame, index: DataFrame,
                          centroids: Array[Array[Float]],
                          books: Array[Array[Array[Float]]],
                          topK: Int = 5, nprobe: Int = 4,
                          idCol: String = "vec_id",
                          vecCol: String = "embedding"): DataFrame = {
    val spark = queries.sparkSession
    import spark.implicits._
    require(topK >= 1, s"topK must be >= 1: $topK")
    require(nprobe >= 1, s"nprobe must be >= 1: $nprobe")
    // both quantizer tiers must be the ones that built the codes
    Similarity.requireQuantizerMatch(index, centroids, books,
      "the PQ-code index")
    val np = math.min(nprobe, centroids.length)
    val bcC = spark.sparkContext.broadcast(centroids)
    val bcB = spark.sparkContext.broadcast(books)
    val members = index
      .select(col("list_id").cast("int"), col(idCol).cast("long"),
        col("codes").cast("array<int>"))
      .as[(Int, Long, Array[Int])]
    val probes = queries.where(col(vecCol).isNotNull)
      .select(col(idCol).cast("long"), col(vecCol)).as[(Long, Array[Float])]
      .flatMap { case (id, v) =>
        Similarity.nearestCentroids(v, bcC.value, np).iterator.map(c => (c, id, v))
      }
    members.groupByKey(_._1).cogroup(probes.groupByKey(_._1)) { (cell, mIt, qIt) =>
      val list = mIt.map { case (_, id, codes) => (id, codes) }.toArray
      qIt.flatMap { case (_, qid, qv) =>
        adcTopK(qid, distTable(residualOf(qv, bcC.value(cell)), bcB.value),
          topK, list.iterator)
      }
    }.toDF("q", "b", "adc_dist2")
      .withColumn("rank", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy("q").orderBy(col("adc_dist2").asc, col("b").asc)))
      .where(col("rank") <= topK)
      .select(col("q"), col("b"), col("adc_dist2"), col("rank").cast("int").as("rank"))
  }

  /** TWO-STAGE RETRIEVAL JOIN — ADC shortlist, exact rerank: the production
    * billion-vector serving shape (FAISS's search-then-refine). Stage 1
    * runs [[knnJoinIvfPq]] for a `shortlist`-sized candidate set per query
    * over m-byte codes (~nprobe/nlist of the corpus, d·4/m× less memory
    * traffic); stage 2 joins ONLY the Q·shortlist survivors back to their
    * float vectors and re-scores exact cosine with the native codegen
    * kernel, ranking (rounded cos desc, id asc) — [[Similarity.knnJoin]]'s
    * exact order. Compression error affects RECALL (what enters the
    * shortlist), never the reported similarity — the same discipline as
    * the dedup family's capped-candidates/exact-verify split.
    *
    * Scale: stage 2 moves Q·shortlist rows through two hash joins and a
    * bounded-heap top-k (≤ k rows per query per partial) — at no point do
    * corpus-sized float vectors replicate per query. A shortlist covering
    * the whole corpus (with the degenerate quantizers) makes stage 1
    * provably lossless, so the composed route must equal the exact
    * [[Similarity.knnJoin]] — the `ann_knn_join_ivfpq_rerank_exact` pin;
    * the production config is recall-gated and benched. */
  def knnJoinIvfPqRerank(queries: DataFrame, corpus: DataFrame, topK: Int = 5,
                         shortlist: Int = 50, nlist: Int = 16, nprobe: Int = 4,
                         m: Int = 8, k: Int = 16,
                         idCol: String = "vec_id", vecCol: String = "embedding",
                         iterations: Int = 5, maxTrainSample: Int = 10000,
                         prebuiltCentroids: Option[Array[Array[Float]]] = None,
                         prebuiltBooks: Option[Array[Array[Array[Float]]]] = None): DataFrame = {
    require(shortlist >= topK, s"shortlist ($shortlist) must cover topK ($topK)")
    val sl = knnJoinIvfPq(queries, corpus, topK = shortlist, nlist, nprobe,
      m, k, idCol, vecCol, iterations, maxTrainSample,
      prebuiltCentroids, prebuiltBooks)
      .select(col("q"), col("b"))
    val qv = queries.where(col(vecCol).isNotNull)
      .select(col(idCol).cast("long").as("q"), col(vecCol).as("__qv"))
    val cv = corpus.where(col(vecCol).isNotNull)
      .select(col(idCol).cast("long").as("b"), col(vecCol).as("__bv"))
    import org.apache.spark.sql.graft.SqlBridge
    val cosNative = SqlBridge.column(graft.functions.CosineSim(
      SqlBridge.expression(col("__qv")), SqlBridge.expression(col("__bv"))))
    val scored = sl.join(qv, Seq("q")).join(cv, Seq("b"))
      .select(col("q"), col("b"), round(cosNative, 6).as("cos"))
    val keyed = struct((-col("cos")).as("__s0"), col("b").as("__s1"),
      struct(col("b"), col("cos")).as("__p"))
    val topk = SqlBridge.column(graft.functions.BoundedTopK(
      SqlBridge.expression(keyed), topK, sortFields = 2).toAggregateExpression())
    scored.groupBy(col("q")).agg(topk.as("__top"))
      .select(col("q"), posexplode(col("__top")).as(Seq("__i", "__row")))
      .select(col("q"), col("__row.__p.b").as("b"), col("__row.__p.cos").as("cos"),
        (col("__i") + 1).cast("int").as("rank"))
  }
}

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

  /** ADC (asymmetric distance computation) top-k: exact queries scored
    * against PQ-compressed corpus codes. Each task builds the m×k
    * query-to-centroid distance table once per query, then every corpus
    * vector costs m table lookups instead of d multiplications — the PQ
    * search payoff. Corpus codes broadcast (they are m bytes/vector — the
    * point of PQ); ranking is deterministic ((dist asc, id asc)). */
  def pqTopK(emb: DataFrame, codebooks: Array[Array[Array[Float]]], topK: Int = 5,
             idCol: String = "vec_id", vecCol: String = "embedding",
             maxBroadcastCodes: Long = 4000000L): DataFrame = {
    val spark = emb.sparkSession
    import spark.implicits._
    val m = codebooks.length
    // BOUNDED driver traffic: codes are m ints/vector, and the cap keeps the
    // broadcast build under control (4M × 8 × 4B ≈ 128 MB). Past the cap,
    // shard the code table through the blocked grid (Similarity.cosineTopK's
    // layout) instead of raising it.
    // one encode job: collect, then enforce the cap on the collected length
    // (a separate count() would run the whole distributed encode twice)
    val codes = pqEncode(emb, codebooks, idCol, vecCol)
      .select(col(idCol), col("codes"))
      .as[(Long, Seq[Int])].collect()
    require(codes.length <= maxBroadcastCodes,
      s"pqTopK broadcasts the code table (${codes.length} rows > cap " +
        s"$maxBroadcastCodes); shard the corpus (blocked grid) for larger indexes")
    val bcCodes = spark.sparkContext.broadcast(codes)
    val bcBooks = spark.sparkContext.broadcast(codebooks)
    emb.select(col(idCol).cast("long"), col(vecCol))
      .as[(Long, Array[Float])]
      .flatMap { case (qid, qv) =>
        val books = bcBooks.value
        val dsub = books(0)(0).length
        // distance table: dt(sub)(c) = ||q_sub - centroid||²
        val dt = Array.tabulate(m) { sub =>
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
        val all = bcCodes.value
        // bounded selection: (dist asc, id asc); one ordering instance for
        // the whole scan — not inside the O(corpus) loop
        val ord = Ordering.Tuple2(Ordering[Double], Ordering[Long])
        val top = scala.collection.mutable.PriorityQueue.empty[(Double, Long)](ord)
        all.foreach { case (bid, bcodes) =>
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
        ordered.reverse.iterator.zipWithIndex.map { case ((dist, bid), i) =>
          (qid, bid, dist, i + 1)
        }
      }
      .toDF("a", "b", "adc_dist2", "rank")
  }
}

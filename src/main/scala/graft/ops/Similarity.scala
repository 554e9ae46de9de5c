package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (Array[Float]).
  *
  * Scale design — no driver-side index. Exact search runs as a *blocked*
  * self-join: the index is hash-sharded into S shards sized to task memory,
  * queries are hash-grouped into Q groups, and every (group, shard) cell is
  * one cogroup task that scores its queries against its in-memory shard with
  * primitive-array loops. Per-task memory is bounded by the shard size
  * (`shardBytes`), compute parallelism by Q×S, and nothing ever collects to
  * the driver — the same plan that runs at sf0.001 runs against a 100 TB
  * corpus by raising S. Per-shard top-k results merge to the global exact
  * top-k with one row_number window (k·S candidate rows per query).
  *
  * The approximate path ([[lshTopK]]) is multi-table hyperplane LSH: L
  * independent b-bit signatures; candidates score exactly within each
  * (table, bucket); per-query global merge + dedup. Recall grows with L,
  * per-task memory is bounded by the bucket cap, and [[autoBits]] scales b
  * with the corpus so the expected bucket size stays constant as data grows.
  */
object Similarity {

  /** Σ aᵢ·bᵢ as a deterministic left-fold in double precision (HOF form —
    * kept for SQL composition; the hot paths use primitive loops with the
    * same fold order). */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  def l2norm(a: Column): Column =
    sqrt(aggregate(transform(a, x => x.cast("double") * x.cast("double")),
      lit(0.0), (acc, v) => acc + v))

  // ---- primitive kernels ---------------------------------------------------

  private def dotP(a: Array[Float], b: Array[Float]): Double = {
    var s = 0.0
    var i = 0
    val n = math.min(a.length, b.length)
    while (i < n) { s += a(i).toDouble * b(i).toDouble; i += 1 }
    s
  }

  private[graft] def normP(a: Array[Float]): Double = {
    var s = 0.0
    var i = 0
    while (i < a.length) { s += a(i).toDouble * a(i).toDouble; i += 1 }
    math.sqrt(s)
  }

  /** Rounded cosine, zero-norm-safe: an all-zero vector has undefined
    * cosine; define it as 0.0 instead of letting 0/0 = NaN crash round6. */
  private[graft] def cosineOf(va: Array[Float], vb: Array[Float], na: Double, nb: Double): Double = {
    val denom = na * nb
    if (denom == 0 || denom.isNaN) 0.0 else round6(dotP(va, vb) / denom)
  }

  /** [[cosineOf]] against a FLAT-PACKED corpus slice (vectors stored
    * back-to-back in one primitive float array — the streaming spill
    * tier's packed-list layout): identical zero-norm and round6
    * semantics, including [[dotP]]'s min-length clamp. */
  private[graft] def cosineOfFlat(va: Array[Float], na: Double,
                                  flat: Array[Float], off: Int, dim: Int,
                                  nb: Double): Double = {
    val denom = na * nb
    if (denom == 0 || denom.isNaN) 0.0
    else {
      var s = 0.0
      var i = 0
      val n = math.min(va.length, dim)
      while (i < n) { s += va(i).toDouble * flat(off + i).toDouble; i += 1 }
      round6(s / denom)
    }
  }

  /** Same rounding as Catalyst's round() (HALF_UP over the exact binary
    * expansion) so results are bit-identical to the SQL form. Fast path in
    * plain doubles: for |x| ≤ ~1 the scaled error is < 1e-10, so any value
    * farther than 1e-9 from a .5 decision boundary rounds identically; only
    * boundary-adjacent values (vanishingly rare) pay the exact BigDecimal. */
  private[graft] def round6(x: Double): Double = {
    val scaled = x * 1e6
    val fl = math.floor(scaled)
    val frac = scaled - fl
    if (math.abs(frac - 0.5) > 1e-9 && math.abs(scaled) < 4e15)
      (if (frac > 0.5) fl + 1 else fl) / 1e6
    else
      new java.math.BigDecimal(x).setScale(6, java.math.RoundingMode.HALF_UP).doubleValue
  }

  /** Bounded top-k selector by (score desc, id asc) — insertion into k-sized
    * arrays beats sorting every candidate when k ≪ n (k·n shifts worst case,
    * usually ~n comparisons). */
  private[graft] final class TopK(k: Int) {
    private val ids = new Array[Long](k)
    private val cs = new Array[Double](k)
    private var n = 0
    def offer(id: Long, c: Double): Unit = {
      if (n == k && (c < cs(n - 1) || (c == cs(n - 1) && id > ids(n - 1)))) return
      var pos = if (n < k) n else n - 1
      while (pos > 0 && (c > cs(pos - 1) || (c == cs(pos - 1) && id < ids(pos - 1)))) pos -= 1
      var i = math.min(n, k - 1)
      while (i > pos) { ids(i) = ids(i - 1); cs(i) = cs(i - 1); i -= 1 }
      ids(pos) = id; cs(pos) = c
      if (n < k) n += 1
    }
    def iterator: Iterator[(Long, Double)] =
      Iterator.range(0, n).map(i => (ids(i), cs(i)))
  }

  // ---- blocked exact search ------------------------------------------------

  /** Default per-task index shard budget (bytes of raw vector data). */
  val DefaultShardBytes: Long = 256L << 20

  private def vecs(emb: DataFrame, idCol: String, vecCol: String): Dataset[(Long, Array[Float])] = {
    val spark = emb.sparkSession
    import spark.implicits._
    emb.select(col(idCol).cast("long"), col(vecCol)).as[(Long, Array[Float])]
  }

  /** (row count, dims) in one distributed aggregation. */
  private def stats(emb: DataFrame, vecCol: String): (Long, Int) = {
    val r = emb.agg(count(lit(1)), max(size(col(vecCol)))).head()
    (r.getLong(0), if (r.isNullAt(1)) 0 else r.getInt(1))
  }

  /** Block grid: S index shards sized to `shardBytes`, Q query groups sized
    * so Q×S tasks saturate the cluster — but never more groups than the
    * corpus supports (index replication costs Q×, so tiny corpora get few
    * groups instead of paying 2·cores× replication for sub-second tasks). */
  private def grid(emb: DataFrame, vecCol: String, shardBytes: Long): (Int, Int) = {
    val (n, dims) = stats(emb, vecCol)
    val bytes = n * dims.toLong * 4
    val s = math.max(1L, (bytes + shardBytes - 1) / shardBytes).toInt
    val par = emb.sparkSession.sparkContext.defaultParallelism
    val byCores = math.max(1, math.ceil(2.0 * par / s).toInt)
    val byCorpus = math.max(1, math.ceil(n / 256.0).toInt)
    (math.min(byCores, byCorpus), s)
  }

  /** Run `score` once per (query group, index shard) cell with the shard
    * materialized as a primitive array; flatMap the per-cell results.
    *
    * Index and query replicas are emitted in ONE pass over the projected
    * input (tag 0 = index copy → every query group; tag 1 = query copy →
    * every shard), grouped by cell with tag-sorted groups so the shard
    * array builds from the leading index rows while the trailing query
    * rows stream — the input is scanned once, not once per replication
    * side, and per-task memory stays bounded by the shard size. */
  private def blocked[T: org.apache.spark.sql.Encoder](
      emb: DataFrame, idCol: String, vecCol: String, shardBytes: Long)(
      score: (Iterator[(Long, Array[Float], Double)], Array[(Long, Array[Float], Double)]) => Iterator[T])
    : Dataset[T] = {
    val spark = emb.sparkSession
    import spark.implicits._
    val (qGroups, sShards) = grid(emb, vecCol, shardBytes)
    // norms compute ONCE per row before replication — at Q (resp. S)
    // replicas each, recomputing per copy would redo the d-length scan
    // Q+S times per vector
    val base = vecs(emb, idCol, vecCol).map { case (id, v) => (id, v, normP(v)) }
    val tagged = base.flatMap { case (id, v, n) =>
      val s = (math.floorMod(id, sShards.toLong)).toInt
      val q = (math.floorMod(id, qGroups.toLong)).toInt
      Iterator.range(0, qGroups).map(g => (g * sShards + s, 0, id, v, n)) ++
        Iterator.range(0, sShards).map(sh => (q * sShards + sh, 1, id, v, n))
    }
    tagged.groupByKey(_._1).flatMapSortedGroups(col("_2")) { (_, it) =>
      val buf = it.buffered
      val shard = scala.collection.mutable.ArrayBuffer.empty[(Long, Array[Float], Double)]
      while (buf.hasNext && buf.head._2 == 0) {
        val r = buf.next()
        shard += ((r._3, r._4, r._5))
      }
      score(buf.map(r => (r._3, r._4, r._5)), shard.toArray)
    }
  }

  /** [[blocked]] with a Long payload carried per vector (a class label,
    * a source id) — same one-pass replication, same tag-sorted cogroup,
    * same bounded per-task memory; the payload rides the wire so the score
    * callback can filter or annotate without a post-hoc join. */
  private def blockedLabeled[T: org.apache.spark.sql.Encoder](
      emb: DataFrame, idCol: String, vecCol: String, labelCol: String,
      shardBytes: Long)(
      score: (Iterator[(Long, Array[Float], Double, Long)],
              Array[(Long, Array[Float], Double, Long)]) => Iterator[T])
    : Dataset[T] = {
    val spark = emb.sparkSession
    import spark.implicits._
    val (qGroups, sShards) = grid(emb, vecCol, shardBytes)
    val base = emb.where(col(labelCol).isNotNull && col(vecCol).isNotNull)
      .select(col(idCol).cast("long"), col(vecCol), col(labelCol).cast("long"))
      .as[(Long, Array[Float], Long)]
      .map { case (id, v, l) => (id, v, normP(v), l) }
    val tagged = base.flatMap { case (id, v, n, l) =>
      val s = (math.floorMod(id, sShards.toLong)).toInt
      val q = (math.floorMod(id, qGroups.toLong)).toInt
      Iterator.range(0, qGroups).map(g => (g * sShards + s, 0, id, v, n, l)) ++
        Iterator.range(0, sShards).map(sh => (q * sShards + sh, 1, id, v, n, l))
    }
    tagged.groupByKey(_._1).flatMapSortedGroups(col("_2")) { (_, it) =>
      val buf = it.buffered
      val shard = scala.collection.mutable.ArrayBuffer.empty[(Long, Array[Float], Double, Long)]
      while (buf.hasNext && buf.head._2 == 0) {
        val r = buf.next()
        shard += ((r._3, r._4, r._5, r._6))
      }
      score(buf.map(r => (r._3, r._4, r._5, r._6)), shard.toArray)
    }
  }

  /** BIPARTITE KNN JOIN — for every query vector, the k nearest corpus
    * vectors by cosine: the embedding retrieval join (RAG context
    * selection, cross-corpus linking, train/eval neighbor audits) when
    * BOTH sides are large. [[contaminationAgainst]] broadcasts a small
    * eval side; this is the scale path — the corpus hash-shards into
    * memory-bounded index cells and the query set hash-groups across
    * them, exactly the [[cosineTopK]] grid with the two roles taken by
    * DIFFERENT tables (each side replicated only across the other's
    * dimension, one pass each). Deterministic rank: (rounded cos desc,
    * corpus id asc); per-shard k-heaps merge through one bounded
    * (≤ k·S rows per query) window. NULL vectors are excluded on both
    * sides. */
  def knnJoin(queries: DataFrame, corpus: DataFrame, k: Int = 10,
              idCol: String = "vec_id", vecCol: String = "embedding",
              shardBytes: Long = DefaultShardBytes): DataFrame = {
    val spark = queries.sparkSession
    import spark.implicits._
    require(k >= 1, s"k must be >= 1: $k")
    val (_, sShards) = grid(corpus, vecCol, shardBytes)
    val (qGroups0, _) = grid(queries, vecCol, shardBytes)
    val qGroups = qGroups0
    def side(df: DataFrame, tag: Int) = {
      val base = df.where(col(vecCol).isNotNull)
        .select(col(idCol).cast("long"), col(vecCol))
        .as[(Long, Array[Float])]
        .map { case (id, v) => (id, v, normP(v)) }
      if (tag == 0)
        // corpus: each vector lives in ONE shard, replicated to every
        // query group's copy of that shard
        base.flatMap { case (id, v, n) =>
          val s = math.floorMod(id, sShards.toLong).toInt
          Iterator.range(0, qGroups).map(g => (g * sShards + s, 0, id, v, n))
        }
      else
        // queries: each vector lives in ONE group, replicated across that
        // group's S shard cells
        base.flatMap { case (id, v, n) =>
          val g = math.floorMod(id, qGroups.toLong).toInt
          Iterator.range(0, sShards).map(sh => (g * sShards + sh, 1, id, v, n))
        }
    }
    val perShard = side(corpus, 0).union(side(queries, 1))
      .groupByKey(_._1).flatMapSortedGroups(col("_2")) { (_, it) =>
        val buf = it.buffered
        val shard = scala.collection.mutable.ArrayBuffer.empty[(Long, Array[Float], Double)]
        while (buf.hasNext && buf.head._2 == 0) {
          val r = buf.next()
          shard += ((r._3, r._4, r._5))
        }
        buf.map(r => (r._3, r._4, r._5)).flatMap { case (q, vq, nq) =>
          val top = new TopK(k)
          var i = 0
          while (i < shard.length) {
            val (b, vb, nb) = shard(i)
            top.offer(b, cosineOf(vq, vb, nq, nb))
            i += 1
          }
          top.iterator.map { case (b, c) => (q, b, c) }
        }
      }.toDF("q", "b", "cos")
    perShard
      .withColumn("rank", row_number().over(
        Window.partitionBy("q").orderBy(col("cos").desc, col("b"))))
      .where(col("rank") <= k)
      .select(col("q"), col("b"), col("cos"), col("rank").cast("int").as("rank"))
  }

  /** IVF-ROUTED BIPARTITE KNN JOIN — the scale tier over [[knnJoin]]. The
    * exact grid is O(Q·C) cosines by construction (every query scores every
    * corpus vector, however well it shards); this routes through the same
    * build-once [[ivfCentroids]] coarse quantizer as [[ivfTopK]]: every
    * corpus vector lands in exactly ONE inverted list (its nearest
    * centroid), every query replicates to only its `nprobe` nearest lists,
    * and exact cosine top-k runs within each probed list. Per-query compute
    * drops to ~(nprobe/nlist)·C dot products and the shuffle carries
    * C + Q·nprobe rows instead of the grid's C·G + Q·S replication.
    * Per-task memory is one inverted list (~C/nlist vectors — scale nlist ∝
    * √C to hold lists constant); the per-list winners merge through one
    * bounded (≤ k·nprobe rows per query) window. Deterministic rank:
    * (rounded cos desc, corpus id asc), identical to [[knnJoin]].
    *
    * `nprobe = nlist` probes every list, which provably covers the full
    * corpus — the result is then bit-identical to the exact [[knnJoin]],
    * which is how the oracle pins this plan (`ann_knn_join_ivf_exact`);
    * the production nprobe ≪ nlist config is the recall-tuned scale path.
    * Pass `prebuilt` to reuse a pinned quantizer across query batches. */
  def knnJoinIvf(queries: DataFrame, corpus: DataFrame, k: Int = 10,
                 nlist: Int = 16, nprobe: Int = 4,
                 idCol: String = "vec_id", vecCol: String = "embedding",
                 iterations: Int = 5, maxTrainSample: Int = 10000,
                 prebuilt: Option[Array[Array[Float]]] = scala.None): DataFrame = {
    val spark = queries.sparkSession
    import spark.implicits._
    require(k >= 1, s"k must be >= 1: $k")
    val centroids = prebuilt.getOrElse(
      ivfCentroids(corpus.where(col(vecCol).isNotNull), nlist, idCol, vecCol,
        iterations, maxTrainSample))
    // clamp against the RESOLVED quantizer: the artifact may carry fewer
    // lists than `nlist` asks for (a tiny training set dedups its init),
    // and the exhaustiveness guarantee is nprobe = centroids.length — the
    // artifact actually routing — not the requested size
    require(nprobe >= 1, s"nprobe must be >= 1: $nprobe")
    val np = math.min(nprobe, centroids.length)
    val bc = spark.sparkContext.broadcast(centroids)
    // corpus: one inverted list per vector (argmax dot ≡ argmax cos — the
    // vector's own norm is constant across centroids); NULL vectors are
    // excluded on both sides, matching the exact knnJoin
    val members = vecs(corpus.where(col(vecCol).isNotNull), idCol, vecCol)
      .map { case (id, v) => (nearestCentroid(v, bc.value), id, v) }
    // queries: replicated to their nprobe nearest lists only
    val probes = vecs(queries.where(col(vecCol).isNotNull), idCol, vecCol)
      .flatMap { case (id, v) =>
        nearestCentroids(v, bc.value, np).iterator.map(c => (c, id, v))
      }
    members.groupByKey(_._1).cogroup(probes.groupByKey(_._1)) { (_, mIt, qIt) =>
      val list = mIt.map { case (_, id, v) => (id, v, normP(v)) }.toArray
      qIt.flatMap { case (_, q, vq) =>
        val nq = normP(vq)
        val top = new TopK(k)
        var i = 0
        while (i < list.length) {
          val (b, vb, nb) = list(i)
          top.offer(b, cosineOf(vq, vb, nq, nb))
          i += 1
        }
        top.iterator.map { case (b, c) => (q, b, c) }
      }
    }.toDF("q", "b", "cos")
      .withColumn("rank", row_number().over(
        Window.partitionBy("q").orderBy(col("cos").desc, col("b"))))
      .where(col("rank") <= k)
      .select(col("q"), col("b"), col("cos"), col("rank").cast("int").as("rank"))
  }

  /** HARD-NEGATIVE MINING for contrastive training: for every anchor
    * vector, the k most-similar vectors carrying a DIFFERENT label — the
    * near-misses that make the best negatives (Xiong et al. 2021 ANCE-style
    * selection, here the exact form). Same blocked grid as [[cosineTopK]]
    * (bounded per-task memory, no driver index) with the label filter
    * applied INSIDE the per-shard scoring loop — before any top-k
    * selection, so a shard full of same-label neighbors can't crowd out
    * true negatives. Deterministic rank: (rounded cos desc, id asc);
    * per-shard k-heaps merge to the global exact top-k through one bounded
    * (≤ k·S rows per anchor) window. NULL labels are excluded on both
    * sides (no label — neither anchor nor negative). */
  def hardNegatives(emb: DataFrame, k: Int = 5, labelCol: String = "label",
                    idCol: String = "vec_id", vecCol: String = "embedding",
                    shardBytes: Long = DefaultShardBytes): DataFrame = {
    import emb.sparkSession.implicits._
    val perShard = blockedLabeled[(Long, Long, Long, Long, Double)](
      emb, idCol, vecCol, labelCol, shardBytes) { (queries, shard) =>
      queries.flatMap { case (a, va, na, la) =>
        val top = new TopK(k)
        var i = 0
        while (i < shard.length) {
          val (b, vb, nb, lb) = shard(i)
          if (b != a && lb != la) top.offer(b, cosineOf(va, vb, na, nb))
          i += 1
        }
        // shard-local id → label probe for the ≤ k survivors (k ≪ the
        // d-length dot products already paid; a per-cell hash map would
        // cost more than it saves at realistic k)
        top.iterator.map { case (b, c) =>
          var j = 0; var lb = 0L
          while (j < shard.length) {
            if (shard(j)._1 == b) { lb = shard(j)._4; j = shard.length } else j += 1
          }
          (a, la, b, lb, c)
        }
      }
    }.toDF("a", "a_label", "b", "b_label", "cos")
    perShard
      .withColumn("rank", row_number().over(
        Window.partitionBy("a").orderBy(col("cos").desc, col("b"))))
      .where(col("rank") <= k)
      .select(col("a"), col("a_label"), col("b"), col("b_label"), col("cos"),
        col("rank").cast("int").as("rank"))
  }

  /** All-pairs cosine similarity (a < b), rounded for cross-engine stability. */
  def cosinePairs(emb: DataFrame, idCol: String = "vec_id",
                  vecCol: String = "embedding",
                  shardBytes: Long = DefaultShardBytes): DataFrame =
    pairsAbove(emb, threshold = -2.0, idCol, vecCol, shardBytes)

  /** Near-duplicate vectors: cosine ≥ threshold (threshold applies to the
    * rounded similarity, matching the SQL oracle). */
  def cosineNearDup(emb: DataFrame, threshold: Double = 0.95,
                    idCol: String = "vec_id", vecCol: String = "embedding",
                    shardBytes: Long = DefaultShardBytes): DataFrame =
    pairsAbove(emb, threshold, idCol, vecCol, shardBytes)

  /** Embedding-space benchmark decontamination: flag every corpus vector
    * whose cosine similarity to ANY eval/benchmark vector reaches
    * `threshold` (the threshold applies to the rounded similarity, matching
    * the SQL oracle). One row per contaminated corpus vector, carrying its
    * best-matching eval vector — the (cos desc, eval id asc) argmax, so
    * ties are deterministic.
    *
    * The text-space analogue is [[graft.ops.Dedup.contamination]]; this is
    * the semantic screen that catches paraphrased leakage a shingle overlap
    * misses.
    *
    * Scale: an eval/benchmark suite is small by construction (10³–10⁵
    * rows), so it broadcasts once and the corpus side STREAMS — a single
    * projection-only map over the corpus scan with a primitive-array inner
    * loop. No shuffle, no self-join, no state: 100 TB of corpus passes
    * through map tasks at scan speed. The eval collect is bounded by
    * `limit(maxEvalVectors + 1)` and fails fast past the cap (an over-cap
    * "eval set" is a sign the caller wants a corpus×corpus join — that is
    * [[cosineNearDup]]'s blocked grid, not this broadcast). */
  def contaminationAgainst(corpus: DataFrame, eval: DataFrame,
                           threshold: Double = 0.8,
                           idCol: String = "vec_id", vecCol: String = "embedding",
                           maxEvalVectors: Int = 1 << 17): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val evalRows = vecs(eval.where(col(vecCol).isNotNull), idCol, vecCol)
      .limit(maxEvalVectors + 1).collect()
    require(evalRows.length <= maxEvalVectors,
      s"eval set exceeds maxEvalVectors=$maxEvalVectors vectors — an eval " +
        "side this large is a corpus join, use cosineNearDup's blocked grid")
    // sorted by id so the strict `>` argmax keeps the SMALLEST eval id on
    // cosine ties — the oracle's (cos DESC, b ASC) rank-1 row
    val evArr = evalRows.map { case (id, v) => (id, v, normP(v)) }.sortBy(_._1)
    val bc = spark.sparkContext.broadcast(evArr)
    vecs(corpus.where(col(vecCol).isNotNull), idCol, vecCol)
      .mapPartitions { it =>
        val ev = bc.value
        it.flatMap { case (a, va) =>
          val na = normP(va)
          var bestId = -1L
          var bestCos = Double.NegativeInfinity
          var i = 0
          while (i < ev.length) {
            val c = cosineOf(va, ev(i)._2, na, ev(i)._3)
            if (c > bestCos) { bestCos = c; bestId = ev(i)._1 }
            i += 1
          }
          if (ev.nonEmpty && bestCos >= threshold) Iterator.single((a, bestId, bestCos))
          else Iterator.empty
        }
      }.toDF("vec_id", "eval_id", "cos")
  }

  private def pairsAbove(emb: DataFrame, threshold: Double,
                         idCol: String, vecCol: String,
                         shardBytes: Long = DefaultShardBytes): DataFrame = {
    import emb.sparkSession.implicits._
    // each unordered pair meets in exactly one cell (b's shard × a's group),
    // so no global dedup pass is needed
    blocked[(Long, Long, Double)](emb, idCol, vecCol, shardBytes) { (queries, shard) =>
      queries.flatMap { case (a, va, na) =>
        shard.iterator
          .filter(_._1 > a) // a < b, each pair once
          .map { case (b, vb, nb) => (a, b, cosineOf(va, vb, na, nb)) }
          .filter(_._3 >= threshold)
      }
    }.toDF("a", "b", "cos")
  }

  /** Exact cosine top-k neighbors per vector (directed: every vector gets its
    * k nearest others). Deterministic rank: (rounded cos desc, id). Per-shard
    * top-k in each cell, then one window merges the ≤ k·S candidates per
    * query to the global top-k — identical to single-pass ranking because
    * per-cell selection uses the same total order. */
  def cosineTopK(emb: DataFrame, k: Int = 10, idCol: String = "vec_id",
                 vecCol: String = "embedding",
                 shardBytes: Long = DefaultShardBytes): DataFrame = {
    import emb.sparkSession.implicits._
    val perShard = blocked[(Long, Long, Double)](emb, idCol, vecCol, shardBytes) { (queries, shard) =>
      queries.flatMap { case (a, va, na) =>
        val top = new TopK(k)
        var i = 0
        while (i < shard.length) {
          val (b, vb, nb) = shard(i)
          if (b != a) top.offer(b, cosineOf(va, vb, na, nb))
          i += 1
        }
        top.iterator.map { case (b, c) => (a, b, c) }
      }
    }.toDF("a", "b", "cos")
    perShard
      .withColumn("rank", row_number().over(
        Window.partitionBy("a").orderBy(col("cos").desc, col("b"))))
      .where(col("rank") <= k)
      .select(col("a"), col("b"), col("cos"), col("rank").cast("int").as("rank"))
  }

  /** EXACT L2 TOP-K FOR A BOUNDED QUERY SAMPLE — the ground-truth side of
    * the serving recall monitor over the ADC tier, which ranks by squared
    * L2 (cosine helpers above would grade an L2-ranked tier against the
    * wrong order on unnormalized vectors). `queries` MUST be a bounded
    * sample (a monitor's `serve_recall_sample`, capped at [[MaxRecallSample]]
    * — enforced, since the sample is collected to the driver and broadcast):
    * one corpus scan scores every sample query per partition through a
    * k-bounded heap, so the shuffle carries ≤ Q·k rows per partition and
    * nothing corpus-sized ever concentrates. Deterministic rank:
    * (dist2 asc, corpus id asc) — the ADC serving tiers' order. */
  val MaxRecallSample = 10000

  def bruteForceL2TopK(queries: DataFrame, corpus: DataFrame, k: Int = 10,
                       idCol: String = "vec_id",
                       vecCol: String = "embedding",
                       /** skip b == query id — pair with self-excluding
                         * tiers (ADC/rerank), else a corpus-member query
                         * caps their recall at (k-1)/k */
                       excludeSelf: Boolean = false): DataFrame = {
    val spark = queries.sparkSession
    import spark.implicits._
    require(k >= 1, s"k must be >= 1: $k")
    // bounded by contract: the recall monitor samples ≤ serve_recall_sample
    // queries; anything larger belongs on knnJoin's distributed grid
    val qs = queries.where(col(vecCol).isNotNull)
      .select(col(idCol).cast("long"), col(vecCol))
      .as[(Long, Array[Float])].limit(MaxRecallSample + 1).collect()
    require(qs.length <= MaxRecallSample,
      s"bruteForceL2TopK is for bounded samples (<= $MaxRecallSample queries); " +
        "use knnJoin/knnJoinIvf for full query sets")
    val bc = spark.sparkContext.broadcast(qs)
    corpus.where(col(vecCol).isNotNull)
      .select(col(idCol).cast("long"), col(vecCol))
      .as[(Long, Array[Float])]
      .mapPartitions { it =>
        val sample = bc.value
        val heaps = Array.fill(sample.length)(new TopK(k))
        it.foreach { case (b, vb) =>
          var i = 0
          while (i < sample.length) {
            if (!(excludeSelf && sample(i)._1 == b)) {
              val qv = sample(i)._2
              var d = 0.0; var j = 0
              val n = math.min(qv.length, vb.length)
              // double arithmetic per term, the family's oracle-parity rule
              while (j < n) { val x = qv(j).toDouble - vb(j).toDouble; d += x * x; j += 1 }
              heaps(i).offer(b, -d) // TopK keeps the LARGEST scores: negate dist2
            }
            i += 1
          }
        }
        heaps.iterator.zipWithIndex.flatMap { case (h, i) =>
          h.iterator.map { case (b, s) => (sample(i)._1, b, -s) }
        }
      }
      .toDF("q", "b", "dist2")
      .withColumn("rank", row_number().over(
        Window.partitionBy("q").orderBy(col("dist2").asc, col("b"))))
      .where(col("rank") <= k)
      .select(col("q"), col("b"), round(col("dist2"), 6).as("dist2"),
        col("rank").cast("int").as("rank"))
  }

  /** OFFLINE RETRIEVAL EVALUATION — recall@k of an approximate result
    * against an exact baseline, the number every ANN/compression knob
    * (nprobe, m, LSH bits, matryoshka dims, int8) is ultimately tuned by.
    * Inputs are ranked result frames in the family's (query, candidate,
    * rank) shape; rows beyond rank k are ignored on BOTH sides, so a
    * wider baseline can be reused across k values. Per query:
    * `recall = |approx top-k ∩ exact top-k| / |exact top-k|` — the exact
    * side's size is the denominator, so a query with fewer than k true
    * neighbors is never penalized for the impossible remainder. Queries
    * present only in the exact frame score 0 (the approximate route
    * missed them entirely); queries absent from the exact frame have no
    * defined baseline and are dropped.
    *
    * Scale: both inputs are top-k tables — Q·k rows by construction — so
    * the intersection is one equi-join on (query, candidate) and two
    * Q-row aggregates; no corpus-sized side exists. */
  def recallAtK(approx: DataFrame, exact: DataFrame, k: Int,
                qCol: String = "a", bCol: String = "b",
                rankCol: String = "rank"): DataFrame = {
    require(k >= 1, s"k must be >= 1: $k")
    val a = approx.where(col(rankCol) <= k)
      .select(col(qCol).cast("long").as("q"), col(bCol).cast("long").as("b"))
    val e = exact.where(col(rankCol) <= k)
      .select(col(qCol).cast("long").as("q"), col(bCol).cast("long").as("b"))
    val hits = a.join(e, Seq("q", "b")).groupBy("q")
      .agg(count(lit(1)).as("hits"))
    e.groupBy("q").agg(count(lit(1)).as("n_exact"))
      .join(hits, Seq("q"), "left")
      .select(col("q"),
        coalesce(col("hits"), lit(0L)).cast("bigint").as("hits"),
        col("n_exact").cast("bigint").as("n_exact"),
        round(coalesce(col("hits"), lit(0L)) / col("n_exact"), 6).as("recall"))
  }

  // ---- hyperplane LSH ------------------------------------------------------

  /** Deterministic pseudo-random hyperplane components for (table, bit, dim):
    * md5-derived values in [-0.5, 0.5). Reproducible on any engine/cluster. */
  def planes(table: Int, bits: Int, dims: Int): Array[Array[Double]] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    Array.tabulate(bits, dims) { (bit, i) =>
      val hex = md.digest(s"$table:$bit-$i".getBytes("UTF-8"))
        .take(4).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex, 16).toDouble / 4294967296.0 - 0.5
    }
  }

  /** Signature bits so the *expected* bucket size stays ~`targetBucket` as
    * the corpus grows: b = ceil(log2(n / targetBucket)), min 2. */
  def autoBits(n: Long, targetBucket: Int = 256): Int =
    math.max(2, math.ceil(math.log(math.max(1.0, n.toDouble / targetBucket)) / math.log(2)).toInt)

  /** Hyperplane-LSH bucket id for one table (`bits`-bit signature of
    * dot-product signs). */
  def lshBucket(emb: DataFrame, bits: Int = 8, idCol: String = "vec_id",
                vecCol: String = "embedding", table: Int = 0): DataFrame = {
    val spark = emb.sparkSession
    val ps = spark.sparkContext.broadcast(planes(table, bits, dims = 4096))
    val bucketOf = udf { (v: Seq[Float]) =>
      val pl = ps.value
      var bucket = 0L
      var bit = 0
      while (bit < pl.length) {
        var s = 0.0
        var i = 0
        while (i < v.length) { s += v(i) * pl(bit)(i % 4096); i += 1 }
        if (s > 0) bucket |= (1L << bit)
        bit += 1
      }
      bucket
    }
    emb.withColumn("bucket", bucketOf(col(vecCol)))
  }

  /** Multi-table LSH approximate top-k: exact cosine ranking *within* each
    * (table, bucket); per-query merge deduplicates candidates across tables
    * and takes the global top-k. Recall rises with `tables`; per-task memory
    * is bounded by `maxBucket` (oversized buckets — skew or too-few bits —
    * are truncated by smallest id, trading recall, never memory). */
  def lshTopK(emb: DataFrame, k: Int = 10, bits: Int = 8, tables: Int = 4,
              maxBucket: Int = 100000,
              idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    require(maxBucket > 0, s"maxBucket must be positive, got $maxBucket")
    val spark = emb.sparkSession
    import spark.implicits._
    val perTable = (0 until tables).map { t =>
      lshBucket(emb, bits, idCol, vecCol, table = t)
        .select(col(idCol).cast("long").as("id"), col(vecCol).as("vec"),
          (col("bucket") + t.toLong * (1L << bits)).as("tb"))
        .as[(Long, Array[Float], Long)]
    }.reduce(_ union _)
    perTable
      .groupByKey(_._3)
      .flatMapGroups { (_: Long, members: Iterator[(Long, Array[Float], Long)]) =>
        // cap while STREAMING the iterator: a bounded max-heap keeps the
        // maxBucket smallest ids, so per-task memory is O(maxBucket) even
        // when a skewed/under-bitted bucket is far larger (ADVICE r2 — the
        // old toArray-then-truncate held the whole bucket before capping)
        val heap = scala.collection.mutable.PriorityQueue
          .empty[(Long, Array[Float])](Ordering.by[(Long, Array[Float]), Long](_._1))
        members.foreach { case (id, v, _) =>
          if (heap.size < maxBucket) heap.enqueue((id, v))
          else if (id < heap.head._1) { heap.dequeue(); heap.enqueue((id, v)) }
        }
        val ms = heap.toArray.map(t => (t._1, t._2, normP(t._2)))
        ms.iterator.flatMap { case (a, va, na) =>
          val top = new TopK(k)
          var i = 0
          while (i < ms.length) {
            val (b, vb, nb) = ms(i)
            if (b != a) top.offer(b, cosineOf(va, vb, na, nb))
            i += 1
          }
          top.iterator.map { case (b, c) => (a, b, c) }
        }
      }
      .toDF("a", "b", "cos")
      .dropDuplicates("a", "b") // same pair can surface from several tables
      .withColumn("rank", row_number().over(
        Window.partitionBy("a").orderBy(col("cos").desc, col("b"))))
      .where(col("rank") <= k)
  }

  /** [[lshTopK]] with `bits` scaled to the corpus size — the default entry
    * point at unknown scale. */
  def lshTopKAuto(emb: DataFrame, k: Int = 10, tables: Int = 4,
                  targetBucket: Int = 256, maxBucket: Int = 100000,
                  idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val n = emb.count()
    lshTopK(emb, k, autoBits(n, targetBucket), tables, maxBucket, idCol, vecCol)
  }

  // ---- semantic dedup ------------------------------------------------------

  /** SEMANTIC NEAR-DUP (SemDeDup-style): cluster the corpus by its own
    * learned coarse quantizer (the [[ivfCentroids]] Lloyd pass — bounded
    * driver sample, deterministic init), then score pairwise cosine ONLY
    * within each cluster and keep pairs ≥ `threshold`. The clustering
    * restriction is what makes embedding dedup tractable at corpus scale:
    * work drops from N² to Σ|C|² ≈ N²/nlist (uniform clusters), and recall
    * loss is confined to near-dups that straddle a cluster boundary —
    * near-identical vectors almost always quantize together, which is the
    * SemDeDup bet (recall spec-gated against the exact operator;
    * precision is 1.0 by construction since in-cluster cosines are exact).
    *
    * Plan: the assignment is a narrow typed map under a broadcast centroid
    * array; pairing is a declarative self-equi-join on the cluster key —
    * Catalyst shuffles both sides once on `cluster`, streams the pair
    * space, and the cosine is a codegen'd HOF fold + round (bit-identical
    * to the SQL form). No driver collection beyond the bounded quantizer
    * sample; per-task memory is one join partition, and AQE splits skewed
    * clusters. Scale nlist ∝ corpus/constant to hold cluster sizes flat.
    *
    * `probes` > 1 is the multi-probe recall knob: each vector lands in its
    * `probes` nearest clusters, so a pair is seen whenever ANY cluster is
    * shared — boundary-straddling near-dups (the recall loss mode) get a
    * second chance at probes× replication cost. Duplicate sightings of the
    * same pair collapse with one distinct over the (small) result. */
  def semanticNearDup(emb: DataFrame, threshold: Double = 0.95, nlist: Int = 16,
                      probes: Int = 1,
                      idCol: String = "vec_id", vecCol: String = "embedding",
                      iterations: Int = 5, maxTrainSample: Int = 10000,
                      prebuilt: Option[Array[Array[Float]]] = scala.None): DataFrame = {
    require(probes >= 1 && probes <= nlist, "probes must be in [1, nlist]")
    val spark = emb.sparkSession
    import spark.implicits._
    val centroids = prebuilt.getOrElse(
      ivfCentroids(emb, nlist, idCol, vecCol, iterations, maxTrainSample))
    val bc = spark.sparkContext.broadcast(centroids)
    // one shuffle: vectors to their probe clusters; each cluster scores its
    // pair space with the same primitive kernels (and the same rounded
    // cosine) as the exact blocked search — per-task memory is one cluster
    // (≈ probes·corpus/nlist vectors; scale nlist with the corpus)
    vecs(emb, idCol, vecCol)
      .flatMap { case (id, v) =>
        nearestCentroids(v, bc.value, probes).iterator.map(c => (c, id, v))
      }
      .groupByKey(_._1)
      .flatMapGroups { (_, it) =>
        val members = it.map { case (_, id, v) => (id, v, normP(v)) }.toArray
        Iterator.range(0, members.length).flatMap { i =>
          val (ia, va, na) = members(i)
          Iterator.range(i + 1, members.length).flatMap { j =>
            val (ib, vb, nb) = members(j)
            val c = cosineOf(va, vb, na, nb)
            if (c >= threshold)
              Iterator.single((math.min(ia, ib), math.max(ia, ib), c))
            else Iterator.empty
          }
        }
      }
      .toDF("a", "b", "cos")
      .distinct() // a pair sharing several probe clusters is seen once per share
  }

  /** CLUSTER ASSIGNMENT over the learned IVF quantizer: (id, cluster,
    * centroid_cos). A narrow map over broadcast centroids — one corpus pass,
    * no shuffle. The curation building block under [[semanticNearDup]],
    * exposed for cluster statistics and balanced sampling. */
  def clusterAssign(emb: DataFrame, nlist: Int = 16,
                    idCol: String = "vec_id", vecCol: String = "embedding",
                    iterations: Int = 5, maxTrainSample: Int = 10000,
                    prebuilt: Option[Array[Array[Float]]] = scala.None): DataFrame = {
    val spark = emb.sparkSession
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(prebuilt.getOrElse(
      ivfCentroids(emb, nlist, idCol, vecCol, iterations, maxTrainSample)))
    vecs(emb, idCol, vecCol)
      .map { case (id, v) =>
        val cs = bc.value
        val c = nearestCentroid(v, cs) // argmax dot == argmax cosine (|v| fixed)
        (id, c, round6(dotP(v, cs(c)) / math.max(normP(v), 1e-12)))
      }
      .toDF(idCol, "cluster", "centroid_cos")
  }

  /** CLUSTER-BALANCED PROTOTYPE SELECTION (the SSL-prototypes / dataset-
    * pruning shape): keep the `perCluster` most-central members of every
    * quantizer cluster — balanced coverage of the embedding space instead
    * of frequency-weighted sampling. One narrow assignment pass plus one
    * cluster-partitioned top-N window (nlist partitions, each bounded by
    * its member count; rank ties break on id for determinism). */
  def clusterBalancedSample(emb: DataFrame, nlist: Int = 16, perCluster: Int = 100,
                            idCol: String = "vec_id", vecCol: String = "embedding",
                            iterations: Int = 5, maxTrainSample: Int = 10000): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val assigned = clusterAssign(emb, nlist, idCol, vecCol, iterations, maxTrainSample)
    assigned
      .withColumn("__rank", row_number().over(
        Window.partitionBy("cluster")
          .orderBy(col("centroid_cos").desc, col(idCol))))
      .where(col("__rank") <= perCluster)
      .select(col(idCol), col("cluster"), col("centroid_cos"),
        col("__rank").cast("int").as("rank"))
  }

  // ---- IVF ----------------------------------------------------------------

  /** Train IVF coarse centroids: Lloyd iterations over a BOUNDED sample
    * (≤ `maxTrainSample` rows — sampling the quantizer training set is
    * standard IVF practice and keeps driver memory constant regardless of
    * corpus size; assignment and search stay fully distributed). Cosine
    * geometry: vectors are L2-normalized before clustering. Deterministic:
    * sample = lowest ids, init = first distinct vectors.
    *
    * The returned array is the BUILD-ONCE index artifact (same pattern as
    * [[graft.ops.Dedup.buildCorpusBloom]]): train the quantizer on the
    * corpus once, then pass it as `prebuilt` to [[ivfTopK]] /
    * [[clusterAssign]] / [[semanticNearDup]] for every later batch or
    * query set — at scale, retraining per call costs a corpus sample +
    * k-means each time and silently shifts cluster boundaries between
    * calls; a pinned quantizer keeps assignments comparable across runs. */
  def ivfCentroids(emb: DataFrame, nlist: Int, idCol: String = "vec_id",
                   vecCol: String = "embedding", iterations: Int = 5,
                   maxTrainSample: Int = 10000): Array[Array[Float]] = {
    val spark = emb.sparkSession
    import spark.implicits._
    val sample = emb.select(col(idCol).cast("long"), col(vecCol))
      .as[(Long, Array[Float])]
      .orderBy(idCol).limit(maxTrainSample).collect().map(_._2)
    require(sample.nonEmpty, "cannot train IVF on an empty table")
    def normalize(v: Array[Float]): Array[Float] = {
      val n = normP(v)
      if (n == 0) v else v.map(x => (x / n).toFloat)
    }
    val train = sample.map(normalize)
    var centroids = train.map(_.toSeq).distinct.take(nlist).map(_.toArray) // content equality, not array reference
    var iter = 0
    while (iter < iterations) {
      val sums = Array.fill(centroids.length)(new Array[Double](train.head.length))
      val counts = new Array[Long](centroids.length)
      train.foreach { v =>
        val c = nearestCentroid(v, centroids)
        counts(c) += 1
        var i = 0
        while (i < v.length) { sums(c)(i) += v(i); i += 1 }
      }
      centroids = centroids.indices.map { c =>
        if (counts(c) == 0) centroids(c) // empty list keeps its centroid
        else normalize(sums(c).map(x => (x / counts(c)).toFloat))
      }.toArray
      iter += 1
    }
    centroids
  }

  /** Persist a trained coarse-quantizer artifact as a catalog table —
    * (list_id, centroid float array), one row per inverted list. The
    * build-once contract crosses JOB boundaries this way: train on today's
    * corpus, save, and every later batch/stream/query session loads the
    * SAME quantizer instead of retraining (which silently shifts cluster
    * boundaries between runs — the reuse note on [[ivfCentroids]]).
    * Parquet float arrays round-trip bit-exactly, so a reloaded index
    * routes identically; `emb_index_roundtrip` oracle-pins exactly that. */
  def saveCentroids(spark: org.apache.spark.sql.SparkSession,
                    centroids: Array[Array[Float]], table: String): Unit = {
    import spark.implicits._
    require(centroids.nonEmpty, "cannot save an empty quantizer")
    centroids.zipWithIndex
      .map { case (c, i) => (i, c.toSeq) }.toSeq
      .toDF("list_id", "centroid")
      .coalesce(1) // nlist rows — one tiny artifact file, never a shuffle
      .write.mode(org.apache.spark.sql.SaveMode.Overwrite).saveAsTable(table)
  }

  /** Load a [[saveCentroids]] artifact back into the in-memory form every
    * IVF entry point's `prebuilt` takes. Driver collect is bounded by
    * nlist (the artifact is centroids, never corpus vectors). */
  def loadCentroids(spark: org.apache.spark.sql.SparkSession,
                    table: String): Array[Array[Float]] = {
    import spark.implicits._
    val rows = spark.table(table)
      .select(col("list_id").cast("int"), col("centroid"))
      .as[(Int, Array[Float])].collect()
    require(rows.nonEmpty, s"$table holds no quantizer rows")
    val sorted = rows.sortBy(_._1)
    // a torn/partial artifact (missing or duplicated list ids) would
    // silently renumber lists and misroute every vector — fail fast instead
    require(sorted.map(_._1).toSeq == sorted.indices,
      s"$table is not a contiguous 0..n-1 quantizer artifact: " +
        s"ids ${sorted.map(_._1).take(8).mkString(",")}…")
    sorted.map(_._2)
  }

  /** Persist the INVERTED LISTS themselves — the full (list_id, id, vector)
    * corpus assignment — as a catalog table bucketed BY list_id.
    * [[saveCentroids]] makes the quantizer survive job boundaries, but every
    * routed search still re-mapped the WHOLE corpus through
    * [[nearestCentroid]] per invocation; at 100 TB that assignment pass
    * dominates every query batch. Materializing the assignment pays it ONCE:
    * the bucketBy(list_id) layout means every later list-keyed equi-join
    * reads the bucket files as pre-hashed partitions with ZERO exchange on
    * the corpus side (the `mat_bucketed_join` move), so a query batch costs
    * only its own routing + the probed-list scoring. The write is an atomic
    * generation swap via the warehouse; NULL vectors are excluded, matching
    * every routed entry point. Size `buckets` so one bucket's lists fit a
    * task (buckets ≤ nlist keeps each a whole number of lists). */
  /** MD5 over a quantizer's exact float bytes — the PAIRING fingerprint
    * stamped into every index artifact: an index is only meaningful under
    * the quantizer that routed it, and a same-nlist retrain shifts cluster
    * boundaries WITHOUT any structural tell (the contiguous-id fail-fast
    * can't see it). Search and append verify the stamp, so mixing
    * artifacts from different builds fails loudly instead of silently
    * losing recall. */
  private[graft] def quantizerMd5(centroids: Array[Array[Float]]): String =
    quantizerMd5(centroids, Array.empty)

  /** Two-tier form for the IVFADC artifacts: the digest encodes the
    * STRUCTURE, not just the flattened row sequence — row count per tier
    * and a tier separator between the coarse centroids and each codebook.
    * A flat `centroids ++ books.flatten` hash let distinct (centroids,
    * books) pairs with the same row sequence collide (e.g. the boundary
    * shifted by one row, or the same rows regrouped under a different m),
    * which is exactly the mix the stamp exists to catch (ADVICE r15). */
  private[graft] def quantizerMd5(centroids: Array[Array[Float]],
                                  books: Array[Array[Array[Float]]]): String = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val buf = java.nio.ByteBuffer.allocate(4)
    def tier(rows: Array[Array[Float]]): Unit = {
      buf.clear(); buf.putInt(rows.length); md.update(buf.array())
      rows.foreach { c =>
        c.foreach { f => buf.clear(); buf.putFloat(f); md.update(buf.array()) }
        md.update(0x7c.toByte) // row separator: [[1,2],[3]] != [[1],[2,3]]
      }
    }
    tier(centroids)
    books.foreach { b => md.update(0x1f.toByte); tier(b) }
    md.digest().map("%02x".format(_)).mkString
  }

  /** The stamp stored on `table`'s rows (constant column — RLE-compressed
    * to ~nothing in parquet), or None for a pre-stamp artifact. */
  private[graft] def storedQuantizerMd5(index: DataFrame): Option[String] =
    if (!index.columns.contains("__quantizer_md5")) scala.None
    else index.select("__quantizer_md5").limit(1).collect()
      .headOption.map(_.getString(0))

  private[graft] def requireQuantizerMatch(index: DataFrame, centroids: Array[Array[Float]],
                                           what: String): Unit =
    requireQuantizerMatch(index, centroids, Array.empty, what)

  /** Two-tier variant for PQ-coded artifacts (centroids route, books code —
    * a retrain of EITHER corrupts the stored codes). */
  private[graft] def requireQuantizerMatch(index: DataFrame, centroids: Array[Array[Float]],
                                           books: Array[Array[Array[Float]]],
                                           what: String): Unit =
    storedQuantizerMd5(index).foreach { stored =>
      val got = quantizerMd5(centroids, books)
      require(stored == got,
        s"$what was built under a DIFFERENT quantizer (artifact $stored, " +
          s"passed $got): routing under mismatched centroids silently " +
          "misses neighbors — reload the paired saveCentroids artifact or " +
          "rebuild the index")
    }

  def saveIndex(spark: org.apache.spark.sql.SparkSession, corpus: DataFrame,
                centroids: Array[Array[Float]], table: String,
                idCol: String = "vec_id", vecCol: String = "embedding",
                buckets: Int = 8): Unit = {
    import spark.implicits._
    require(centroids.nonEmpty, "cannot build an index from an empty quantizer")
    require(buckets >= 1, s"buckets must be >= 1: $buckets")
    val bc = spark.sparkContext.broadcast(centroids)
    val stamp = quantizerMd5(centroids)
    val lists = vecs(corpus.where(col(vecCol).isNotNull), idCol, vecCol)
      .map { case (id, v) => (nearestCentroid(v, bc.value), id, v) }
      .toDF("list_id", idCol, vecCol)
      .withColumn("__quantizer_md5", lit(stamp))
    new graft.materialize.SessionCatalogWarehouse(spark).createOrReplace(
      table, lists, partitionBy = Nil, clusterBy = Nil,
      bucketBy = Seq("list_id"), buckets = buckets)
  }

  /** INCREMENTAL index maintenance — assign ONLY a new corpus batch under
    * the PINNED quantizer and append its (list_id, id, vector) rows to the
    * existing [[saveIndex]] table: the nightly-crawl shape, where
    * re-running the full assignment (let alone retraining) per ingest
    * batch would cost a corpus scan for a corpus-fraction of new rows.
    * The append preserves the bucketBy(list_id) layout (the bucket COUNT
    * is read from the existing table's catalog metadata — `buckets` is
    * only the fallback when metadata is unavailable), and
    * because a vector's list depends only on the FROZEN centroids, an
    * appended index is row-identical to a full rebuild over the combined
    * corpus — `ann_knn_join_ivf_index_append` oracle-pins exactly that
    * (routed join over 90%-built + 10%-appended ≡ exact over the full
    * corpus at nprobe = nlist). */
  def appendToIndex(spark: org.apache.spark.sql.SparkSession, newBatch: DataFrame,
                    centroids: Array[Array[Float]], table: String,
                    idCol: String = "vec_id", vecCol: String = "embedding",
                    buckets: Int = 8): Unit = {
    import spark.implicits._
    require(centroids.nonEmpty, "cannot route into an index with an empty quantizer")
    // the REAL append trap: routing the new batch under a quantizer that
    // is not the one the existing rows were assigned with quietly splits
    // lists across two geometries — verify the stamp before writing
    val existing = spark.table(table)
    requireQuantizerMatch(existing, centroids, s"index $table")
    // the layout authority is the EXISTING table's catalog metadata, not
    // the caller: an index built with a non-default bucket count would make
    // a default-parameter append fail at write time on the bucket-spec
    // mismatch even though the table records the right value (ADVICE r15).
    // The parameter survives only as the fallback for metadata-less targets.
    val nBuckets = graft.materialize.SessionCatalogWarehouse
      .backingTable(spark, table).flatMap(t =>
        org.apache.spark.sql.graft.SqlBridge.bucketCount(spark, t))
      .getOrElse(buckets)
    val bc = spark.sparkContext.broadcast(centroids)
    val stamp = quantizerMd5(centroids)
    val lists0 = vecs(newBatch.where(col(vecCol).isNotNull), idCol, vecCol)
      .map { case (id, v) => (nearestCentroid(v, bc.value), id, v) }
      .toDF("list_id", idCol, vecCol)
    // a pre-stamp artifact has no fingerprint column — append schema-compatibly
    val lists =
      if (existing.columns.contains("__quantizer_md5"))
        lists0.withColumn("__quantizer_md5", lit(stamp))
      else lists0
    new graft.materialize.SessionCatalogWarehouse(spark).append(
      table, lists, partitionBy = Nil, clusterBy = Nil,
      bucketBy = Seq("list_id"), buckets = nBuckets)
  }

  /** Load a [[saveIndex]] inverted-list table. A plain catalog read — the
    * bucketed layout rides with the table, so downstream list-keyed joins
    * stay exchange-free on this side. Fails fast on a frame that is not an
    * inverted-list artifact (missing the list_id routing column). */
  def loadIndex(spark: org.apache.spark.sql.SparkSession, table: String): DataFrame = {
    val df = spark.table(table)
    require(df.columns.contains("list_id"),
      s"$table is not an inverted-list index artifact (no list_id column): " +
        df.columns.mkString(", "))
    df
  }

  /** IVF-ROUTED BIPARTITE KNN JOIN OVER A PERSISTED INDEX — [[knnJoinIvf]]
    * with the corpus→list assignment read from a [[saveIndex]] table instead
    * of recomputed per invocation: a query batch pays only its own routing
    * plus the probed-list scoring, never the corpus assignment pass.
    *
    * The scoring stays the SAME list-keyed cogroup with primitive-array
    * kernels as [[knnJoinIvf]] — measured against the declarative
    * alternative (list_id equi-join + native cosine + bounded-heap
    * aggregate, which reads the bucketed index with zero exchange): the
    * join form paid per-row operator overhead on every scored PAIR
    * (Q·nprobe·C/nlist rows through join + aggregate machinery, 15.9 s vs
    * 3.2 s on the sf1 probe), while the cogroup shuffles only the C index
    * rows + Q·nprobe probe rows and scores each list in one tight in-memory
    * loop. Pair volume dwarfs C at any realistic config, so the cogroup
    * wins at every scale; the bucketed on-disk layout still serves the
    * stream-static join ([[graft.streaming.Streams.streamingAnnTopK]]'s
    * `prebuiltIndex`) and any SQL consumer of the list table.
    *
    * Deterministic rank (rounded cos desc, corpus id asc) — identical to
    * [[knnJoin]]; `nprobe = nlist` provably covers the corpus, so the full
    * save → load → route → score path is oracle-pinned against the exact
    * bipartite rank (`ann_knn_join_ivf_indexed`). */
  def knnJoinIvfIndexed(queries: DataFrame, index: DataFrame,
                        centroids: Array[Array[Float]], k: Int = 10,
                        nprobe: Int = 4, idCol: String = "vec_id",
                        vecCol: String = "embedding"): DataFrame = {
    val spark = queries.sparkSession
    import spark.implicits._
    require(k >= 1, s"k must be >= 1: $k")
    require(nprobe >= 1, s"nprobe must be >= 1: $nprobe")
    // mixed artifacts (an index built under a different quantizer) would
    // route queries into lists the corpus was never assigned to — fail fast
    requireQuantizerMatch(index, centroids, "the inverted-list index")
    val np = math.min(nprobe, centroids.length) // clamp to the RESOLVED artifact
    val bc = spark.sparkContext.broadcast(centroids)
    val members = index
      .select(col("list_id").cast("int"), col(idCol).cast("long"), col(vecCol))
      .as[(Int, Long, Array[Float])]
    val probes = vecs(queries.where(col(vecCol).isNotNull), idCol, vecCol)
      .flatMap { case (id, v) =>
        nearestCentroids(v, bc.value, np).iterator.map(c => (c, id, v))
      }
    // a corpus vector lives in exactly ONE list, so (q, b) pairs are unique
    // across probed lists — no cross-list dedup pass
    members.groupByKey(_._1).cogroup(probes.groupByKey(_._1)) { (_, mIt, qIt) =>
      val list = mIt.map { case (_, id, v) => (id, v, normP(v)) }.toArray
      qIt.flatMap { case (_, q, vq) =>
        val nq = normP(vq)
        val top = new TopK(k)
        var i = 0
        while (i < list.length) {
          val (b, vb, nb) = list(i)
          top.offer(b, cosineOf(vq, vb, nq, nb))
          i += 1
        }
        top.iterator.map { case (b, c) => (q, b, c) }
      }
    }.toDF("q", "b", "cos")
      .withColumn("rank", row_number().over(
        Window.partitionBy("q").orderBy(col("cos").desc, col("b"))))
      .where(col("rank") <= k)
      .select(col("q"), col("b"), col("cos"), col("rank").cast("int").as("rank"))
  }

  private[graft] def nearestCentroid(v: Array[Float], cs: Array[Array[Float]]): Int = {
    var best = 0
    var bestDot = Double.MinValue
    var c = 0
    while (c < cs.length) {
      val d = dotP(v, cs(c)) // normalized ⇒ dot = cosine
      if (d > bestDot) { bestDot = d; best = c }
      c += 1
    }
    best
  }

  /** `nprobe` nearest centroid ids for a vector, best first. */
  private[graft] def nearestCentroids(v: Array[Float], cs: Array[Array[Float]], nprobe: Int): Array[Int] =
    cs.indices.map(c => (c, dotP(v, cs(c)) / math.max(normP(v), 1e-12)))
      .sortBy(-_._2).take(nprobe).map(_._1).toArray

  /** IVF approximate top-k: every vector lands in one inverted list (its
    * nearest centroid); every query probes its `nprobe` nearest lists and
    * ranks exactly within them; one window merges per-list winners. Per-task
    * memory is one inverted list (corpus/nlist), recall is tuned by nprobe,
    * and compute drops to ~nprobe/nlist of brute force — the classic IVF
    * trade. Scale nlist ∝ √corpus to keep lists constant-sized. */
  def ivfTopK(emb: DataFrame, k: Int = 10, nlist: Int = 16, nprobe: Int = 4,
              idCol: String = "vec_id", vecCol: String = "embedding",
              iterations: Int = 5, maxTrainSample: Int = 10000,
              prebuilt: Option[Array[Array[Float]]] = scala.None): DataFrame = {
    val spark = emb.sparkSession
    import spark.implicits._
    val centroids = prebuilt.getOrElse(
      ivfCentroids(emb, nlist, idCol, vecCol, iterations, maxTrainSample))
    val bc = spark.sparkContext.broadcast(centroids)
    val base = vecs(emb, idCol, vecCol)
    // members: one list per vector
    val members = base.map { case (id, v) =>
      (nearestCentroid(v, bc.value), id, v)
    }
    // queries: replicated to their nprobe probe lists
    val queries = base.flatMap { case (id, v) =>
      nearestCentroids(v, bc.value, nprobe).iterator.map(c => (c, id, v))
    }
    members.groupByKey(_._1).cogroup(queries.groupByKey(_._1)) { (_, mIt, qIt) =>
      val list = mIt.map { case (_, id, v) => (id, v, normP(v)) }.toArray
      qIt.flatMap { case (_, a, va) =>
        val na = normP(va)
        val top = new TopK(k)
        var i = 0
        while (i < list.length) {
          val (b, vb, nb) = list(i)
          if (b != a) top.offer(b, cosineOf(va, vb, na, nb))
          i += 1
        }
        top.iterator.map { case (b, c) => (a, b, c) }
      }
    }.toDF("a", "b", "cos")
      .withColumn("rank", row_number().over(
        Window.partitionBy("a").orderBy(col("cos").desc, col("b"))))
      .where(col("rank") <= k)
  }
}

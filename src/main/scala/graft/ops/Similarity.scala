package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (Array[Float]).
  *
  * Brute-force cosine against a broadcast index is the exactness baseline —
  * the standard Spark shape for dense linear algebra (HOF folds and
  * crossJoins of array columns are orders of magnitude slower: not
  * codegen-friendly, and the join materializes every pair). The index
  * (id, vector, norm) is broadcast once; queries stream through
  * mapPartitions with primitive-array inner loops. Scales to any corpus size
  * on the query side; the index side must fit in executor memory — beyond
  * that, [[lshTopK]] buckets first (hyperplane LSH), or shard the index and
  * merge per-shard top-k.
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

  private def normP(a: Array[Float]): Double = {
    var s = 0.0
    var i = 0
    while (i < a.length) { s += a(i).toDouble * a(i).toDouble; i += 1 }
    math.sqrt(s)
  }

  /** Same rounding as Catalyst's round() (HALF_UP over the exact binary
    * expansion) so results are bit-identical to the SQL form. */
  private def round6(x: Double): Double =
    new java.math.BigDecimal(x).setScale(6, java.math.RoundingMode.HALF_UP).doubleValue

  private def collectIndex(emb: DataFrame, idCol: String, vecCol: String)
    : Array[(Long, Array[Float], Double)] = {
    val spark = emb.sparkSession
    import spark.implicits._
    emb.select(col(idCol).cast("long"), col(vecCol))
      .as[(Long, Array[Float])]
      .collect()
      .map { case (id, v) => (id, v, normP(v)) }
      .sortBy(_._1)
  }

  /** All-pairs cosine similarity (a < b), rounded for cross-engine stability. */
  def cosinePairs(emb: DataFrame, idCol: String = "vec_id",
                  vecCol: String = "embedding"): DataFrame =
    pairsAbove(emb, threshold = -2.0, idCol, vecCol)

  /** Near-duplicate vectors: cosine ≥ threshold (threshold applies to the
    * rounded similarity, matching the SQL oracle). */
  def cosineNearDup(emb: DataFrame, threshold: Double = 0.95,
                    idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame =
    pairsAbove(emb, threshold, idCol, vecCol)

  private def pairsAbove(emb: DataFrame, threshold: Double,
                         idCol: String, vecCol: String): DataFrame = {
    val spark = emb.sparkSession
    import spark.implicits._
    val index = spark.sparkContext.broadcast(collectIndex(emb, idCol, vecCol))
    val out = emb.select(col(idCol).cast("long"), col(vecCol))
      .as[(Long, Array[Float])]
      .mapPartitions { it =>
        val idx = index.value
        it.flatMap { case (a, va) =>
          val na = normP(va)
          idx.iterator
            .filter(_._1 > a) // a < b, each pair once
            .map { case (b, vb, nb) => (a, b, round6(dotP(va, vb) / (na * nb))) }
            .filter(_._3 >= threshold)
        }
      }
      .toDF("a", "b", "cos")
    out
  }

  /** Brute-force cosine top-k neighbors per vector (directed: every vector
    * gets its k nearest others). Deterministic rank: (rounded cos desc, id). */
  def cosineTopK(emb: DataFrame, k: Int = 10, idCol: String = "vec_id",
                 vecCol: String = "embedding"): DataFrame = {
    val spark = emb.sparkSession
    import spark.implicits._
    val index = spark.sparkContext.broadcast(collectIndex(emb, idCol, vecCol))
    emb.select(col(idCol).cast("long"), col(vecCol))
      .as[(Long, Array[Float])]
      .mapPartitions { it =>
        val idx = index.value
        it.flatMap { case (a, va) =>
          val na = normP(va)
          val scored = idx.collect { case (b, vb, nb) if b != a =>
            (b, round6(dotP(va, vb) / (na * nb)))
          }
          scored.sortBy { case (b, c) => (-c, b) }
            .take(k).zipWithIndex
            .map { case ((b, c), r) => (a, b, c, r + 1) }
        }
      }
      .toDF("a", "b", "cos", "rank")
  }

  /** Deterministic pseudo-random hyperplane components for (bit, dim):
    * md5-derived values in [-0.5, 0.5). Reproducible on any engine/cluster. */
  def planes(bits: Int, dims: Int): Array[Array[Double]] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    Array.tabulate(bits, dims) { (bit, i) =>
      val hex = md.digest(s"$bit-$i".getBytes("UTF-8"))
        .take(4).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex, 16).toDouble / 4294967296.0 - 0.5
    }
  }

  /** Hyperplane-LSH bucket id (`bits`-bit signature of dot-product signs).
    * The scale path: vectors land in ~2^bits buckets; search within bucket. */
  def lshBucket(emb: DataFrame, bits: Int = 8, idCol: String = "vec_id",
                vecCol: String = "embedding"): DataFrame = {
    val spark = emb.sparkSession
    import spark.implicits._
    val ps = spark.sparkContext.broadcast(planes(bits, dims = 4096))
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

  /** LSH-bucketed approximate top-k: exact cosine ranking *within* each
    * bucket. Recall < 1 by construction; bucket count trades recall/speed.
    * Per-bucket pair space ≈ (n/2^bits)² — the 100 TB path when the index
    * exceeds broadcast size. */
  def lshTopK(emb: DataFrame, k: Int = 10, bits: Int = 8,
              idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val spark = emb.sparkSession
    import spark.implicits._
    val bucketed = lshBucket(emb, bits, idCol, vecCol)
      .select(col(idCol).cast("long").as("id"), col(vecCol).as("vec"), col("bucket"))
      .as[(Long, Array[Float], Long)]
    bucketed
      .groupByKey(_._3)
      .flatMapGroups { (bucket: Long, members: Iterator[(Long, Array[Float], Long)]) =>
        val ms = members.map { case (id, v, _) => (id, v, normP(v)) }.toArray.sortBy(_._1)
        ms.iterator.flatMap { case (a, va, na) =>
          ms.collect { case (b, vb, nb) if b != a =>
            (b, round6(dotP(va, vb) / (na * nb)))
          }.sortBy { case (b, c) => (-c, b) }
            .take(k).zipWithIndex
            .map { case ((b, c), r) => (a, b, c, r + 1, bucket) }
        }
      }
      .toDF("a", "b", "cos", "rank", "bucket")
  }
}

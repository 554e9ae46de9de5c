package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (Array[Float]).
  *
  * Brute-force cosine top-k is the exactness baseline (O(n²) pairs — fine up
  * to ~10⁵ vectors per partition-block); the hyperplane-LSH variant is the
  * scale path: bucket first, search within buckets, so the pair space shrinks
  * by ~2^bits. Dot products run through the `aggregate` higher-order function
  * — sequential fold, codegen'd, no UDF.
  */
object Similarity {

  /** Σ aᵢ·bᵢ as a deterministic left-fold in double precision. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  def l2norm(a: Column): Column =
    sqrt(aggregate(transform(a, x => x.cast("double") * x.cast("double")),
      lit(0.0), (acc, v) => acc + v))

  /** All-pairs cosine similarity (a < b), rounded for cross-engine stability. */
  def cosinePairs(emb: DataFrame, idCol: String = "vec_id",
                  vecCol: String = "embedding"): DataFrame = {
    val e = emb.select(col(idCol), col(vecCol), l2norm(col(vecCol)).as("nrm"))
    val a = e.select(col(idCol).as("a"), col(vecCol).as("va"), col("nrm").as("na"))
    val b = e.select(col(idCol).as("b"), col(vecCol).as("vb"), col("nrm").as("nb"))
    a.crossJoin(b).where(col("a") < col("b"))
      .withColumn("cos", round(dot(col("va"), col("vb")) / (col("na") * col("nb")), 6))
      .select("a", "b", "cos")
  }

  /** Near-duplicate vectors: cosine ≥ threshold. */
  def cosineNearDup(emb: DataFrame, threshold: Double = 0.95,
                    idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame =
    cosinePairs(emb, idCol, vecCol).where(col("cos") >= threshold)

  /** Brute-force cosine top-k neighbors per vector (directed: every vector
    * gets its k nearest others). Deterministic rank: (rounded cos desc, id). */
  def cosineTopK(emb: DataFrame, k: Int = 10, idCol: String = "vec_id",
                 vecCol: String = "embedding"): DataFrame = {
    val e = emb.select(col(idCol), col(vecCol), l2norm(col(vecCol)).as("nrm"))
    val a = e.select(col(idCol).as("a"), col(vecCol).as("va"), col("nrm").as("na"))
    val b = e.select(col(idCol).as("b"), col(vecCol).as("vb"), col("nrm").as("nb"))
    val pairs = a.crossJoin(b).where(col("a") =!= col("b"))
      .withColumn("cos", round(dot(col("va"), col("vb")) / (col("na") * col("nb")), 6))
    pairs
      .withColumn("rank", row_number().over(
        Window.partitionBy("a").orderBy(col("cos").desc, col("b"))))
      .where(col("rank") <= k)
      .select(col("a"), col("b"), col("cos"), col("rank"))
  }

  /** Deterministic pseudo-random hyperplane component for (bit, dim):
    * md5-derived value in [-0.5, 0.5). Reproducible on any engine/cluster. */
  private def planeComponent(bit: Int, dim: Column): Column =
    (conv(substring(md5(concat_ws("-", lit(bit), dim)), 1, 8), 16, 10).cast("double")
      / lit(4294967296.0)) - 0.5

  /** Hyperplane-LSH bucket id (`bits`-bit signature of dot-product signs).
    * The scale path: vectors land in ~2^bits buckets; search within bucket. */
  def lshBucket(emb: DataFrame, bits: Int = 8, idCol: String = "vec_id",
                vecCol: String = "embedding"): DataFrame = {
    val bucket = (0 until bits).map { bit =>
      val proj = aggregate(
        transform(col(vecCol), (x, i) => x.cast("double") * planeComponent(bit, i)),
        lit(0.0), (acc, v) => acc + v)
      when(proj > 0, lit(1L << bit)).otherwise(lit(0L))
    }.reduce(_ + _)
    emb.withColumn("bucket", bucket)
  }

  /** LSH-bucketed approximate top-k: exact cosine ranking *within* each
    * bucket. Recall < 1 by construction; bucket count trades recall/speed. */
  def lshTopK(emb: DataFrame, k: Int = 10, bits: Int = 8,
              idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val bucketed = lshBucket(emb, bits, idCol, vecCol)
      .select(col(idCol), col(vecCol), col("bucket"), l2norm(col(vecCol)).as("nrm"))
    val a = bucketed.select(col("bucket"), col(idCol).as("a"), col(vecCol).as("va"), col("nrm").as("na"))
    val b = bucketed.select(col("bucket"), col(idCol).as("b"), col(vecCol).as("vb"), col("nrm").as("nb"))
    a.join(b, Seq("bucket")).where(col("a") =!= col("b"))
      .withColumn("cos", round(dot(col("va"), col("vb")) / (col("na") * col("nb")), 6))
      .withColumn("rank", row_number().over(
        Window.partitionBy("a").orderBy(col("cos").desc, col("b"))))
      .where(col("rank") <= k)
      .select(col("a"), col("b"), col("cos"), col("rank"), col("bucket"))
  }
}

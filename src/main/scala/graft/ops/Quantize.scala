package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Embedding quantization for storage/serving: per-vector int8 scalar
  * quantization (the faiss `SQ8` scheme — per-vector min/max affine map to
  * [0, 255]). A pure projection over the embedding array (array HOFs, all
  * codegen) — no shuffle, no state: each 4-byte float becomes 1 byte plus
  * two floats of per-vector header, a 4× storage cut at scan speed.
  */
object Quantize {

  private def vmin(v: Column) = array_min(v).cast("double")
  private def vmax(v: Column) = array_max(v).cast("double")

  /** Quantized codes + header. `scale` = (max-min)/255; constant vectors
    * (scale 0) quantize to all-zero codes. Codes are INT (0-255) — the
    * byte-packing is a writer concern, the math is the operator.
    *
    * The header (min/max/scale) materializes as columns in a FIRST
    * projection, and the transform lambda references those columns: an
    * inlined array_min/array_max inside the lambda would re-scan the whole
    * vector per element — O(d²) per vector, the array-HOF re-inline trap. */
  def int8(emb: DataFrame, idCol: String = "vec_id",
           vecCol: String = "embedding"): DataFrame = {
    val v = col(vecCol)
    emb.select(
      col(idCol),
      v.as("__v"),
      vmin(v).as("qmin"),
      vmax(v).as("qmax"),
      ((vmax(v) - vmin(v)) / 255.0).as("scale"))
      .select(
        col(idCol),
        col("qmin"),
        col("qmax"),
        col("scale"),
        transform(col("__v"), x =>
          when(col("scale") === 0.0, lit(0))
            .otherwise(round((x.cast("double") - col("qmin")) / col("scale"), 0).cast("int")))
          .as("codes"))
  }

  /** Round-trip summary per vector — the oracle-friendly shape: exact
    * integer code sum plus the rounded header. `qsum` pins every code
    * (an off-by-one anywhere changes the sum); header pins the affine map. */
  def int8Summary(emb: DataFrame, idCol: String = "vec_id",
                  vecCol: String = "embedding"): DataFrame =
    int8(emb, idCol, vecCol).select(
      col(idCol),
      col("qmin"),
      col("qmax"),
      round(col("scale"), 6).as("scale"),
      aggregate(col("codes"), lit(0L), (acc, c) => acc + c).as("qsum"),
      size(col("codes")).cast("long").as("dims"))

  /** L2 normalization, summarized for the oracle: the rounded norm plus the
    * element sum of the unit vector (a checksum — any per-element deviation
    * moves it). Pure array-HOF projection in double precision with a
    * deterministic left-fold, so the numbers are bit-comparable across
    * engines; zero vectors keep checksum 0 (norm 0 guard). The normalize
    * itself is the serving-side prep every cosine index assumes. */
  /** MATRYOSHKA truncation (Kusupati et al., MRL 2022): keep the first
    * `dims` components and L2-renormalize to unit length — MRL-trained
    * embeddings nest coarse representations in prefixes, so this is the
    * standard storage/compute downshift (768 → 64 bytes per vector) before
    * ANN indexing; the truncated unit vectors feed the same cosine/IVF/PQ
    * stack unchanged. Pure array-HOF projection (slice + deterministic
    * left-folds), scan speed, no shuffle. Components re-cast to float
    * AFTER the double-precision divide so the stored vector is what a
    * float index would hold. Zero-norm prefixes pass through unscaled. */
  def matryoshka(emb: DataFrame, dims: Int, idCol: String = "vec_id",
                 vecCol: String = "embedding"): DataFrame = {
    require(dims >= 1, "matryoshka needs dims >= 1")
    // NULL vectors carry no prefix to truncate — drop them (as centroidByLabel
    // does) rather than emit a null-vector row the oracle would coalesce to 0
    val pre = slice(col(vecCol), 1, dims)
    val norm = sqrt(aggregate(
      transform(pre, x => x.cast("double") * x.cast("double")),
      lit(0.0), (acc, x) => acc + x))
    emb.where(col(vecCol).isNotNull)
      .select(col(idCol), pre.as("__p"), norm.as("__n"))
      .select(col(idCol),
        when(col("__n") === 0.0, col("__p"))
          .otherwise(transform(col("__p"),
            x => (x.cast("double") / col("__n")).cast("float")))
          .as(vecCol),
        col("__n").as("prefix_norm"),
        size(col("__p")).cast("long").as("dims"))
  }

  /** Per-label embedding CENTROIDS as (label, dim, n, mean) rows — the
    * class-mean diagnostic behind semantic-drift monitors, cluster-quality
    * checks, and nearest-class-mean baselines. Elements quantize to 1e-4
    * by floor (floor on doubles is bit-identical in any engine — unlike
    * float→decimal casts, whose HALF_UP vs banker's rounding diverges on
    * boundary values) and sum as exact BIGINTs, then ONE double division —
    * so the means are bit-comparable without pinning a summation order.
    * The 1e-4 quantization is part of the operator's contract; for a
    * drift/cluster diagnostic it is far below any actionable signal.
    * Shuffle shape: the posexplode fans out rows × dims, but the aggregate
    * is map-side combinable, so only (labels × dims) partials exchange —
    * at 100 TB the wire carries the centroid table, not the vectors.
    * Emitted per-dimension rather than re-assembled into arrays: consumers
    * join on (label, dim), and the oracle compare stays scalar. */
  def centroidByLabel(emb: DataFrame, labelCol: String = "label",
                      vecCol: String = "embedding"): DataFrame =
    emb.where(col(vecCol).isNotNull)
      .select(col(labelCol).as("label"),
        posexplode(col(vecCol)).as(Seq("dim", "__v")))
      .groupBy("label", "dim")
      .agg(count(lit(1)).as("n"),
        sum(floor(col("__v").cast("double") * 10000).cast("long")).as("__s"))
      .select(col("label"), col("dim").cast("long").as("dim"), col("n"),
        round(col("__s").cast("double") / 10000.0 / col("n"), 6).as("mean"))

  /** CENTROID-DISTANCE OUTLIERS — the embedding-space mislabel/noise
    * screen: every vector's Euclidean distance to ITS OWN label's exact
    * centroid, z-scored per label, so one global |z| threshold flags
    * suspicious members across labels of different natural spread (the
    * numeric-column analogue is `check_outliers_mad`). Composition of
    * exact pieces, so the whole thing oracle-checks: centroids are
    * [[centroidByLabel]]'s quantized-sum exact means; per-term squared
    * differences route through DECIMAL(28,12) so the distance sum is
    * associative (cross-engine identical) before the one sqrt + round.
    *
    * Scale: the centroid frame is labels × dims (KBs — broadcast); the
    * corpus pays one explode + one map-side-combinable per-vector
    * aggregate; label stats are a labels-sized frame joined back
    * broadcast. No window, nothing collects. Spread-free labels (one
    * member, or all equidistant) get NULL z, never a division blow-up. */
  def centroidOutliers(emb: DataFrame, labelCol: String = "label",
                       idCol: String = "vec_id",
                       vecCol: String = "embedding"): DataFrame = {
    val cent = centroidByLabel(emb, labelCol, vecCol)
      .select(col("label"), col("dim"), col("mean"))
    val ex = emb.where(col(vecCol).isNotNull && col(labelCol).isNotNull)
      .select(col(idCol), col(labelCol).as("label"),
        posexplode(col(vecCol)).as(Seq("dim", "__v")))
      .withColumn("dim", col("dim").cast("long"))
    val diff = col("__v").cast("double") - col("mean")
    val d = ex.join(broadcast(cent), Seq("label", "dim"))
      .withColumn("__t", (diff * diff).cast("decimal(28,12)"))
      .groupBy(col(idCol), col("label"))
      .agg(round(sqrt(sum(col("__t")).cast("double")), 6).as("dist"))
    val stats = d.groupBy("label").agg(
      avg("dist").as("__mu"), stddev_samp("dist").as("__sigma"))
    d.join(broadcast(stats), Seq("label"))
      .select(col(idCol), col("label"), col("dist"),
        round(col("__mu"), 6).as("label_mean_dist"),
        when(col("__sigma") > 0,
          round((col("dist") - col("__mu")) / col("__sigma"), 6)).as("dist_z"))
  }

  def l2NormalizeSummary(emb: DataFrame, idCol: String = "vec_id",
                         vecCol: String = "embedding"): DataFrame = {
    val v = col(vecCol)
    val norm = sqrt(aggregate(
      transform(v, x => x.cast("double") * x.cast("double")),
      lit(0.0), (acc, x) => acc + x))
    emb.select(col(idCol), v.as("__v"), norm.as("__n"))
      .select(
        col(idCol),
        round(col("__n"), 6).as("l2_norm"),
        when(col("__n") === 0.0, lit(0.0))
          .otherwise(round(aggregate(
            transform(col("__v"), x => x.cast("double") / col("__n")),
            lit(0.0), (acc, x) => acc + x), 6)).as("unit_sum"),
        size(col("__v")).cast("long").as("dims"))
  }

  /** JOHNSON–LINDENSTRAUSS RANDOM PROJECTION (Achlioptas 2003 ±1 variant):
    * v′_j = (1/√dOut)·Σᵢ vᵢ·s(i,j) with the sign matrix s ∈ {±1} derived
    * from md5("i:j") first-nibble parity — DETERMINISTIC and PORTABLE, so
    * any engine (and any later session) reconstructs the identical
    * projection matrix from nothing but (i, j); the oracle replays it in
    * SQL. The cheap dimension cut in front of ANN/clustering when even
    * [[matryoshka]]'s learned prefixes aren't available: pairwise distances
    * distort by at most ~√(ln n / dOut) w.h.p. (the JL bound).
    *
    * Output is flat (id, j, p) component rows — the oracle-friendly shape
    * ([[matryoshka]]'s convention); `collect_list` over j reassembles
    * vectors when a caller wants arrays. Scale: a pure per-partition
    * projection — zero shuffle, the dIn×dOut sign table computes once per
    * partition (≤ 64k entries at any practical size) and the arithmetic is
    * primitive loops; mapPartitions because a Column form would interpret
    * a dOut×dIn HOF lambda per row. */
  def randomProjection(emb: DataFrame, dOut: Int = 16,
                       idCol: String = "vec_id",
                       vecCol: String = "embedding"): DataFrame = {
    require(dOut >= 1, s"dOut must be >= 1: $dOut")
    val spark = emb.sparkSession
    import spark.implicits._
    // empty (zero-length, non-null) vectors are excluded like NULLs — the
    // SQL oracle's unnest of an empty array yields no component rows, so
    // the id never surfaces there; emitting dOut all-zero rows for it
    // would be a latent engine/oracle mismatch (ADVICE r14)
    emb.where(col(vecCol).isNotNull && size(col(vecCol)) > 0)
      .select(col(idCol).cast("long"), col(vecCol))
      .as[(Long, Array[Float])]
      .mapPartitions { it =>
        val md = java.security.MessageDigest.getInstance("MD5")
        val signs = scala.collection.mutable.HashMap.empty[(Int, Int), Double]
        def sign(i: Int, j: Int): Double = signs.getOrElseUpdate((i, j), {
          // first hex nibble 0-7 ⇔ high bit of byte 0 clear — the exact
          // predicate the SQL oracle states as substr(md5, 1, 1) <= '7'
          if ((md.digest(s"$i:$j".getBytes("UTF-8"))(0) & 0x80) == 0) 1.0 else -1.0
        })
        val scale = 1.0 / math.sqrt(dOut.toDouble)
        it.flatMap { case (id, v) =>
          Iterator.range(0, dOut).map { j =>
            var s = 0.0
            var i = 0
            while (i < v.length) { s += v(i).toDouble * sign(i, j); i += 1 }
            (id, j, s * scale)
          }
        }
      }
      .toDF(idCol, "j", "__raw")
      .select(col(idCol), col("j"), round(col("__raw"), 6).as("p"))
  }
}

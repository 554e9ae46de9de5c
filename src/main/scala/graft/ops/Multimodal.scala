package graft.ops

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: image/audio/video as opaque `binary` columns
  * with typed metadata, plus batch decode / feature-extract stages.
  *
  * Decode is injectable ([[MediaCodec]]): [[StubCodec]] is the deterministic
  * default (the synthetic corpus isn't imagery), [[ImageIOCodec]] does real
  * JPEG/PNG decode via the JDK, and an ffmpeg-backed codec would implement
  * the same trait. The Spark-side contract is the same for all of them:
  * binary column + metadata struct in, fixed-schema feature rows out,
  * processed per-partition in batches (the Scala analogue of `mapInPandas`:
  * one iterator pass, no per-row task overhead, arrow-sized batches on a
  * cluster).
  */
object Multimodal {

  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("content", BinaryType),
    StructField("media_type", StringType),
    StructField("meta", StructType(Seq(
      StructField("source", StringType),
      StructField("declared_bytes", LongType))))))

  /** Wrap a text table into media rows (binary payload + typed metadata) —
    * the ingestion shape for opaque blobs. */
  def toMediaTable(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("media_id"),
      col("text").cast("binary").as("content"),
      lit("application/octet-stream").as("media_type"),
      struct(col("source").as("source"), col("n_chars").as("declared_bytes")).as("meta"))

  final case class MediaFeatures(
      media_id: Long, n_bytes: Long, width: Int, height: Int,
      channels: Int, content_hash: String)

  /** Batch feature extraction over partitions (mapPartitions — one JVM pass
    * per partition, like one pandas batch per partition in mapInPandas).
    * The codec is injectable ([[MediaCodec]]): [[StubCodec]] is the sandbox
    * default; [[ImageIOCodec]] decodes real JPEG/PNG via the JDK. Payloads
    * the codec can't decode fall back to the stub arithmetic so a mixed or
    * corrupt corpus degrades per-row, never per-stage. */
  def extractFeatures(media: DataFrame, codec: MediaCodec = StubCodec): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select("media_id", "content")
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        val md = java.security.MessageDigest.getInstance("MD5")
        it.map { case (id, bytes) =>
          val b = if (bytes == null) Array.emptyByteArray else bytes
          val dims = codec.decode(b).getOrElse(StubCodec.decode(b).get)
          md.reset()
          MediaFeatures(id, b.length.toLong, dims.width, dims.height,
            dims.channels, md.digest(b).map("%02x".format(_)).mkString)
        }
      }
      .toDF()
  }

  /** 60-bit PERCEPTUAL-STYLE content signature over the binary payload —
    * the media face of [[graft.ops.Dedup.hammingPairs]]: near-identical
    * payloads (re-encodes, small edits) land within a few bit flips, so
    * banded hamming join finds them without pairwise byte comparison (the
    * image-dedup recipe of the large crawl-curation pipelines).
    *
    * Signature: the payload splits into `bits` equal byte regions; bit i
    * is set iff region i's mean byte value exceeds the payload's overall
    * mean — localized edits flip only their region's bits, and the
    * mean-relative quantization is robust to global shifts (brightness /
    * re-encoding analogues). Like [[StubCodec]] this is the deterministic
    * stand-in for a real DCT pHash (the image libs this container lacks);
    * the banding, join, and verify machinery is the real, tested part and
    * is hash-function-agnostic. One zero-shuffle JVM pass, same batch shape
    * as [[extractFeatures]]. Empty/NULL payloads emit no row. */
  def perceptualHash(media: DataFrame, bits: Int = 60): DataFrame = {
    require(bits >= 1 && bits <= 60, s"bits must be in [1, 60]: $bits")
    val spark = media.sparkSession
    import spark.implicits._
    media.select("media_id", "content")
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.flatMap { case (id, bytes) =>
          if (bytes == null || bytes.isEmpty) Iterator.empty
          else {
            var total = 0L
            var i = 0
            while (i < bytes.length) { total += (bytes(i) & 0xff); i += 1 }
            val overall = total.toDouble / bytes.length
            var sig = 0L
            var b = 0
            while (b < bits) {
              val lo = (b.toLong * bytes.length / bits).toInt
              val hi = ((b + 1).toLong * bytes.length / bits).toInt
              if (hi > lo) {
                var s = 0L
                var j = lo
                while (j < hi) { s += (bytes(j) & 0xff); j += 1 }
                if (s.toDouble / (hi - lo) > overall) sig |= (1L << b)
              }
              b += 1
            }
            Iterator((id, sig))
          }
        }
      }
      .toDF("media_id", "phash")
  }

  /** 63-bit DCT PERCEPTUAL HASH (the classic pHash recipe): decode to a
    * `grid`×`grid` luma plane through the injectable codec, 2-D DCT-II
    * (separable, precomputed cosine tables — one O(grid³) pass per image),
    * keep the top-left 8×8 low-frequency block minus the DC term, and set
    * bit i iff coefficient i exceeds the block's median. Low-frequency
    * structure survives re-encode/resize/brightness shifts, so true
    * near-duplicate IMAGES land within a few bit flips even when their
    * byte streams share nothing — the regime the byte-region signature
    * ([[perceptualHash]]) structurally misses (any re-encode scrambles
    * bytes). Pair generation is the same banded hamming join
    * ([[graft.ops.Dedup.hammingPairs]], `sigBits = 63`).
    *
    * Codec contract: `codec.lumaGrid` first, [[StubCodec]]'s deterministic
    * byte-region grid as the per-row fallback — an undecodable or mixed
    * corpus degrades per-row, never per-stage, and the DCT math is real
    * either way. Empty/NULL payloads emit no row. One zero-shuffle JVM
    * pass, same batch shape as [[extractFeatures]]. */
  def perceptualHashDct(media: DataFrame, codec: MediaCodec = ImageIOCodec,
                        grid: Int = 32): DataFrame = {
    require(grid >= 8, s"grid must be >= 8 (the 8x8 DCT block): $grid")
    val spark = media.sparkSession
    import spark.implicits._
    media.select("media_id", "content")
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        // cos table shared across the partition: ct(u)(x) = cos((2x+1)uπ/2N)
        val ct = Array.tabulate(grid, grid)((u, x) =>
          math.cos((2 * x + 1) * u * math.Pi / (2.0 * grid)))
        it.flatMap { case (id, bytes) =>
          codec.lumaGrid(bytes, grid).orElse(StubCodec.lumaGrid(bytes, grid)) match {
            case Some(pix) => Iterator((id, dctSignature(pix, grid, ct)))
            case scala.None => Iterator.empty
          }
        }
      }
      .toDF("media_id", "phash")
  }

  /** Separable 2-D DCT-II of the luma plane, thresholded to the 63-bit
    * signature: rows first (only the 8 output columns any kept coefficient
    * needs), then columns — O(grid²·8 + grid·8·8) multiplies instead of
    * the naive grid⁴. */
  private def dctSignature(pix: Array[Double], grid: Int,
                           ct: Array[Array[Double]]): Long = {
    // rows: r(y)(v) = Σ_x pix(y, x) · cos-term, for v < 8
    val rows = Array.ofDim[Double](grid, 8)
    var y = 0
    while (y < grid) {
      var v = 0
      while (v < 8) {
        var s = 0.0
        var x = 0
        while (x < grid) { s += pix(y * grid + x) * ct(v)(x); x += 1 }
        rows(y)(v) = s
        v += 1
      }
      y += 1
    }
    // columns: c(u)(v) = Σ_y rows(y)(v) · cos-term, for u < 8. The DCT
    // normalization constants (α(u)·α(v), fixed positive per coefficient)
    // are dropped: every image is scaled identically, so near-identical
    // planes still yield near-identical coefficient vectors and the hash
    // stays self-consistent — nothing ever reconstructs pixels from it
    val coef = new Array[Double](63)
    var k = 0
    var u = 0
    while (u < 8) {
      var v = 0
      while (v < 8) {
        if (u != 0 || v != 0) {
          var s = 0.0
          var yy = 0
          while (yy < grid) { s += rows(yy)(v) * ct(u)(yy); yy += 1 }
          coef(k) = s
          k += 1
        }
        v += 1
      }
      u += 1
    }
    val sorted = coef.clone()
    java.util.Arrays.sort(sorted)
    val median = sorted(31) // lower median of 63
    var sig = 0L
    var i = 0
    while (i < 63) {
      if (coef(i) > median) sig |= (1L << i)
      i += 1
    }
    sig
  }

  /** Pure-SQL feature projection with the same stub arithmetic — used by the
    * DuckDB oracle path to pin the plumbing end-to-end. */
  def extractFeaturesSql(media: DataFrame): DataFrame =
    media.select(
      col("media_id"),
      octet_length(col("content")).cast("long").as("n_bytes"),
      (lit(1) + octet_length(col("content")).cast("long") % 1024).cast("int").as("width"),
      (lit(1) + (octet_length(col("content")).cast("long") * 7) % 768).cast("int").as("height"),
      lit(3).as("channels"),
      md5(col("content")).as("content_hash"))

  final case class ResizedMedia(
      media_id: Long, out_width: Int, out_height: Int,
      n_bytes_in: Long, n_bytes_out: Long, resized_hash: String)

  /** Batched resize through the injectable codec. [[StubCodec]] stride-
    * downsamples so the output byte count tracks the target dimensions;
    * [[ImageIOCodec]] does a real bilinear scale + PNG re-encode. The
    * per-partition iterator pass is the mapInPandas contract: one batch
    * walk, fixed output schema, no per-row task overhead. */
  def resize(media: DataFrame, targetWidth: Int = 256, targetHeight: Int = 192,
             codec: MediaCodec = StubCodec): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select("media_id", "content")
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        val md = java.security.MessageDigest.getInstance("MD5")
        it.map { case (id, bytes) =>
          val b = if (bytes == null) Array.emptyByteArray else bytes
          val out = codec.resize(b, targetWidth, targetHeight)
            .getOrElse(StubCodec.resize(b, targetWidth, targetHeight).get)
          md.reset()
          ResizedMedia(id, targetWidth, targetHeight, b.length.toLong, out.length.toLong,
            md.digest(out).map("%02x".format(_)).mkString)
        }
      }
      .toDF()
  }

  /** Deterministic frame-sampling plan for timed media: pick `every`-th chunk
    * boundary from the payload — stands in for video frame sampling, produces
    * (media_id, frame_no, offset) rows via a generator, not a driver loop. */
  def sampleFrames(media: DataFrame, chunk: Int = 4096, every: Int = 10): DataFrame =
    media
      .withColumn("n_chunks",
        greatest(lit(1L), ceil(octet_length(col("content")).cast("double") / chunk).cast("long")))
      .select(col("media_id"),
        explode(sequence(lit(0L), col("n_chunks") - 1, lit(every.toLong))).as("frame_no"))
      .withColumn("byte_offset", col("frame_no") * chunk)
}

package graft.ops

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: image/audio/video as opaque `binary` columns
  * with typed metadata, plus batch decode / feature-extract stages.
  *
  * The real decode libs (libjpeg/ffmpeg) are not in this container, so the
  * decoder is a clearly-marked deterministic STUB — but the Spark-side
  * contract is real: binary column + metadata struct in, fixed-schema feature
  * rows out, processed per-partition in batches (the Scala analogue of
  * `mapInPandas`: one iterator pass, no per-row task overhead, arrow-sized
  * batches on a cluster).
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

  /** STUB decoder: deterministic fake dimensions derived from the payload.
    * Replace `decodeStub` with a real codec behind the same signature. */
  private def decodeStub(id: Long, bytes: Array[Byte]): MediaFeatures = {
    val n = if (bytes == null) 0L else bytes.length.toLong
    // ??? real implementation: ImageIO/ffmpeg decode of `bytes`
    val width = (1 + n % 1024).toInt
    val height = (1 + (n * 7) % 768).toInt
    val md = java.security.MessageDigest.getInstance("MD5")
    val hash = md.digest(if (bytes == null) Array.emptyByteArray else bytes)
      .map("%02x".format(_)).mkString
    MediaFeatures(id, n, width, height, channels = 3, content_hash = hash)
  }

  /** Batch feature extraction over partitions (mapPartitions — one JVM pass
    * per partition, like one pandas batch per partition in mapInPandas). */
  def extractFeatures(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select("media_id", "content")
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) => decodeStub(id, bytes) })
      .toDF()
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

  /** STUB resize: downsample the payload by a deterministic stride so the
    * output byte count tracks the target dimensions (a real implementation
    * swaps the stride loop for a codec scale — same signature, same batch
    * shape). The per-partition iterator pass is the mapInPandas contract:
    * one batch walk, fixed output schema, no per-row task overhead. */
  def resize(media: DataFrame, targetWidth: Int = 256, targetHeight: Int = 192): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    val target = targetWidth.toLong * targetHeight
    media.select("media_id", "content")
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        val md = java.security.MessageDigest.getInstance("MD5")
        it.map { case (id, bytes) =>
          val b = if (bytes == null) Array.emptyByteArray else bytes
          // ??? real implementation: decode → scale(targetWidth, targetHeight)
          val stride = math.max(1L, b.length.toLong / math.max(1L, target))
          val outLen = if (b.isEmpty) 0 else ((b.length - 1) / stride + 1).toInt
          val out = new Array[Byte](outLen)
          var i = 0
          while (i < outLen) { out(i) = b((i * stride).toInt); i += 1 }
          md.reset()
          ResizedMedia(id, targetWidth, targetHeight, b.length.toLong, outLen.toLong,
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

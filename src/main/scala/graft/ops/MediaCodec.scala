package graft.ops

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

/** Injectable media codec behind the multimodal operators (round-4 verdict
  * task #5): the Spark-side plumbing (binary columns, per-partition batch
  * decode, fixed output schema) is identical whichever codec is plugged in;
  * only the byte-level decode differs.
  *
  *  - [[StubCodec]] — the deterministic fake used when no real codec fits
  *    the payload (or the sandbox lacks one). Oracle-pinned end-to-end.
  *  - [[ImageIOCodec]] — real JPEG/PNG/GIF/BMP decode via `javax.imageio`,
  *    which ships in the JDK (no external jar). Drop-in for image columns;
  *    an ffmpeg-backed codec for video would implement the same trait.
  *
  * Implementations must be Serializable: they ride inside `mapPartitions`
  * closures to the executors.
  */
trait MediaCodec extends Serializable {

  /** Decode dimensions/channels, or None when the payload isn't decodable
    * by this codec (callers fall back to the stub arithmetic so a mixed or
    * corrupt corpus never fails the whole stage). */
  def decode(bytes: Array[Byte]): Option[MediaCodec.Dims]

  /** Re-encode `bytes` scaled to `w`×`h`, or None when not decodable. */
  def resize(bytes: Array[Byte], w: Int, h: Int): Option[Array[Byte]]

  /** `size`×`size` row-major grayscale (luma) grid in [0, 255] — the DCT
    * pHash input plane — or None when the payload isn't decodable by this
    * codec. Empty/NULL payloads are None for every codec (no pixels ⇒ no
    * signature row). */
  def lumaGrid(bytes: Array[Byte], size: Int): Option[Array[Double]]
}

object MediaCodec {
  final case class Dims(width: Int, height: Int, channels: Int)

  /** Registry keyed by name so a pipeline parameter (`media_codec: imageio`)
    * or env selects the codec without code changes. */
  def forName(name: String): MediaCodec = name.trim.toLowerCase match {
    case "" | "stub" => StubCodec
    case "imageio"   => ImageIOCodec
    case other => throw new IllegalArgumentException(
      s"unknown media codec '$other' (have: stub, imageio)")
  }
}

/** Deterministic fake: dimensions derived from payload length. Never fails,
  * never inspects content — the honest sandbox default. */
object StubCodec extends MediaCodec {
  override def decode(bytes: Array[Byte]): Option[MediaCodec.Dims] = {
    val n = if (bytes == null) 0L else bytes.length.toLong
    Some(MediaCodec.Dims((1 + n % 1024).toInt, (1 + (n * 7) % 768).toInt, 3))
  }

  /** Stride-downsample so output size tracks the target dims. */
  override def resize(bytes: Array[Byte], w: Int, h: Int): Option[Array[Byte]] = {
    val b = if (bytes == null) Array.emptyByteArray else bytes
    val target = w.toLong * h
    val stride = math.max(1L, b.length.toLong / math.max(1L, target))
    val outLen = if (b.isEmpty) 0 else ((b.length - 1) / stride + 1).toInt
    val out = new Array[Byte](outLen)
    var i = 0
    while (i < outLen) { out(i) = b((i * stride).toInt); i += 1 }
    Some(out)
  }

  /** Deterministic grid from raw bytes: cell k = mean byte value of the
    * k-th of size² equal payload regions (the 2-D generalization of the
    * region signature) — locality-preserving, so localized payload edits
    * perturb only nearby cells and the DCT pHash stays meaningful on
    * non-image blobs. */
  override def lumaGrid(bytes: Array[Byte], size: Int): Option[Array[Double]] = {
    if (bytes == null || bytes.isEmpty) scala.None
    else {
      val cells = size * size
      val out = new Array[Double](cells)
      var k = 0
      while (k < cells) {
        val lo = (k.toLong * bytes.length / cells).toInt
        val hi = math.max(lo + 1, ((k + 1).toLong * bytes.length / cells).toInt)
          .min(bytes.length)
        var s = 0L
        var j = lo
        while (j < hi) { s += (bytes(j) & 0xff); j += 1 }
        out(k) = if (hi > lo) s.toDouble / (hi - lo) else 0.0
        k += 1
      }
      Some(out)
    }
  }
}

/** Real image decode via the JDK's ImageIO — JPEG/PNG/GIF/BMP with zero
  * external dependencies. Returns None on non-image payloads. */
object ImageIOCodec extends MediaCodec {

  override def decode(bytes: Array[Byte]): Option[MediaCodec.Dims] =
    read(bytes).map(img =>
      MediaCodec.Dims(img.getWidth, img.getHeight, img.getColorModel.getNumComponents))

  override def resize(bytes: Array[Byte], w: Int, h: Int): Option[Array[Byte]] =
    read(bytes).map { img =>
      val scaled = new BufferedImage(w, h,
        if (img.getColorModel.hasAlpha) BufferedImage.TYPE_INT_ARGB
        else BufferedImage.TYPE_INT_RGB)
      val g = scaled.createGraphics()
      try {
        g.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
          java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
        g.drawImage(img, 0, 0, w, h, null)
      } finally g.dispose()
      val out = new ByteArrayOutputStream()
      javax.imageio.ImageIO.write(scaled, "png", out)
      out.toByteArray
    }

  /** Real decode → bilinear scale to `size`×`size` → BT.601 luma. */
  override def lumaGrid(bytes: Array[Byte], size: Int): Option[Array[Double]] =
    read(bytes).map { img =>
      val scaled = new BufferedImage(size, size, BufferedImage.TYPE_INT_RGB)
      val g = scaled.createGraphics()
      try {
        g.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
          java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
        g.drawImage(img, 0, 0, size, size, null)
      } finally g.dispose()
      val out = new Array[Double](size * size)
      var y = 0
      while (y < size) {
        var x = 0
        while (x < size) {
          val rgb = scaled.getRGB(x, y)
          out(y * size + x) = 0.299 * ((rgb >> 16) & 0xff) +
            0.587 * ((rgb >> 8) & 0xff) + 0.114 * (rgb & 0xff)
          x += 1
        }
        y += 1
      }
      out
    }

  // in-memory sources only — the default disk-backed stream cache writes a
  // temp FILE per read, a per-row cost that dwarfs the decode on small blobs
  javax.imageio.ImageIO.setUseCache(false)

  /** Magic-number gate for the formats the JDK can actually decode
    * (JPEG/PNG/GIF/BMP/TIFF/WBMP). Anything else returns None WITHOUT
    * touching ImageIO: reader scanning + stream setup per row is the
    * dominant cost on a mixed or non-image corpus, and a blob that fails
    * the sniff could never decode anyway. */
  private def looksLikeImage(b: Array[Byte]): Boolean =
    b.length >= 4 && {
      val (a0, a1, a2, a3) = (b(0) & 0xff, b(1) & 0xff, b(2) & 0xff, b(3) & 0xff)
      (a0 == 0xff && a1 == 0xd8 && a2 == 0xff) || // JPEG
        (a0 == 0x89 && a1 == 0x50 && a2 == 0x4e && a3 == 0x47) || // PNG
        (a0 == 0x47 && a1 == 0x49 && a2 == 0x46 && a3 == 0x38) || // GIF
        (a0 == 0x42 && a1 == 0x4d) || // BMP
        (a0 == 0x49 && a1 == 0x49 && a2 == 0x2a && a3 == 0x00) || // TIFF LE
        (a0 == 0x4d && a1 == 0x4d && a2 == 0x00 && a3 == 0x2a) // TIFF BE
    }

  private def read(bytes: Array[Byte]): Option[BufferedImage] =
    if (bytes == null || bytes.isEmpty || !looksLikeImage(bytes)) scala.None
    else
      try Option(javax.imageio.ImageIO.read(new ByteArrayInputStream(bytes)))
      catch { case _: Exception => scala.None }
}

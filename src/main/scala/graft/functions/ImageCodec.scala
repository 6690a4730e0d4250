package graft.functions

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import javax.imageio.ImageIO

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._

/** Real image codec expressions for the multimodal column family
  * (SURVEY §2.8 E4): synthesize a deterministic grayscale PNG from an
  * integer seed, and decode any PNG/BMP back into pixel statistics —
  * both on the JDK's built-in `javax.imageio` (no external codec
  * dependencies).
  *
  * Together they give the E4 pipeline a REAL encode→decode round-trip
  * to verify: the synthesized pixels are pure integer arithmetic the
  * DuckDB oracle replays exactly, so if the PNG encoder or decoder
  * corrupted anything the decoded stats would diverge from the
  * oracle's formula-computed truth (same trick as the CSV round-trip
  * query: the oracle never sees the PNG bytes).
  *
  * Both are CodegenFallback: the body is a codec call into ImageIO,
  * not arithmetic worth inlining into generated code. Still per-row,
  * shuffle-free, and parallel across partitions — the plan shape is
  * identical to any scalar expression.
  */
object ImageCodec {
  /** Modulus shared with [[graft.ext.MinHash.P]]-style arithmetic:
    * keeps every product below 2^62 (seed < 2^32, mixed constant < P
    * < 2^30), so the identical expressions run overflow-free as
    * DuckDB BIGINTs.
    */
  val P: Long = 1000000007L

  /** LCG-style mix constants (Knuth multiplicative + Numerical
    * Recipes increment); interpolated into the oracle SQL from here
    * so the engines cannot drift.
    */
  val MixA: Long = 2654435761L
  val MixB: Long = 1013904223L

  /** Pixel value at flat index i for a given seed — row-major, in
    * [0, 256). The DuckDB oracle interpolates this exact formula.
    */
  def pixel(seed: Long, i: Long): Int = {
    val mix = ((i + 1L) * MixA + MixB) % P
    ((seed * mix) % P % 256L).toInt
  }

  // ImageIO's default stream cache is a temp FILE per encode/decode —
  // per-row disk churn. Memory cache only.
  ImageIO.setUseCache(false)

  def encodeGrayPng(seed: Long, width: Int, height: Int): Array[Byte] = {
    val img = new BufferedImage(width, height, BufferedImage.TYPE_BYTE_GRAY)
    val raster = img.getRaster
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) {
        raster.setSample(x, y, 0, pixel(seed, y.toLong * width + x))
        x += 1
      }
      y += 1
    }
    val out = new ByteArrayOutputStream(256)
    ImageIO.write(img, "png", out)
    out.toByteArray
  }

  /** Decode → nearest-neighbor resample → re-encode. The resample is
    * an explicitly-specified integer gather — out(x, y) = in(x·srcW
    * ÷ outW, y·srcH ÷ outH), floor division — rather than AWT's
    * scaling filters, whose sample-alignment rounding is
    * implementation-defined and would not be oracle-replayable. Both
    * codec ends are REAL ImageIO round-trips, so the chain
    * decode→resize→encode→decode exercises the full per-row
    * multimodal path. Null for undecodable payloads.
    */
  def resizeNearest(bytes: Array[Byte], outW: Int, outH: Int): Array[Byte] =
    try {
      val img = ImageIO.read(new ByteArrayInputStream(bytes))
      if (img == null) null
      else {
        val src = img.getRaster
        val out = new BufferedImage(outW, outH, BufferedImage.TYPE_BYTE_GRAY)
        val dst = out.getRaster
        var y = 0
        while (y < outH) {
          var x = 0
          while (x < outW) {
            dst.setSample(x, y, 0,
              src.getSample(x * img.getWidth / outW, y * img.getHeight / outH, 0))
            x += 1
          }
          y += 1
        }
        val bos = new ByteArrayOutputStream(256)
        ImageIO.write(out, "png", bos)
        bos.toByteArray
      }
    } catch { case scala.util.control.NonFatal(_) => null }

  /** Decode → 8×8 nearest-neighbor gather → 64-bit AVERAGE HASH
    * (aHash): bit j is set iff the gathered pixel at (j%8, j/8)
    * is strictly above the integer mean of the 64 gathered pixels.
    * Every step is exact integer arithmetic on top of a real ImageIO
    * decode — gather index x·srcW÷8 (floor), mean = sum÷64 (floor),
    * strict > — so an engine with no codec can replay the hash from
    * the pixel formula alone. The standard perceptual-dedup
    * fingerprint: identical assets hash equal regardless of encoder
    * byte layout, and near-identical smooth images land within a few
    * bits. Null for undecodable payloads.
    */
  def aHash64(bytes: Array[Byte]): Any =
    try {
      val img = ImageIO.read(new ByteArrayInputStream(bytes))
      if (img == null) null
      else {
        val src = img.getRaster
        val w = img.getWidth
        val h = img.getHeight
        val g = new Array[Long](64)
        var sum = 0L
        var j = 0
        while (j < 64) {
          val v = src.getSample((j % 8) * w / 8, (j / 8) * h / 8, 0).toLong
          g(j) = v
          sum += v
          j += 1
        }
        val mean = sum / 64L
        var bits = 0L
        j = 0
        while (j < 64) {
          if (g(j) > mean) bits |= (1L << j)
          j += 1
        }
        bits
      }
    } catch { case scala.util.control.NonFatal(_) => null }

  /** Decode + band-0 pixel stats; null for undecodable payloads. */
  def decodeStats(bytes: Array[Byte]): InternalRow =
    try {
      val img = ImageIO.read(new ByteArrayInputStream(bytes))
      if (img == null) null
      else {
        val raster = img.getRaster
        val w = img.getWidth
        val h = img.getHeight
        var sum = 0L
        var min = Long.MaxValue
        var max = Long.MinValue
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val v = raster.getSample(x, y, 0).toLong
            sum += v
            if (v < min) min = v
            if (v > max) max = v
            x += 1
          }
          y += 1
        }
        new GenericInternalRow(Array[Any](w.toLong, h.toLong, sum, min, max))
      }
    } catch { case scala.util.control.NonFatal(_) => null }
}

/** binary PNG payload (deterministic width×height grayscale image)
  * from a bigint seed. Pixel (x, y) = [[ImageCodec.pixel]](seed,
  * y·width + x) — integer arithmetic an engine without codecs can
  * replay, which is what makes the decode side oracle-verifiable.
  */
case class SynthGrayPng(child: Expression, imgWidth: Int, imgHeight: Int)
    extends UnaryExpression with CodegenFallback {
  require(imgWidth > 0 && imgHeight > 0)

  override def prettyName: String = "graft_synth_gray_png"
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires bigint seed, got ${other.simpleString}")
  }

  override protected def nullSafeEval(input: Any): Any =
    ImageCodec.encodeGrayPng(input.asInstanceOf[Long], imgWidth, imgHeight)

  override protected def withNewChildInternal(newChild: Expression): SynthGrayPng =
    copy(child = newChild)
}

/** Image RESIZE as a binary→binary column transform: real decode,
  * exactly-specified nearest-neighbor resample, real re-encode
  * ([[ImageCodec.resizeNearest]]). The thumbnail/downsample step of a
  * multimodal ingest pipeline, per-row and shuffle-free; composes
  * with [[DecodeImageStats]] so the oracle can verify the resampled
  * pixels through a second full codec round-trip.
  */
case class ResizeGrayPng(child: Expression, outWidth: Int, outHeight: Int)
    extends UnaryExpression with CodegenFallback {
  require(outWidth > 0 && outHeight > 0)

  override def prettyName: String = "graft_resize_gray_png"
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires binary, got ${other.simpleString}")
  }

  override protected def nullSafeEval(input: Any): Any =
    ImageCodec.resizeNearest(input.asInstanceOf[Array[Byte]], outWidth, outHeight)

  override protected def withNewChildInternal(newChild: Expression): ResizeGrayPng =
    copy(child = newChild)
}

/** Decode an image payload (any ImageIO-supported format — PNG and
  * BMP ship with the JDK) and emit band-0 pixel statistics as a
  * struct. Undecodable bytes → null, the coerce-don't-crash contract
  * a 100 TB multimodal scrub needs (P2's `try_cast` for blobs).
  */
case class DecodeImageStats(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def prettyName: String = "graft_decode_image_stats"
  override def nullable: Boolean = true
  override def dataType: DataType = StructType(Seq(
    StructField("img_w", LongType),
    StructField("img_h", LongType),
    StructField("px_sum", LongType),
    StructField("px_min", LongType),
    StructField("px_max", LongType)))

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires binary, got ${other.simpleString}")
  }

  override protected def nullSafeEval(input: Any): Any =
    ImageCodec.decodeStats(input.asInstanceOf[Array[Byte]])

  override protected def withNewChildInternal(newChild: Expression): DecodeImageStats =
    copy(child = newChild)
}

/** Perceptual fingerprint of an image payload: real decode → 8×8
  * integer gather → 64-bit average hash ([[ImageCodec.aHash64]]).
  * The image-dedup analogue of SimHash: equality catches re-encoded
  * copies, small hamming distance catches near-identical smooth
  * images. Per-row, shuffle-free; undecodable bytes → null.
  */
case class GrayPngAHash(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def prettyName: String = "graft_ahash64"
  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires binary, got ${other.simpleString}")
  }

  override protected def nullSafeEval(input: Any): Any =
    ImageCodec.aHash64(input.asInstanceOf[Array[Byte]])

  override protected def withNewChildInternal(newChild: Expression): GrayPngAHash =
    copy(child = newChild)
}

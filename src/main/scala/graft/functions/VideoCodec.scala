package graft.functions

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import javax.imageio.{IIOImage, ImageIO}
import javax.imageio.stream.{MemoryCacheImageInputStream, MemoryCacheImageOutputStream}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._

/** "Video" codec expressions for the multimodal column family
  * (SURVEY §2.8 E4, frame-sequence path): synthesize a deterministic
  * multi-frame animated GIF from an integer seed, and decode +
  * FRAME-SAMPLE it back — the brief's decode/frame-sample operation
  * on a real container format the JDK ships a reader and writer for
  * (`javax.imageio` GIF support). A true video codec (H.264 etc.) is
  * not in the JDK; an animated GIF is the honest JDK-native stand-in:
  * a seekable multi-frame container with per-frame decode.
  *
  * Oracle trick as with [[ImageCodec]]/[[AudioCodec]]: frame f's
  * pixel i is pure integer arithmetic ([[VideoCodec.pixel]]), so the
  * DuckDB oracle replays the sampled frame's stats without ever
  * seeing the GIF bytes; a corrupted encoder, decoder, or
  * frame-indexing step diverges the hash.
  *
  * CodegenFallback: codec calls, not expression arithmetic. Per-row,
  * shuffle-free, parallel across partitions.
  */
object VideoCodec {
  /** Frame f's pixel at flat index i: the image formula with a
    * frame-shifted seed, in [0, 256). Interpolated into the oracle.
    */
  def pixel(seed: Long, frame: Int, i: Long): Int =
    ImageCodec.pixel(seed + frame, i)

  ImageIO.setUseCache(false)

  /** Per-thread writer + write param, built once and reused across
    * rows (ImageWriter instances are not thread-safe; one per
    * executor thread, reset via setOutput per payload). The param
    * disables PROGRESSIVE mode — GIF's interlace — because the JDK
    * pipeline scrambles/drops rows of interlaced SMALL-height frames
    * on read-back (observed at 4×4; 8×6 survived). The param route
    * costs nothing per row; the equivalent interlaceFlag=FALSE frame
    * METADATA route measured 0.96 s → ~5 s on the e4 bench (the
    * explicit-metadata write path in the JDK GIF writer is ~5×
    * slower per frame).
    */
  private val threadWriter =
    new ThreadLocal[(javax.imageio.ImageWriter, javax.imageio.ImageWriteParam)] {
      override def initialValue(): (javax.imageio.ImageWriter, javax.imageio.ImageWriteParam) = {
        val writer = ImageIO.getImageWritersByFormatName("gif").next()
        val param = writer.getDefaultWriteParam
        param.setProgressiveMode(javax.imageio.ImageWriteParam.MODE_DISABLED)
        (writer, param)
      }
    }

  def encodeGifAnim(seed: Long, width: Int, height: Int, nFrames: Int): Array[Byte] = {
    val bos = new ByteArrayOutputStream(1024)
    val ios = new MemoryCacheImageOutputStream(bos)
    val (writer, param) = threadWriter.get()
    writer.setOutput(ios)
    writer.prepareWriteSequence(null)
    var f = 0
    while (f < nFrames) {
      val img = new BufferedImage(width, height, BufferedImage.TYPE_BYTE_GRAY)
      val raster = img.getRaster
      var y = 0
      while (y < height) {
        var x = 0
        while (x < width) {
          raster.setSample(x, y, 0, pixel(seed, f, y.toLong * width + x))
          x += 1
        }
        y += 1
      }
      writer.writeToSequence(new IIOImage(img, null, null), param)
      f += 1
    }
    writer.endWriteSequence()
    ios.flush()
    bos.toByteArray
  }

  /** Decode, count frames, and FRAME-SAMPLE the middle frame
    * (index n/2) → (n_frames, frame_idx, px_sum, px_min, px_max);
    * null for undecodable payloads.
    */
  def frameSampleStats(bytes: Array[Byte]): InternalRow =
    try {
      val reader = ImageIO.getImageReadersByFormatName("gif").next()
      try {
        reader.setInput(new MemoryCacheImageInputStream(new ByteArrayInputStream(bytes)))
        val n = reader.getNumImages(true)
        if (n <= 0) null
        else {
          val mid = n / 2
          val img = reader.read(mid)
          val w = img.getWidth
          val h = img.getHeight
          var sum = 0L
          var min = Long.MaxValue
          var max = Long.MinValue
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              // getRGB applies the frame's COLOR PALETTE — GIF frames
              // decode as indexed rasters whose raw samples are
              // palette indices, not gray values (the writer may emit
              // a frame-local palette of only the colors used)
              val v = (img.getRGB(x, y) & 0xFF).toLong
              sum += v
              if (v < min) min = v
              if (v > max) max = v
              x += 1
            }
            y += 1
          }
          new GenericInternalRow(Array[Any](n.toLong, mid.toLong, sum, min, max))
        }
      } finally reader.dispose()
    } catch { case scala.util.control.NonFatal(_) => null }

  /** Scene-change detection over a decoded frame sequence: frame f
    * (f ≥ 1) is a CUT when Σ_i |p_f[i] − p_{f−1}[i]| > `threshold` —
    * the classic pixel-difference shot-boundary test, kept entirely
    * in BIGINT so the oracle's arithmetic replay is exact. Returns
    * the cut frame indexes (ascending); null for undecodable
    * payloads.
    */
  def sceneCutIndexes(bytes: Array[Byte], threshold: Long): Any =
    try {
      val reader = ImageIO.getImageReadersByFormatName("gif").next()
      try {
        reader.setInput(new MemoryCacheImageInputStream(new ByteArrayInputStream(bytes)))
        val n = reader.getNumImages(true)
        if (n <= 0) null
        else {
          var prev: Array[Long] = null
          val cuts = scala.collection.mutable.ArrayBuffer.empty[Any]
          var f = 0
          while (f < n) {
            val img = reader.read(f)
            val w = img.getWidth
            val h = img.getHeight
            val cur = new Array[Long](w * h)
            var y = 0
            while (y < h) {
              var x = 0
              while (x < w) {
                cur(y * w + x) = (img.getRGB(x, y) & 0xFF).toLong
                x += 1
              }
              y += 1
            }
            if (prev != null && prev.length == cur.length) {
              var d = 0L
              var i = 0
              while (i < cur.length) {
                d += math.abs(cur(i) - prev(i)); i += 1
              }
              if (d > threshold) cuts += f.toLong
            }
            prev = cur
            f += 1
          }
          org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(cuts.toArray)
        }
      } finally reader.dispose()
    } catch { case scala.util.control.NonFatal(_) => null }
}

/** binary animated-GIF payload (nFrames deterministic grayscale
  * frames) from a bigint seed.
  */
case class SynthGifAnim(child: Expression, imgWidth: Int, imgHeight: Int, nFrames: Int)
    extends UnaryExpression with CodegenFallback {
  require(imgWidth > 0 && imgHeight > 0 && nFrames > 0)

  override def prettyName: String = "graft_synth_gif_anim"
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires bigint seed, got ${other.simpleString}")
  }

  override protected def nullSafeEval(input: Any): Any =
    VideoCodec.encodeGifAnim(input.asInstanceOf[Long], imgWidth, imgHeight, nFrames)

  override protected def withNewChildInternal(newChild: Expression): SynthGifAnim =
    copy(child = newChild)
}

/** Decode an animated-GIF payload and emit middle-frame sample
  * statistics as a struct; undecodable bytes → null.
  */
case class GifFrameStats(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def prettyName: String = "graft_gif_frame_stats"
  override def nullable: Boolean = true
  override def dataType: DataType = StructType(Seq(
    StructField("n_frames", LongType),
    StructField("frame_idx", LongType),
    StructField("px_sum", LongType),
    StructField("px_min", LongType),
    StructField("px_max", LongType)))

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires binary, got ${other.simpleString}")
  }

  override protected def nullSafeEval(input: Any): Any =
    VideoCodec.frameSampleStats(input.asInstanceOf[Array[Byte]])

  override protected def withNewChildInternal(newChild: Expression): GifFrameStats =
    copy(child = newChild)
}

/** Decode an animated-GIF payload and emit scene-cut frame indexes
  * (pixel-difference shot-boundary test, BIGINT-exact); undecodable
  * bytes → null.
  */
case class GifSceneCuts(child: Expression, threshold: Long)
    extends UnaryExpression with CodegenFallback {

  override def prettyName: String = "graft_gif_scene_cuts"
  override def nullable: Boolean = true
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires binary, got ${other.simpleString}")
  }

  override protected def nullSafeEval(input: Any): Any =
    VideoCodec.sceneCutIndexes(input.asInstanceOf[Array[Byte]], threshold)

  override protected def withNewChildInternal(newChild: Expression): GifSceneCuts =
    copy(child = newChild)
}

package graft.functions

import java.nio.{ByteBuffer, ByteOrder}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._

/** Real audio codec expressions for the multimodal column family
  * (SURVEY §2.8 E4, audio path): synthesize a deterministic 16-bit
  * PCM WAV payload from an integer seed, and parse any RIFF/WAVE
  * 16-bit PCM payload back into sample statistics — pure JVM byte
  * work, no codec dependencies (PCM WAV is a 44-byte header plus
  * little-endian samples).
  *
  * Same oracle trick as [[ImageCodec]]: the synthesized samples are
  * integer arithmetic the DuckDB oracle replays exactly, so a
  * corrupted encoder or parser diverges from the formula-computed
  * truth without the oracle ever seeing the bytes. Upgrades E4's
  * audio modality from a documented stub to a real
  * encode→parse→stats round-trip.
  *
  * CodegenFallback for the same reason as the image pair: the body is
  * header parsing and a sample loop, not expression arithmetic.
  */
object AudioCodec {
  /** Sample value at index i for a given seed: reuse the image mix
    * constants, fold into signed 16-bit range [-32768, 32767]. The
    * DuckDB oracle interpolates this exact formula.
    */
  def sample(seed: Long, i: Long): Int = {
    val mix = ((i + 1L) * ImageCodec.MixA + ImageCodec.MixB) % ImageCodec.P
    (((seed * mix) % ImageCodec.P) % 65536L - 32768L).toInt
  }

  val SampleRate = 8000

  /** Minimal RIFF/WAVE: 44-byte canonical header, mono, 16-bit PCM. */
  def encodePcmWav(seed: Long, nSamples: Int): Array[Byte] = {
    val dataBytes = nSamples * 2
    val buf = ByteBuffer.allocate(44 + dataBytes).order(ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataBytes)
      .put("WAVE".getBytes("US-ASCII"))
    buf.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1) // PCM
      .putShort(1) // mono
      .putInt(SampleRate)
      .putInt(SampleRate * 2) // byte rate
      .putShort(2) // block align
      .putShort(16) // bits per sample
    buf.put("data".getBytes("US-ASCII")).putInt(dataBytes)
    var i = 0
    while (i < nSamples) {
      buf.putShort(sample(seed, i.toLong).toShort)
      i += 1
    }
    buf.array()
  }

  /** Parse a RIFF/WAVE 16-bit PCM payload → (n_samples, sample_rate,
    * amp_sum, amp_peak); null for anything malformed (coerce, not
    * crash). Walks the chunk list rather than assuming the canonical
    * 44-byte layout, so WAVs with extra chunks (LIST/INFO) still
    * parse.
    */
  def parseStats(bytes: Array[Byte]): InternalRow =
    try {
      val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
      def ascii(n: Int): String = {
        val a = new Array[Byte](n); buf.get(a); new String(a, "US-ASCII")
      }
      if (ascii(4) != "RIFF") return null
      buf.getInt // declared riff size; trust actual buffer bounds instead
      if (ascii(4) != "WAVE") return null
      var sampleRate = -1
      var bitsPerSample = -1
      var stats: InternalRow = null
      while (stats == null && buf.remaining >= 8) {
        val id = ascii(4)
        val size = buf.getInt
        if (size < 0 || size > buf.remaining) return null
        id match {
          case "fmt " =>
            val fmtStart = buf.position()
            val audioFormat = buf.getShort
            buf.getShort // channels (stats are per-payload, channel-agnostic)
            sampleRate = buf.getInt
            buf.getInt; buf.getShort
            bitsPerSample = buf.getShort
            if (audioFormat != 1 || bitsPerSample != 16) return null
            buf.position(fmtStart + size)
          case "data" =>
            if (sampleRate < 0) return null // fmt must precede data
            val n = size / 2
            var sum = 0L
            var peak = 0L
            var i = 0
            while (i < n) {
              val v = buf.getShort.toLong
              sum += v
              val a = math.abs(v)
              if (a > peak) peak = a
              i += 1
            }
            stats = new GenericInternalRow(
              Array[Any](n.toLong, sampleRate.toLong, sum, peak))
          case _ =>
            buf.position(buf.position() + size) // skip unknown chunk
        }
      }
      stats
    } catch { case scala.util.control.NonFatal(_) => null }
}

/** binary WAV payload (deterministic mono 16-bit PCM) from a bigint
  * seed: sample i = [[AudioCodec.sample]](seed, i) — integer
  * arithmetic an engine without codecs can replay.
  */
case class SynthPcmWav(child: Expression, nSamples: Int)
    extends UnaryExpression with CodegenFallback {
  require(nSamples > 0)

  override def prettyName: String = "graft_synth_pcm_wav"
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires bigint seed, got ${other.simpleString}")
  }

  override protected def nullSafeEval(input: Any): Any =
    AudioCodec.encodePcmWav(input.asInstanceOf[Long], nSamples)

  override protected def withNewChildInternal(newChild: Expression): SynthPcmWav =
    copy(child = newChild)
}

/** Parse a 16-bit PCM WAV payload and emit sample statistics as a
  * struct; malformed bytes → null.
  */
case class ParseWavStats(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def prettyName: String = "graft_parse_wav_stats"
  override def nullable: Boolean = true
  override def dataType: DataType = StructType(Seq(
    StructField("n_samples", LongType),
    StructField("sample_rate", LongType),
    StructField("amp_sum", LongType),
    StructField("amp_peak", LongType)))

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires binary, got ${other.simpleString}")
  }

  override protected def nullSafeEval(input: Any): Any =
    AudioCodec.parseStats(input.asInstanceOf[Array[Byte]])

  override protected def withNewChildInternal(newChild: Expression): ParseWavStats =
    copy(child = newChild)
}

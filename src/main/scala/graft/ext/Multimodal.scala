package graft.ext

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing (SURVEY §2.8 E4): treat image/audio/
  * video payloads as opaque `binary` columns with typed metadata, and
  * run decode/feature-extraction as per-row expressions.
  *
  * The IMAGE path is real: [[synthImage]] encodes a deterministic
  * grayscale PNG per row and [[imageStats]] decodes any
  * ImageIO-supported payload (PNG/BMP ship with the JDK) into pixel
  * statistics — a genuine encode→decode round-trip the oracle
  * verifies from the pixel formula without ever seeing the bytes.
  * The AUDIO path is real too: [[synthAudio]] emits RIFF/WAVE 16-bit
  * PCM payloads and [[audioStats]] parses them (chunk walk + sample
  * loop, pure JVM — PCM WAV needs no codec). The FRAME-SEQUENCE
  * ("video") path is real as well: [[synthVideo]] writes multi-frame
  * animated GIFs and [[videoFrameStats]] decodes + frame-samples them
  * (the JDK ships a GIF reader AND writer; round-trip proven
  * bit-exact). Only COMPRESSED codecs (H.264, MP3, JPEG-lossy
  * pipelines) are absent from the JDK; for those [[fakeFeatures]]
  * remains the documented placeholder: same binary column, schema,
  * and per-row no-shuffle plan shape a real decoder (mapInPandas or
  * an `Expression` like [[graft.functions.DecodeImageStats]]) plugs
  * into.
  */
object Multimodal {

  /** Deterministic width×height grayscale PNG from a bigint seed
    * ([[graft.functions.SynthGrayPng]]) — the payload generator for
    * codec round-trip tests and the E4 decode query.
    */
  def synthImage(seed: Column, width: Int, height: Int): Column = {
    import org.apache.spark.sql.graftshim.ColumnBridge
    ColumnBridge.column(graft.functions.SynthGrayPng(
      ColumnBridge.expression(seed), width, height))
  }

  /** REAL resize: decode → exact nearest-neighbor resample →
    * re-encode ([[graft.functions.ResizeGrayPng]]); undecodable
    * bytes → null.
    */
  def resizeImage(blob: Column, outW: Int, outH: Int): Column = {
    import org.apache.spark.sql.graftshim.ColumnBridge
    ColumnBridge.column(graft.functions.ResizeGrayPng(
      ColumnBridge.expression(blob), outW, outH))
  }

  /** REAL decode: image payload → struct(img_w, img_h, px_sum,
    * px_min, px_max) via `javax.imageio`; undecodable bytes → null
    * ([[graft.functions.DecodeImageStats]]).
    */
  def imageStats(blob: Column): Column = {
    import org.apache.spark.sql.graftshim.ColumnBridge
    ColumnBridge.column(graft.functions.DecodeImageStats(
      ColumnBridge.expression(blob)))
  }

  /** Perceptual 64-bit average hash of an image payload: real decode
    * → 8×8 integer gather → threshold against the integer mean
    * ([[graft.functions.GrayPngAHash]]). Equal hashes ⇒ re-encoded
    * copies of the same asset; small hamming ⇒ near-identical smooth
    * images. Undecodable bytes → null.
    */
  def imageAHash(blob: Column): Column = {
    import org.apache.spark.sql.graftshim.ColumnBridge
    ColumnBridge.column(graft.functions.GrayPngAHash(
      ColumnBridge.expression(blob)))
  }

  /** Deterministic mono 16-bit PCM WAV from a bigint seed
    * ([[graft.functions.SynthPcmWav]]) — the audio counterpart of
    * [[synthImage]].
    */
  def synthAudio(seed: Column, nSamples: Int): Column = {
    import org.apache.spark.sql.graftshim.ColumnBridge
    ColumnBridge.column(graft.functions.SynthPcmWav(
      ColumnBridge.expression(seed), nSamples))
  }

  /** REAL audio parse: RIFF/WAVE 16-bit PCM payload →
    * struct(n_samples, sample_rate, amp_sum, amp_peak); malformed →
    * null ([[graft.functions.ParseWavStats]]).
    */
  def audioStats(blob: Column): Column = {
    import org.apache.spark.sql.graftshim.ColumnBridge
    ColumnBridge.column(graft.functions.ParseWavStats(
      ColumnBridge.expression(blob)))
  }

  /** Deterministic multi-frame animated GIF from a bigint seed
    * ([[graft.functions.SynthGifAnim]]) — the frame-sequence
    * ("video") counterpart of [[synthImage]]/[[synthAudio]].
    */
  def synthVideo(seed: Column, width: Int, height: Int, nFrames: Int): Column = {
    import org.apache.spark.sql.graftshim.ColumnBridge
    ColumnBridge.column(graft.functions.SynthGifAnim(
      ColumnBridge.expression(seed), width, height, nFrames))
  }

  /** REAL frame-sample decode: animated-GIF payload → struct(n_frames,
    * frame_idx, px_sum, px_min, px_max) of the MIDDLE frame; malformed
    * → null ([[graft.functions.GifFrameStats]]).
    */
  def videoFrameStats(blob: Column): Column = {
    import org.apache.spark.sql.graftshim.ColumnBridge
    ColumnBridge.column(graft.functions.GifFrameStats(
      ColumnBridge.expression(blob)))
  }

  /** REAL scene-cut detection: animated-GIF payload → ascending cut
    * frame indexes under the pixel-difference shot-boundary test
    * ([[graft.functions.GifSceneCuts]]); malformed → null.
    */
  def sceneCuts(blob: Column, threshold: Long): Column = {
    import org.apache.spark.sql.graftshim.ColumnBridge
    ColumnBridge.column(graft.functions.GifSceneCuts(
      ColumnBridge.expression(blob), threshold))
  }

  /** Text → binary payload (the testdata has no real blobs; any
    * binary column behaves identically downstream).
    */
  def toBlob(c: Column): Column = encode(c, "UTF-8")

  /** Payload size in bytes. */
  def blobBytes(blob: Column): Column = octet_length(blob).cast("long")

  /** Content digest (dedup/key material for blobs). */
  def blobDigest(blob: Column): Column = md5(blob)

  /** Placeholder feature extractor for modalities the JDK has no
    * codec for (audio/video): n deterministic pseudo-features in
    * [0,1) derived from md5(digest ++ index). For images, use the
    * real [[imageStats]] decoder instead; this keeps schema, batch
    * shape and plan identical for the codec-less modalities.
    */
  def fakeFeatures(blob: Column, n: Int): Column = {
    val digest = blobDigest(blob)
    array((0 until n).map { i =>
      (TextOps.md5Int32(concat(digest, lit("_" + i))) % 1000L).cast("double") / lit(1000.0)
    }: _*)
  }
}

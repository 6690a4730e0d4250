package graft.ext

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing (SURVEY §2.8 E4): treat image/audio/
  * video payloads as opaque `binary` columns with typed metadata, and
  * run decode/feature-extraction as per-row expressions.
  *
  * The container has no image/audio codecs, so the DECODE step is a
  * STUB: [[fakeFeatures]] derives a deterministic pseudo-feature
  * vector from the blob's digest in place of a real
  * decoder+extractor. Everything around it — the binary column, the
  * metadata schema, the per-row no-shuffle plan shape, the array
  * output — is the real plumbing a decoder would plug into (swap
  * [[fakeFeatures]] for a mapInPandas/`Expression` decoder on a
  * cluster with codecs).
  */
object Multimodal {

  /** Text → binary payload (the testdata has no real blobs; any
    * binary column behaves identically downstream).
    */
  def toBlob(c: Column): Column = encode(c, "UTF-8")

  /** Payload size in bytes. */
  def blobBytes(blob: Column): Column = octet_length(blob).cast("long")

  /** Content digest (dedup/key material for blobs). */
  def blobDigest(blob: Column): Column = md5(blob)

  /** STUB feature extractor: n deterministic pseudo-features in
    * [0,1) derived from md5(digest ++ index). A real implementation
    * decodes the payload (image resize, audio frame-sample, …) and
    * emits real features; this keeps schema, batch shape and plan
    * identical without codecs.
    */
  def fakeFeatures(blob: Column, n: Int): Column = {
    val digest = blobDigest(blob)
    array((0 until n).map { i =>
      (TextOps.md5Int32(concat(digest, lit("_" + i))) % 1000L).cast("double") / lit(1000.0)
    }: _*)
  }
}

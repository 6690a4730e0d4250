package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact deduplication (SURVEY §2.8 E1).
  *
  * `dropDuplicates(keys)` keeps an ARBITRARY row per key — fine for
  * idempotent pipelines, useless for oracle-verified ones. The
  * deterministic variant keeps the minimum row by an explicit order
  * column (window row_number, one shuffle on the dedup key), which is
  * what a reproducible training-data pipeline wants anyway: reruns
  * keep the same representative.
  *
  * At 100 TB: dedup on a FINGERPRINT ([[TextOps.fingerprint]]) of the
  * content, not the content itself — only (key, order, id) columns
  * shuffle; full documents are re-joined (or carried) afterwards.
  */
object Dedup {

  /** Spark-native arbitrary-representative dedup (kept for API
    * parity; not oracle-comparable by construction).
    */
  def exact(df: DataFrame, keys: Seq[String]): DataFrame =
    df.dropDuplicates(keys)

  /** SimHash chunk geometry for [[simhashPairs]]: a 32-bit simhash
    * cut into 4 chunks of 8 bits. Pigeonhole: two hashes within
    * hamming distance 3 differ in at most 3 bits, so at least one of
    * the 4 chunks is bit-identical — bucketing on (chunk index, chunk
    * value) has perfect recall for radius ≤ 3. At corpus scale the
    * same design widens to a 64-bit simhash with 16-bit chunks (more
    * selective buckets, radius ≤ 3 still guaranteed).
    */
  val SimHashChunks = 4
  val SimHashChunkBits = 8

  /** SimHash hamming near-duplicate pairs — the third near-dup family
    * next to MinHash banding ([[MinHash.candidatePairs]]) and
    * embedding LSH ([[Similarity.nearDupPairs]]), and the cheapest:
    * ONE long per document (no signature array, no embedding), one
    * chunk-bucket self-join, `bit_count(xor)` as the verifier.
    *
    * Plan shape: per-row simhash (codegen'd one-pass
    * [[graft.functions.SimHash32]]) → eager-persisted hash table
    * (both self-join sides read it) → posexplode into 4 chunk rows →
    * equality join on (chunk index, chunk value) → hamming filter in
    * the candidate stream → distinct. Candidate-bounded, never
    * all-pairs; both sides shuffle once on the chunk key.
    */
  def simhashPairs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      radius: Int = 3): DataFrame = {
    require(radius <= SimHashChunks - 1,
      s"$SimHashChunks chunks guarantee recall only for radius <= ${SimHashChunks - 1}")
    val hs = transform(TextOps.tokens(col(textCol)), t => TextOps.md5Int32(t))
    val sims = graft.ops.Sink.cachedEager(
      df.select(col(idCol).as("doc_id"), TextOps.simhash32(hs).as("simhash")))
    val chunkVals = (0 until SimHashChunks).map { c =>
      shiftright(col("simhash"), c * SimHashChunkBits)
        .bitwiseAND(lit((1L << SimHashChunkBits) - 1))
    }
    val chunks = sims.select(
      col("doc_id"), col("simhash"),
      posexplode(array(chunkVals: _*)).as(Seq("cidx", "cval")))
    chunks.as("a")
      .join(
        chunks.as("b"),
        col("a.cidx") === col("b.cidx") && col("a.cval") === col("b.cval") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(
        col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        bit_count(col("a.simhash").bitwiseXOR(col("b.simhash")))
          .cast("long").as("hamming"))
      .filter(col("hamming") <= radius)
      .distinct()
  }

  /** Deterministic dedup: keep the first row per key group by
    * `orderCol` ascending, and report the group size. Deterministic
    * ONLY when `orderCol` is unique within each key group (like a
    * row id) — with ties, supply the multi-column overload.
    */
  def exactDeterministic(
      df: DataFrame,
      keys: Seq[String],
      orderCol: String,
      sizeCol: String): DataFrame =
    exactDeterministic(df, keys, Seq(orderCol), sizeCol)

  def exactDeterministic(df: DataFrame, keys: Seq[String], orderCol: String): DataFrame =
    exactDeterministic(df, keys, Seq(orderCol), "group_size")

  /** Deterministic dedup, multi-column order: keep the first row per
    * key group by `orderCols` ascending. The representative is
    * deterministic iff `orderCols` TOTALLY order the rows within
    * every key group — pass enough tiebreakers to guarantee it
    * (row_number over a partial order picks an arbitrary row among
    * ties, which is exactly the non-reproducibility this operator
    * exists to remove).
    */
  def exactDeterministic(
      df: DataFrame,
      keys: Seq[String],
      orderCols: Seq[String],
      sizeCol: String = "group_size"): DataFrame = {
    require(orderCols.nonEmpty, "at least one order column required")
    val part = Window.partitionBy(keys.map(col): _*)
    val w = part.orderBy(orderCols.map(col(_).asc): _*)
    df.withColumn("__rn", row_number().over(w))
      .withColumn(sizeCol, count(lit(1)).over(part))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }
}

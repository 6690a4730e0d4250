package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing: assign every document a (seq_id, offset) inside
  * fixed-length training sequences, by a running token sum over the
  * greedy concatenation order. The naive form is a window running sum
  * partitioned by source — which serializes an entire source into ONE
  * task. In a real pretraining mix one source (CommonCrawl) is
  * routinely >80% of the corpus, so at 100 TB that single task does a
  * serial prefix sum over billions of rows. This module implements the
  * classic TWO-PHASE PARALLEL PREFIX SUM, expressed entirely in
  * DataFrame ops (no mapPartitions, no RDDs):
  *
  *   1. bucket rows into order-respecting BLOCKS (`order div
  *      blockSize` — monotone in the order, so block boundaries never
  *      split the ordering) and compute an intra-block running sum
  *      with a window over (source, block): every window partition is
  *      bounded by blockSize rows, so no task sees more than a block;
  *   2. aggregate per-block token totals — a frame of corpusRows /
  *      blockSize rows (10 B docs at blockSize 1 M → 10 k rows) — and
  *      prefix-sum THOSE with a window per source: tiny by
  *      construction, safe on one task;
  *   3. broadcast-join the block offsets back and add. Per-row work,
  *      no further shuffle.
  *
  * Two bounded shuffles + one broadcast replace the one unbounded
  * window; the longest serial chain drops from O(sourceRows) to
  * O(blockSize) + O(nBlocks). Equality with the serial window form is
  * law-tested (PackingSpec) and — because the registered `e5_pack`
  * query runs THIS path against a serial-window DuckDB oracle —
  * verified end-to-end every driver round.
  */
object Packing {

  /** Adds `tok_before`: tokens preceding each row in the concatenation
    * order `(source, order)`, computed by the two-phase prefix sum
    * above. The order column must be numeric and unique per source (a
    * doc id); `blockSize` caps the rows any single window task scans.
    */
  def tokensBefore(
      df: DataFrame,
      source: String,
      order: String,
      ntok: String,
      blockSize: Long = 1000000L): DataFrame = {
    require(blockSize > 0, s"blockSize must be positive, got $blockSize")
    val withBlk = df.withColumn("_blk", floor(col(order) / lit(blockSize)).cast("long"))
    // Phase 1: intra-block running sum; every partition ≤ blockSize rows.
    val wIntra = Window.partitionBy(col(source), col("_blk")).orderBy(col(order))
      .rowsBetween(Window.unboundedPreceding, -1)
    val intra = withBlk.withColumn("_intra", coalesce(sum(col(ntok)).over(wIntra), lit(0L)))
    // Phase 2: per-block totals (rows / blockSize of them), then the
    // block-level exclusive prefix sum — the only per-source serial
    // step left, over the tiny totals frame.
    val wBlk = Window.partitionBy(col(source)).orderBy(col("_blk"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = withBlk.groupBy(col(source), col("_blk"))
      .agg(sum(col(ntok)).as("_blk_tot"))
      .withColumn("_blk_off", coalesce(sum(col("_blk_tot")).over(wBlk), lit(0L)))
      .select(col(source), col("_blk"), col("_blk_off"))
    // Phase 3: offsets frame is tiny — broadcast, add, done.
    intra.join(broadcast(offsets), Seq(source, "_blk"))
      .withColumn("tok_before", col("_intra") + col("_blk_off"))
      .drop("_blk", "_intra", "_blk_off")
  }

  /** Serial-window reference implementation (the naive form the law
    * test compares against). Correct, but partitions by source alone:
    * do not use where one source can dominate the corpus.
    */
  def tokensBeforeSerial(
      df: DataFrame,
      source: String,
      order: String,
      ntok: String): DataFrame = {
    val w = Window.partitionBy(col(source)).orderBy(col(order))
      .rowsBetween(Window.unboundedPreceding, -1)
    df.withColumn("tok_before", coalesce(sum(col(ntok)).over(w), lit(0L)))
  }
}

package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Point-in-interval range join — all (point, interval) pairs with
  * `lo <= pt <= hi` — via temporal BINNING, the shape that survives
  * scale. Spark has no native range join: a bare `ON pt BETWEEN lo
  * AND hi` plans as BroadcastNestedLoopJoin (O(|points|·|intervals|)
  * comparisons and a broadcast of a whole side).
  *
  * Binning makes it an equi-join: intervals explode to the fixed-width
  * time bins they overlap, points map to their single bin, the join
  * runs co-partitioned on the bin key with the range predicate as a
  * residual filter. A matching pair meets in EXACTLY one bin (the
  * point's), so no post-join dedup is needed. Cost: |intervals| ×
  * (duration/binWidth + 1) exploded rows + one shuffle each side —
  * pick binWidth near the typical interval duration so the explosion
  * factor stays ~2 and bins stay selective.
  */
object RangeJoin {

  /** @param points    frame with a timestamp column `ptCol`
    * @param intervals frame with timestamp columns `loCol`, `hiCol`
    *                  (lo <= hi; violating rows match nothing)
    * @param binSeconds bin width in seconds
    */
  def pointInInterval(
      points: DataFrame,
      ptCol: String,
      intervals: DataFrame,
      loCol: String,
      hiCol: String,
      binSeconds: Long): DataFrame = {
    require(binSeconds > 0)
    def binOf(c: Column): Column = floor(unix_timestamp(c) / lit(binSeconds))
    val binned = intervals
      // guard BEFORE sequence: Spark's sequence(a, b) with a > b
      // yields a DESCENDING range, not empty
      .filter(col(loCol) <= col(hiCol))
      .withColumn("__bin",
        explode(sequence(binOf(col(loCol)), binOf(col(hiCol)))))
    points
      .withColumn("__bin", binOf(col(ptCol)))
      .join(binned,
        Seq("__bin"))
      .filter(col(ptCol) >= col(loCol) && col(ptCol) <= col(hiCol))
      .drop("__bin")
  }

  /** Interval-OVERLAP join — all (left, right) interval pairs with
    * `l.lo <= r.hi AND r.lo <= l.hi` — the two-sided sibling of
    * [[pointInInterval]]: BOTH sides explode to their bins and
    * equi-join on the bin key with the overlap predicate residual.
    * A pair overlapping across several shared bins would join once
    * per bin, so the join keeps each pair only in the FIRST bin the
    * two share (`bin == greatest(firstBin(l), firstBin(r))`, which is
    * always inside both bin ranges when the intervals overlap) —
    * exactly-once semantics without a post-join distinct, which at
    * scale would be a second full shuffle.
    */
  def intervalOverlap(
      left: DataFrame,
      lLo: String,
      lHi: String,
      right: DataFrame,
      rLo: String,
      rHi: String,
      binSeconds: Long): DataFrame = {
    require(binSeconds > 0)
    def binOf(c: Column): Column = floor(unix_timestamp(c) / lit(binSeconds))
    def binned(df: DataFrame, lo: String, hi: String, b0: String) =
      df.filter(col(lo) <= col(hi))
        .withColumn(b0, binOf(col(lo)))
        .withColumn("__bin", explode(sequence(binOf(col(lo)), binOf(col(hi)))))
    val l = binned(left, lLo, lHi, "__lb0")
    val r = binned(right, rLo, rHi, "__rb0")
    l.join(r, Seq("__bin"))
      .filter(col(lLo) <= col(rHi) && col(rLo) <= col(lHi))
      .filter(col("__bin") === greatest(col("__lb0"), col("__rb0")))
      .drop("__bin", "__lb0", "__rb0")
  }
}

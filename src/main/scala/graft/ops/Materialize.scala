package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Incremental materialized-aggregate maintenance.
  *
  * The 100 TB shape the reference's full-recompute `to_sql(replace)`
  * load (etl_script.py:164-168) cannot reach: a standing rollup table
  * is refreshed by aggregating ONLY the newly-arrived slice and
  * merging its partial states into the stored rollup — history is
  * never rescanned. This works exactly when every kept statistic is
  * mergeable from per-slice partials: count and sum merge by
  * addition, min/max by min/max. (Non-mergeable stats — exact NDV,
  * exact percentiles — need a mergeable sketch instead: KMV
  * [[Aggregates.kmvDistinct]] or HLL for NDV, t-digest for
  * quantiles; same maintenance recipe, estimate instead of exact.)
  *
  * Determinism: metrics are BIGINT (cents-scaled money, counts), so
  * merge order cannot perturb a bit and the refreshed rollup is
  * hash-identical to a from-scratch recompute — which is the oracle
  * of [[graft.ParityQueries.s19RollupIncremental]] and the law
  * OpsSpec checks on random splits.
  */
object Materialize {

  /** Mergeable per-key rollup: count, sum, min, max of a BIGINT
    * metric. One partial+final agg pass — at the fact table's scale
    * this is the only full scan the rollup ever costs, paid once at
    * bootstrap; every later refresh aggregates a delta slice only.
    */
  def rollup(df: DataFrame, keyCol: String, metric: Column): DataFrame =
    df.select(col(keyCol), metric.cast("long").as("m"))
      .groupBy(col(keyCol))
      .agg(
        count(lit(1)).as("n"),
        sum(col("m")).as("sum_m"),
        min(col("m")).as("min_m"),
        max(col("m")).as("max_m"))

  /** Merge two rollups with [[rollup]]'s schema into one: union, then
    * re-reduce each statistic by its own merge law (counts/sums add,
    * min/max reduce). Keys present on one side only pass through —
    * new days append, existing days update. The union's agg shuffles
    * |base keys| + |delta keys| pre-reduced rows, never fact rows;
    * with the stored rollup bucketed on the key even that exchange
    * disappears.
    */
  def merge(base: DataFrame, delta: DataFrame, keyCol: String): DataFrame =
    base.unionByName(delta)
      .groupBy(col(keyCol))
      .agg(
        sum(col("n")).as("n"),
        sum(col("sum_m")).as("sum_m"),
        min(col("min_m")).as("min_m"),
        max(col("max_m")).as("max_m"))

  /** In-place refresh of a STORED rollup: read it, [[merge]] a delta
    * rollup in, rewrite to a sibling directory, swap (the
    * rewrite-then-swap recipe index compaction uses — at warehouse
    * scale the swap is a metastore/table-format pointer flip). The
    * tmp write fully materializes the merged frame before the old
    * table is touched, so a crash leaves either the old or the new
    * rollup intact, never a partial one.
    */
  def refreshInto(
      spark: org.apache.spark.sql.SparkSession,
      stored: String, deltaRollup: DataFrame, keyCol: String): Unit = {
    val tmp = stored + "_refreshing"
    merge(spark.read.parquet(stored), deltaRollup, keyCol)
      .write.mode("overwrite").parquet(tmp)
    Sink.clearLocalPath(stored)
    val ok = new java.io.File(tmp.stripPrefix("file:"))
      .renameTo(new java.io.File(stored.stripPrefix("file:")))
    require(ok, s"rollup refresh swap failed for $stored")
  }
}

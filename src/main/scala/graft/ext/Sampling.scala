package graft.ext

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Deterministic sampling operators for training-data assembly
  * (SURVEY §2.8 extensions): held-out splits and per-source mixture
  * weighting. `df.sample` is engine- and partitioning-dependent;
  * these derive every decision from an md5 hash of the ROW IDENTITY,
  * so the same row lands in the same split on any engine, any
  * partitioning, any rerun — the property that makes held-out sets
  * trustworthy and mixtures reproducible. Pure per-row expressions:
  * zero shuffles, fully pushdown-friendly.
  */
object Sampling {

  /** Hash bucket in [0, 1000) from a salted row id — the shared
    * primitive (salt separates independent sampling decisions so
    * split and mixture draws are uncorrelated).
    */
  def permilleBucket(idCol: Column, salt: String): Column =
    TextOps.md5Int32(concat(lit(salt + "_"), idCol.cast("string"))) % 1000

  /** Named train/val/test assignment by cumulative permille
    * thresholds (default 80/10/10).
    */
  def assignSplit(idCol: Column, trainPct: Int = 80, valPct: Int = 10): Column = {
    require(trainPct + valPct < 100)
    val b = permilleBucket(idCol, "split")
    when(b < trainPct * 10, "train")
      .when(b < (trainPct + valPct) * 10, "val")
      .otherwise("test")
  }

  /** Mixture sampling: keep a row iff its hash bucket falls under its
    * source's keep-rate (permille). Sources absent from `rates` use
    * `defaultPermille`. This is how corpus mixtures are weighted
    * (e.g. books oversampled vs web) without materializing copies.
    */
  def mixtureKeep(
      idCol: Column,
      sourceCol: Column,
      rates: Map[String, Int],
      defaultPermille: Int): Column = {
    val rate = rates.toSeq.sortBy(_._1).foldLeft(lit(defaultPermille)) {
      case (acc, (s, r)) => when(sourceCol === s, lit(r)).otherwise(acc)
    }
    permilleBucket(idCol, "mix") < rate
  }

  /** Copy count for mixture rates ABOVE 1000 permille (upsampling —
    * oversampling high-quality sources is the other half of mixture
    * weighting): every row gets rate/1000 whole copies, plus one more
    * iff its bucket falls under the fractional remainder. Rates under
    * 1000 degenerate to 0-or-1 copies on the SAME draw as
    * [[mixtureKeep]] (same salt), so a mixture spec can mix down- and
    * up-sampled sources coherently. Emit copies via
    * `explode(sequence(1, copies))` — per-row fan-out, no shuffle.
    */
  def mixtureCopies(
      idCol: Column,
      sourceCol: Column,
      rates: Map[String, Int],
      defaultPermille: Int): Column = {
    val rate = rates.toSeq.sortBy(_._1).foldLeft(lit(defaultPermille)) {
      case (acc, (s, r)) => when(sourceCol === s, lit(r)).otherwise(acc)
    }
    // floor-div: Column./ is double division, so floor+cast back
    floor(rate / lit(1000)).cast("int") +
      when(permilleBucket(idCol, "mix") < rate % lit(1000), lit(1)).otherwise(lit(0))
  }

  /** Deterministic per-group fixed-size sample — reservoir-sampling
    * semantics without the sequential reservoir: rank rows inside
    * each group by an md5 draw on the salted row id and keep the k
    * smallest (draw ties broken on the id itself, so the winner set
    * is total-ordered). The same rows win on any engine, any
    * partitioning, any rerun — [[permilleBucket]]'s reproducibility
    * property lifted from "keep with probability p" to "keep exactly
    * k per group". Plans as WindowGroupLimit partial top-k: each map
    * task prunes its partition to k rows per group BEFORE the
    * shuffle, so a group never materializes anywhere — the 100 TB
    * shape for "give me 10 000 inspection docs per source".
    */
  def reservoirPerGroup(
      df: org.apache.spark.sql.DataFrame,
      groupCol: String,
      idCol: String,
      k: Int): org.apache.spark.sql.DataFrame = {
    val drawn = df.withColumn(
      "_draw",
      TextOps.md5Int32(concat(lit("reservoir_"), col(idCol).cast("string"))))
    graft.ops.Ranking
      .topKPerGroup(drawn, Seq(groupCol), Seq(col("_draw").asc, col(idCol).asc), k)
      .drop("_draw")
  }

  /** WEIGHTED sample without replacement, k per group, inclusion
    * probability ∝ weight — priority sampling (Duffield–Lund–Thorup,
    * "Priority sampling for estimation of arbitrary subset sums",
    * JACM 2007): each row draws u = (md5("wsamp_" ‖ id) + 1) / 2^32
    * (a uniform in (0, 1]; the +1 excludes zero, the power-of-two
    * scale is EXACT in binary floating point) and gets priority
    * q = w / u ≥ w; the per-group top-k by (q desc, id) is the
    * sample. ONE correctly-rounded double divide after two exact
    * ops — IEEE 754 requires division correctly rounded, so q is
    * bit-identical on every engine, which is why this formulation is
    * used instead of the classical Efraimidis–Spirakis u^(1/w) key
    * (pow/log are not correctly rounded and may flip ranks across
    * engines). The (k+1)-th priority τ turns the sample into a
    * sketch: `est_w` = max(w, τ) per kept row sums to an UNBIASED
    * estimate of any subset's total weight (the DLT estimator; groups
    * with ≤ k rows keep est_w = w exactly — every row was taken).
    *
    * Deterministic on any engine / partitioning / rerun, like every
    * Sampling draw. Scale shape: WindowGroupLimit partial top-(k+1)
    * prunes each map task to k+1 rows per group BEFORE the shuffle;
    * τ and ranks then compute on ≤ (k+1)·|groups| rows. Mergeable:
    * top-(k+1) by priority of a union = top-(k+1) of concatenated
    * per-slice top-(k+1)s, the reservoir/quantile-sketch min-k law
    * with q's order reversed.
    */
  def prioritySamplePerGroup(
      df: org.apache.spark.sql.DataFrame,
      groupCol: String,
      idCol: String,
      wCol: String,
      k: Int): org.apache.spark.sql.DataFrame = {
    val u = (TextOps.md5Int32(concat(lit("wsamp_"), col(idCol).cast("string"))) + lit(1L))
      .cast("double") / lit(4294967296.0)
    val drawn = df
      .filter(col(wCol).isNotNull && col(idCol).isNotNull)
      .withColumn("_q", col(wCol).cast("double") / u)
    val wDbl = col(wCol).cast("double")
    val grp = org.apache.spark.sql.expressions.Window.partitionBy(col(groupCol))
    graft.ops.Ranking
      .topKPerGroup(drawn, Seq(groupCol), Seq(col("_q").desc, col(idCol).asc), k + 1)
      .withColumn("_tau", max(when(col("rk") === k + 1, col("_q"))).over(grp))
      .filter(col("rk") <= k)
      .withColumn("est_w", greatest(wDbl, coalesce(col("_tau"), wDbl)))
      .drop("_q", "_tau")
  }

  /** Deterministic PER-EPOCH shuffle order: for each epoch e, every
    * row gets `position` = its rank under the md5 draw
    * `md5(\"epoch<e>_\" || id)` (ties → id). Training loaders need a
    * DIFFERENT uniform permutation of the corpus each epoch, and the
    * same permutation on every re-run / from any worker — which a
    * `rand()` shuffle cannot give. Output: one row per (epoch, row)
    * with (epoch, position, id-columns).
    *
    * Scale shape: the obvious `row_number() OVER (PARTITION BY epoch
    * ORDER BY draw)` serializes each epoch through ONE task — at
    * 100 TB that is the whole corpus through one thread, per epoch.
    * Instead the draw's uniformity is the partitioner: rows bucket by
    * the draw's high bits into `nBlocks` order-respecting blocks
    * (block = draw >> shift is monotone in draw), rank within
    * (epoch, block) by a bounded window, add the exclusive
    * prefix-sum of per-block counts (an nBlocks-sized frame,
    * broadcast back) — the [[graft.ext.Packing]] two-phase discipline
    * applied to rank instead of running token sums.
    */
  def epochShuffle(
      df: org.apache.spark.sql.DataFrame,
      idCol: String,
      epochs: Int,
      nBlocks: Int = 64): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(epochs > 0 && nBlocks > 0)
    // md5Int32 is uniform on [0, 2^32); 2^32 / nBlocks keeps blocks
    // balanced for any power-of-two nBlocks (64 here → ~1.6% of the
    // epoch per window task; raise nBlocks with the corpus).
    val blockW = (1L << 32) / nBlocks
    val drawn = df
      .crossJoin(broadcast(
        df.sparkSession.range(0, epochs).select(col("id").as("epoch"))))
      .withColumn("_draw",
        TextOps.md5Int32(
          concat(lit("epoch"), col("epoch").cast("string"), lit("_"),
            col(idCol).cast("string"))))
      .withColumn("_blk", floor(col("_draw") / lit(blockW)).cast("long"))
    val wIntra = Window.partitionBy(col("epoch"), col("_blk"))
      .orderBy(col("_draw"), col(idCol))
    val offsets = drawn.groupBy(col("epoch"), col("_blk"))
      .agg(count(lit(1)).as("_blk_n"))
      .withColumn("_blk_off",
        coalesce(
          sum(col("_blk_n")).over(
            Window.partitionBy(col("epoch")).orderBy(col("_blk"))
              .rowsBetween(Window.unboundedPreceding, -1)),
          lit(0L)))
      .select(col("epoch"), col("_blk"), col("_blk_off"))
    drawn
      .withColumn("_intra", row_number().over(wIntra).cast("long"))
      .join(broadcast(offsets), Seq("epoch", "_blk"))
      .withColumn("position", col("_intra") + col("_blk_off"))
      .drop("_draw", "_blk", "_intra", "_blk_off")
  }
}

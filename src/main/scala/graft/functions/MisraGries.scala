package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Misra–Gries summary buffer: parallel key/count arrays with an
  * explicit fill pointer so `reduce` can mutate in place (the
  * documented Aggregator pattern — zero per-row allocation).
  */
case class MgBuf(keys: Array[Long], counts: Array[Long], var used: Int)

/** Distributed Misra–Gries heavy-hitter sketch (k counters) as a
  * typed `Aggregator` — the MERGEABLE-summaries formulation
  * (Agarwal et al., PODS'12): per-partition MG summaries combine by
  * summing counters and re-truncating to the (k+1)-th largest, and
  * the merged summary keeps the full MG guarantee: every item with
  * true frequency > n/(k+1) survives with estimate within n/(k+1)
  * of truth. That makes the sketch a sound CANDIDATE GENERATOR for
  * exact heavy hitters: rescan counts only the ≤ k survivors, so no
  * full-cardinality groupBy state ever exists. At 100 TB the value
  * is the bounded state: the map side carries k=O(100) counters per
  * partition instead of a hash table over the full key domain, and
  * only ≤ k rows cross the final exchange.
  *
  * Per-row cost is an O(k) probe of a flat long array (k ≤ a few
  * hundred; contiguous scan, no hashing/boxing). The decrement-all
  * branch is amortized O(1): each decrement event destroys k+1
  * count units that k+1 distinct increments paid for.
  *
  * Reference behavior generalized: the reference's dashboards only
  * ever need exact small-domain value_counts (app.py:60-75); this is
  * the scale path for the same ask on an unbounded key domain.
  */
class MisraGries(k: Int) extends Aggregator[Long, MgBuf, Seq[Long]]
    with Serializable {
  require(k > 0, s"k must be positive, got $k")

  override def zero: MgBuf = MgBuf(new Array[Long](k), new Array[Long](k), 0)

  override def reduce(b: MgBuf, v: Long): MgBuf = {
    var i = 0
    while (i < b.used) {
      if (b.keys(i) == v) { b.counts(i) += 1L; return b }
      i += 1
    }
    if (b.used < k) {
      b.keys(b.used) = v
      b.counts(b.used) = 1L
      b.used += 1
      return b
    }
    // All k counters occupied by other keys: decrement everything by
    // one (the arriving item's own unit pays the (k+1)-th share) and
    // compact the zeros.
    var w = 0
    i = 0
    while (i < k) {
      if (b.counts(i) > 1L) {
        b.keys(w) = b.keys(i)
        b.counts(w) = b.counts(i) - 1L
        w += 1
      }
      i += 1
    }
    b.used = w
    b
  }

  override def merge(a: MgBuf, b: MgBuf): MgBuf = {
    if (b.used == 0) return a
    if (a.used == 0) return b
    // Sum counters key-wise (≤ 2k entries), then re-truncate: subtract
    // the (k+1)-th largest count from everything and keep positives —
    // the PODS'12 merge that preserves the n/(k+1) error bound.
    val m = scala.collection.mutable.LongMap.empty[Long]
    var i = 0
    while (i < a.used) { m(a.keys(i)) = m.getOrElse(a.keys(i), 0L) + a.counts(i); i += 1 }
    i = 0
    while (i < b.used) { m(b.keys(i)) = m.getOrElse(b.keys(i), 0L) + b.counts(i); i += 1 }
    val sub =
      if (m.size <= k) 0L
      else m.values.toArray.sorted(Ordering[Long].reverse).apply(k) // (k+1)-th largest
    val out = zero
    m.foreach { case (key, cnt) =>
      if (cnt > sub) { out.keys(out.used) = key; out.counts(out.used) = cnt - sub; out.used += 1 }
    }
    out
  }

  /** Surviving candidate keys, sorted for a deterministic column value. */
  override def finish(b: MgBuf): Seq[Long] =
    b.keys.take(b.used).sorted.toSeq

  override def bufferEncoder: Encoder[MgBuf] = Encoders.product[MgBuf]
  override def outputEncoder: Encoder[Seq[Long]] = ExpressionEncoder[Seq[Long]]()
}

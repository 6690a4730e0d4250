package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed `Aggregator` for the exact mean of 2-decimal (monetary)
  * doubles — the `Dataset[T]` counterpart of
  * [[graft.ops.Aggregates.exactMean]]'s decimal path, and the
  * engine's exemplar of the custom-Aggregator API tier (typed
  * buffer + Encoders + map-side merge).
  *
  * The buffer is (sum of CENTS as long, count): `round(v * 100)`
  * recovers the exact integer cents for any 2-decimal value
  * representable as a double, so accumulation is integer arithmetic —
  * exact, associative, order-free — and the single final division
  * `sum / (100 · n)` is one deterministic double op. Overflow bound:
  * 9.2e18 cents ≈ 9e16 dollars of total — fine for any realistic
  * partition; merge is a plain long add, so the partial/final split
  * behaves exactly like a built-in aggregate.
  */
object ExactCentsMean extends Aggregator[Double, (Long, Long), Double] {
  override def zero: (Long, Long) = (0L, 0L)
  override def reduce(b: (Long, Long), v: Double): (Long, Long) =
    (b._1 + math.round(v * 100.0), b._2 + 1L)
  override def merge(a: (Long, Long), b: (Long, Long)): (Long, Long) =
    (a._1 + b._1, a._2 + b._2)
  override def finish(b: (Long, Long)): Double =
    if (b._2 == 0L) Double.NaN else b._1.toDouble / (100.0 * b._2)
  override def bufferEncoder: Encoder[(Long, Long)] =
    Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong)
  override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
}

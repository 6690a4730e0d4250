package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Optimizer rule: rewrite point-in-interval theta-joins into the
  * binned equi-join [[graft.ops.RangeJoin]] builds by hand — the (c)
  * tier of custom-operator work: whole-plan rewriting via
  * `Rule[LogicalPlan]`, no user code changes.
  *
  * Trigger (deliberately narrow — a rewrite rule must never fire on a
  * plan it cannot prove safe): an INNER join whose entire condition is
  * `pt >= lo AND pt <= hi` (or the mirrored/flipped forms) where `pt`
  * is a timestamp attribute from one side and `lo`, `hi` are
  * timestamp attributes from the other. Spark plans that join as
  * BroadcastNestedLoopJoin — O(|left|·|right|) comparisons with a
  * full broadcast of one side; the rewrite turns it into:
  *
  *   points  + __bin = floor(unix(pt) / width)
  *   intervals + explode(sequence(bin(lo), bin(hi))) AS __bin
  *   JOIN ON __bin equality AND the ORIGINAL range condition
  *   project back to the original output
  *
  * Matching pairs meet in exactly one bin (the point's own), so the
  * rewrite is exactly row-preserving — proven by the law test against
  * the un-rewritten join. Bin width comes from
  * `spark.graft.rangeJoin.binSeconds` (session conf, default 3600).
  *
  * Registered via `spark.experimental.extraOptimizations` (live
  * session) or a SparkSessionExtensions `injectOptimizerRule` at
  * session build.
  */
object RangeJoinRule extends Rule[LogicalPlan] {

  val BinConfKey = "spark.graft.rangeJoin.binSeconds"
  val DefaultBinSeconds = 3600L

  override def apply(plan: LogicalPlan): LogicalPlan = plan transform {
    case j @ Join(left, right, Inner, Some(cond), hint) =>
      matchRange(cond, left, right) match {
        case Some((pt, lo, hi, pointsLeft)) =>
          val binSeconds =
            try conf.getConfString(BinConfKey, DefaultBinSeconds.toString).toLong
            catch { case _: NumberFormatException => DefaultBinSeconds }
          val (points, intervals) = if (pointsLeft) (left, right) else (right, left)

          def binOf(ts: Expression): Expression =
            Cast(
              Floor(Divide(
                Cast(toUnixSeconds(ts), org.apache.spark.sql.types.DoubleType),
                Literal(binSeconds.toDouble))),
              LongType)

          val pBin = Alias(binOf(pt), "__graft_bin")()
          val pointsPlan = Project(points.output :+ pBin, points)

          val iBinAttr = AttributeReference("__graft_bin_i", LongType, nullable = true)()
          // Sequence is TimeZoneAware — an optimizer-introduced one must
          // carry the timezone explicitly or the plan turns unresolved
          val gen = Explode(
            Sequence(binOf(lo), binOf(hi), None, Some(conf.sessionLocalTimeZone)))
          val intervalsPlan = Generate(
            gen, unrequiredChildIndex = Nil, outer = false,
            qualifier = None, generatorOutput = Seq(iBinAttr),
            child = intervals)

          val joined = Join(
            if (pointsLeft) pointsPlan else intervalsPlan,
            if (pointsLeft) intervalsPlan else pointsPlan,
            Inner,
            Some(And(EqualTo(pBin.toAttribute, iBinAttr), cond)),
            hint)
          Project(j.output, joined)
        case None => j
      }
  }

  /** seconds since epoch as a long — timestamps are epoch micros
    * internally, so UnixSeconds is pure integer floor-division (no
    * session-timezone expression needed, which an optimizer-introduced
    * expression could not resolve late; floor — not truncation — keeps
    * the bin mapping monotonic across the epoch).
    *
    * TIMESTAMP_NTZ (what a parquet timestamp WITHOUT isAdjustedToUTC
    * reads as since Spark 3.4) goes through an explicit
    * session-zone Cast first: UnixSeconds only accepts TIMESTAMP, and
    * an optimizer-introduced Cast must carry its timezone or the plan
    * turns unresolved. The wall→instant mapping is non-decreasing, so
    * bin(lo) <= bin(pt) <= bin(hi) still holds for every matching
    * pair and the rewrite stays exactly row-preserving (the original
    * range predicate is re-applied after the bin equi-join).
    */
  private def toUnixSeconds(ts: Expression): Expression = ts.dataType match {
    case TimestampNTZType =>
      UnixSeconds(Cast(ts, TimestampType, Some(conf.sessionLocalTimeZone)))
    case _ => UnixSeconds(ts)
  }

  /** Some((pt, lo, hi, pointIsOnLeft)) when the WHOLE condition is the
    * canonical range shape over timestamp attributes split across the
    * two sides.
    */
  private def matchRange(
      cond: Expression,
      left: LogicalPlan,
      right: LogicalPlan): Option[(Attribute, Attribute, Attribute, Boolean)] = {
    def tsAttr(e: Expression): Option[Attribute] = e match {
      case a: Attribute
          if a.dataType == TimestampType || a.dataType == TimestampNTZType =>
        Some(a)
      case _ => None
    }
    // normalize a comparison to (smaller, larger)
    def geq(e: Expression): Option[(Attribute, Attribute)] = e match {
      case GreaterThanOrEqual(a, b) => for (x <- tsAttr(a); y <- tsAttr(b)) yield (y, x)
      case LessThanOrEqual(a, b) => for (x <- tsAttr(a); y <- tsAttr(b)) yield (x, y)
      case _ => None
    }
    cond match {
      case And(c1, c2) =>
        (geq(c1), geq(c2)) match {
          case (Some((lo, pt1)), Some((pt2, hi))) if pt1.semanticEquals(pt2) =>
            val pt = pt1
            val fromLeft = left.outputSet
            val fromRight = right.outputSet
            if (fromLeft.contains(pt) && fromRight.contains(lo) && fromRight.contains(hi))
              Some((pt, lo, hi, true))
            else if (fromRight.contains(pt) && fromLeft.contains(lo) && fromLeft.contains(hi))
              Some((pt, lo, hi, false))
            else None
          case _ => None
        }
      case _ => None
    }
  }
}

package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{
  Ascending, Attribute, GenericInternalRow, JoinedRow, RowOrdering, SortOrder,
  UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}

/** Native AS-OF JOIN — the whole-operator tier (logical node +
  * planner strategy + physical exec) of the custom-operator ladder,
  * registered through `SparkSessionExtensions.injectPlannerStrategy`
  * (`GraftExtensions`).
  *
  * Semantics (matching `ops.AsofJoin.asofJoin`, the composed
  * union+window form, law-tested equal): for every left row, the
  * LAST right row of the same key with `right.ts <= left.ts`
  * (inclusive), its value columns appended — null-filled when no
  * such row exists. Like the window form — and unlike SQL ASOF —
  * null keys group together and null timestamps sort first.
  *
  * Why a physical operator: the composed form UNIONS both tables and
  * runs a carry-forward window over the union — the whole RIGHT
  * table flows through the left's shuffle, sort, and window, and the
  * window state machine evaluates per row. This exec declares
  * `ClusteredDistribution` on the keys and per-side `(key, ts)`
  * ordering, so EnsureRequirements gives each side its OWN exchange
  * + sort (no union blow-up, exchange reuse still applies), and the
  * merge itself is a single forward pass with O(1) state: one
  * buffered right row per key. At 100 TB that is the difference
  * between shuffling quotes+trades together and shuffling each once.
  */
case class AsOfJoinNode(
    left: LogicalPlan,
    right: LogicalPlan,
    keys: Seq[String],
    leftTsCol: String,
    rightTsCol: String,
    valCols: Seq[String])
  extends BinaryNode {

  // Columns are referenced BY NAME and resolved against the children
  // on demand: both sides often derive from the same base relation,
  // and the analyzer's DeduplicateRelations renumbers one subtree's
  // exprIds — captured Attribute fields would go stale (observed as
  // INTERNAL_ERROR_ATTRIBUTE_NOT_FOUND at execution). Names survive
  // the rewrite; the strategy binds them to the FINAL child outputs.
  private[plans] def attrOf(p: LogicalPlan, n: String): Attribute =
    p.output.find(_.name == n).getOrElse(
      throw new IllegalArgumentException(
        s"as-of join column $n not found in ${p.output.map(_.name)}"))

  override def output: Seq[Attribute] =
    left.output ++ valCols.map(c => attrOf(right, c).withNullability(true))

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinNode =
    copy(left = newLeft, right = newRight)
}

object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case n @ AsOfJoinNode(l, r, keys, lTs, rTs, valCols) =>
      // Fail at planning, not execution: the exec builds its comparators
      // from the LEFT side's data types and applies them to right-side
      // projections, so an int-vs-long (or date-vs-timestamp) mismatch
      // would silently miscompare rather than error (r8 ADVICE). Require
      // exact type equality per key and for the timestamps.
      for (k <- keys) {
        val (lt, rt) = (n.attrOf(l, k).dataType, n.attrOf(r, k).dataType)
        require(lt == rt,
          s"as-of join key '$k' type mismatch: left $lt vs right $rt — cast one side first")
      }
      locally {
        val (lt, rt) = (n.attrOf(l, lTs).dataType, n.attrOf(r, rTs).dataType)
        require(lt == rt,
          s"as-of join timestamp type mismatch: left '$lTs' $lt vs right '$rTs' $rt — cast one side first")
      }
      AsOfJoinExec(
        planLater(l), planLater(r),
        keys.map(n.attrOf(l, _)), keys.map(n.attrOf(r, _)),
        n.attrOf(l, lTs), n.attrOf(r, rTs),
        valCols.map(n.attrOf(r, _))) :: Nil
    case _ => Nil
  }
}

case class AsOfJoinExec(
    left: SparkPlan,
    right: SparkPlan,
    leftKeys: Seq[Attribute],
    rightKeys: Seq[Attribute],
    leftTs: Attribute,
    rightTs: Attribute,
    rightVals: Seq[Attribute])
  extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ rightVals.map(_.withNullability(true))

  // Both sides cluster on the join keys (each side shuffles ONCE on
  // its own column widths) and sort by (keys, ts) — the merge below
  // then never looks backwards.
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKeys) :: ClusteredDistribution(rightKeys) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] =
    Seq(
      (leftKeys :+ leftTs).map(SortOrder(_, Ascending)),
      (rightKeys :+ rightTs).map(SortOrder(_, Ascending)))

  override def outputOrdering: Seq[SortOrder] =
    (leftKeys :+ leftTs).map(SortOrder(_, Ascending))

  override def outputPartitioning = left.outputPartitioning

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)

  override protected def doExecute(): RDD[InternalRow] = {
    val lOut = left.output
    val rOut = right.output
    val lKeyExprs = leftKeys
    val rKeyExprs = rightKeys
    val lTsExpr = leftTs
    val rTsExpr = rightTs
    val rValExprs = rightVals
    val outAttrs = output
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val lKeyProj = UnsafeProjection.create(lKeyExprs, lOut)
      val rKeyProj = UnsafeProjection.create(rKeyExprs, rOut)
      val lTsProj = UnsafeProjection.create(Seq(lTsExpr), lOut)
      val rTsProj = UnsafeProjection.create(Seq(rTsExpr), rOut)
      val rValProj = UnsafeProjection.create(rValExprs, rOut)
      val keyOrd =
        RowOrdering.createNaturalAscendingOrdering(lKeyExprs.map(_.dataType))
      val tsOrd =
        RowOrdering.createNaturalAscendingOrdering(Seq(lTsExpr.dataType))
      // bind value inputs NULLABLE: the no-match row is all nulls even
      // when the source attribute is non-nullable
      val outProj = UnsafeProjection.create(
        outAttrs, lOut ++ rValExprs.map(_.withNullability(true)))
      val nullVal = new GenericInternalRow(rValExprs.size)
      val joined = new JoinedRow

      // One buffered right row (as its projected key/ts/value copies)
      // — the exec's WHOLE per-partition state beyond the iterators.
      var rKey: InternalRow = null
      var rTs: InternalRow = null
      var rVal: InternalRow = null
      def advanceRight(): Unit =
        if (rIter.hasNext) {
          val row = rIter.next()
          rKey = rKeyProj(row).copy()
          rTs = rTsProj(row).copy()
          rVal = rValProj(row).copy()
        } else { rKey = null; rTs = null; rVal = null }
      advanceRight()

      // lastVal = value of the newest right row already consumed for
      // the CURRENT left key (null when none). Valid only while the
      // left key stays the same.
      var curKey: InternalRow = null
      var lastVal: InternalRow = null

      lIter.map { lRow =>
        val lKey = lKeyProj(lRow)
        if (curKey == null || keyOrd.compare(curKey, lKey) != 0) {
          curKey = lKey.copy()
          lastVal = null
        }
        val lTsRow = lTsProj(lRow)
        var cont = rKey != null
        while (cont) {
          val kc = keyOrd.compare(rKey, curKey)
          if (kc < 0 || (kc == 0 && tsOrd.compare(rTs, lTsRow) <= 0)) {
            if (kc == 0) lastVal = rVal
            advanceRight()
            cont = rKey != null
          } else cont = false
        }
        outProj(joined(lRow, if (lastVal != null) lastVal else nullVal))
      }
    }
  }
}

package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native 32-bit SimHash over an `array<bigint>` of token hashes →
  * bigint in [0, 2^32).
  *
  * Bit b of the result is set iff Σ_tokens (bit b of hash ? +1 : -1)
  * is positive — exactly the nested-lambda formulation replicated by
  * the DuckDB oracle (ExtQueries.e5dSql), but as one primitive loop
  * instead of 32 interpreted per-bit folds over the token array.
  * Null token hash → null result.
  */
case class SimHash32(child: Expression) extends UnaryExpression {

  override def prettyName: String = "graft_simhash32"
  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<bigint>, got ${other.simpleString}")
  }

  override protected def nullSafeEval(input: Any): Any = {
    val hs = input.asInstanceOf[ArrayData]
    val n = hs.numElements()
    val votes = new Array[Int](32)
    var i = 0
    while (i < n) {
      if (hs.isNullAt(i)) return null
      val h = hs.getLong(i)
      var b = 0
      while (b < 32) {
        if (((h >> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
        b += 1
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 32) {
      if (votes(b) > 0) out |= (1L << b)
      b += 1
    }
    out
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, hs => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val b = ctx.freshName("b")
      val h = ctx.freshName("h")
      val votes = ctx.freshName("votes")
      val out = ctx.freshName("out")
      s"""
         |int $n = $hs.numElements();
         |int[] $votes = new int[32];
         |for (int $i = 0; $i < $n && !${ev.isNull}; $i++) {
         |  if ($hs.isNullAt($i)) { ${ev.isNull} = true; break; }
         |  long $h = $hs.getLong($i);
         |  for (int $b = 0; $b < 32; $b++) {
         |    if ((($h >> $b) & 1L) == 1L) $votes[$b]++; else $votes[$b]--;
         |  }
         |}
         |if (!${ev.isNull}) {
         |  long $out = 0L;
         |  for (int $b = 0; $b < 32; $b++) {
         |    if ($votes[$b] > 0) $out |= (1L << $b);
         |  }
         |  ${ev.value} = $out;
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): SimHash32 =
    copy(child = newChild)
}

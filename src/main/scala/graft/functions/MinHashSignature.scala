package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native MinHash signature: `array<bigint>` of shingle hashes →
  * `array<bigint>` of H minima, element i being
  * `min over m of (a(i)·m + b(i)) mod p`.
  *
  * Identical arithmetic to the lambda formulation
  * `array(array_min(transform(ms, m -> (aᵢ·m + bᵢ) % p)), …)` (and to
  * the DuckDB oracle), but one fused primitive loop instead of H
  * interpreted per-permutation folds — the lambda path measured ~4M
  * boxed iterations per 5k docs. Empty or null-element input → null.
  */
case class MinHashSignature(
    child: Expression, a: Seq[Long], b: Seq[Long], p: Long)
    extends UnaryExpression {

  require(a.length == b.length && a.nonEmpty)

  override def prettyName: String = "graft_minhash_signature"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<bigint>, got ${other.simpleString}")
  }

  private val aArr = a.toArray
  private val bArr = b.toArray

  override protected def nullSafeEval(input: Any): Any = {
    val ms = input.asInstanceOf[ArrayData]
    val n = ms.numElements()
    if (n == 0) return null
    val h = aArr.length
    val sig = new Array[Long](h)
    java.util.Arrays.fill(sig, Long.MaxValue)
    var i = 0
    while (i < n) {
      if (ms.isNullAt(i)) return null
      val m = ms.getLong(i)
      var j = 0
      while (j < h) {
        val v = (aArr(j) * m + bArr(j)) % p
        if (v < sig(j)) sig(j) = v
        j += 1
      }
      i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(sig)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val aRef = ctx.addReferenceObj("minhashA", aArr, "long[]")
    val bRef = ctx.addReferenceObj("minhashB", bArr, "long[]")
    nullSafeCodeGen(ctx, ev, ms => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val m = ctx.freshName("m")
      val v = ctx.freshName("v")
      val sig = ctx.freshName("sig")
      s"""
         |int $n = $ms.numElements();
         |if ($n == 0) {
         |  ${ev.isNull} = true;
         |} else {
         |  long[] $sig = new long[$aRef.length];
         |  java.util.Arrays.fill($sig, Long.MAX_VALUE);
         |  for (int $i = 0; $i < $n && !${ev.isNull}; $i++) {
         |    if ($ms.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    long $m = $ms.getLong($i);
         |    for (int $j = 0; $j < $aRef.length; $j++) {
         |      long $v = ($aRef[$j] * $m + $bRef[$j]) % ${p}L;
         |      if ($v < $sig[$j]) $sig[$j] = $v;
         |    }
         |  }
         |  if (!${ev.isNull}) {
         |    ${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray($sig);
         |  }
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashSignature =
    copy(child = newChild)
}

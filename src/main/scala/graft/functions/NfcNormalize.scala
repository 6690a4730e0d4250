package graft.functions

import java.text.Normalizer

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC normalization of a string column — the first step of
  * any serious text-cleaning pipeline (decomposed accent sequences,
  * compatibility variants, and platform-dependent producers all write
  * the SAME text with different codepoints; dedup fingerprints,
  * tokenizers, and equality joins silently fragment without canonical
  * composition). Spark ships no normalization function, so this is
  * the (b)-tier custom scalar Expression: null-safe, codegen'd via a
  * static helper call, so it stays inside whole-stage codegen instead
  * of forcing an interpreted fallback or a UDF serialization round.
  *
  * Matches DuckDB's `nfc_normalize` (both implement Unicode NFC) —
  * oracle-compared byte-for-byte by the `e5_normalize` query.
  *
  * The fast path costs one scan: `Normalizer.isNormalized` is O(n)
  * with no allocation, and real-world corpora are overwhelmingly
  * already-NFC, so the expensive compose path runs only on the rows
  * that need it.
  */
case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def prettyName: String = "graft_nfc_normalize"
  override def dataType: DataType = StringType
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string, got ${other.simpleString}")
  }

  override protected def nullSafeEval(input: Any): Any =
    NfcNormalize.nfc(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.NfcNormalize.nfc($c)")

  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)
}

object NfcNormalize {
  /** Static entry shared by interpreted eval and generated code. */
  def nfc(s: UTF8String): UTF8String = {
    val str = s.toString
    if (Normalizer.isNormalized(str, Normalizer.Form.NFC)) s
    else UTF8String.fromString(Normalizer.normalize(str, Normalizer.Form.NFC))
  }
}

package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.ext.MinHash
import graft.functions.{FloatDotProduct, MinHashSignature, SimHash32}

/** SparkSessionExtensions entry point: registers the engine's native
  * expressions as SQL functions, so they are callable from
  * `spark.sql(...)` / `expr(...)` in sessions built with
  * `.withExtensions(new GraftExtensions)` or
  * `spark.sql.extensions=graft.GraftExtensions`.
  *
  *  - `graft_dot(a, b)`          — codegen'd float-array dot product
  *  - `graft_simhash32(hs)`      — 32-bit SimHash over token hashes
  *  - `graft_minhash_sig(ms)`    — MinHash signature with the
  *                                  engine's banding constants
  *
  * The DataFrame API (`ext.Similarity`, `ext.MinHash`, `ext.TextOps`)
  * does NOT require the extension — it builds the expressions
  * directly — so the driver contract works on any plain session;
  * this registration is for SQL-first users.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def info(name: String, usage: String) =
    new ExpressionInfo(classOf[GraftExtensions].getName, null, name, usage, "")

  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.builders.foreach { case (name, usage, builder) =>
      ext.injectFunction((FunctionIdentifier(name), info(name, usage), builder))
    }
}

object GraftExtensions {

  private[graft] val builders: Seq[(String, String, Seq[Expression] => Expression)] = Seq(
    ("graft_dot",
      "graft_dot(a, b) - dot product of two float arrays as double",
      (args: Seq[Expression]) => FloatDotProduct(args(0), args(1))),
    ("graft_simhash32",
      "graft_simhash32(hs) - 32-bit simhash of a bigint-array of token hashes",
      (args: Seq[Expression]) => SimHash32(args.head)),
    ("graft_minhash_sig",
      "graft_minhash_sig(ms) - minhash signature of shingle hashes",
      (args: Seq[Expression]) => MinHashSignature(
        args.head,
        (0 until MinHash.NumHashes).map(MinHash.aConst),
        (0 until MinHash.NumHashes).map(MinHash.bConst),
        MinHash.P)))

  /** Register the same functions on an already-running session. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    builders.foreach { case (name, _, builder) =>
      org.apache.spark.sql.graftshim.ColumnBridge
        .registerTempFunction(spark, name, builder)
    }
}

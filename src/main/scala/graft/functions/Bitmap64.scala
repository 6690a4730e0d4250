package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Compressed EXACT distinct-id set over 64-bit keys — the mergeable
  * NDV statistic that stays exact at ANY per-group cardinality, where
  * the KMV sketch ([[graft.ops.Materialize.ndvSketchExact]]) goes
  * estimate-only the moment a group saturates its k hashes. This is
  * the count-distinct representation warehouse engines standardize on
  * for dashboard tiles (a compressed id set per rollup row, unioned
  * across slices); here the container is a sorted-delta varint stream
  * over the ids THEMSELVES — no hash anywhere, so exactness needs no
  * collision argument at all, only the encode/decode round-trip law.
  *
  * Wire format (binary column value):
  *  - empty set → zero bytes;
  *  - first id: zigzag varint (ids may be negative);
  *  - each subsequent id: plain varint of (delta − 1), where delta is
  *    the UNSIGNED 64-bit difference to the previous id — strictly
  *    ascending input makes every delta ≥ 1, and two's-complement
  *    subtraction of sorted longs IS the unsigned delta even across
  *    the full long range, so wrapping addition decodes it back.
  *
  * Consequences, each load-bearing for the rollup tier:
  *  - cardinality = varint count — an O(bytes) scan that never
  *    materializes the ids;
  *  - union / intersection are streaming merge-joins over two encoded
  *    inputs — O(bytes), no decode-to-array, no allocation beyond the
  *    output;
  *  - dense id runs cost ~1 byte/id, so a rollup row's bitmap is
  *    bounded by its group's true NDV, not the fact's row count —
  *    the explicit storage trade against KMV's fixed k, taken exactly
  *    when the tile must stay exact.
  *
  * All four expressions codegen to static calls on this object, so
  * they stay inside WholeStageCodegen spans (the rollup-side plans
  * are group-cardinality-sized, but there is no reason to fall out of
  * codegen for them).
  */
object Bitmap64 {

  val Empty: Array[Byte] = Array.emptyByteArray

  private def writeVarint(out: java.io.ByteArrayOutputStream, vIn: Long): Unit = {
    var v = vIn
    while ((v & ~0x7fL) != 0L) {
      out.write(((v & 0x7fL) | 0x80L).toInt)
      v >>>= 7
    }
    out.write(v.toInt)
  }

  private def zigzag(v: Long): Long = (v << 1) ^ (v >> 63)
  private def unzigzag(v: Long): Long = (v >>> 1) ^ -(v & 1L)

  /** Encode a STRICTLY ascending array of longs. The sortedness
    * requirement is the caller's (sort_array of a distinct set);
    * violations fail fast here rather than corrupt the stream.
    */
  def encode(sorted: ArrayData): Array[Byte] = {
    val n = sorted.numElements()
    if (n == 0) return Empty
    val out = new java.io.ByteArrayOutputStream(n + 8)
    var prev = sorted.getLong(0)
    writeVarint(out, zigzag(prev))
    var i = 1
    while (i < n) {
      val v = sorted.getLong(i)
      require(v > prev, s"bitmap64: input not strictly ascending at index $i ($prev -> $v)")
      writeVarint(out, (v - prev) - 1L) // unsigned delta ≥ 1, stored as delta-1
      prev = v
      i += 1
    }
    out.toByteArray
  }

  /** Number of encoded ids — one varint per id, so count the varint
    * terminators (bytes without the continuation bit).
    */
  def cardinality(b: Array[Byte]): Long = {
    var n = 0L
    var i = 0
    while (i < b.length) {
      if ((b(i) & 0x80) == 0) n += 1L
      i += 1
    }
    n
  }

  /** Streaming cursor over an encoded bitmap: call [[Cursor.advance]]
    * until it returns false; [[Cursor.value]] is the current id.
    */
  private final class Cursor(b: Array[Byte]) {
    private var pos = 0
    private var first = true
    var value: Long = 0L
    def advance(): Boolean = {
      if (pos >= b.length) return false
      var raw = 0L
      var shift = 0
      var more = true
      while (more) {
        val x = b(pos)
        pos += 1
        raw |= (x & 0x7fL) << shift
        shift += 7
        more = (x & 0x80) != 0
      }
      value = if (first) { first = false; unzigzag(raw) }
      else value + raw + 1L // wrapping add inverts the unsigned delta
      true
    }
  }

  /** Set union of two encoded bitmaps — a merge-join over the two
    * varint streams, re-encoding as it goes. Output size ≤ |a| + |b|.
    */
  def union(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
    if (a.length == 0) return b
    if (b.length == 0) return a
    val out = new java.io.ByteArrayOutputStream(a.length + b.length)
    val ca = new Cursor(a)
    val cb = new Cursor(b)
    var hasA = ca.advance()
    var hasB = cb.advance()
    var first = true
    var prev = 0L
    def emit(v: Long): Unit = {
      if (first) { writeVarint(out, zigzag(v)); first = false }
      else writeVarint(out, (v - prev) - 1L)
      prev = v
    }
    while (hasA || hasB) {
      if (hasA && (!hasB || ca.value <= cb.value)) {
        if (hasB && cb.value == ca.value) hasB = cb.advance()
        emit(ca.value)
        hasA = ca.advance()
      } else {
        emit(cb.value)
        hasB = cb.advance()
      }
    }
    out.toByteArray
  }

  /** |a ∩ b| — the same merge-join, counting matches instead of
    * re-encoding. The exact segment-overlap primitive: two rollup
    * rows in, one BIGINT out, fact table untouched.
    */
  def intersectCardinality(a: Array[Byte], b: Array[Byte]): Long = {
    if (a.length == 0 || b.length == 0) return 0L
    val ca = new Cursor(a)
    val cb = new Cursor(b)
    var hasA = ca.advance()
    var hasB = cb.advance()
    var n = 0L
    while (hasA && hasB) {
      if (ca.value == cb.value) { n += 1L; hasA = ca.advance(); hasB = cb.advance() }
      else if (ca.value < cb.value) hasA = ca.advance()
      else hasB = cb.advance()
    }
    n
  }

  /** Decode to a long array — test/diagnostic surface only; the
    * production paths (cardinality, union, intersect) never call it.
    */
  def decode(b: Array[Byte]): Array[Long] = {
    val buf = scala.collection.mutable.ArrayBuffer.empty[Long]
    val c = new Cursor(b)
    while (c.advance()) buf += c.value
    buf.toArray
  }
}

/** `array<bigint>` (strictly ascending, e.g. `sort_array(collect_set(
  * id))`) → encoded exact id-set binary ([[Bitmap64.encode]]).
  */
case class BitmapFromSorted(child: Expression) extends UnaryExpression {
  override def prettyName: String = "graft_bitmap"
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, false) => TypeCheckResult.TypeCheckSuccess
    case ArrayType(LongType, true) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<bigint>, got ${other.simpleString}")
  }

  override protected def nullSafeEval(input: Any): Any =
    Bitmap64.encode(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Bitmap64.encode($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Encoded bitmap → exact cardinality (BIGINT), via the O(bytes)
  * varint count — the ids are never materialized.
  */
case class BitmapCard(child: Expression) extends UnaryExpression {
  override def prettyName: String = "graft_bitmap_card"
  override def dataType: DataType = LongType
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires binary, got ${other.simpleString}")
  }

  override protected def nullSafeEval(input: Any): Any =
    Bitmap64.cardinality(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Bitmap64.cardinality($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** AGGREGATE set union of encoded bitmaps — `graft_bitmap_union_agg`
  * folds any number of per-group bitmap rows into one id set. This is
  * what makes the bitmap rollup a true LATTICE node where the KMV
  * sketch is structurally a leaf: per-group exact sizes can never
  * answer a coarser grouping (ids shared across groups would double-
  * count — the KMV leg's documented disqualification), but the id
  * SETS themselves union losslessly, so `count(DISTINCT id) GROUP BY
  * any-key-subset` is derivable from a finer bitmap rollup by
  * re-aggregating with this function and counting the result.
  *
  * Update and merge are the same streaming [[Bitmap64.union]] — an
  * associative, commutative, idempotent fold, so partial aggregation
  * (map-side combine) applies and shuffle order cannot perturb a
  * byte. Buffer cost is bounded by the union's true NDV, the same
  * O(group NDV) envelope the rollup already accepted at build.
  */
case class BitmapUnionAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends org.apache.spark.sql.catalyst.expressions.aggregate
    .TypedImperativeAggregate[Array[Byte]] {

  override def prettyName: String = "graft_bitmap_union_agg"
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(child)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires binary, got ${other.simpleString}")
  }

  override def createAggregationBuffer(): Array[Byte] = Bitmap64.Empty

  override def update(
      buffer: Array[Byte],
      input: org.apache.spark.sql.catalyst.InternalRow): Array[Byte] =
    child.eval(input) match {
      case null => buffer // null bitmap rows contribute nothing
      case b => Bitmap64.union(buffer, b.asInstanceOf[Array[Byte]])
    }

  override def merge(buffer: Array[Byte], other: Array[Byte]): Array[Byte] =
    Bitmap64.union(buffer, other)

  override def eval(buffer: Array[Byte]): Any = buffer

  override def serialize(buffer: Array[Byte]): Array[Byte] = buffer
  override def deserialize(bytes: Array[Byte]): Array[Byte] = bytes

  override def withNewMutableAggBufferOffset(newOffset: Int): BitmapUnionAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BitmapUnionAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}

/** Set union of two encoded bitmaps — the per-key merge step of the
  * bitmap rollup (base ⊕ delta), O(bytes) streaming.
  */
case class BitmapUnion(left: Expression, right: Expression) extends BinaryExpression {
  override def prettyName: String = "graft_bitmap_union"
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = left.nullable || right.nullable

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, BinaryType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (binary, binary), got (${l.simpleString}, ${r.simpleString})")
    }

  override protected def nullSafeEval(a: Any, b: Any): Any =
    Bitmap64.union(a.asInstanceOf[Array[Byte]], b.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.Bitmap64.union($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** |left ∩ right| of two encoded bitmaps (BIGINT) — exact overlap of
  * two stored id sets without touching the fact table.
  */
case class BitmapIntersectCard(left: Expression, right: Expression)
    extends BinaryExpression {
  override def prettyName: String = "graft_bitmap_and_card"
  override def dataType: DataType = LongType
  override def nullable: Boolean = left.nullable || right.nullable

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, BinaryType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (binary, binary), got (${l.simpleString}, ${r.simpleString})")
    }

  override protected def nullSafeEval(a: Any, b: Any): Any =
    Bitmap64.intersectCardinality(a.asInstanceOf[Array[Byte]], b.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.Bitmap64.intersectCardinality($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

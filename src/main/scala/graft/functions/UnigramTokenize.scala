package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native per-document unigram tokenize-at-ingest:
  * struct(n_tokens BIGINT, n_pieces BIGINT) for one text under a
  * frozen (piece → count) model — the JVM-loop form of
  * [[graft.ext.Unigram.tokenizeCounts]]'s nested Catalyst fold, kept
  * law-equal to it (UnigramSpec "native ≡ fold").
  *
  * Why it exists (r20, guide §"expressions and codegen"): the fold is
  * a HigherOrderFunction chain — per document an `aggregate` over
  * tokens, per token an `aggregate` over character positions with
  * maxPieceLen map probes each — and HOF lambdas are interpreted
  * per ELEMENT, never whole-stage-codegen'd. At landing scale that
  * put ~25M interpreted expression evaluations on the streaming
  * ingest's hot path (e5_unigram_stream: 13–16 s per micro-batch at
  * sf0.1, single-task because a one-file micro-batch is one
  * partition). This expression walks the same DP in one primitive
  * loop per row with a shared java.util.HashMap model.
  *
  * Exact semantics replicated from the fold (law-tested):
  *  - tokens = split(trim(text), "\\s+"), empty tokens dropped;
  *    n_tokens = their count (trim removes ASCII spaces only,
  *    matching Spark's StringTrim).
  *  - per token, Viterbi over positions: dp(0)=0,
  *    dp(i) = min over k ≤ min(maxPieceLen, i) of
  *    dp(i−k) + 2^41 − cnt(substring(i−k, i)); missing piece or
  *    unreachable cell ⇒ candidate absent; no candidate ⇒ dp(i)
  *    unreachable. n_pieces_token = (dp(len) + 2^41 − 1) >> 41.
  *  - an unreachable final cell (token with out-of-alphabet chars —
  *    possible at landing, never for the training corpus) nulls the
  *    document's n_pieces, and LATER tokens are then not evaluated at
  *    all — the fold's `acc + score` Add short-circuits on a null
  *    left, so the radix guard must not fire for tokens after the
  *    poison (pinned by UnigramSpec's radix-guard test shape).
  *  - the per-word 2^41-radix overflow guard throws on
  *    len(token) > min((2^41 − 1)/max(maxCnt, 1), 2^22 − 1) with the
  *    fold's message (ending "pieces-pack radix").
  *  - null text ⇒ null struct (the fold yields struct(null, null);
  *    both read back as null fields / dropped rows downstream —
  *    law-tested through field selection).
  */
case class UnigramTokenizeCounts(
    child: Expression,
    vocab: Seq[(String, Long)],
    maxPieceLen: Int)
  extends UnaryExpression {

  require(vocab.nonEmpty, "unigram model is empty")
  require(maxPieceLen >= 1, s"maxPieceLen must be >= 1, got $maxPieceLen")

  override def prettyName: String = "graft_unigram_tokenize_counts"

  override def dataType: DataType = StructType(Seq(
    StructField("n_tokens", LongType, nullable = true),
    StructField("n_pieces", LongType, nullable = true)))

  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string, got ${other.simpleString}")
  }

  private val Big: Long = graft.ext.Unigram.Big

  // values boxed explicitly: a [String, Long] map would auto-unbox a
  // miss (null) to 0L, and 0 is a VALID model count
  @transient private lazy val model: java.util.HashMap[String, java.lang.Long] = {
    val m = new java.util.HashMap[String, java.lang.Long](vocab.size * 2)
    vocab.foreach { case (p, c) => m.put(p, java.lang.Long.valueOf(c)) }
    m
  }

  @transient private lazy val maxCnt: Long = vocab.map(_._2).max

  /** Same bound as Unigram.guardedLen: the longest token whose packed
    * Σcnt cannot overflow the 2^41 radix.
    */
  @transient private lazy val safeLen: Long =
    math.min((Big - 1) / math.max(maxCnt, 1L), (1L << 22) - 1)

  /** Viterbi piece count for one token, or -1 when the final cell is
    * unreachable (null score in the fold form).
    */
  private def pieceCount(w: String): Long = {
    val len = w.length
    if (len > safeLen)
      throw new RuntimeException(
        s"word of length $len with max piece count $maxCnt could overflow the 2^41 pieces-pack radix")
    val dp = new Array[Long](len + 1)
    var i = 1
    while (i <= len) {
      var best = -1L
      val kMax = math.min(maxPieceLen, i)
      var k = 1
      while (k <= kMax) {
        val prev = dp(i - k)
        if (prev >= 0L) {
          val cnt = model.get(w.substring(i - k, i))
          if (cnt ne null) {
            val s = prev + Big - cnt.longValue()
            if (best < 0L || s < best) best = s
          }
        }
        k += 1
      }
      dp(i) = best
      i += 1
    }
    val fin = dp(len)
    if (fin < 0L) -1L else (fin + Big - 1) >> 41
  }

  /** Public for generated code. */
  def tokenizeJvm(input: UTF8String): InternalRow = {
    val tokens = input.trim().toString.split("\\s+", -1)
    var nTokens = 0L
    var nPieces = 0L
    var poisoned = false
    var i = 0
    while (i < tokens.length) {
      val w = tokens(i)
      if (w.nonEmpty) {
        nTokens += 1
        // the fold's accumulating Add short-circuits on a null acc:
        // after a poison, later tokens are not evaluated (and their
        // radix guard cannot fire)
        if (!poisoned) {
          val p = pieceCount(w)
          if (p < 0L) poisoned = true else nPieces += p
        }
      }
      i += 1
    }
    new GenericInternalRow(Array[Any](
      nTokens, if (poisoned) null else nPieces))
  }

  override protected def nullSafeEval(input: Any): Any =
    tokenizeJvm(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("unigramTokenize", this,
      classOf[UnigramTokenizeCounts].getName)
    nullSafeCodeGen(ctx, ev, t => s"${ev.value} = $ref.tokenizeJvm($t);")
  }

  override protected def withNewChildInternal(newChild: Expression): UnigramTokenizeCounts =
    copy(child = newChild)
}

/** Native Viterbi segmentation of ONE WORD under a frozen
  * (piece → count) model: array<string> of pieces — the JVM-loop form
  * of [[graft.ext.Unigram.viterbiSegs]]'s per-position Catalyst fold,
  * law-equal to it on total vocabularies (UnigramSpec).
  *
  * Same r20 motivation as [[UnigramTokenizeCounts]]: the fold is an
  * interpreted HOF chain carrying K (score, piece-list) struct cells
  * per position — it dominates `trainVocab`'s per-round segmentation
  * and every distinct-word encode.
  *
  * Semantics (law-tested ≡ the fold and ≡ brute-force enumeration):
  * dp(0)=0; dp(i) = min over k ≤ min(maxPieceLen, i) of
  * dp(i−k) + 2^41 − cnt(substring(i−k, i)), candidates with missing
  * pieces or unreachable cells absent; TIES at position i go to the
  * SMALLEST k (the fold's winsFrom evaluates k-ascending with <=,
  * stopping at the shortest final piece). Pieces reconstruct from the
  * per-cell winning k. The 2^41-radix guard matches
  * Unigram.guardedLen. Null word ⇒ null.
  *
  * PRECONDITION (the trainer's totality guarantee: the alphabet
  * survives every prune): every character of the word is in the
  * model. An unsegmentable word returns null here — the fold form
  * returns an undefined piece list with a null score in that
  * out-of-contract case, so the two agree on every input the
  * operators can produce.
  */
case class UnigramViterbiSegs(
    child: Expression,
    vocab: Seq[(String, Long)],
    maxPieceLen: Int)
  extends UnaryExpression {

  require(vocab.nonEmpty, "unigram model is empty")
  require(maxPieceLen >= 1, s"maxPieceLen must be >= 1, got $maxPieceLen")

  override def prettyName: String = "graft_unigram_viterbi_segs"
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string, got ${other.simpleString}")
  }

  private val Big: Long = graft.ext.Unigram.Big

  @transient private lazy val model: java.util.HashMap[String, java.lang.Long] = {
    val m = new java.util.HashMap[String, java.lang.Long](vocab.size * 2)
    vocab.foreach { case (p, c) => m.put(p, java.lang.Long.valueOf(c)) }
    m
  }

  @transient private lazy val maxCnt: Long = vocab.map(_._2).max

  @transient private lazy val safeLen: Long =
    math.min((Big - 1) / math.max(maxCnt, 1L), (1L << 22) - 1)

  /** Public for generated code. */
  def segsJvm(input: UTF8String): org.apache.spark.sql.catalyst.util.GenericArrayData = {
    val w = input.toString
    val len = w.length
    if (len > safeLen)
      throw new RuntimeException(
        s"word of length $len with max piece count $maxCnt could overflow the 2^41 pieces-pack radix")
    val dp = new Array[Long](len + 1)
    val bk = new Array[Int](len + 1)
    var i = 1
    while (i <= len) {
      var best = -1L
      var bestK = 0
      val kMax = math.min(maxPieceLen, i)
      var k = 1
      while (k <= kMax) {
        val prev = dp(i - k)
        if (prev >= 0L) {
          val cnt = model.get(w.substring(i - k, i))
          if (cnt ne null) {
            val s = prev + Big - cnt.longValue()
            // strict <: the first (smallest) k achieving the minimum
            // keeps the win — the fold's shortest-piece tie rule
            if (best < 0L || s < best) { best = s; bestK = k }
          }
        }
        k += 1
      }
      dp(i) = best
      bk(i) = bestK
      i += 1
    }
    if (len > 0 && dp(len) < 0L) return null // out-of-contract (see doc)
    var n = 0
    var j = len
    while (j > 0) { n += 1; j -= bk(j) }
    val out = new Array[Any](n)
    j = len
    var idx = n - 1
    while (j > 0) {
      out(idx) = UTF8String.fromString(w.substring(j - bk(j), j))
      idx -= 1
      j -= bk(j)
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override protected def nullSafeEval(input: Any): Any =
    segsJvm(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("unigramSegs", this,
      classOf[UnigramViterbiSegs].getName)
    nullSafeCodeGen(ctx, ev, t => s"""
      ${ev.value} = $ref.segsJvm($t);
      if (${ev.value} == null) { ${ev.isNull} = true; }
    """)
  }

  override protected def withNewChildInternal(newChild: Expression): UnigramViterbiSegs =
    copy(child = newChild)
}

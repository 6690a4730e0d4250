package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Unigram-LM (SentencePiece-family, Kudo ACL 2018) tokenizer
  * TRAINING: the OTHER production tokenizer family beside BPE's
  * merge-table ([[Bpe]]) — seed a candidate-piece vocabulary from
  * corpus substrings, then alternate (E) segment every word under the
  * current model with a Viterbi dynamic program and (M) re-estimate
  * piece usage from the chosen segmentations, pruning the vocabulary
  * after every round. The reference (hospital-ETL, etl_script.py) has
  * no text operators; this generalizes the engine to the `documents`
  * substrate the way a 100 TB pretraining pipeline needs.
  *
  * Deterministic integer surrogate for the likelihood: SentencePiece
  * maximizes Σ log p(piece), a float whose `ln` differs across
  * engines in the last ulp — unverifiable bit-exactly against an
  * independent oracle (the e5_lm_score / e5_bigram_rarity reasoning).
  * The Viterbi here optimizes the integer pair
  * (fewest pieces, then largest Σ current-usage-count), packed into
  * ONE int64 per DP cell: score = pieces · 2⁴¹ − Σcnt, so each
  * transition ADDS the constant 2⁴¹ − cnt(piece) and `min` ranks
  * (pieces asc, Σcnt desc) lexicographically. Fewest-pieces is the
  * MDL/compression objective unigram training drives toward; the
  * count term is the model — E-steps under re-estimated counts move
  * segmentations exactly like probability mass would, and every
  * comparison is exact 64-bit arithmetic both engines reproduce.
  * Remaining ties break to the SHORTEST final piece (smallest k), a
  * total order both the fold below and the oracle's CASE replay.
  *
  * Scale shape (the property that makes this trainable at 100 TB):
  * ONE corpus-sized pass (word frequencies — shared with BPE via
  * [[Bpe.wordFreqs]]), then every round runs on the DISTINCT-WORD
  * frame. The E-step is a single zero-shuffle fold per word
  * (`aggregate` over positions, vocab broadcast as a map literal —
  * the model is ≤ alphabet + multiBudget entries BY CONSTRUCTION, the
  * artifact a tokenizer ships, so collecting it each round is the
  * same bounded-collect category as BPE's per-round argmax); the
  * M-step is one explode + sum over segmented vocab rows. Nothing in
  * the loop scales with the corpus.
  */
object Unigram {

  /** 2⁴¹ — the pieces-count pack radix. Decode correctness and the
    * fewest-pieces ordering need each word's TOTAL Σcnt < 2⁴¹, and
    * Σcnt is bounded by len(word) × max piece count — a per-(model,
    * word) property no model-only require can establish (the r17
    * ADVICE finding: a ≥3-piece word with counts near 2⁴⁰ broke both
    * while the old maxCnt < 2⁴⁰ guard passed). Every fold path
    * therefore runs [[guardedLen]]: a per-row length check that
    * raises before any packed score can silently wrap — batch,
    * score-only, and streaming tokenize included.
    */
  val Big: Long = 1L << 41

  /** length(word), or raise_error when len × maxCnt could borrow into
    * the pieces digit (also capped at 2²² chars so pieces · 2⁴¹
    * itself cannot overflow int64). Evaluated once per word as the
    * fold's sequence bound — one integer compare in the hot path.
    */
  private def guardedLen(word: Column, maxCnt: Long): Column = {
    val safe = math.min((Big - 1) / math.max(maxCnt, 1L), (1L << 22) - 1)
    when(length(word).cast(LongType) <= lit(safe), length(word))
      .otherwise(raise_error(concat(
        lit("word of length "), length(word).cast("string"),
        lit(s" with max piece count $maxCnt could overflow the 2^41 pieces-pack radix"))))
  }

  /** Candidate pieces: every substring of length 1..maxPieceLen of
    * every distinct word, each OCCURRENCE (position) weighted by the
    * word's corpus frequency. `sequence(1, n)` is descending for
    * n < 1 (the Bpe.scala trap), so lengths the word can't fill
    * contribute an empty array instead.
    */
  def seedPieceCounts(words: DataFrame, maxPieceLen: Int): DataFrame =
    words.select(col("f"), explode(expr(
      s"""flatten(transform(sequence(1, $maxPieceLen), k ->
         |  CASE WHEN length(word) >= k
         |    THEN transform(sequence(1, length(word) - k + 1),
         |                   i -> substring(word, i, k))
         |    ELSE array() END))""".stripMargin)).as("piece"))
      .groupBy(col("piece")).agg(sum(col("f")).as("cnt"))

  /** Viterbi-segment each word of `words` (a (word, …) frame) under
    * the piece→count model `vocab`, appending a `segs` array column.
    * One forward fold over positions; DP cell i holds the best
    * (packed score, piece list) for the prefix word[1..i], and the
    * carried state is the last `maxPieceLen` cells — cell i−k is
    * NULL-scored while unreachable (or before the word starts), which
    * is exactly "no candidate for k", so no boundary guards exist to
    * disagree on. The model must contain every single character of
    * every word (the trainer guarantees it by keeping the alphabet
    * through every prune), making cell 0's reachability inductive.
    */
  def segment(words: DataFrame, vocab: Seq[(String, Long)], maxPieceLen: Int): DataFrame = {
    // r20: native DP (one primitive JVM loop per word, backpointer
    // reconstruction) instead of the interpreted per-position HOF
    // fold — trainVocab re-segments the distinct-word frame every EM
    // round and every encode path segments it once more, so the fold
    // dominated all four unigram gates. Fold kept law-equal below.
    import org.apache.spark.sql.graftshim.ColumnBridge
    words.withColumn("segs", ColumnBridge.column(
      graft.functions.UnigramViterbiSegs(
        ColumnBridge.expression(col("word")), vocab, maxPieceLen)))
  }

  /** The original fold form of [[segment]] — the executable spec the
    * native expression is law-tested against.
    */
  private[graft] def segmentFold(words: DataFrame, vocab: Seq[(String, Long)], maxPieceLen: Int): DataFrame =
    words.withColumn("segs", viterbiSegs(col("word"), vocab, maxPieceLen))

  /** The per-word Viterbi fold as a bare Column — composable into any
    * per-row context ([[segment]]'s frame form, the streaming
    * tokenize-at-ingest twin's nested per-document fold).
    */
  def viterbiSegs(word: Column, vocab: Seq[(String, Long)], maxPieceLen: Int): Column = {
    require(vocab.nonEmpty, "unigram model is empty")
    val maxCnt = vocab.map(_._2).max
    require(maxCnt < Big,
      s"piece count $maxCnt cannot fit the 2^41 pieces-pack radix")
    val vm = map_from_arrays(
      typedlit(vocab.map(_._1)), typedlit(vocab.map(_._2)))
    val nullCell =
      struct(lit(null).cast(LongType).as("s"), typedlit(Seq.empty[String]).as("g"))
    val init = array(
      struct(lit(0L).as("s"), typedlit(Seq.empty[String]).as("g")) +:
        Seq.fill(maxPieceLen - 1)(nullCell): _*)
    val folded = aggregate(
      sequence(lit(1), guardedLen(word, maxCnt)),
      init,
      (st: Column, i: Column) => {
        // candidate k: extend cell i−k with the k-char piece ending at i
        val cands = (1 to maxPieceLen).map { k =>
          val piece = word.substr(i - lit(k - 1), lit(k))
          val prev = st.getItem(k - 1)
          val s = prev.getField("s") + lit(Big) - try_element_at(vm, piece)
          (s, concat(prev.getField("g"), array(piece)))
        }
        val cs = cands.map(_._1)
        // smallest k whose score equals the min of all non-null
        // candidates — evaluated k-ascending with <= so ties stop at
        // the shortest piece (the oracle replays the same CASE chain)
        def winsFrom(k: Int): Column = {
          val later = (k + 1 to maxPieceLen).map(j => coalesce(cs(j - 1), cs(k - 1)))
          cs(k - 1).isNotNull &&
            (if (later.isEmpty) lit(true) else cs(k - 1) <= later.reduce(least(_, _)))
        }
        val best = (1 until maxPieceLen).foldRight(
          struct(cs(maxPieceLen - 1).as("s"), cands(maxPieceLen - 1)._2.as("g"))) {
          (k, els) =>
            when(winsFrom(k), struct(cs(k - 1).as("s"), cands(k - 1)._2.as("g")))
              .otherwise(els)
        }
        concat(array(best), slice(st, 1, maxPieceLen - 1))
      })
    folded.getItem(0).getField("g")
  }

  /** Train `rounds` hard-EM rounds; returns the final model as a
    * driver-local (piece, count) list — the artifact a tokenizer
    * ships, bounded by |alphabet| + multiBudget by construction.
    *
    * Seeding: the alphabet (every single character, always kept so
    * segmentation stays total) plus the top `multiBudget` multi-char
    * substrings by (occurrence count desc, piece asc). Each round:
    * segment the distinct-word frame under the current model
    * ([[segment]]), re-count piece usage (occurrences × word
    * frequency — the M-step), and prune back to alphabet ∪ top
    * multiBudget used multi-char pieces under the same total order.
    * Characters the E-step stopped using stay at count 0 (required
    * symbols, as SentencePiece keeps its character coverage set).
    * Both bounded collects per round are model-sized, never corpus-
    * or vocabulary-sized: the seed's top-multi cut runs distributed
    * (TakeOrdered) and the M-step recount only contains pieces the
    * segmentations used — a subset of the current model.
    */
  def trainVocab(words: DataFrame, rounds: Int, maxPieceLen: Int,
      multiBudget: Int): Seq[(String, Long)] = {
    val seed = seedPieceCounts(words, maxPieceLen)
    val alphabet = seed.filter(length(col("piece")) === 1)
      .collect().map(r => r.getString(0) -> r.getLong(1)).sortBy(_._1)
    require(alphabet.nonEmpty, "empty corpus: no characters to seed the model")
    val seedMulti = seed.filter(length(col("piece")) > 1)
      .orderBy(col("cnt").desc, col("piece").asc).limit(multiBudget)
      .collect().map(r => r.getString(0) -> r.getLong(1))
    var vocab: Seq[(String, Long)] = alphabet.toSeq ++ seedMulti
    for (_ <- 1 to rounds) {
      val counts = segment(words, vocab, maxPieceLen)
        .select(col("f"), explode(col("segs")).as("piece"))
        .groupBy(col("piece")).agg(sum(col("f")).as("cnt"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val multi = counts.iterator.filter(_._1.length > 1).toSeq
        .sortBy { case (p, c) => (-c, p) }.take(multiBudget)
      vocab = alphabet.toSeq.map { case (p, _) => p -> counts.getOrElse(p, 0L) } ++ multi
    }
    vocab
  }

  /** [[trainVocab]] over a corpus column, as a DataFrame for the
    * registry gate: (piece, n_uses) — the trained model.
    */
  def train(docs: DataFrame, textCol: String, rounds: Int, maxPieceLen: Int,
      multiBudget: Int): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val words = graft.ops.Sink.cachedEager(Bpe.wordFreqs(docs, textCol))
    val vocab = trainVocab(words, rounds, maxPieceLen, multiBudget)
    words.unpersist(blocking = false)
    vocab.toDF("piece", "n_uses")
  }

  // ---- Model artifact lifecycle (the AnnIndex discipline for text) --------
  // A tokenizer is THE canonical train-once / apply-forever artifact:
  // at 100 TB the model is trained on one corpus snapshot, shipped,
  // and every later ingest tokenizes against the FROZEN table.
  // Strings and int64 counts round-trip parquet bit-exactly, so
  // apply-from-artifact is bit-identical to apply-in-query.

  /** Persist a trained model as the standing tokenizer artifact
    * (piece, n_uses) — (alphabet + budget) rows, KB-scale.
    */
  def writeModel(spark: org.apache.spark.sql.SparkSession,
      vocab: Seq[(String, Long)], dir: String): Unit = {
    import spark.implicits._
    vocab.toDF("piece", "n_uses").coalesce(1)
      .write.mode("overwrite").parquet(dir)
  }

  /** Read a stored model back into the driver-local broadcastable
    * form every apply path consumes. Sorted for determinism — the
    * map-literal lookup is order-independent, the plan text is not.
    */
  def readModel(spark: org.apache.spark.sql.SparkSession,
      dir: String): Seq[(String, Long)] =
    spark.read.parquet(dir)
      .collect().map(r => r.getString(0) -> r.getLong(1)).sortBy(_._1).toSeq

  /** SCORE-ONLY Viterbi fold: the final packed dp value for `word`
    * under the model — same recurrence as [[viterbiSegs]] with the
    * piece lists dropped, so the carried state is K flat longs
    * instead of K growing string arrays (the count path needs no
    * segmentation: `least` over candidate scores is tie-agnostic
    * because tied candidates share the score by definition).
    */
  def viterbiScore(word: Column, vocab: Seq[(String, Long)], maxPieceLen: Int): Column =
    viterbiScoreWith(word,
      map_from_arrays(typedlit(vocab.map(_._1)), typedlit(vocab.map(_._2))),
      maxPieceLen, vocab.map(_._2).max)

  /** [[viterbiScore]] against an already-bound model map column —
    * lets a per-document fold [[TextOps.let1]]-bind the map once per
    * row instead of reconstructing the literal inside the innermost
    * lambda. `maxCnt` is the model's largest count, passed by the
    * vocab-holding caller so the per-word radix guard covers this
    * path too (the map column cannot be inspected at plan time).
    */
  def viterbiScoreWith(word: Column, vm: Column, maxPieceLen: Int,
      maxCnt: Long): Column = {
    val init = array(
      lit(0L) +: Seq.fill(maxPieceLen - 1)(lit(null).cast(LongType)): _*)
    val folded = aggregate(
      sequence(lit(1), guardedLen(word, maxCnt)),
      init,
      (st: Column, i: Column) => {
        val cs = (1 to maxPieceLen).map { k =>
          st.getItem(k - 1) + lit(Big) -
            try_element_at(vm, word.substr(i - lit(k - 1), lit(k)))
        }
        concat(array(cs.reduce(least(_, _))), slice(st, 1, maxPieceLen - 1))
      })
    folded.getItem(0)
  }

  /** Landing-time per-DOCUMENT tokenization counts under a fixed
    * model, as one per-row expression: struct(n_tokens, n_pieces) —
    * whitespace tokens and the sum of each token's Viterbi piece
    * count. The piece count is recovered from the packed score alone
    * (score = p·2⁴¹ − Σcnt with 0 ≤ Σcnt < 2⁴¹ ⟹
    * p = (score + 2⁴¹ − 1) >> 41), so the nested fold is
    * [[viterbiScore]]'s flat-long version — no string lists ride the
    * loop. Zero state, zero shuffle: the form a streaming ingest
    * computes once per arriving document. The batch path
    * ([[segment]] on the distinct-word frame + a join) is cheaper
    * per corpus; this is cheaper per DOCUMENT — the serving trade
    * both engines replay identically because segmentation is
    * word-local either way (law-tested ≡ the batch counts).
    */
  def tokenizeCounts(text: Column, vocab: Seq[(String, Long)],
      maxPieceLen: Int): Column = {
    // r20: the nested HOF fold below ([[tokenizeCountsFold]]) is
    // interpreted per element — ~maxPieceLen map probes per character
    // position per token, none of it codegen'd — and it sits on the
    // streaming ingest's per-document hot path (13–16 s per sf0.1
    // micro-batch). The native expression walks the identical DP in
    // one primitive JVM loop per row; the fold form is kept law-equal
    // next to it (UnigramSpec "native ≡ fold").
    import org.apache.spark.sql.graftshim.ColumnBridge
    ColumnBridge.column(graft.functions.UnigramTokenizeCounts(
      ColumnBridge.expression(text), vocab, maxPieceLen))
  }

  /** The original nested-fold formulation of [[tokenizeCounts]] —
    * retained as the executable spec the native expression is
    * law-tested against (two evaluation strategies of one function).
    */
  private[graft] def tokenizeCountsFold(text: Column, vocab: Seq[(String, Long)],
      maxPieceLen: Int): Column = {
    require(vocab.nonEmpty, "unigram model is empty")
    val maxCnt = vocab.map(_._2).max
    val mapLit = map_from_arrays(
      typedlit(vocab.map(_._1)), typedlit(vocab.map(_._2)))
    TextOps.let1(mapLit) { vm =>
      TextOps.let1(filter(TextOps.tokens(text), w => length(w) > 0)) { tks =>
        struct(
          size(tks).cast("long").as("n_tokens"),
          aggregate(tks, lit(0L),
            (acc: Column, w: Column) =>
              acc + shiftright(viterbiScoreWith(w, vm, maxPieceLen, maxCnt) + lit(Big - 1), 41))
            .as("n_pieces"))
      }
    }
  }
}

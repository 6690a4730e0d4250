package graft

import org.apache.spark.sql.functions._

import graft.ext.Unigram

/** Laws for the unigram-LM (SentencePiece-family) tokenizer trainer:
  * the Viterbi fold must agree EXACTLY with brute-force enumeration
  * of every segmentation under the packed integer objective, the
  * alphabet must survive every prune (segmentation totality), and
  * the hard-EM loop must move mass the way re-estimated counts say.
  */
class UnigramSpec extends SparkSpec {

  import spark.implicits._

  /** Brute force: enumerate ALL segmentations of `word` into vocab
    * pieces of length ≤ K, rank by (pieces asc, Σcnt desc, then the
    * fold's shortest-LAST-piece-first order applied left to right) —
    * the operator's tie discipline restated as explicit enumeration.
    */
  private def bruteSegs(word: String, vocab: Map[String, Long], k: Int): Option[Seq[String]] = {
    def all(rest: String): Seq[Seq[String]] =
      if (rest.isEmpty) Seq(Seq.empty)
      else (1 to math.min(k, rest.length)).flatMap { n =>
        val p = rest.take(n)
        if (vocab.contains(p)) all(rest.drop(n)).map(p +: _) else Seq.empty
      }
    val cands = all(word)
    if (cands.isEmpty) None
    else {
      // packed score = pieces * 2^41 - sum(cnt); the DP breaks packed
      // ties by preferring the SHORTER final piece at each position,
      // which in enumeration order is lexicographic on piece lengths
      // read right-to-left — equivalently, compare reversed length
      // sequences ascending.
      val best = cands.minBy { segs =>
        val score = segs.size * Unigram.Big - segs.map(vocab).sum
        (score, segs.reverse.map(_.length).mkString(","))
      }
      Some(best)
    }
  }

  private def segOne(word: String, vocab: Seq[(String, Long)], k: Int): Seq[String] =
    Unigram.segment(Seq((word, 1L)).toDF("word", "f"), vocab, k)
      .select(col("segs")).as[Seq[String]].head()

  test("Viterbi fold ≡ brute-force enumeration on a seeded random vocab") {
    val rnd = new scala.util.Random(42)
    val alphabet = "abc".map(c => c.toString -> (1L + rnd.nextInt(5))).toSeq
    val multi = Seq("ab", "bc", "abc", "cab", "bca", "aa", "ccc", "abca")
      .map(p => p -> (1L + rnd.nextInt(50)))
    val vocab = alphabet ++ multi
    val vm = vocab.toMap
    val words = (1 to 60).map(_ =>
      (0 until 1 + rnd.nextInt(8)).map(_ => ('a' + rnd.nextInt(3)).toChar).mkString)
      .distinct
    val got = Unigram.segment(words.map(w => (w, 1L)).toDF("word", "f"), vocab, 4)
      .select(col("word"), col("segs")).as[(String, Seq[String])].collect().toMap
    for (w <- words) {
      assert(got(w) == bruteSegs(w, vm, 4).get, s"word '$w'")
      assert(got(w).mkString == w, s"segmentation of '$w' must concatenate back")
    }
  }

  test("native segment ≡ the fold form on a total vocab (r20 expression swap)") {
    val rnd = new scala.util.Random(7)
    val alphabet = "abcd".map(c => c.toString -> rnd.nextInt(5).toLong).toSeq
    val multi = Seq("ab", "bc", "cd", "abc", "bcd", "abcd", "dd", "ada")
      .map(p => p -> (1L + rnd.nextInt(40)))
    val vocab = alphabet ++ multi
    val words = ((1 to 80).map(_ =>
      (0 until 1 + rnd.nextInt(9)).map(_ => ('a' + rnd.nextInt(4)).toChar).mkString)
      :+ "a").distinct
    val df = words.map(w => (w, 1L)).toDF("word", "f")
    val native = Unigram.segment(df, vocab, 4)
      .select(col("word"), col("segs")).as[(String, Seq[String])].collect().toMap
    val fold = Unigram.segmentFold(df, vocab, 4)
      .select(col("word"), col("segs")).as[(String, Seq[String])].collect().toMap
    assert(native == fold && native.size == words.size)
  }

  test("fewest pieces wins even against higher-count shorter pieces") {
    // 'ab' is massively common but 'abab' exists: 1 piece beats 2
    val vocab = Seq("a" -> 1L, "b" -> 1L, "ab" -> 1000L, "abab" -> 1L)
    assert(segOne("abab", vocab, 4) == Seq("abab"))
  }

  test("count breaks the piece-count tie; shortest piece breaks the count tie") {
    // two 2-piece segmentations of 'abc': [ab, c] (cnt 7+1=8) and
    // [a, bc] (cnt 1+7=8) — packed scores tie, DP prefers the
    // SHORTER piece at the last position: 'c' (len 1) over 'bc'
    val tie = Seq("a" -> 1L, "b" -> 1L, "c" -> 1L, "ab" -> 7L, "bc" -> 7L)
    assert(segOne("abc", tie, 4) == Seq("ab", "c"))
    // raise bc's count: [a, bc] now strictly better
    val won = Seq("a" -> 1L, "b" -> 1L, "c" -> 1L, "ab" -> 7L, "bc" -> 8L)
    assert(segOne("abc", won, 4) == Seq("a", "bc"))
  }

  test("alphabet survives pruning at count 0 and keeps segmentation total") {
    // corpus: 'ab' dominates; after round 1 every word segments to
    // [ab]-pieces, so 'a'/'b' usage drops — but they must stay in the
    // model (count 0) or any NEW word with an isolated char would
    // become unsegmentable
    val docs = Seq.fill(50)("ab ab abab").zipWithIndex
      .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val vocab = Unigram.trainVocab(
      graft.ext.Bpe.wordFreqs(docs, "text"), rounds = 2, maxPieceLen = 4, multiBudget = 4)
    val vm = vocab.toMap
    assert(vm.contains("a") && vm.contains("b"))
    assert(vm("a") == 0L && vm("b") == 0L, "chars unused by the E-step stay at 0")
    assert(vm("ab") > 0L && vm("abab") > 0L)
    // totality on unseen text under the trained model
    assert(segOne("ba", vocab, 4) == Seq("b", "a"))
  }

  test("hard-EM re-segmentation follows re-estimated counts across rounds") {
    // 'xyzw' is itself a ≤4-char seed candidate, so round 1 already
    // segments both words to their single-piece optimum; round 2's
    // recount must land on the same fixpoint — usage counts equal to
    // plain word frequencies, with every shorter candidate unused.
    val docs = Seq((0L, "xyzw xyzw xyz")).toDF("doc_id", "text")
    val vocab = Unigram.trainVocab(
      graft.ext.Bpe.wordFreqs(docs, "text"), rounds = 2, maxPieceLen = 4, multiBudget = 8)
    val vm = vocab.toMap
    // 'xyzw' is a 4-char candidate piece: 1 piece beats everything
    assert(vm("xyzw") == 2L)
    assert(segOne("xyzw", vocab, 4) == Seq("xyzw"))
  }

  test("model artifact round-trips; per-row tokenizeCounts ≡ distinct-word encode") {
    val rnd = new scala.util.Random(11)
    val docs = (0L until 30L).map(i =>
      (i, (0 until 5 + rnd.nextInt(10))
        .map(_ => Seq("spark", "scan", "sort", "a", "agg")(rnd.nextInt(5))).mkString(" ")))
      .toDF("doc_id", "text")
    val words = graft.ext.Bpe.wordFreqs(docs, "text")
    val vocab = Unigram.trainVocab(words, rounds = 2, maxPieceLen = 4, multiBudget = 8)
    // artifact round-trip is exact (strings + int64 through parquet)
    val dir = graft.ops.Sink.scratchDir("unigram_model_spec")
    Unigram.writeModel(spark, vocab, dir)
    assert(Unigram.readModel(spark, dir).toSet == vocab.toSet)
    // the per-row nested fold and the batch distinct-word encode are
    // two evaluation orders of the same word-local function
    val perRow = docs.select(col("doc_id"),
      Unigram.tokenizeCounts(col("text"), vocab, 4).as("tc"))
      .select(col("doc_id"), col("tc.n_tokens"), col("tc.n_pieces"))
      .as[(Long, Long, Long)].collect().toSet
    val nSeg = Unigram.segment(words, vocab, 4)
      .select(col("word"), size(col("segs")).cast("long").as("n_seg"))
    val batch = docs
      .select(col("doc_id"), explode(graft.ext.TextOps.tokens(col("text"))).as("word"))
      .filter(length(col("word")) > 0)
      .join(nSeg, Seq("word"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_tokens"), sum(col("n_seg")).as("n_pieces"))
      .as[(Long, Long, Long)].collect().toSet
    assert(perRow == batch && perRow.nonEmpty)
  }

  test("native tokenizeCounts ≡ the nested-fold form (r20 expression swap)") {
    // the native expression replaced the interpreted HOF fold on the
    // streaming ingest hot path; the fold stays as the executable
    // spec. Corpus exercises: repetition, out-of-alphabet chars
    // (poison → null n_pieces, including a poison BEFORE a valid
    // token), multi-whitespace, tabs (StringTrim trims spaces only),
    // empty and whitespace-only texts, and a null text.
    val rnd = new scala.util.Random(17)
    val base = (0L until 40L).map(i =>
      (i, (0 until 3 + rnd.nextInt(8))
        .map(_ => Seq("spark", "scan", "sort", "a", "agg")(rnd.nextInt(5))).mkString(" ")))
    val edge = Seq(
      (100L, "spark Ω sort"),          // mid-document out-of-alphabet token
      (101L, "Ω spark"),               // poison FIRST, valid token after
      (102L, "  spark   scan  "),      // runs of spaces
      (103L, "\tspark scan\t"),        // tabs survive trim, split drops them
      (104L, ""), (105L, "   "),       // empty / whitespace-only
      (106L, null.asInstanceOf[String]))
    val docs = (base ++ edge).toDF("doc_id", "text")
    val vocab = Unigram.trainVocab(
      graft.ext.Bpe.wordFreqs(docs.filter(col("doc_id") < 100L), "text"),
      rounds = 2, maxPieceLen = 4, multiBudget = 8)
    def collectWith(f: (org.apache.spark.sql.Column, Seq[(String, Long)], Int) => org.apache.spark.sql.Column) =
      docs.select(col("doc_id"), f(col("text"), vocab, 4).as("tc"))
        .select(col("doc_id"), col("tc.n_tokens"), col("tc.n_pieces"))
        .collect().map(r => (r.getLong(0),
          if (r.isNullAt(1)) null else r.getLong(1),
          if (r.isNullAt(2)) null else r.getLong(2))).toSet
    val native = collectWith(Unigram.tokenizeCounts)
    val fold = collectWith(Unigram.tokenizeCountsFold)
    assert(native == fold && native.size == docs.count())
    // the poison rows really did null n_pieces while keeping n_tokens
    assert(native.exists { case (id, nt, np) => id == 100L && nt == 3L && np == null })
    assert(native.exists { case (id, nt, np) => id == 101L && nt == 2L && np == null })
  }

  test("model artifact is bounded by alphabet + budget") {
    val docs = (0L until 40L).map(i => (i, s"w${i}a b${i % 7} common common"))
      .toDF("doc_id", "text")
    val budget = 5
    val vocab = Unigram.trainVocab(
      graft.ext.Bpe.wordFreqs(docs, "text"), rounds = 2, maxPieceLen = 4, multiBudget = budget)
    val alphabetSize = vocab.count(_._1.length == 1)
    assert(vocab.size <= alphabetSize + budget)
    assert(vocab.map(_._1).distinct.size == vocab.size, "no duplicate pieces")
  }

  test("pack-radix guard is per-word: len × maxCnt near 2^41 raises, short words pass (r17 ADVICE)") {
    // counts near 2^40 pass the old model-only guard, but a word
    // segmenting into ≥3 such pieces overflows Σcnt — the guard must
    // bound len(word) × maxCnt, on EVERY fold path
    val huge = 1L << 40
    val vocab = Seq("a" -> huge, "b" -> 1L)
    // safe: (2^41 - 1) / 2^40 = 1 char
    val ok = Unigram.segment(Seq(("a")).toDF("word"), vocab, 2)
      .select(col("segs")).as[Seq[String]].collect()
    assert(ok.head == Seq("a"))
    def mustRaise(body: => Unit): Unit = {
      val e = intercept[Exception](body)
      def msgs(t: Throwable): Seq[String] =
        if (t == null) Seq.empty
        else Option(t.getMessage).toSeq ++ msgs(t.getCause)
      assert(msgs(e).exists(_.contains("pieces-pack radix")), e.toString)
    }
    // segmentation path (batch train/apply)
    mustRaise(Unigram.segment(Seq(("aab")).toDF("word"), vocab, 2).collect())
    // score-only + streaming tokenize path (first token in-vocab so
    // the piece-sum fold reaches the oversized word — a NULL score
    // short-circuits the accumulating Add before later tokens)
    mustRaise(Seq(("b aab")).toDF("text")
      .select(Unigram.tokenizeCounts(col("text"), vocab, 2)).collect())
  }
}

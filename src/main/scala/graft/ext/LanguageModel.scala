package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Corpus-statistics language-model scoring (SURVEY §2.8 E5): the
  * perplexity-filter shape of an LLM-data pipeline — train an n-gram
  * model ON the corpus, score every document BY the model — without
  * the transcendental log-prob that could never hash-match across
  * engines (log is implementation-defined in the last ulp; see
  * e5_bigram_rarity's integer-exact trade for the same reasoning).
  *
  * The portable surrogate: add-one-smoothed bigram probabilities
  * p(w2|w1) = (c(w1,w2)+1) / (c(w1,·)+V) are RATIOS OF INTEGERS —
  * one IEEE division, correctly rounded and bit-identical in both
  * engines — and the per-document score is their occurrence-weighted
  * MEAN instead of the log-sum: high mean-p = predictable, fluent
  * text; low mean-p = gibberish/OCR noise/boilerplate mangling, the
  * same ordering a perplexity gate thresholds on. Double sums are
  * order-dependent, so per-bigram contributions go through
  * DECIMAL(28,10) (the kmeans/PageRank recipe) and the final mean is
  * one exact decimal-to-double cast and one division.
  *
  * The reference (hospital-ETL, etl_script.py) has no text operators;
  * this generalizes the engine to the `documents` substrate.
  */
object LanguageModel {
  private val Dec = DecimalType(28, 10)

  /** Add-one-smoothed bigram predictability per document:
    * (id, n_bigrams, mean_p) over all docs with ≥ 2 tokens, where
    * mean_p = Σ_positions p(w2|w1) / n_bigrams under the corpus-wide
    * bigram model (V = corpus vocabulary size).
    *
    * 100 TB shape: one corpus scan explodes adjacent-token pairs
    * (per-row work) and PRE-AGGREGATES to (id, w1, w2) before
    * anything shuffles — a Zipf-hot bigram's join multiplicity is
    * bounded by |docs containing it|, never its occurrence count
    * (AQE skew split covers the residual). Bigram counts derive from
    * the pre-agg by a second partial-combine (one row per bigram
    * out); left-context counts c(w1,·) derive from bigram counts by
    * a third (one row per word). V arrives as a broadcast 1-row
    * frame (the distributed scalar-subquery idiom); the vocabulary
    * pass reads only the text column of a columnar scan. The model
    * joins back to the pre-agg on (w1,w2)/(w1) — build sides are one
    * row per key, safely replicable. No all-pairs, no driver loop.
    */
  def bigramPredictability(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    // sequence(1, 0) is DESCENDING — guard the < 2-token case explicitly
    // (same pattern as MinHash.shingles)
    val bigrams = TextOps.let1(TextOps.tokens(col(textCol))) { tkv =>
      when(size(tkv) < 2, array().cast("array<struct<w1:string,w2:string>>"))
        .otherwise(transform(
          sequence(lit(1), size(tkv) - 1),
          i => struct(element_at(tkv, i).as("w1"), element_at(tkv, i + 1).as("w2"))))
    }
    val perDoc = df
      .select(col(idCol), explode(bigrams).as("bg"))
      .select(col(idCol), col("bg.w1").as("w1"), col("bg.w2").as("w2"))
      .groupBy(col(idCol), col("w1"), col("w2"))
      .agg(count(lit(1)).as("n_occ"))
    val cb = perDoc.groupBy(col("w1"), col("w2")).agg(sum(col("n_occ")).as("cb"))
    val cl = cb.groupBy(col("w1")).agg(sum(col("cb")).as("cl"))
    val vocab = df
      .select(explode(TextOps.tokens(col(textCol))).as("__word"))
      .agg(count_distinct(col("__word")).as("v"))
    val p = (col("cb") + 1L).cast("double") / (col("cl") + col("v")).cast("double")
    perDoc
      .join(cb, Seq("w1", "w2"))
      .join(cl, Seq("w1"))
      .crossJoin(broadcast(vocab))
      .select(col(idCol), col("n_occ"),
        (col("n_occ").cast("double") * p).cast(Dec).as("cd"))
      .groupBy(col(idCol))
      .agg(sum(col("n_occ")).as("n_bigrams"), sum(col("cd")).as("sdec"))
      .select(col(idCol), col("n_bigrams"),
        (col("sdec").cast("double") / col("n_bigrams").cast("double")).as("mean_p"))
  }

  /** Trigram STUPID BACKOFF scoring (Brants et al. 2007, "Large
    * Language Models in Machine Translation") of a HELD-OUT slice by
    * a model trained on the rest — the web-scale LM recipe (no
    * normalized smoothing, just score s = c3/c2, backing off to
    * 0.4·(c2/c1), then 0.4·0.4·(c1/T)) in the train/score split where
    * backoff actually fires (a corpus scored on itself has every
    * trigram seen, so the backoff chain would be dead code — this is
    * also the Moore-Lewis-style data-selection shape: rank candidate
    * docs by an in-domain model's score). Every branch is a ratio of
    * BIGINT train counts through one correctly-rounded IEEE division
    * and at most two fixed-order multiplications by the literal 0.4 —
    * bit-identical cross-engine; per-doc occurrence-weighted means go
    * through DECIMAL(28,10) as always.
    *
    * 100 TB shape: tokenization runs ONCE into an eagerly-persisted
    * (id, heldout, tokens) frame feeding all four n-gram derivations;
    * every count table pre-aggregates map-side to one row per n-gram
    * before any join; the held-out side pre-aggregates to (doc,
    * trigram, n_occ) so a Zipf-hot trigram joins once per containing
    * doc, never per occurrence; T arrives as a broadcast 1-row frame.
    * The count joins are key-equi on the n-gram — build sides one row
    * per key. No all-pairs, no driver state.
    *
    * Output: (id, n_trigrams, mean_s) for held-out docs with ≥ 3
    * tokens.
    */
  def stupidBackoffScore(df: DataFrame, idCol: String, textCol: String,
      heldout: org.apache.spark.sql.Column): DataFrame =
    stupidBackoffScore(df, idCol, textCol, heldout, null)

  /** As above with an explicit TRAIN slice predicate (over the input
    * columns; null → train on everything not held out). The two-model
    * form is what Moore–Lewis (2010) cross-entropy-difference data
    * selection runs: score the same held-out candidates by an
    * IN-DOMAIN model and a general one, rank by the contrast.
    */
  def stupidBackoffScore(df: DataFrame, idCol: String, textCol: String,
      heldout: org.apache.spark.sql.Column,
      trainPred: org.apache.spark.sql.Column): DataFrame = {
    // n-gram structs from a token array; sequence(1,0) is DESCENDING,
    // so the < n case is guarded explicitly (the MinHash.shingles rule)
    def grams(n: Int)(tk: org.apache.spark.sql.Column) =
      TextOps.let1(tk) { tkv =>
        when(size(tkv) < n,
          array().cast(s"array<struct<${(1 to n).map(j => s"w$j:string").mkString(",")}>>"))
          .otherwise(transform(
            sequence(lit(1), size(tkv) - (n - 1)),
            i => struct((0 until n).map(j =>
              element_at(tkv, i + j).as(s"w${j + 1}")): _*)))
      }
    val toks = graft.ops.Sink.cachedEager(df.select(
      col(idCol).as("doc_id"), heldout.as("ho"),
      (if (trainPred == null) lit(true) else trainPred).as("tp"),
      TextOps.tokens(col(textCol)).as("tk")))
    val train = toks.filter(!col("ho") && col("tp"))
    val c1 = train.select(explode(col("tk")).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("c1"))
    val c2 = train.select(explode(grams(2)(col("tk"))).as("g"))
      .select(col("g.w1").as("w1"), col("g.w2").as("w2"))
      .groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("c2"))
    val c3 = train.select(explode(grams(3)(col("tk"))).as("g"))
      .select(col("g.w1").as("w1"), col("g.w2").as("w2"), col("g.w3").as("w3"))
      .groupBy(col("w1"), col("w2"), col("w3")).agg(count(lit(1)).as("c3"))
    val tot = c1.agg(sum(col("c1")).as("t"))
    val hd = toks.filter(col("ho"))
      .select(col("doc_id"), explode(grams(3)(col("tk"))).as("g"))
      .select(col("doc_id"), col("g.w1").as("w1"), col("g.w2").as("w2"),
        col("g.w3").as("w3"))
      .groupBy(col("doc_id"), col("w1"), col("w2"), col("w3"))
      .agg(count(lit(1)).as("n_occ"))
    val joined = hd
      .join(c3, Seq("w1", "w2", "w3"), "left")
      .join(c2.select(col("w1"), col("w2"), col("c2").as("c2_12")),
        Seq("w1", "w2"), "left")
      .join(c2.select(col("w1").as("w2"), col("w2").as("w3"),
        col("c2").as("c2_23")), Seq("w2", "w3"), "left")
      .join(c1.select(col("w").as("w2"), col("c1").as("c1_2")), Seq("w2"), "left")
      .join(c1.select(col("w").as("w3"), col("c1").as("c1_3")), Seq("w3"), "left")
      .crossJoin(broadcast(tot))
    // branch guards mirror the backoff chain; c3>0 ⇒ c2_12>0 and
    // c2_23>0 ⇒ c1_2>0 by containment, so no division sees zero
    val s =
      when(coalesce(col("c3"), lit(0L)) > 0,
        col("c3").cast("double") / col("c2_12").cast("double"))
        .when(coalesce(col("c2_23"), lit(0L)) > 0,
          lit(0.4) * (col("c2_23").cast("double") / col("c1_2").cast("double")))
        .otherwise(lit(0.4) * (lit(0.4) *
          (coalesce(col("c1_3"), lit(0L)).cast("double") / col("t").cast("double"))))
    joined
      .select(col("doc_id"), col("n_occ"),
        (col("n_occ").cast("double") * s).cast(Dec).as("cd"))
      .groupBy(col("doc_id"))
      .agg(sum(col("n_occ")).as("n_trigrams"), sum(col("cd")).as("sdec"))
      .select(col("doc_id"), col("n_trigrams"),
        (col("sdec").cast("double") / col("n_trigrams").cast("double")).as("mean_s"))
  }
}

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
}

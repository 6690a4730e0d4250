package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Learned quality filtering (SURVEY §2.8 E5): the fastText-classifier
  * shape of an LLM-data pipeline — label a seed set, TRAIN a model on
  * features, score the WHOLE corpus with it — re-expressed with
  * arithmetic both engines compute bit-identically.
  *
  * The model is a nearest-centroid (Rocchio) classifier: per-class
  * mean of a portable feature vector, predict by smaller squared
  * distance. Every feature is a ratio of integers (one IEEE division,
  * correctly rounded in both engines); centroid means go through
  * DECIMAL(28,10) sums (order-independent, the [[LanguageModel]] /
  * kmeans recipe); the squared distance is a FIXED left-associated
  * chain of double ops, so Spark and the DuckDB oracle agree to the
  * last bit. A logistic/softmax head would add transcendentals
  * (exp/log are implementation-defined in the last ulp) without
  * changing the operator shape — train-aggregate, broadcast the
  * model, score per-row.
  *
  * The reference (hospital-ETL, etl_script.py) has no learned
  * operators; this generalizes the engine to model-based corpus
  * curation on the `documents` substrate.
  */
object QualityModel {
  private val Dec = DecimalType(28, 10)

  /** Nearest-centroid quality classification per document:
    * (id, label_seed, label_pred) where label_seed is the heuristic
    * pseudo-label ([[TextOps.qualityScore]] ≥ `threshold` → "hi") and
    * label_pred is the class whose feature centroid is nearer in
    * squared L2 over (stopword_ratio, length_saturation,
    * type_token_ratio). Ties (exactly equidistant) predict "hi".
    *
    * 100 TB shape: ONE corpus scan computes the 3 features per-row
    * (pure codegen'd expressions, no shuffle); training is one
    * partial+final aggregate down to 2 rows (the model); the model
    * pivots to a 1-row frame and BROADCASTS — scoring is then a
    * second per-row pass with zero shuffles and no join network
    * traffic. The feature frame is computed once and reused by both
    * passes (Spark plans it twice from the same lineage; at scale,
    * persist or pass a pre-materialized frame). No driver loop, no
    * collect — the "model" never leaves the cluster.
    */
  def centroidClassify(
      df: DataFrame,
      idCol: String,
      textCol: String,
      stopwords: Seq[String],
      threshold: Double = 0.5): DataFrame = {
    val labeled = featurize(df, idCol, textCol, stopwords, threshold)
    predict(labeled, train(labeled), idCol)
  }

  /** Per-row feature + pseudo-label pass: (id, f_stop, f_len, f_ttr,
    * label_seed). Pure codegen'd expressions, zero shuffles — safe on
    * batch AND unbounded streaming frames (no state, no watermark).
    */
  def featurize(
      df: DataFrame,
      idCol: String,
      textCol: String,
      stopwords: Seq[String],
      threshold: Double = 0.5): DataFrame = {
    val feats = TextOps.let1(TextOps.tokens(col(textCol))) { tk =>
      struct(
        TextOps.stopwordRatio(tk, stopwords).as("f_stop"),
        least(size(tk).cast("double") / lit(100.0), lit(1.0)).as("f_len"),
        TextOps.typeTokenRatio(tk).as("f_ttr"))
    }
    df.select(col(idCol), inline(array(feats)))
      .withColumn("label_seed",
        when((col("f_stop") * lit(0.5) + col("f_len") * lit(0.5)) >= threshold, "hi")
          .otherwise("lo"))
  }

  /** Train the model from a [[featurize]]d frame: one partial+final
    * aggregate to 2 class rows, pivoted to a single wide row
    * (hi_c_* and lo_c_*) — the frame a scoring pass broadcasts.
    */
  def train(labeled: DataFrame): DataFrame = {
    def m(c: String) = sum(col(c).cast(Dec)).cast("double") / count(lit(1))
    // 2-row model -> 1-row wide frame: max() over a single row per class
    def side(cls: String, c: String) =
      max(when(col("label_seed") === cls, col(c))).as(s"${cls}_$c")
    labeled
      .groupBy(col("label_seed"))
      .agg(m("f_stop").as("c_stop"), m("f_len").as("c_len"), m("f_ttr").as("c_ttr"))
      .agg(
        side("hi", "c_stop"), side("hi", "c_len"), side("hi", "c_ttr"),
        side("lo", "c_stop"), side("lo", "c_len"), side("lo", "c_ttr"))
  }

  /** Score a [[featurize]]d frame by nearest centroid under a
    * broadcast [[train]]ed model: (id, label_seed, label_pred).
    * Stateless per-row math after the broadcast, so the scored frame
    * may be a stream (stream-static join) — the train-offline /
    * score-online deployment shape.
    *
    * Degenerate-model behavior (r10 ADVICE): if the seed rule labeled
    * the whole corpus one class, the missing class's centroid columns
    * are NULL in the [[train]]ed row. A class with a NULL centroid is
    * NEVER predicted — every row gets the surviving class — instead
    * of the prior silent fall-through that could label everything as
    * the ABSENT class when "lo" was the missing one.
    */
  def predict(labeled: DataFrame, model: DataFrame, idCol: String): DataFrame = {
    def d2(cls: String): org.apache.spark.sql.Column = {
      def t(f: String) = {
        val diff = col(s"f_$f") - col(s"${cls}_c_$f")
        diff * diff
      }
      t("stop") + t("len") + t("ttr")
    }
    labeled
      .crossJoin(broadcast(model))
      .select(col(idCol), col("label_seed"),
        when(d2("hi").isNull, "lo")
          .when(d2("lo").isNull, "hi")
          .when(d2("hi") <= d2("lo"), "hi")
          .otherwise("lo").as("label_pred"))
  }
}

package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Aggregation operators (SURVEY §2.4 A1–A5).
  *
  * Reference semantics: pandas `len` / `nunique` / `mean` /
  * `groupby(...).mean()` (reference dashboard_app/app.py:47-48,57,74;
  * etl_app/etl_script.py:100,120,169). pandas `mean` skips NaN; Spark
  * `avg` skips null — identical. pandas `groupby` DROPS null group
  * keys; Spark keeps a null group — `groupedMean` filters them for
  * parity (SURVEY §7.4 trap 4).
  *
  * Determinism at scale: double addition is not associative, so a
  * parallel Spark sum can differ from a sequential engine in the last
  * bits. For oracle-comparable results we aggregate through
  * `DECIMAL(28,10)` — exact, association-free — and cast the final
  * value back to double. `HashAggregateExec` still does the
  * partial+final (map-side combine) split, so the shuffle moves one
  * row per group per partition, not raw rows.
  */
object Aggregates {

  private val Exact = DecimalType(28, 10)

  /** Exact, order-independent mean: sum in decimal, divide in double.
    * Null-skipping like pandas (count of the column, not count(*)).
    */
  def exactMean(c: Column): Column =
    sum(c.cast(Exact)).cast("double") / count(c)

  /** Exact, order-independent sum (decimal accumulate, double out). */
  def exactSum(c: Column): Column =
    sum(c.cast(Exact)).cast("double")

  /** A1: scalar row count (reference `len(df)`). */
  def rowCount(df: DataFrame): Long = df.count()

  /** A2: exact distinct count, null-excluding — matches pandas
    * `nunique` (dashboard_app/app.py:47). At 100 TB prefer
    * `approxDistinctCount` unless exactness is contractual: exact
    * distinct is a full shuffle of the distinct keys.
    */
  def distinctCount(df: DataFrame, column: String): DataFrame =
    df.agg(count_distinct(col(column)).as(s"n_$column"))

  /** A2 scale variant: HyperLogLog++, no exact-distinct shuffle. */
  def approxDistinctCount(df: DataFrame, column: String, rsd: Double = 0.01): DataFrame =
    df.agg(approx_count_distinct(col(column), rsd).as(s"approx_n_$column"))

  /** O6 scale variant: grouped approximate percentiles via Spark's
    * mergeable one-pass quantile sketch (`approx_percentile`,
    * Greenwald-Khanna). Exact `percentile` buffers every value of a
    * group; the sketch holds O(accuracy · log n) state per group
    * regardless of group size, with rank error ≤ n / accuracy — the
    * form that survives a 100 TB group. Output: one array column of
    * the requested quantiles per group.
    */
  def approxPercentiles(
      df: DataFrame,
      key: String,
      valueCol: String,
      quantiles: Seq[Double],
      accuracy: Int = 10000): DataFrame =
    df.groupBy(col(key)).agg(
      percentile_approx(
        col(valueCol),
        array(quantiles.map(lit): _*),
        lit(accuracy)).as(s"approx_q_$valueCol"))

  /** A3: scalar mean (dashboard_app/app.py:48). */
  def mean(df: DataFrame, column: String): DataFrame =
    df.agg(exactMean(col(column)).as(s"avg_$column"))

  /** A4/A5: grouped mean; drops null group keys for pandas parity
    * (pandas groupby drops NaN keys — dashboard_app/app.py:57,74).
    */
  def groupedMean(
      df: DataFrame,
      key: String,
      valueCol: String,
      dropNullKeys: Boolean = true): DataFrame = {
    val base = if (dropNullKeys) df.filter(col(key).isNotNull) else df
    base.groupBy(col(key)).agg(exactMean(col(valueCol)).as(s"avg_$valueCol"))
  }
}

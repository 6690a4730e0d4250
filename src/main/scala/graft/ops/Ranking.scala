package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sort / limit / top-k operators (SURVEY §2.5 O1–O3).
  *
  * Reference semantics: pandas `sort_values` puts NaN LAST regardless
  * of direction (dashboard_app/app.py:95-98) → Spark needs explicit
  * `desc_nulls_last` / `asc_nulls_last`. `head(N)` of a sorted frame
  * (app.py:101) → `orderBy(...).limit(n)`, which Catalyst plans as
  * `TakeOrderedAndProjectExec`: each partition keeps a local top-N
  * heap and only N rows per partition reach the driver — a true
  * distributed top-k with NO global sort, which is exactly what you
  * want at 100 TB.
  *
  * Determinism: ties must be broken by a total ordering or two engines
  * can legitimately return different top-k sets (SURVEY §7.4 trap 3) —
  * callers pass explicit tiebreaker columns.
  */
object Ranking {

  /** O1: global sort, descending, nulls last (pandas parity). */
  def sortDesc(df: DataFrame, column: String, tiebreakers: Seq[String] = Nil): DataFrame =
    df.orderBy(col(column).desc_nulls_last +: tiebreakers.map(col(_).asc_nulls_last): _*)

  /** O2: global sort, ascending, nulls last (pandas parity). */
  def sortAsc(df: DataFrame, column: String, tiebreakers: Seq[String] = Nil): DataFrame =
    df.orderBy(col(column).asc_nulls_last +: tiebreakers.map(col(_).asc_nulls_last): _*)

  /** O3: top-k by explicit sort order (fused to
    * TakeOrderedAndProjectExec — no global sort, no full shuffle).
    */
  def topK(df: DataFrame, order: Seq[Column], k: Int): DataFrame =
    df.orderBy(order: _*).limit(k)

  /** Top-k PER GROUP (extension beyond the reference; needed by the
    * similarity-search operators). One shuffle on the partition keys,
    * then a windowed rank — rows never leave their partition after
    * the shuffle.
    */
  def topKPerGroup(
      df: DataFrame,
      partitionCols: Seq[String],
      order: Seq[Column],
      k: Int,
      rankCol: String = "rk"): DataFrame = {
    val w = Window.partitionBy(partitionCols.map(col): _*).orderBy(order: _*)
    df.withColumn(rankCol, row_number().over(w))
      .filter(col(rankCol) <= k)
  }
}

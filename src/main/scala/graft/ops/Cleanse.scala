package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Cleansing operators (SURVEY §2.2 P2–P3).
  *
  * P2 — numeric coercion: the reference runs
  * `pd.to_numeric(col, errors='coerce')` (reference
  * etl_app/etl_script.py:79-86): unparseable text ("N/A",
  * "Too Few to Report") becomes null, never an error. Spark 4 defaults
  * `spark.sql.ansi.enabled=true`, where a plain `cast` THROWS on bad
  * input — so coercion must be `try_cast`, which reproduces pandas'
  * coerce-to-null exactly (SURVEY §4.2, the highest-risk parity trap).
  *
  * P3 — null-drop: `dropna(subset=[...])` (etl_script.py:93) → Spark
  * `na.drop("any", cols)`. Both remove a row if ANY listed column is
  * null.
  */
object Cleanse {

  /** P2: coerce each existing column to double; non-numeric → null.
    * Columns not present are skipped (the reference guards with
    * `if col in df.columns`, etl_script.py:80).
    */
  def coerceToDouble(df: DataFrame, cols: Seq[String]): DataFrame = {
    val present = cols.filter(df.columns.contains)
    present.foldLeft(df) { (d, c) =>
      d.withColumn(c, expr(s"try_cast(`$c` AS DOUBLE)"))
    }
  }

  /** P3: drop rows where any of `cols` is null. */
  def dropNullRows(df: DataFrame, cols: Seq[String]): DataFrame =
    df.na.drop("any", cols)
}

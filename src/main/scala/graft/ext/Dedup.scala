package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact deduplication (SURVEY §2.8 E1).
  *
  * `dropDuplicates(keys)` keeps an ARBITRARY row per key — fine for
  * idempotent pipelines, useless for oracle-verified ones. The
  * deterministic variant keeps the minimum row by an explicit order
  * column (window row_number, one shuffle on the dedup key), which is
  * what a reproducible training-data pipeline wants anyway: reruns
  * keep the same representative.
  *
  * At 100 TB: dedup on a FINGERPRINT ([[TextOps.fingerprint]]) of the
  * content, not the content itself — only (key, order, id) columns
  * shuffle; full documents are re-joined (or carried) afterwards.
  */
object Dedup {

  /** Spark-native arbitrary-representative dedup (kept for API
    * parity; not oracle-comparable by construction).
    */
  def exact(df: DataFrame, keys: Seq[String]): DataFrame =
    df.dropDuplicates(keys)

  /** Deterministic dedup: keep the first row per key group by
    * `orderCol` ascending, and report the group size (how many
    * duplicates the kept row represents).
    */
  def exactDeterministic(
      df: DataFrame,
      keys: Seq[String],
      orderCol: String,
      sizeCol: String = "group_size"): DataFrame = {
    val part = Window.partitionBy(keys.map(col): _*)
    val w = part.orderBy(col(orderCol).asc)
    df.withColumn("__rn", row_number().over(w))
      .withColumn(sizeCol, count(lit(1)).over(part))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }
}

package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver's deterministic parquet test tables
  * (`/root/testdata/sf*`, see TESTDATA.md). Parquet scans get column
  * pruning + predicate pushdown from Catalyst for free, so callers
  * should express projections/filters declaratively and let the scan
  * shrink.
  */
object Tables {
  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def lineitem(spark: SparkSession, d: String): DataFrame = load(spark, d, "lineitem")
  def orders(spark: SparkSession, d: String): DataFrame = load(spark, d, "orders")
  def customer(spark: SparkSession, d: String): DataFrame = load(spark, d, "customer")
  def supplier(spark: SparkSession, d: String): DataFrame = load(spark, d, "supplier")
  def part(spark: SparkSession, d: String): DataFrame = load(spark, d, "part")
  def nation(spark: SparkSession, d: String): DataFrame = load(spark, d, "nation")
  def region(spark: SparkSession, d: String): DataFrame = load(spark, d, "region")
  /** `events.ts` is TIMESTAMP(NANOS) parquet, which Spark only reads
    * under `spark.sql.legacy.parquet.nanosAsLong=true` (as a long of
    * nanos). Convert to a proper TimestampType here — lossless: the
    * generator's values carry no sub-microsecond component.
    */
  def events(spark: SparkSession, d: String): DataFrame = {
    val raw = load(spark, d, "events")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts", org.apache.spark.sql.functions.timestamp_micros(
          org.apache.spark.sql.functions.expr("ts div 1000")))
      case _ => raw
    }
  }
  def documents(spark: SparkSession, d: String): DataFrame = load(spark, d, "documents")
  def embeddings(spark: SparkSession, d: String): DataFrame = load(spark, d, "embeddings")
}

package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Warm-up: a small scan+agg job absorbs JVM/codegen/parquet-footer
    // startup so it doesn't land on the alphabetically-first query
    // (r2 showed ~5s of warm-up attributed to a1_count).
    // NonFatal only: swallowing OutOfMemoryError / linkage errors here
    // would let the bench proceed on a broken JVM and misattribute the
    // failure to later queries (r3 ADVICE).
    try SparkEntry.queries.get("a1_count")
      .foreach(_(spark, sfDir).write.format("noop").mode("overwrite").save())
    catch { case scala.util.control.NonFatal(_) => () }
    // Drive with a noop write, not count(): under count() Catalyst's
    // EliminateSorts deletes orderBys, so sort queries would measure
    // nothing. Failures are reported explicitly instead of as -1.
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      val err: Option[String] =
        try { fn(spark, sfDir).write.format("noop").mode("overwrite").save(); None }
        catch { case e: Throwable => Some(s"${e.getClass.getSimpleName}: ${String.valueOf(e.getMessage).take(120)}") }
      // measure before cache teardown: clearCache is bookkeeping between
      // queries, not part of the query (r2 ADVICE)
      val elapsed = (System.nanoTime() - t0) / 1e9
      spark.catalog.clearCache()
      (name, elapsed, err)
    }
    // escape ALL control chars: Spark exception messages carry newlines,
    // and one raw \n would make the whole bench line unparseable JSON
    def jstr(s: String) = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val qs = results.map { case (k, v, _) => jstr(k) + ":" + v }.mkString("{", ",", "}")
    val errs = results.collect { case (k, _, Some(e)) => jstr(k) + ":" + jstr(e) }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"errors":$errs,"sf":"$sfDir"}""")
    spark.stop()
  }
}

package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.plans.{MvCatalog, MvRewriteRule}

/** Laws for the materialized-view substitution (s30): the rewrite
  * must change the PLAN (fact scan → rollup scan) and must not change
  * one bit of the RESULT — and it must refuse every query it cannot
  * prove, leaving the fact scan in place.
  */
class MvRewriteSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"
  private val cents = floor(col("o_totalprice") * 100).cast("long")

  /** The test session has no GraftExtensions, so attach the rule the
    * way RangeJoinRuleSpec does (extraOptimizations) and open the
    * opt-in conf window for the body.
    */
  private def withMvRule[T](body: => T): T = {
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations :+ MvRewriteRule
    spark.conf.set(MvRewriteRule.EnabledKey, "true")
    try body
    finally {
      spark.conf.unset(MvRewriteRule.EnabledKey)
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations.filterNot(_ eq MvRewriteRule)
    }
  }

  private def rows(df: DataFrame): Seq[Seq[Any]] =
    df.collect().toSeq.map(_.toSeq).sortBy(_.mkString("|"))

  private def scans(df: DataFrame): Set[String] =
    MvRewriteRule.scanPaths(df.queryExecution.optimizedPlan)

  private def mvReady(): Unit = ParityQueries.s30MvDir(spark, dir)

  test("s30 MV rewrite: rollup scan substituted, results bit-identical") {
    mvReady()
    val unrewritten = rows(ParityQueries.s30UserQuery(spark, dir))
    val (rewritten, paths) = withMvRule {
      val q = ParityQueries.s30UserQuery(spark, dir)
      (rows(q), scans(q))
    }
    assert(paths.exists(_.contains("mv_orders")), paths)
    assert(!paths.exists(_.contains("orders.parquet")), paths)
    assert(rewritten == unrewritten)
  }

  test("filter on the group key pushes onto the rollup and stays exact") {
    mvReady()
    def q: DataFrame = Tables.orders(spark, dir)
      .filter(col("o_custkey") % 7 === 0)
      .groupBy(col("o_custkey"))
      .agg(count(lit(1)).as("n_orders"), sum(cents).as("sum_cents"))
    val plain = rows(q)
    val (rewritten, paths) = withMvRule { (rows(q), scans(q)) }
    assert(paths.exists(_.contains("mv_orders")), paths)
    assert(!paths.exists(_.contains("orders.parquet")), paths)
    assert(rewritten == plain)
  }

  test("non-derivable aggregate (count_distinct) leaves the fact scan") {
    mvReady()
    val q = Tables.orders(spark, dir)
      .groupBy(col("o_custkey"))
      .agg(countDistinct(col("o_orderpriority")).as("nd"))
    val paths = withMvRule { scans(q) }
    assert(paths.exists(_.contains("orders.parquet")), paths)
  }

  test("a different metric expression leaves the fact scan") {
    mvReady()
    val q = Tables.orders(spark, dir)
      .groupBy(col("o_custkey"))
      .agg(sum(floor(col("o_totalprice") * 200).cast("long")).as("x"))
    val paths = withMvRule { scans(q) }
    assert(paths.exists(_.contains("orders.parquet")), paths)
  }

  test("a filter on a non-key column leaves the fact scan") {
    mvReady()
    val q = Tables.orders(spark, dir)
      .filter(col("o_orderpriority") === "1-URGENT")
      .groupBy(col("o_custkey"))
      .agg(count(lit(1)).as("n"), sum(cents).as("s"))
    val paths = withMvRule { scans(q) }
    assert(paths.exists(_.contains("orders.parquet")), paths)
  }

  test("computed-key MV: grouping by the key EXPRESSION rewrites") {
    val day = date_trunc("DAY", col("o_orderdate"))
    val path = graft.ops.Sink.scratchDir("mv_orders_day_test") + "/daily"
    MvCatalog.create(spark, "test_orders_daily",
      Tables.orders(spark, dir), day, "day", cents, path)
    try {
      def q: DataFrame = Tables.orders(spark, dir)
        .groupBy(day.as("day"))
        .agg(count(lit(1)).as("n_orders"),
          min(cents).as("min_cents"), max(cents).as("max_cents"))
      val plain = rows(q)
      val (rewritten, paths) = withMvRule { (rows(q), scans(q)) }
      assert(paths.exists(_.contains("mv_orders_day_test")), paths)
      assert(!paths.exists(_.contains("orders.parquet")), paths)
      assert(rewritten == plain)
    } finally MvCatalog.unregister("test_orders_daily")
  }

  test("disabled conf leaves every plan untouched even with MVs registered") {
    mvReady()
    // rule attached but conf NOT set: EnabledKey defaults to false
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations :+ MvRewriteRule
    try {
      val paths = scans(ParityQueries.s30UserQuery(spark, dir))
      assert(paths.exists(_.contains("orders.parquet")), paths)
    } finally spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations.filterNot(_ eq MvRewriteRule)
  }
}

package graft

import scala.util.Random

import org.apache.spark.sql.functions._

import graft.ext.Dedup
import graft.ops.{Ranking, Relational}

/** Algebraic laws over seeded random data (deterministic; several
  * sizes per law — the Spark-side complement to the pure-function
  * ScalaCheck properties in LawsProps).
  */
class SparkLawsSpec extends SparkSpec {
  import spark.implicits._

  private def randomPairs(seed: Int, n: Int, keySpace: Int): Seq[(Int, Int)] = {
    val r = new Random(seed)
    Seq.fill(n)((r.nextInt(keySpace), r.nextInt(1000)))
  }

  test("law: dedup group sizes sum to input size; representatives are minima") {
    for (seed <- Seq(1, 7, 42)) {
      val data = randomPairs(seed, 300, 20).toDF("k", "v")
      val out = Dedup.exactDeterministic(data, Seq("k"), "v").collect()
      assert(out.map(_.getLong(2)).sum == 300L)
      val minByKey = data.groupBy("k").agg(min("v")).as[(Int, Int)].collect().toMap
      out.foreach(r => assert(r.getInt(1) == minByKey(r.getInt(0))))
    }
  }

  test("law: salted join equals plain join for random sizes and buckets") {
    for ((seed, buckets) <- Seq((3, 2), (9, 5), (27, 16))) {
      val l = randomPairs(seed, 150, 10).toDF("k", "lv")
      val r = (0 until 10).map(i => (i, s"d$i")).toDF("k", "name")
      val plain = Relational.innerJoin(l, r, Seq("k"))
        .collect().map(_.toSeq).sortBy(_.mkString(",")).toSeq
      val salted = Relational.saltedInnerJoin(l, r, Seq("k"), buckets)
        .select("k", "lv", "name").collect().map(_.toSeq).sortBy(_.mkString(",")).toSeq
      assert(salted == plain)
    }
  }

  test("law: topKPerGroup returns at most k rows per group, all from the input") {
    for ((seed, k) <- Seq((5, 1), (11, 3))) {
      val data = randomPairs(seed, 200, 8).toDF("k", "v")
      val out = Ranking.topKPerGroup(data, Seq("k"), Seq(col("v").desc, col("v").asc), k)
        .drop("rk")
      val perGroup = out.groupBy("k").count().as[(Int, Long)].collect()
      assert(perGroup.forall(_._2 <= k))
      val inputSet = data.as[(Int, Int)].collect().toSet
      assert(out.as[(Int, Int)].collect().forall(inputSet.contains))
    }
  }

  test("law: |A∩B| + |A\\B| = |distinct A| for set ops") {
    for (seed <- Seq(2, 13)) {
      val a = randomPairs(seed, 100, 30).map(_._1).toDF("x")
      val b = randomPairs(seed + 1, 100, 30).map(_._1).toDF("x")
      val inter = a.intersect(b).count()
      val minus = a.except(b).count()
      assert(inter + minus == a.distinct().count())
    }
  }
}

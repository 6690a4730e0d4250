package graft

import org.apache.spark.sql.functions._

import graft.ext.{MinHash, Similarity}
import graft.ops.Sink

/** Units for S6 retry and the E2 verification-stage operators. */
class RetryAndNearDupSpec extends SparkSpec {
  import spark.implicits._

  test("withRetry succeeds after transient failures") {
    var calls = 0
    val out = Sink.withRetry(attempts = 4, delayMs = 1) {
      calls += 1
      if (calls < 3) sys.error("db warming up")
      "connected"
    }
    assert(out == "connected")
    assert(calls == 3)
  }

  test("withRetry rethrows after exhausting attempts") {
    var calls = 0
    val e = intercept[RuntimeException] {
      Sink.withRetry(attempts = 2, delayMs = 1) { calls += 1; sys.error("down") }
    }
    assert(e.getMessage == "down")
    assert(calls == 2)
  }

  test("exactJaccardPairs: identical docs 1.0, near-dups high, verified exactly") {
    val base = (1 to 30).map(i => s"tok$i").mkString(" ")
    val docs = Seq(
      (1L, base),
      (2L, base),                                    // identical → J = 1.0
      (3L, base.replace("tok30", "changed")),        // near-dup
      (4L, (100 to 130).map(i => s"zz$i").mkString(" "))).toDF("id", "body")
    val pairs = MinHash.exactJaccardPairs(docs, "id", "body")
      .as[(Long, Long, Double)].collect().map(p => (p._1, p._2) -> p._3).toMap
    assert(pairs((1L, 2L)) == 1.0)
    // 30 tokens → 28 windows; the last token appears only in the
    // final window, so 27 of 28 are shared: J = 27/(28+28-27)
    assert(math.abs(pairs((1L, 3L)) - 27.0 / 29.0) < 1e-12)
    assert(!pairs.keySet.exists { case (a, b) => a == 4L || b == 4L })
  }

  test("nearDupPairs finds same-bucket high-cosine pairs only, once") {
    val vecs = Seq(
      (0L, Array(1f, 1f, 0.1f)),
      (1L, Array(0.9f, 1.1f, 0.1f)),   // ~parallel to 0, same bucket
      (2L, Array(-1f, 1f, 0.1f)),      // different bucket
      (3L, Array(1f, 0.9f, -2f))).toDF("vec_id", "embedding") // same bucket as.. no: sign(-2)
    val out = Similarity.nearDupPairs(vecs, nBits = 3, threshold = 0.9)
      .as[(Long, Long, Double)].collect()
    assert(out.map(p => (p._1, p._2)).toSeq == Seq((0L, 1L)))
    assert(out.head._3 > 0.99)
  }
}

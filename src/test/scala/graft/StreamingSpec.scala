package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

import graft.streaming.EventStream

/** Structured Streaming units: watermarked windowed aggregation,
  * stateful running counts, and streaming dedup, driven through
  * MemoryStream with a memory sink.
  */
class StreamingSpec extends SparkSpec {
  import spark.implicits._

  private def ts(hhmm: String): Timestamp =
    Timestamp.valueOf(s"2026-01-01 $hhmm:00")

  test("windowedStats aggregates into event-time hour buckets incrementally") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Timestamp, Double)]
    val q = EventStream.windowedStats(
      in.toDF().toDF("ts", "value"), lateness = "0 seconds")
      .writeStream.format("memory").queryName("ws_out")
      .outputMode(OutputMode.Append).start()
    try {
      in.addData((ts("10:05"), 1.0), (ts("10:35"), 3.0), (ts("11:10"), 10.0))
      q.processAllAvailable()
      // advance the watermark far enough to close both hours
      in.addData((ts("13:00"), 0.0))
      q.processAllAvailable()
      val rows = spark.table("ws_out")
        .as[(Timestamp, Long, Double)].collect().sortBy(_._1.getTime).toSeq
      assert(rows == Seq(
        (ts("10:00"), 2L, 2.0),   // (1+3)/2 in the 10:00 window
        (ts("11:00"), 1L, 10.0)))
    } finally q.stop()
  }

  test("runningCounts accumulates per-key state across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(String, Long)]
    val q = EventStream.runningCounts(in.toDS())
      .writeStream.format("memory").queryName("rc_out")
      .outputMode(OutputMode.Update).start()
    try {
      in.addData(("a", 1L), ("a", 1L), ("b", 1L))
      q.processAllAvailable()
      in.addData(("a", 1L))
      q.processAllAvailable()
      val last = spark.table("rc_out").as[(String, Long)].collect()
        .groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).max }
      assert(last == Map("a" -> 3L, "b" -> 1L))
    } finally q.stop()
  }

  test("streamingDedup drops duplicate keys within the watermark horizon") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Timestamp, String)]
    val q = EventStream.streamingDedup(
      in.toDF().toDF("ts", "k"), Seq("k"), lateness = "1 hour")
      .writeStream.format("memory").queryName("dd_out")
      .outputMode(OutputMode.Append).start()
    try {
      in.addData((ts("10:00"), "x"), (ts("10:01"), "x"), (ts("10:02"), "y"))
      q.processAllAvailable()
      in.addData((ts("10:03"), "x"))
      q.processAllAvailable()
      assert(spark.table("dd_out").select("k").as[String].collect().sorted.toSeq ==
        Seq("x", "y"))
      // eviction: advance the watermark far past x's expiry (first-seen
      // + lateness), then re-send x — its state must be GONE, so the
      // key is admitted again. This is the bounded-state property
      // dropDuplicatesWithinWatermark provides and plain dropDuplicates
      // on a non-event-time subset does not.
      in.addData((ts("13:00"), "z"))
      q.processAllAvailable()
      in.addData((ts("13:01"), "x"))
      q.processAllAvailable()
      assert(spark.table("dd_out").select("k").as[String].collect().sorted.toSeq ==
        Seq("x", "x", "y", "z"))
    } finally q.stop()
  }
}

package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.ops.Aggregates

/** Structured Streaming operators over the `events` shape
  * (event_id, ts, user_id, event_type, value — TESTDATA.md).
  *
  * The reference is batch-only (SURVEY §2.7), so this module is the
  * engine's forward-looking streaming surface: the SAME logical
  * transforms as the batch W1 query, executed incrementally. In
  * Structured Streaming the plan below runs with partial aggregation
  * map-side and state-store-backed windows — at scale only
  * (window, partial-agg) rows shuffle, and the watermark bounds state
  * size by evicting windows older than the allowed lateness.
  */
object EventStream {

  /** Watermarked tumbling-window stats — the streaming twin of the
    * registered batch `w1_window_agg` query (identical aggregates:
    * count + exact decimal mean). Late events beyond `lateness` are
    * dropped and their windows finalized/evicted.
    */
  def windowedStats(
      events: DataFrame,
      lateness: String = "2 hours",
      windowLen: String = "1 hour"): DataFrame =
    events
      .withWatermark("ts", lateness)
      .groupBy(window(col("ts"), windowLen).as("w"))
      .agg(count(lit(1)).as("n"), Aggregates.exactMean(col("value")).as("avg_value"))
      .select(col("w.start").as("bucket"), col("n"), col("avg_value"))

  /** Per-key running state for [[runningCounts]]. */
  case class KeyCount(key: String, n: Long)

  /** Stateful per-key running counts via mapGroupsWithState — the
    * minimal template for custom streaming state (sessionization,
    * streaming dedup, CDC merge all specialize this shape). State is
    * per-key in the state store.
    *
    * NoTimeout keeps the example deterministic under test drivers: a
    * processing-time timeout makes the engine schedule continuous
    * no-data micro-batches for state eviction, which starves
    * `processAllAvailable`-style synchronization. A production
    * deployment with unbounded key space should switch to
    * `EventTimeTimeout` + `state.setTimeoutTimestamp` so idle keys
    * are evicted as the watermark advances.
    */
  def runningCounts(
      events: Dataset[(String, Long)]): Dataset[KeyCount] = {
    import events.sparkSession.implicits._
    events.groupByKey(_._1)
      .mapGroupsWithState[Long, KeyCount](GroupStateTimeout.NoTimeout) {
        (key: String, rows: Iterator[(String, Long)], state: GroupState[Long]) =>
          val prev = state.getOption.getOrElse(0L)
          val next = prev + rows.size
          state.update(next)
          KeyCount(key, next)
      }
  }

  /** Streaming exact dedup on a key column: first arrival wins,
    * duplicates within the watermark horizon are dropped — the
    * streaming counterpart of ext.Dedup.
    *
    * `dropDuplicatesWithinWatermark` (not `dropDuplicates`): plain
    * dropDuplicates only evicts state when the event-time column is
    * PART of the dedup keys — with keys like Seq("k") its state grows
    * without bound despite the watermark. The WithinWatermark variant
    * expires each key once the watermark passes its first-seen event
    * time plus the delay, so state is bounded by the key arrival rate
    * × the lateness horizon — the property an unbounded-key-space
    * deployment actually needs.
    */
  def streamingDedup(events: DataFrame, keyCols: Seq[String], lateness: String = "2 hours"): DataFrame =
    events.withWatermark("ts", lateness).dropDuplicatesWithinWatermark(keyCols)

  /** Default output mode for the windowed aggregation (append emits
    * each window once, when the watermark passes its end).
    */
  val WindowedOutputMode: OutputMode = OutputMode.Append
}

package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StreamingQuery}

import graft.sources.Tables

/** Structured Streaming over the events stream (SURVEY.md §2.G G19).
  *
  * The same logical window aggregation runs in batch (Relational.q19) and
  * here as a stream: `withWatermark` bounds state, tumbling/sliding/session
  * windows come from the built-in window functions, and custom per-key
  * state uses mapGroupsWithState. Batch/stream equivalence and late-row
  * semantics are asserted in StreamingSpec.
  *
  * Scale: streaming state is partitioned by group key across executors;
  * the watermark is what makes 100 TB/day ingestion possible — state for
  * closed windows is dropped, so memory is bounded by (watermark horizon ×
  * key cardinality), not by stream length.
  */
object EventStreams {

  /** Tumbling 1-hour window aggregation (stream form of q19_window_agg). */
  def hourlyAgg(events: DataFrame, watermark: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      // group by the intact window struct — extracting .start before the agg
      // would strip the event-time marker append mode needs
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("c"), round(sum("value"), 2).as("s"))
      .select(col("w.start").as("ws"), col("event_type"), col("c"), col("s"))

  /** Sliding 30-min windows every 10 min (overlapping assignment). */
  def slidingAgg(events: DataFrame, watermark: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), "30 minutes", "10 minutes").as("w"), col("event_type"))
      .agg(count(lit(1)).as("c"))
      .select(col("w.start").as("ws"), col("event_type"), col("c"))

  /** Session windows per user with a 30-minute gap. */
  def sessionAgg(events: DataFrame, watermark: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(session_window(col("ts"), "30 minutes").as("sw"), col("user_id"))
      .agg(count(lit(1)).as("c"))
      .select(col("sw.start").as("ss"), col("user_id"), col("c"))

  /** Streaming exact dedup: drop re-deliveries of the same event_id, with
    * watermarked state so the dedup table doesn't grow unboundedly — the
    * at-least-once→exactly-once repair stage of a 100 TB/day ingest. */
  def dedupStream(events: DataFrame, watermark: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .dropDuplicates("event_id", "ts")

  case class UserRunning(user_id: Long, n: Long, total: Double)

  /** Custom keyed state: running per-user event count + value total via
    * mapGroupsWithState (the KeyValueGroupedDataset stateful API). */
  def runningTotals(spark: SparkSession, events: DataFrame): DataFrame = {
    import spark.implicits._
    events.select(col("user_id").as[Long], col("value").as[Double])
      .groupByKey(_._1)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout()) {
        (user: Long, rows: Iterator[(Long, Double)], state: GroupState[UserRunning]) =>
          val prev = state.getOption.getOrElse(UserRunning(user, 0L, 0.0))
          var n = prev.n; var total = prev.total
          rows.foreach { r => n += 1; total += r._2 }
          val next = UserRunning(user, n, total)
          state.update(next)
          next
      }
      .toDF()
  }

  /** Run a streaming query over a memory-fed stream to completion
    * (test/replay harness): returns the final result table. */
  def runToCompletion(q: StreamingQuery): Unit = {
    q.processAllAvailable()
    q.stop()
  }
}

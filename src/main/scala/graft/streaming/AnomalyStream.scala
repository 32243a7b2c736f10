package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StreamingQuery}

import graft.operators.Quality

/** Streaming spike detection: the watermarked hourly window aggregation
  * runs in the stream, and each micro-batch's (type, hour) counts are
  * scored in foreachBatch against a TRAINED per-type baseline with the
  * SAME [[Quality.scoreHourly]] the batch detector uses — batch ≡ stream
  * by construction (one scorer, two drivers), asserted in
  * AnomalyStreamSpec.
  *
  * The baseline comes from history, not the live stream — the production
  * contract (a self-derived live baseline would chase its own spikes),
  * and also what keeps the plan legal: Structured Streaming forbids a
  * second aggregation downstream of the windowed count, while a
  * broadcast stats join inside foreachBatch is plain batch code.
  * Scale: streaming state is the watermark-bounded window store
  * (types × open hours) — which is why the sink runs in UPDATE mode:
  * Complete mode would have to re-emit every window ever seen each
  * trigger, so Spark pins all of them in state forever (types × all
  * hours since start) and the watermark evicts nothing. Update emits
  * only the windows a batch changed; flags are monotone (counts only
  * grow and the scorer is high-side-only), so a per-(type, hour)
  * last-wins sink — or just a keyed upsert — holds the current flag set.
  */
object AnomalyStream {

  /** Watermarked per-type hourly counts, stream form. */
  def hourlyCounts(events: DataFrame, watermark: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("c"))
      .select(col("event_type"), col("w.start").as("h"), col("c"))

  /** Start the detector: score each batch's UPDATED window counts
    * against the trained `stats` frame, handing flagged rows to
    * `onFlagged`. The callback sees only changed windows; because counts
    * are monotone and the scorer is high-side-only, a keyed last-wins
    * upsert downstream reconstructs the exact current flag set
    * (AnomalyStreamSpec does precisely that and matches batch q31). */
  def start(events: DataFrame, stats: DataFrame, queryName: String,
      onFlagged: DataFrame => Unit, z: Double = Quality.AnomalyZ,
      watermark: String = "10 minutes"): StreamingQuery = {
    // the trained frame joins into EVERY micro-batch: un-persisted, a
    // live aggregation plan over history re-executes per trigger and
    // per-trigger latency grows with history size (r9 review find) —
    // pin it once for the query's lifetime (stats tables are
    // type×hour-bounded, broadcast-scale by construction)
    val pinned = stats.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    pinned.count() // materialize before the first trigger
    hourlyCounts(events, watermark).writeStream
      .outputMode(OutputMode.Update())
      .queryName(queryName)
      .foreachBatch { (df: DataFrame, _: Long) =>
        onFlagged(Quality.scoreHourly(df, pinned, z))
      }
      .start()
  }
}

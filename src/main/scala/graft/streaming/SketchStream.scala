package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.operators.{Sketches, Snapshots}

/** Streaming distinct-count maintenance: each micro-batch is reduced to
  * its per-(event_type, day) HLL sketches and committed exactly-once
  * into a [[Snapshots]] log via [[SnapshotStream.ingestBatch]]; the read
  * path unions the accumulated sketch rows per type. Three properties
  * compose to make this the 100 TB shape:
  *
  *   - the sketch reduction is the ONLY thing that sees raw events —
  *     the log stores KB-sized sketch rows (∝ types × days per batch),
  *     so a year of stream output is a tiny table however large the
  *     event volume;
  *   - HLL union is order- and partition-insensitive, so per-batch
  *     sketches merged at read time equal the one-shot sketch over all
  *     events ever ingested (the [[Sketches]] merge law — SketchStreamSpec
  *     pins stream ≡ batch on the same feed);
  *   - a replayed micro-batch (foreachBatch is at-least-once after a
  *     crash) hits the manifest tag guard and commits nothing, and even
  *     a hypothetical double-merge would be absorbed by HLL idempotence
  *     (max of identical registers) — two independent exactly-once
  *     nets.
  */
object SketchStream {

  /** Per-batch sketch reduction (also the replay unit under test). */
  def sketchBatch(df: DataFrame): DataFrame =
    df.groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(hll_sketch_agg(col("user_id"), Sketches.LgK).as("sk"))

  def start(stream: DataFrame, table: String, checkpoint: String): StreamingQuery =
    stream.writeStream
      .foreachBatch((df: DataFrame, id: Long) => {
        SnapshotStream.ingestBatch(sketchBatch(df), table, id); ()
      })
      .option("checkpointLocation", checkpoint)
      .start()

  /** Distinct users per type over everything ingested so far — unions
    * sketch rows from every committed batch; never touches an event. */
  def distinctUsers(spark: SparkSession, table: String): DataFrame =
    Snapshots.read(spark, table)
      .groupBy("event_type")
      .agg(hll_sketch_estimate(hll_union_agg(col("sk"))).as("est"))
      .orderBy("event_type")
}

package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.StreamingQuery

import graft.operators.Snapshots

/** Exactly-once streaming ingest into a [[Snapshots]] transaction log:
  * each micro-batch becomes one log commit tagged `s<batchId>`, and a
  * replayed batchId (foreachBatch is at-least-once after a crash) hits
  * [[Snapshots.commitIfAbsent]]'s tag guard and commits nothing — the
  * same ledger idea as [[ExactlyOnceSink]], but the ledger IS the
  * table's own manifest history, so consumers get time travel,
  * [[Snapshots.appendedBetween]] change feeds, and stats-pruned reads
  * over the live stream output for free.
  *
  * Scale: a commit costs the batch write + one manifest line set; the
  * dedup guard scans the manifest history (bounded by commit count, and
  * by [[Snapshots.vacuum]] retention), never the data.
  */
object SnapshotStream {

  /** The idempotent per-batch ingest (also the replay unit under test).
    * `tagPrefix` namespaces the exactly-once guard: checkpoint batchIds
    * restart at 0 PER STREAM, so two streams ingesting into one table
    * with the same prefix would silently drop each other's batches on
    * the shared tag (r9 review find) — give each writer its own prefix. */
  def ingestBatch(df: DataFrame, table: String, batchId: Long,
      statsCol: Option[String] = None, tagPrefix: String = "s"): Option[Int] =
    Snapshots.commitIfAbsent(df, table, s"$tagPrefix$batchId", statsCol)

  /** Attach the snapshot-log sink to a stream — one distinct `tagPrefix`
    * per writer sharing a table. */
  def start(stream: DataFrame, table: String, checkpoint: String,
      tagPrefix: String = "s"): StreamingQuery =
    stream.writeStream
      .foreachBatch((df: DataFrame, id: Long) =>
        { ingestBatch(df, table, id, tagPrefix = tagPrefix); () })
      .option("checkpointLocation", checkpoint)
      .start()
}

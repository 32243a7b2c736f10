package graft.streaming

import java.sql.Timestamp

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.{Sketches, Snapshots}
import graft.sources.Tables

/** Stream ≡ batch for the sketch-maintained distinct counts, plus the
  * exactly-once replay guard: per-micro-batch sketches accumulated in a
  * snapshot log and unioned at read time must equal the one-shot batch
  * sketch over the same events, and a replayed batch must change
  * nothing. */
object SketchStreamSpec {
  case class Ev(ts: Timestamp, user_id: Long, event_type: String)
}

class SketchStreamSpec extends SparkSpec {
  import SketchStreamSpec.Ev

  test("streamed per-batch sketches union to the batch estimates; replay is a no-op") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val table = "/tmp/graft_sketchstream_spec"
    val ckpt = s"$table-ckpt"
    val fs = new Path(table).getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new Path(table), true); fs.delete(new Path(ckpt), true)

    val evs = Tables.events(spark, sf).select("ts", "user_id", "event_type").collect()
      .map(r => Ev(r.getTimestamp(0), r.getLong(1), r.getString(2))).toSeq
    val chunks = evs.grouped(math.max(1, evs.size / 3)).toSeq

    val input = MemoryStream[Ev]
    val q = SketchStream.start(input.toDF(), table, ckpt)
    chunks.foreach { c => input.addData(c); q.processAllAvailable() }
    q.stop()

    val streamed = SketchStream.distinctUsers(spark, table).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val batch = Sketches.mergedEstimates(spark, sf).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(streamed.nonEmpty && streamed == batch,
      s"streamed sketch union drifted from batch: $streamed vs $batch")

    // replay batch 0 (at-least-once crash semantics): the tag guard
    // must refuse the commit and the estimates must not move
    val versionsBefore = Snapshots.versions(spark, table)
    val replay = SnapshotStream.ingestBatch(
      SketchStream.sketchBatch(chunks.head.toDF()), table, 0L)
    assert(replay.isEmpty, "replayed batch was committed twice")
    assert(Snapshots.versions(spark, table) == versionsBefore)
    val after = SketchStream.distinctUsers(spark, table).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(after == batch)
  }
}

package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.Snapshots

/** Streaming ingest into the snapshot transaction log: one commit per
  * micro-batch, replayed batchIds commit nothing, and the log's reads
  * (time travel, change feed) work over the stream's output. */
class SnapshotStreamSpec extends SparkSpec {

  private def freshDir(tag: String): String = {
    val d = s"/tmp/graft_snapstream_$tag"
    val fs = new org.apache.hadoop.fs.Path(d)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(d), true)
    d
  }

  test("stream batches become log versions; a crash-replay commits nothing") {
    implicit val sql = spark.sqlContext
    import spark.implicits._
    val table = freshDir("ingest")
    val ckpt = java.nio.file.Files.createTempDirectory("graft_snapstream_ckpt").toString
    val input = MemoryStream[(Long, String)]
    val q = SnapshotStream.start(input.toDF().toDF("id", "payload"), table, ckpt)
    input.addData((1L, "a"), (2L, "b"))
    q.processAllAvailable()
    input.addData((3L, "c"))
    q.processAllAvailable()
    q.stop()

    assert(Snapshots.versions(spark, table) == Seq(1, 2))
    assert(Snapshots.read(spark, table).count() == 3)
    // incremental consumers read the second batch off the manifest diff
    assert(Snapshots.appendedBetween(spark, table, 1, 2)
      .select("id").as[Long].collect().toSeq == Seq(3L))

    // crash-replay: foreachBatch re-delivers batchId 0 with the same data
    // (at-least-once) — the tag guard must refuse a second commit
    val batch0 = Seq((1L, "a"), (2L, "b")).toDF("id", "payload")
    assert(SnapshotStream.ingestBatch(batch0, table, 0L).isEmpty)
    assert(SnapshotStream.ingestBatch(batch0, table, 1L).isEmpty)
    assert(Snapshots.versions(spark, table) == Seq(1, 2))
    assert(Snapshots.read(spark, table).count() == 3)
    // a genuinely new batch still lands
    assert(SnapshotStream.ingestBatch(Seq((4L, "d")).toDF("id", "payload"), table, 2L)
      .contains(3))
    assert(Snapshots.read(spark, table).count() == 4)
  }

  test("manifest stats prune files on read; results match the unpruned filter") {
    import spark.implicits._
    val d = freshDir("stats")
    Snapshots.commit((1L to 10L).map(i => (i, s"r$i")).toDF("id", "s").coalesce(1),
      d, statsCol = Some("id"))
    Snapshots.commit((11L to 20L).map(i => (i, s"r$i")).toDF("id", "s").coalesce(1),
      d, statsCol = Some("id"))
    Snapshots.commit((21L to 30L).map(i => (i, s"r$i")).toDF("id", "s").coalesce(1),
      d, statsCol = Some("id"))
    val (pruned, opened, total) = Snapshots.readPruned(spark, d, "id", 3.0, 7.0)
    assert(total == 3 && opened == 1, s"opened $opened of $total")
    val got = pruned.filter(col("id").between(3, 7)).select("id").as[Long]
      .collect().sorted.toSeq
    val full = Snapshots.read(spark, d).filter(col("id").between(3, 7))
      .select("id").as[Long].collect().sorted.toSeq
    assert(got == full && got == (3L to 7L))
    // a column without recorded stats never prunes (correctness-safe)
    val (_, o2, t2) = Snapshots.readPruned(spark, d, "nosuch", 0.0, 1.0)
    assert(o2 == t2)
  }
}

package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.{EvRow, Layout}

/** Streaming CDC apply: change batches merged through foreachBatch equal
  * sequential batch merges, and a crash-replayed micro-batch is a no-op
  * (mergeEvents' changeset idempotence IS the recovery story). */
class MergeStreamSpec extends SparkSpec {

  test("stream of changesets applied via mergeStream equals sequential batch merges") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val out = java.nio.file.Files.createTempDirectory("graft_merge_stream").toString
    try {
      Layout.partitionEvents(spark, sf, out)
      val base = spark.read.parquet(out)
      val picks = base.orderBy("event_id").limit(2).collect()
      def ev(r: org.apache.spark.sql.Row) = EvRow(r.getAs[Long]("event_id"),
        r.getAs[Timestamp]("ts"), r.getAs[Long]("user_id"),
        r.getAs[String]("event_type"), r.getAs[Double]("value"), r.getAs[String]("props"))
      val maxId = base.agg(max("event_id")).collect().head.getLong(0)
      val baseCount = base.count()
      val b1 = Seq(ev(picks(0)).copy(value = 777.0))              // update
      val b2 = Seq(ev(picks(1)).copy(value = 888.0),              // update
        ev(picks(0)).copy(event_id = maxId + 1, value = 999.0))   // insert

      val input = MemoryStream[EvRow]
      val q = Layout.mergeStream(spark, out, input.toDF())
      input.addData(b1: _*); q.processAllAvailable()
      input.addData(b2: _*); q.processAllAvailable()
      q.stop()

      val got = spark.read.parquet(out).select("event_id", "value").collect()
        .map(r => r.getLong(0) -> r.getDouble(1)).toMap
      assert(got.size.toLong == baseCount + 1)
      assert(got(b1.head.event_id) == 777.0)
      assert(got(b2.head.event_id) == 888.0)
      assert(got(maxId + 1) == 999.0)

      // crash recovery: the engine re-delivers the LAST micro-batch to
      // foreachBatch — re-applying b2 must change nothing
      Layout.mergeEvents(spark, out, b2.toDF())
      val replayed = spark.read.parquet(out).select("event_id", "value").collect()
        .map(r => r.getLong(0) -> r.getDouble(1)).toMap
      assert(replayed == got, "replayed micro-batch was not a no-op")
    } finally {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(java.nio.file.Paths.get(out)).iterator().asScala
        .toSeq.reverse.foreach(java.nio.file.Files.delete)
    }
  }
}

package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Exactly-once sink: replayed batches do not duplicate output. */
class ExactlyOnceSpec extends SparkSpec {

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  private def rm(dir: String): Unit = {
    import scala.jdk.CollectionConverters._
    java.nio.file.Files.walk(java.nio.file.Paths.get(dir)).iterator().asScala
      .toSeq.reverse.foreach(java.nio.file.Files.delete)
  }

  test("stream commits batches; a crash-replay of a batch is idempotent") {
    implicit val sql = spark.sqlContext
    import spark.implicits._
    val out = tmp("graft_eos_out"); val ckpt = tmp("graft_eos_ckpt")
    try {
      val input = MemoryStream[(Long, String)]
      val stream = input.toDF().toDF("id", "payload")
      val q = ExactlyOnceSink.start(stream, out, ckpt)
      input.addData((1L, "a"), (2L, "b"))
      q.processAllAvailable()
      input.addData((3L, "c"))
      q.processAllAvailable()
      q.stop()

      val committed = ExactlyOnceSink.readAll(spark, out)
      assert(committed.count() == 3)
      assert(committed.select("id").as[Long].collect().sorted.toSeq == Seq(1L, 2L, 3L))
      val batches = committed.select("batch_id").distinct().count()
      assert(batches == 2)

      // crash-replay: foreachBatch re-delivers batch 0 with the same data
      // (at-least-once contract) — the idempotent write must not duplicate
      val batch0 = Seq((1L, "a"), (2L, "b")).toDF("id", "payload")
      ExactlyOnceSink.writeBatch(batch0, out, 0L)
      ExactlyOnceSink.writeBatch(batch0, out, 0L) // and a double replay
      val after = ExactlyOnceSink.readAll(spark, out)
      assert(after.count() == 3, s"replay duplicated rows: ${after.count()}")
      assert(after.filter(col("batch_id") === 0).count() == 2)
    } finally { rm(out); rm(ckpt) }
  }
}

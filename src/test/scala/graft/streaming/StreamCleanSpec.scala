package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sources.Tables

/** Streaming clean verdicts ≡ batch rules, end-to-end through the
  * exactly-once sink with a crash-replay. */
class StreamCleanSpec extends SparkSpec {

  private def rm(dir: String): Unit = {
    import scala.jdk.CollectionConverters._
    java.nio.file.Files.walk(java.nio.file.Paths.get(dir)).iterator().asScala
      .toSeq.reverse.foreach(java.nio.file.Files.delete)
  }

  test("stream → clean → exactly-once sink ≡ batch verdicts, replay-safe") {
    implicit val sql = spark.sqlContext
    import spark.implicits._
    val docs = Tables.documents(spark, sf).select("doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getString(1))).sortBy(_._1).toSeq
    // inject exact duplicates arriving in a LATER batch: copies of the
    // first two docs under fresh ids
    val dupes = docs.take(2).map { case (id, text) => (10000L + id, text) }

    val out = java.nio.file.Files.createTempDirectory("graft_clean_out").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft_clean_ckpt").toString
    try {
      val input = MemoryStream[(Long, String)]
      val stream = StreamClean.verdicts(spark, input.toDF().toDF("doc_id", "text")).toDF()
      val q = ExactlyOnceSink.start(stream, out, ckpt)
      val (b1, b2) = docs.splitAt(docs.size / 2)
      input.addData(b1: _*); q.processAllAvailable()
      input.addData((b2 ++ dupes): _*); q.processAllAvailable()
      q.stop()

      val committed = ExactlyOnceSink.readAll(spark, out)
        .select("doc_id", "keep", "reason").collect()
        .map(r => r.getLong(0) -> (r.getBoolean(1), r.getString(2))).toMap
      assert(committed.size == docs.size + dupes.size)

      // batch reference for the stateless rules
      val expected = StreamClean.statelessVerdicts(
        Tables.documents(spark, sf).select("doc_id", "text"))
        .select("doc_id", "reason").collect()
        .map(r => r.getLong(0) -> r.getString(1)).toMap
      docs.foreach { case (id, _) =>
        assert(committed(id)._2 == expected(id), s"doc $id")
      }
      // injected copies: demoted to duplicated iff their original was ok
      dupes.foreach { case (id, _) =>
        val orig = expected(id - 10000L)
        val want = if (orig == "ok") "duplicated" else orig
        assert(committed(id)._2 == want, s"dup $id: ${committed(id)._2} != $want")
        assert(!committed(id)._1 || want == "ok")
      }
      // the corpus carries real verdict diversity
      val reasons = committed.values.map(_._2).toSet
      assert(reasons.contains("ok") && reasons.contains("duplicated"))

      // crash-replay of the final batch: rewrite batch 1 with the same
      // rows — counts must not change (idempotent per-batch commit)
      val batch1 = ExactlyOnceSink.readAll(spark, out).filter(col("batch_id") === 1)
        .select("doc_id", "keep", "reason")
      // materialize before the overwrite (cannot write over the dir
      // while lazily reading from it)
      val frozen = batch1.collect().toSeq
      val replay = spark.createDataFrame(
        spark.sparkContext.parallelize(frozen), batch1.schema)
      ExactlyOnceSink.writeBatch(replay, out, 1L)
      val after = ExactlyOnceSink.readAll(spark, out)
      assert(after.count() == docs.size + dupes.size)
    } finally { rm(out); rm(ckpt) }
  }
}

package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sources.Tables

/** Stream ≡ batch parity for the streaming domain cap: first-K
  * admission per source over a doc_id-ascending feed equals the batch
  * row_number() gate on the same ordering, regardless of how the feed
  * is split into micro-batches. cap=10 binds on the fixture (20 sources
  * × 25 docs at sf0.001), so both verdicts occur. */
class CapStreamSpec extends SparkSpec {

  private val cap = graft.operators.Curation.FirstCap

  private def feed(chunks: Seq[Seq[CurationStreams.CapDoc]]): Map[Long, (String, Long, Boolean)] = {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[CurationStreams.CapDoc]
    val name = s"cs_${System.nanoTime()}"
    val q = CurationStreams.capStream(spark, input.toDF(), cap)
      .toDF().writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    chunks.foreach { c => input.addData(c); q.processAllAvailable() }
    q.stop()
    spark.table(name).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[String]("source"), r.getAs[Long]("rn"), r.getAs[Boolean]("admitted")))
      .toMap
  }

  private def docs(): Seq[CurationStreams.CapDoc] =
    Tables.documents(spark, sf).select("doc_id", "source").collect()
      .map(r => CurationStreams.CapDoc(r.getLong(0), r.getString(1)))
      .sortBy(_.doc_id).toSeq

  // the REGISTERED (DuckDB-oracled) batch twin — stream ≡ oracled row
  private def batchExpected(): Map[Long, (String, Long, Boolean)] =
    graft.operators.Curation.domainCapFirst(spark, sf).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[String]("source"), r.getAs[Long]("rn"), r.getAs[Boolean]("admitted")))
      .toMap

  test("streaming first-K cap equals the batch row_number gate; cap binds") {
    val all = docs()
    val streamed = feed(all.grouped(math.max(1, all.size / 3)).toSeq)
    val batch = batchExpected()
    assert(streamed == batch)
    val verdicts = streamed.values.map(_._3).toSet
    assert(verdicts == Set(true, false), "cap does not bind on the fixture")
  }

  test("verdicts independent of the micro-batch split") {
    val all = docs()
    val a = feed(Seq(all))                                  // one batch
    val b = feed(all.grouped(7).toSeq)                      // many tiny batches
    assert(a == b)
  }
}

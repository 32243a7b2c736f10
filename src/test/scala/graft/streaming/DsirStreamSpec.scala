package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

import graft.SparkSpec
import graft.operators.Dsir
import graft.sources.Tables

/** Stream-static DSIR scoring: arriving docs weighted against the frozen
  * target/raw bucket multinomials match the batch scorer exactly. */
class DsirStreamSpec extends SparkSpec {

  test("dsir stream: 1-token doc scores its unigram bucket and does not crash") {
    import spark.implicits._
    val tiny = Seq((900001L, "solo"), (900002L, "two tokens")).toDF("doc_id", "text")
    val got = Dsir.scoreStream(spark, sf, tiny).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // 1 unigram + 0 bigrams; 2 unigrams + 1 bigram
    assert(got == Map(900001L -> 1L, 900002L -> 3L))
  }

  test("dsir stream scoring ≡ batch weights on corpus docs") {
    implicit val sql = spark.sqlContext
    import spark.implicits._
    val docs = Tables.documents(spark, sf).select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq

    val input = MemoryStream[(Long, String)]
    val scored = Dsir.scoreStream(spark, sf, input.toDF().toDF("doc_id", "text"))
    val q = scored.writeStream.format("memory").queryName("dsir_scores")
      .outputMode(OutputMode.Update()).start()
    val (b1, b2) = docs.splitAt(docs.size / 2)
    input.addData(b1: _*); q.processAllAvailable()
    input.addData(b2: _*); q.processAllAvailable()
    q.stop()

    val got = spark.table("dsir_scores").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    val batch = Dsir.weights(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(batch.nonEmpty && got.size == batch.size)
    batch.foreach { case (id, exp) =>
      assert(got(id) == exp, s"doc $id: ${got(id)} != $exp")
    }
  }
}

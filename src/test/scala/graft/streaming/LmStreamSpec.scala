package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

import graft.SparkSpec
import graft.operators.NgramLm
import graft.sources.Tables

/** Stream-static LM scoring: arriving docs scored against the frozen
  * bigram LM match the batch scorer exactly. */
class LmStreamSpec extends SparkSpec {

  test("short docs: 1-token doc contributes no bigrams and does not crash") {
    import spark.implicits._
    val tiny = Seq((1L, "solo"), (2L, "two tokens")).toDF("doc_id", "text")
    // scoreStream works on static frames too (stream-static joins degrade
    // to plain joins) — the 1-token doc must vanish, not throw
    val got = NgramLm.scoreStream(spark, sf, tiny).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.keySet == Set(2L))
    assert(got(2L) == 1)
  }

  test("stream scoring ≡ batch perplexity on corpus docs; unseen n-grams smoothed") {
    implicit val sql = spark.sqlContext
    import spark.implicits._
    val docs = Tables.documents(spark, sf).select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
    // one synthetic doc whose bigrams the frozen LM has never seen
    val unseen = (99999L, "qqxx yyzz wwvv qqxx yyzz")

    val input = MemoryStream[(Long, String)]
    val scored = NgramLm.scoreStream(spark, sf, input.toDF().toDF("doc_id", "text"))
    val q = scored.writeStream.format("memory").queryName("lm_scores")
      .outputMode(OutputMode.Update()).start()
    val (b1, b2) = docs.splitAt(docs.size / 2)
    input.addData(b1: _*); q.processAllAvailable()
    input.addData((b2 :+ unseen): _*); q.processAllAvailable()
    q.stop()

    val got = spark.table("lm_scores").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2), r.getDouble(3))).toMap
    val batch = NgramLm.perplexity(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2), r.getDouble(3))).toMap

    assert(batch.nonEmpty && got.size == batch.size + 1)
    batch.foreach { case (id, exp) =>
      assert(got(id) == exp, s"doc $id: ${got(id)} != $exp")
    }
    // the unseen doc scores at the smoothing floor: every bigram gets
    // p = k/(0 + kV) = 1/V, so xent = ln(V) exactly
    val (m, xent, _) = got(99999L)
    assert(m == 4)
    val uniV = Tables.documents(spark, sf)
      .select(org.apache.spark.sql.functions.explode(
        org.apache.spark.sql.functions.split(
          org.apache.spark.sql.functions.col("text"), " ")).as("w"))
      .distinct().count().toDouble
    assert(math.abs(xent - math.round(math.log(uniV) * 1e4) / 1e4) < 1e-9,
      s"unseen-doc xent $xent != ln(V) ${math.log(uniV)}")
  }
}

package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkSpec
import graft.operators.TextAnalysis
import graft.sources.Tables

/** Streaming MOSS parity: the row-wise fingerprint projection must equal
  * the batch window-function winnowing EXACTLY, candidate emission must
  * be feed-split-invariant and cover every batch winnowPairs pair, and
  * the hot-fingerprint state cap must bound bucket fan-out. */
class MossStreamSpec extends SparkSpec {

  case class Doc(doc_id: Long, text: String)

  test("row-wise fingerprints equal the batch winnowing selection exactly") {
    val batch = TextAnalysis.winnowing(spark, sf).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getString(2))).toSet
    val rowwise = MossStreams.fingerprints(
        Tables.documents(spark, sf).select("doc_id", "text")).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getString(2))).toSet
    assert(batch.nonEmpty && rowwise == batch,
      s"row-wise ${rowwise.size} fps vs batch ${batch.size}")
  }

  test("streaming candidates are feed-split-invariant and cover batch winnow pairs") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val docs = Tables.documents(spark, sf).select("doc_id", "text").collect()
      .map(r => Doc(r.getLong(0), r.getString(1))).sortBy(_.doc_id).toSeq
    val input = MemoryStream[Doc]
    val name = s"moss_${System.nanoTime()}"
    val q = MossStreams.candidatePairs(spark, input.toDF())
      .writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    docs.grouped(math.max(1, docs.size / 3)).foreach { c =>
      input.addData(c); q.processAllAvailable()
    }
    q.stop()
    val streamed = spark.table(name).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // static single-pass run of the same operator — split invariance
    val static = MossStreams.candidatePairs(spark,
        Tables.documents(spark, sf).select("doc_id", "text")).collect()
      .map(p => (p.a_id, p.b_id)).toSet
    assert(streamed == static, s"stream ${streamed.size} vs static ${static.size}")
    // coverage: every batch pair (>= WinMinShared shared fps) shares at
    // least one fingerprint, so the candidate sieve must contain it
    val pairs = TextAnalysis.winnowPairs(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.nonEmpty && pairs.subsetOf(streamed),
      s"missed batch pairs: ${(pairs -- streamed).take(5)}")
  }

  test("hot-fingerprint bucket freezes at the state cap") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // one 6-token boilerplate run shared by cap+20 docs: every doc emits
    // the same fingerprint(s); the bucket must stop at the cap
    val boiler = "alpha bravo charlie delta echo foxtrot"
    val n = TextAnalysis.WinMaxFpDf + 20
    val docs = (0 until n).map(i => Doc(i.toLong, boiler))
    val input = MemoryStream[Doc]
    val name = s"mosshot_${System.nanoTime()}"
    val q = MossStreams.candidatePairs(spark, input.toDF())
      .writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    docs.grouped(25).foreach { c => input.addData(c); q.processAllAvailable() }
    q.stop()
    val emitted = spark.table(name).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val cap = TextAnalysis.WinMaxFpDf
    // pairs only among the first `cap` resident docs: C(cap, 2) ceiling
    assert(emitted.size <= cap * (cap - 1) / 2,
      s"hot bucket fanned out past the cap: ${emitted.size} pairs")
    assert(emitted.forall { case (a, b) => a < cap && b < cap },
      "a doc past the cap entered the frozen bucket")
  }
}

package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkSpec
import graft.operators.TextAnalysis
import graft.sources.Tables

/** Stream ≡ batch for CMS heavy-hitter maintenance: per-micro-batch
  * sketches merged from the snapshot log must estimate probe terms
  * CELL-IDENTICALLY to the one-shot batch sketch (same eps/confidence/
  * seed ⇒ same matrix ⇒ counter sums equal single-pass counts), and a
  * replayed batch must change nothing. */
object CmsStreamSpec {
  case class Doc(doc_id: Long, text: String)
}

class CmsStreamSpec extends SparkSpec {
  import CmsStreamSpec.Doc

  test("streamed batch sketches merge to the exact batch CMS estimates; replay no-op") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val table = "/tmp/graft_cmsstream_spec"
    val ckpt = s"$table-ckpt"
    val fs = new Path(table).getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new Path(table), true); fs.delete(new Path(ckpt), true)

    val docs = Tables.documents(spark, sf).select("doc_id", "text").collect()
      .map(r => Doc(r.getLong(0), r.getString(1))).toSeq
    val chunks = docs.grouped(math.max(1, docs.size / 3)).toSeq

    val input = MemoryStream[Doc]
    val q = CmsStream.start(input.toDF(), table, ckpt)
    chunks.foreach { c => input.addData(c); q.processAllAvailable() }
    q.stop()

    // probes: the exact corpus top terms plus a term absent from it
    val probes = TextAnalysis.topTerms(spark, sf, k = 10).collect()
      .map(_.getString(0)).toSeq :+ "graft-absent-term"
    val streamed = CmsStream.estimates(spark, table, probes).toMap
    val batch = TextAnalysis.cmsTopTerms(spark, sf, probes,
      eps = CmsStream.Eps, confidence = CmsStream.Confidence).toMap
    assert(streamed == batch, s"merged stream CMS drifted from batch: $streamed vs $batch")

    // CMS is one-sided: estimates dominate the exact counts
    val exact = TextAnalysis.topTerms(spark, sf, k = 10).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    exact.foreach { case (t, c) => assert(streamed(t) >= c) }

    // replay batch 0: tag guard refuses, estimates unchanged
    val replay = SnapshotStream.ingestBatch(
      CmsStream.sketchBatch(spark, chunks.head.toDF()), table, 0L)
    assert(replay.isEmpty)
    assert(CmsStream.estimates(spark, table, probes).toMap == batch)
  }
}

package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sources.Tables

/** CDC chunking: reconstruction + the shift-robustness property that
  * motivates content-defined boundaries. */
class CdcChunkingSpec extends SparkSpec {

  test("chunks reconstruct each document exactly") {
    val docs = Tables.documents(spark, sf).select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val grouped = CdcChunking.cdcChunks(spark, sf).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getString(2)))
      .groupBy(_._1)
    assert(grouped.keySet == docs.keySet)
    grouped.foreach { case (id, cs) =>
      val rebuilt = cs.sortBy(_._2).map(_._3).mkString(" ")
      assert(rebuilt == docs(id), s"doc $id")
    }
  }

  test("insertion at the front: CDC fingerprints realign, fixed-width lose everything") {
    val docs = Tables.documents(spark, sf).select("doc_id", "text")
    val edited = docs.withColumn("text", concat(lit("zzz qqq xxx "), col("text")))

    def fps(df: org.apache.spark.sql.DataFrame): Map[Long, Set[String]] =
      CdcChunking.chunksFor(df).collect()
        .map(r => (r.getLong(0), r.getString(4)))
        .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).toSet }

    val orig = fps(docs); val ed = fps(edited)
    // per-doc fraction of original CDC chunks that survive the edit,
    // over docs long enough to have several chunks
    val survive = orig.toSeq.collect {
      case (id, s) if s.size >= 3 =>
        (s intersect ed(id)).size.toDouble / s.size
    }
    assert(survive.nonEmpty)
    val cdcAvg = survive.sum / survive.size
    assert(cdcAvg >= 0.5, s"CDC survival $cdcAvg — boundaries did not realign")

    // fixed-width grid on the same docs: a 3-token prepend shifts every
    // chunk's content, so (almost) nothing survives
    val raw = docs.collect().map(r => r.getLong(0) -> r.getString(1).split(" ")).toMap
    val fixedSurvive = raw.collect { case (id, toks) if toks.length >= 48 =>
      val o = toks.grouped(16).map(_.mkString(" ")).toSet
      val e = (Array("zzz", "qqq", "xxx") ++ toks).grouped(16).map(_.mkString(" ")).toSet
      (o intersect e).size.toDouble / o.size
    }
    val fixedAvg = fixedSurvive.sum / fixedSurvive.size
    assert(fixedAvg < 0.1, s"fixed-width unexpectedly robust: $fixedAvg")
    assert(cdcAvg > fixedAvg + 0.4)
  }
}

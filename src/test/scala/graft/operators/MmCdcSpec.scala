package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sources.Tables

/** Byte-level CDC dedup for binary assets: exact-dup detection, edit
  * resilience vs fixed-width blocks, and full brute-force pair parity. */
class MmCdcSpec extends SparkSpec {

  private lazy val contents: Seq[(Long, Array[Byte])] =
    Tables.documents(spark, sf).select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1).getBytes("UTF-8"))).toSeq

  private def fps(b: Array[Byte]): Set[Long] =
    Multimodal.cdcChunks(0L, b).map(_.fp).toSet

  test("cdc: chunks tile the content exactly and identical blobs chunk identically") {
    contents.take(50).foreach { case (id, b) =>
      val cs = Multimodal.cdcChunks(id, b)
      assert(cs.map(_.len).sum == b.length, s"doc $id chunks don't tile")
      assert(cs.head.offset == 0 && cs.map(c => c.offset + c.len).max == b.length)
      cs.foreach(c => assert(c.len <= Multimodal.CdcMaxChunk))
      // determinism / content-addressing
      assert(Multimodal.cdcChunks(id, b.clone()) == cs)
    }
  }

  test("cdc: an injected byte-identical copy pairs with its original at resemblance 1.0") {
    import spark.implicits._
    val (origId, origBytes) = contents.head
    val copyId = 900001L
    val rows = contents.flatMap { case (id, b) => Multimodal.cdcChunks(id, b) } ++
      Multimodal.cdcChunks(copyId, origBytes)
    val got = Multimodal.assetNearDupOf(
        rows.map(c => (c.doc_id, c.fp)).toDF("doc_id", "fp"), 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(got.get((origId, copyId)).contains(1.0),
      s"dup pair ($origId,$copyId) not found at r=1.0: ${got.get((origId, copyId))}")
  }

  test("cdc: a mid-blob insertion realigns; fixed-width blocks lose the shifted tail") {
    val (_, orig) = contents.maxBy(_._2.length)
    val at = orig.length / 4
    val edited = orig.take(at) ++ "SPLICED".getBytes("UTF-8") ++ orig.drop(at)
    val a = fps(orig); val b = fps(edited)
    val cdcShared = (a & b).size.toDouble / a.size
    // fixed 64-byte grid: every block behind the insertion shifts
    def grid(bs: Array[Byte]): Set[Long] =
      bs.grouped(64).zipWithIndex
        .map { case (g, _) => Multimodal.fnv64(g, 0, g.length) }.toSet
    val gridShared = (grid(orig) & grid(edited)).size.toDouble / grid(orig).size
    assert(cdcShared >= 0.5, s"CDC survival $cdcShared below 0.5")
    assert(cdcShared > gridShared,
      s"CDC ($cdcShared) must beat the fixed grid ($gridShared) after a splice")
  }

  test("cdc: near-dup pairs equal driver-side brute force over fingerprint sets") {
    val sets = contents.map { case (id, b) => id -> fps(b) }
    val expected = (for {
      i <- sets.indices; j <- (i + 1) until sets.size
      (ia, sa) = sets(i); (ib, sb) = sets(j)
      inter = (sa & sb).size
      r = inter.toDouble / (sa.size + sb.size - inter)
      if r >= 0.5
    } yield {
      val (lo, hi) = if (ia < ib) (ia, ib) else (ib, ia)
      (lo, hi) -> math.round(r * 1e4) / 1e4
    }).toMap
    val got = Multimodal.assetNearDup(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(got == expected, s"pair sets differ: got ${got.size}, expected ${expected.size}")
  }
}

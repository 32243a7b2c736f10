package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sources.Tables

/** Whole-document BFD bin packing: no SQL oracle exists (each placement
  * depends on the full bin-remainder multiset), so the gates live here —
  * coverage, capacity, the classical 11/9·OPT+1 bins bound per shard,
  * and determinism. */
class PackBinsSpec extends SparkSpec {

  private val cap = 512L

  test("pack_bins: every doc once, capacity respected, 11/9 OPT bound per shard") {
    val rows = Packing.packBins(spark, sf).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Int]("shard"),
        r.getAs[Int]("bin"), r.getAs[Long]("nt")))
    val nDocs = Tables.documents(spark, sf).count()
    assert(rows.length == nDocs)
    assert(rows.map(_._1).distinct.length == nDocs)
    rows.foreach { case (id, shard, _, nt) =>
      assert(nt >= 1 && nt <= cap)
      assert(shard == (id % Packing.PackShards).toInt)
    }
    rows.groupBy(r => (r._2, r._3)).foreach { case ((shard, bin), docs) =>
      val load = docs.map(_._4).sum
      assert(load <= cap, s"shard $shard bin $bin overflows: $load")
    }
    rows.groupBy(_._2).foreach { case (shard, docs) =>
      val bins = docs.map(_._3).distinct.length
      val opt = math.ceil(docs.map(_._4).sum.toDouble / cap).toInt
      assert(bins <= math.ceil(11.0 * opt / 9.0).toInt + 1,
        s"shard $shard: $bins bins vs OPT lower bound $opt breaks the Johnson bound")
      // bin ids are dense 0..bins-1 (a dataloader can address them directly)
      assert(docs.map(_._3).distinct.sorted.toSeq == (0 until bins))
    }
  }

  test("pack_bins: deterministic across runs and tighter than one-doc-per-bin") {
    val a = Packing.packBins(spark, sf).collect().map(_.toSeq).toSeq
    val b = Packing.packBins(spark, sf).collect().map(_.toSeq).toSeq
    assert(a == b)
    val perShardBins = a.map(r => (r(1), r(2))).distinct.size
    assert(perShardBins < a.size, "packing no better than one doc per bin")
  }
}

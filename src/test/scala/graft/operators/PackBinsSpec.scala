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

  test("bfdPlace kernel: randomized loads hold capacity/coverage/density/bound") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val loads: Gen[List[Long]] = for {
      n <- Gen.choose(0, 400)
      c <- Gen.listOfN(n, Gen.frequency(
        3 -> Gen.choose(1L, cap / 8),     // small docs (the common case)
        2 -> Gen.choose(cap / 8, cap / 2),
        1 -> Gen.choose(cap / 2, cap)))   // bin-dominating docs
    } yield c
    (0 until 60).foreach { i =>
      val nts = loads.pureApply(Gen.Parameters.default, Seed(811L + i))
      // sorted as packBins feeds the kernel: one shard, nt desc, id asc
      val rows = nts.zipWithIndex
        .map { case (nt, id) => (id.toLong, nt, 0) }
        .sortBy { case (id, nt, _) => (-nt, id) }
      val placed = Packing.bfdPlace(cap, rows.iterator).toList
      assert(placed.map(_._1).sorted == nts.indices.map(_.toLong).toList)
      val byBin = placed.groupBy(_._3)
      byBin.values.foreach(ds => assert(ds.map(_._4).sum <= cap))
      if (placed.nonEmpty) {
        assert(byBin.keySet == (0 until byBin.size).toSet, "bin ids not dense")
        val opt = math.ceil(nts.sum.toDouble / cap).toInt
        assert(byBin.size <= math.ceil(11.0 * opt / 9.0).toInt + 1)
        assert(Packing.bfdPlace(cap, rows.iterator).toList == placed)
      }
    }
  }

  test("bfdPlace kernel: shard boundary resets bin state") {
    // two shards back-to-back in one iterator: second shard must restart
    // at bin 0 with full capacity, exactly as if packed alone
    val s0 = Seq((0L, cap, 0), (1L, cap / 2, 0))
    val s1 = Seq((2L, cap, 1), (3L, 3L, 1))
    val placed = Packing.bfdPlace(cap, (s0 ++ s1).iterator).toList
    val alone = Packing.bfdPlace(cap, s1.map { case (i, n, _) => (i, n, 0) }.iterator)
      .toList.map { case (i, _, b, n) => (i, 1, b, n) }
    assert(placed.filter(_._2 == 1) == alone)
  }

  test("pack_bins: deterministic across runs and tighter than one-doc-per-bin") {
    val a = Packing.packBins(spark, sf).collect().map(_.toSeq).toSeq
    val b = Packing.packBins(spark, sf).collect().map(_.toSeq).toSeq
    assert(a == b)
    val perShardBins = a.map(r => (r(1), r(2))).distinct.size
    assert(perShardBins < a.size, "packing no better than one doc per bin")
  }
}

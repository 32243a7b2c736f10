package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkSpec
import graft.streaming.ErStreams.{BlockState, ErLink}

/** The `maxBlockReg` junk-block stop-list (the skew residual the horizon
  * cannot bound: an idle block evicts, a HOT block's registry — and with
  * it per-arrival scoring and the per-batch state rewrite — grows
  * forever). Kernel cases drive [[ErStreams.scoreBlock]] directly (the
  * bfdPlace discipline); one streaming case proves the frozen block goes
  * silent while its neighbors keep linking. */
class ErBlockCapSpec extends SparkSpec {

  case class ErRec(side: String, key: Long, name: String)

  private val empty = BlockState(Seq.empty, Seq.empty)
  private def reg(ks: Long*): Seq[(Long, String)] = ks.map(k => k -> f"reg$k%03d_BLOCK")
  private def dirty(ks: Long*): Seq[(Long, String)] = ks.map(k => k -> f"reg$k%03d_BLOCK")

  test("kernel: a cap the block never reaches changes nothing") {
    val (stCap, outCap) =
      ErStreams.scoreBlock(empty, reg(1, 2, 3), dirty(2), 2, compact = false, Some(100))
    val (stNo, outNo) =
      ErStreams.scoreBlock(empty, reg(1, 2, 3), dirty(2), 2, compact = false, None)
    assert(stCap === stNo && outCap === outNo)
    assert(outCap === Seq(ErLink(2, 2, "reg002_BLOCK", 0)))
    assert(!stCap.frozen && stCap.reg.size === 3)
  }

  test("kernel: crossing the cap freezes the block whole — O(1) tombstone, no emissions, per-block verdict") {
    // the crossing batch carries a dirty record that WOULD match: the
    // verdict must still be block-wide silence (never arrival-order-
    // dependent within the crossing batch)
    val (st, out) =
      ErStreams.scoreBlock(empty, reg(1, 2, 3, 4, 5, 6), dirty(3), 2, compact = false, Some(5))
    assert(out.isEmpty)
    assert(st === BlockState(Seq.empty, Seq.empty, frozen = true))
    // everything after the freeze passes unscored and the tombstone
    // never grows — registry arrivals included
    val (st2, out2) = ErStreams.scoreBlock(st, reg(7, 8), dirty(7), 2, compact = false, Some(5))
    assert(out2.isEmpty && st2 === st)
  }

  test("kernel: the cap counts the ACCUMULATED registry across batches") {
    val (st1, out1) = ErStreams.scoreBlock(empty, reg(1, 2, 3), Seq.empty, 2, compact = false, Some(5))
    assert(!st1.frozen && out1.isEmpty)
    val (st2, _) = ErStreams.scoreBlock(st1, reg(4, 5), Seq.empty, 2, compact = false, Some(5))
    assert(!st2.frozen && st2.reg.size === 5) // at the cap: still live
    val (st3, out3) = ErStreams.scoreBlock(st2, reg(6), dirty(1), 2, compact = false, Some(5))
    assert(st3.frozen && out3.isEmpty) // one past the cap: frozen
  }

  test("stream: the hot block goes silent at the cap while its neighbors keep linking") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // block = last 6 chars: "BLOCKA" (hot, 6 registrants > cap 3) vs
    // "BLOCKB" (2 registrants, under cap)
    def a(k: Long, blk: String) = ErRec("a", k, f"reg$k%03d_$blk")
    def b(k: Long, blk: String) = ErRec("b", 1000 + k, f"reg$k%03d_$blk")
    val input = MemoryStream[ErRec]
    val name = s"ercap_${System.nanoTime()}"
    val q = ErStreams.linkGrowing(spark, input.toDF(), maxBlockReg = Some(3))
      .writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    input.addData((1L to 6L).map(a(_, "BLOCKA")) ++ Seq(a(1, "BLOCKB"), a(2, "BLOCKB")))
    q.processAllAvailable()
    input.addData(Seq(b(3, "BLOCKA"), b(2, "BLOCKB"))) // both would match at dist 0
    q.processAllAvailable()
    q.stop()
    val links = spark.table(name).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getInt(3))).toSet
    assert(links === Set((1002L, 2L, "reg002_BLOCKB", 0)),
      s"hot block must be silent, neighbor must link: $links")
  }
}

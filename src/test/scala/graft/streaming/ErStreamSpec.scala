package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkSpec
import graft.operators.EntityResolution

/** Stream ≡ batch parity for streaming record linkage: dirty records
  * arriving in micro-batches link against the frozen clean registry
  * exactly as the batch [[EntityResolution.linkRegistries]] does,
  * regardless of how the feed is split. */
class ErStreamSpec extends SparkSpec {

  case class DirtyRec(b_key: Long, b_name: String)

  case class ErRec(side: String, key: Long, name: String)

  test("streaming linkage equals the batch linkage on a 3-batch feed") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val all = EntityResolution.dirty(spark, sf).collect()
      .map(r => DirtyRec(r.getLong(0), r.getString(1))).sortBy(_.b_key).toSeq
    val input = MemoryStream[DirtyRec]
    val name = s"er_${System.nanoTime()}"
    val q = EntityResolution.linkStream(spark, sf, input.toDF())
      .writeStream.format("memory").queryName(name)
      .outputMode("update").start()
    all.grouped(math.max(1, all.size / 3)).foreach { c =>
      input.addData(c); q.processAllAvailable()
    }
    q.stop()
    // update mode: last emission per key is the final link
    val streamed = spark.table(name).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getString(2), r.getInt(3)))
      .toMap
    val batch = EntityResolution.linkRegistries(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getString(2), r.getInt(3)))
      .toMap
    assert(batch.nonEmpty && streamed == batch)
  }

  test("growing-registry streaming linkage converges to the batch linkage") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val clean = graft.sources.Tables.customer(spark, sf)
      .select("c_custkey", "c_name").collect()
      .map(r => ErRec("a", r.getLong(0), r.getString(1))).sortBy(_.key).toSeq
    val dirtyRecs = EntityResolution.dirty(spark, sf).collect()
      .map(r => ErRec("b", r.getLong(0), r.getString(1))).sortBy(_.key).toSeq
    val Seq(c1, c2, c3) = clean.grouped((clean.size + 2) / 3).toSeq.padTo(3, Seq.empty[ErRec])
    val Seq(d1, d2, d3) = dirtyRecs.grouped((dirtyRecs.size + 2) / 3).toSeq.padTo(3, Seq.empty[ErRec])
    val input = MemoryStream[ErRec]
    val name = s"ergrow_${System.nanoTime()}"
    val q = graft.streaming.ErStreams.linkGrowing(spark, input.toDF())
      .writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    // dirty records d2/d3 arrive BEFORE the registry chunks holding their
    // matches — the links must improve as the registry grows
    Seq(c1 ++ d1 ++ d2, c2 ++ d3, c3).foreach { b =>
      if (b.nonEmpty) input.addData(b); q.processAllAvailable()
    }
    q.stop()
    // append-mode improvements strictly decrease (dist, a_key) per key:
    // the minimum emission per b_key is the final link
    val streamed = spark.table(name).collect()
      .map(r => (r.getLong(0), (r.getInt(3), r.getLong(1), r.getString(2))))
      .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).min }
    val batch = EntityResolution.linkRegistries(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getInt(3), r.getLong(1), r.getString(2)))
      .toMap
    assert(batch.nonEmpty && streamed == batch,
      s"stream ${streamed.size} links vs batch ${batch.size}")
  }

  // ---- production state-bound cases (VERDICT r7 #5) ----
  // NOTE: with a registered ProcessingTimeTimeout the micro-batch engine
  // keeps scheduling no-data batches to evaluate timers, so
  // processAllAvailable never quiesces — these poll the memory sink /
  // state-store metrics with a deadline instead (the StreamingSpec
  // horizon-test idiom).

  private def awaitRows(name: String, n: Int): Unit = {
    val t0 = System.currentTimeMillis
    while (spark.table(name).count() < n &&
      System.currentTimeMillis - t0 < 60000) Thread.sleep(100)
  }

  private def awaitState(q: org.apache.spark.sql.streaming.StreamingQuery,
      what: String)(pred: Long => Boolean): Unit = {
    val t0 = System.currentTimeMillis
    def cur: Option[Long] = Option(q.lastProgress)
      .flatMap(p => p.stateOperators.headOption).map(_.numRowsTotal)
    while (!cur.exists(pred) && System.currentTimeMillis - t0 < 60000)
      Thread.sleep(50)
    assert(cur.exists(pred), s"$what never observed (last state rows: $cur)")
  }

  test("bounded mode stays batch-parity inside a generous horizon") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val clean = graft.sources.Tables.customer(spark, sf)
      .select("c_custkey", "c_name").collect()
      .map(r => ErRec("a", r.getLong(0), r.getString(1))).sortBy(_.key).toSeq
    val dirtyRecs = EntityResolution.dirty(spark, sf).collect()
      .map(r => ErRec("b", r.getLong(0), r.getString(1))).sortBy(_.key).toSeq
    val input = MemoryStream[ErRec]
    val name = s"erbound_${System.nanoTime()}"
    val q = ErStreams.linkGrowing(spark, input.toDF(), horizonMs = Some(600000L))
      .writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    val batch = EntityResolution.linkRegistries(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getInt(3), r.getLong(1), r.getString(2)))
      .toMap
    // interleave both feeds; everything lands well inside 10 min, and
    // the fixture registry has UNIQUE names so the dist-0 compaction
    // departure (duplicate-name re-ranking) cannot trigger
    (clean ++ dirtyRecs).grouped((clean.size + dirtyRecs.size) / 3 + 1).foreach(input.addData(_))
    awaitRows(name, batch.size)
    q.stop()
    val streamed = spark.table(name).collect()
      .map(r => (r.getLong(0), (r.getInt(3), r.getLong(1), r.getString(2))))
      .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).min }
    assert(batch.nonEmpty && streamed == batch,
      s"bounded stream ${streamed.size} links vs batch ${batch.size}")
  }

  test("dist-0 links are compacted out of resident state (no rescoring) in bounded mode") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // same block (suffix 'QRSTUV'); batch 2 lands a DUPLICATE registry
    // name with a smaller key — the one arrival that could re-rank a
    // dist-0 link. Exact mode re-emits; bounded mode must not (the
    // record left the resident set when its dist hit 0).
    def run(horizon: Option[Long]): Set[(Long, Long, Int)] = {
      val input = MemoryStream[ErRec]
      val name = s"ercomp_${System.nanoTime()}"
      val q = ErStreams.linkGrowing(spark, input.toDF(), horizonMs = horizon)
        .writeStream.format("memory").queryName(name)
        .outputMode("append").start()
      input.addData(Seq(ErRec("a", 10L, "Bob QRSTUV"), ErRec("b", 1L, "Bob QRSTUV")))
      awaitRows(name, 1)
      input.addData(Seq(ErRec("a", 5L, "Bob QRSTUV")))
      // sentinel: a NEW dirty record in batch 3 always links (to the
      // min-key duplicate, a_key 5) — its sink row proves batch 2 was
      // processed first, without relying on quiescence under timers
      input.addData(Seq(ErRec("b", 3L, "Bob QRSTUV")))
      awaitRows(name, if (horizon.isEmpty) 3 else 2)
      q.stop()
      spark.table(name).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getInt(3))).toSet
    }
    val exact = run(None)
    assert(exact == Set((1L, 10L, 0), (1L, 5L, 0), (3L, 5L, 0)),
      s"exact mode must re-rank the dist-0 tie: $exact")
    val bounded = run(Some(600000L))
    assert(bounded == Set((1L, 10L, 0), (3L, 5L, 0)),
      s"bounded mode must not rescore a compacted dist-0 link: $bounded")
  }

  test("horizon eviction drops an idle block whole (state capped, late arrivals unlinked)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[ErRec]
    val name = s"erevict_${System.nanoTime()}"
    val q = ErStreams.linkGrowing(spark, input.toDF(), horizonMs = Some(500L))
      .writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    // registry + one linkable dirty record register block state
    input.addData(Seq(ErRec("a", 10L, "Eve ABCDEF"), ErRec("b", 1L, "Eve ABCDEF")))
    awaitRows(name, 1)
    awaitState(q, "block state registration")(_ > 0)
    // idle past the horizon: a timer batch evicts the whole block
    awaitState(q, "horizon eviction")(_ == 0)
    // a late dirty record sees an EMPTY registry — no link emission
    input.addData(Seq(ErRec("b", 2L, "Eve ABCDEF")))
    awaitState(q, "late-arrival batch commit")(_ > 0) // its own state re-registered
    q.stop()
    val links = spark.table(name).collect().map(r => r.getLong(0)).toSeq
    assert(links == Seq(1L),
      s"evicted block must not link late arrivals (registry gone): $links")
  }
}

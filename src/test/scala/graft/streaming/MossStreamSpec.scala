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
    val q = MossStreams.candidateSieve(spark, input.toDF())
      .writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    docs.grouped(math.max(1, docs.size / 3)).foreach { c =>
      input.addData(c); q.processAllAvailable()
    }
    q.stop()
    val streamed = spark.table(name).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // static single-pass run of the same operator — split invariance
    val static = MossStreams.candidateSieve(spark,
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

  test("confirmed pairs drain to the batch winnowPairs rows exactly (feed-split invariant)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val docs = Tables.documents(spark, sf).select("doc_id", "text").collect()
      .map(r => Doc(r.getLong(0), r.getString(1))).sortBy(_.doc_id).toSeq
    val batch = TextAnalysis.winnowPairs(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    def drained(nSplits: Int): Set[(Long, Long, Long)] = {
      val input = MemoryStream[Doc]
      val name = s"mossconf_${System.nanoTime()}"
      val q = MossStreams.confirmedPairs(spark, input.toDF())
        .writeStream.format("memory").queryName(name)
        .outputMode("append").start()
      docs.grouped(math.max(1, docs.size / nSplits)).foreach { c =>
        input.addData(c); q.processAllAvailable()
      }
      q.stop()
      // latest emission per pair is its final status (the ErStreams
      // latest-wins discipline; memory sink appends in batch order)
      spark.table(name).collect()
        .map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getBoolean(3)))
        .foldLeft(Map.empty[(Long, Long), (Long, Boolean)])(_ + _)
        .collect { case ((a, b), (s, true)) => (a, b, s) }.toSet
    }
    val threeWay = drained(3)
    assert(batch.nonEmpty && threeWay == batch,
      s"stream ${threeWay.size} vs batch ${batch.size}: missing=${(batch -- threeWay).take(3)} extra=${(threeWay -- batch).take(3)}")
    assert(drained(7) == threeWay, "emissions depend on the feed split")
  }

  test("cap-crossing retraction: a hot fingerprint's pairs net to the batch exclusion") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // two doc families: (a) a boilerplate 10-token run shared by cap+5
    // docs — enough shared fps (>= WinMinShared) that pairs QUALIFY
    // while the buckets are sub-cap, then must retract to nothing when
    // the buckets cross the cap; (b) a clean copied pair that must
    // survive. Batch winnowPairs on the same frame is the ground truth.
    // 30 tokens → ~28 grams → ~11 selected fps at density 2/(WinW+1):
    // comfortably past the WinMinShared=5 floor for both families
    val boiler = (1 to 30).map(i => s"boil$i").mkString(" ")
    val copied = (1 to 30).map(i => s"uniq$i").mkString(" ")
    val n = TextAnalysis.WinMaxFpDf + 5
    val docs = (0 until n).map(i => Doc(i.toLong, boiler)) ++
      Seq(Doc(900L, copied), Doc(901L, copied))
    // tuples, not the inner case class: a local Seq[Doc] can't resolve
    // the inner-class encoder's outer scope at toDF time
    val staticDf = docs.map(d => (d.doc_id, d.text)).toDF("doc_id", "text")
    val batch = {
      // winnowPairs reads from a dir; replicate its pipeline on the
      // constructed frame via the row-wise fps (spec'd equal) + the
      // same df-cap + floor
      val fps = MossStreams.fingerprints(staticDf)
        .select("doc_id", "fp").distinct()
      val okFp = fps.groupBy("fp").count()
        .filter(org.apache.spark.sql.functions.col("count") <= TextAnalysis.WinMaxFpDf)
        .select("fp")
      val j = fps.join(okFp, Seq("fp"))
      j.toDF("fp", "a_id").join(j.toDF("fp", "b_id"), Seq("fp"))
        .filter(org.apache.spark.sql.functions.col("a_id") <
          org.apache.spark.sql.functions.col("b_id"))
        .groupBy("a_id", "b_id").count()
        .filter(org.apache.spark.sql.functions.col("count") >= TextAnalysis.WinMinShared)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    }
    assert(batch == Set((900L, 901L, batch.headOption.map(_._3).getOrElse(0L))),
      s"fixture must reduce to the one clean pair: $batch")
    val input = MemoryStream[Doc]
    val name = s"mossretr_${System.nanoTime()}"
    val q = MossStreams.confirmedPairs(spark, input.toDF())
      .writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    docs.grouped(20).foreach { c => input.addData(c); q.processAllAvailable() }
    q.stop()
    val finalRows = spark.table(name).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getBoolean(3)))
      .foldLeft(Map.empty[(Long, Long), (Long, Boolean)])(_ + _)
    val stillOk = finalRows.collect { case ((a, b), (s, true)) => (a, b, s) }.toSet
    assert(stillOk == batch,
      s"after cap-crossing retraction stream must equal batch: got $stillOk vs $batch")
    // the boilerplate pairs must have been retracted via explicit
    // disqualification rows, not silently: some (i, j) pair with i,j in
    // the boiler family appears with ok=false as its final status
    val retracted = finalRows.collect { case ((a, b), (_, false)) if a < n && b < n => (a, b) }
    assert(retracted.nonEmpty, "expected explicit disqualification emissions for the hot family")
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
    val q = MossStreams.candidateSieve(spark, input.toDF())
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

  test("horizon mode evicts idle fingerprint buckets; detection becomes windowed") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    def stateRows(q: org.apache.spark.sql.streaming.StreamingQuery): Option[Long] =
      Option(q.lastProgress).flatMap(_.stateOperators.headOption).map(_.numRowsTotal)
    def await(q: org.apache.spark.sql.streaming.StreamingQuery, what: String)(
        pred: Long => Boolean): Unit = {
      val t0 = System.currentTimeMillis
      while (!stateRows(q).exists(pred) && System.currentTimeMillis - t0 < 60000)
        Thread.sleep(50)
      assert(stateRows(q).exists(pred), s"$what never observed (${stateRows(q)})")
    }
    val text = "alpha bravo charlie delta echo foxtrot"
    val input = MemoryStream[Doc]
    val name = s"mosshz_${System.nanoTime()}"
    val q = MossStreams.candidateSieve(spark, input.toDF(), horizonMs = Some(400L))
      .writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    input.addData(Seq(Doc(1L, text)))
    await(q, "doc 1 bucket registration")(_ > 0)
    await(q, "horizon eviction")(_ == 0) // timer batch evicted the idle bucket
    input.addData(Seq(Doc(2L, text)))
    await(q, "doc 2 bucket registration")(_ > 0)
    q.stop()
    // the windowed contract: doc 2 arrived after doc 1's bucket was
    // evicted, so NO pair crosses the horizon
    assert(spark.table(name).isEmpty,
      s"evicted bucket leaked a cross-horizon pair: ${spark.table(name).collect().toSeq}")
  }
}

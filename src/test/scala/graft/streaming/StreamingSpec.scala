package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

import graft.SparkSpec
import graft.sources.Tables

/** G19 verification: streaming output ≡ batch query on the same data;
  * watermark semantics with injected late rows (SURVEY.md §5.2.4). */
class StreamingSpec extends SparkSpec {

  case class Ev(event_id: Long, ts: Timestamp, user_id: Long, event_type: String, value: Double)

  private def eventsAsCase(): Seq[Ev] = {
    Tables.events(spark, sf).select("event_id", "ts", "user_id", "event_type", "value")
      .collect()
      .map(r => Ev(r.getLong(0), r.getTimestamp(1), r.getLong(2), r.getString(3), r.getDouble(4)))
      .toSeq
  }

  test("index append path: stream-encoded vectors match the batch index exactly") {
    import spark.implicits._
    import graft.operators.Similarity
    val ivf = Similarity.buildIvfIndex(spark, sf)
    val pq = Similarity.buildPqIndex(spark, sf, ivf)
    def rowSet(rows: Array[org.apache.spark.sql.Row]) =
      rows.map(r => (r.getLong(0), r.getInt(1), r.getAs[Array[Byte]](2).toSeq)).toSet
    val indexed = rowSet(pq.codes.select("vec_id", "cell", "code").collect())

    // batch form: re-encoding the corpus against the live index must
    // reproduce the index's own rows (cell prediction + codes)
    val emb = Tables.embeddings(spark, sf).select("vec_id", "embedding")
    val batch = rowSet(Similarity.encodeForAppend(spark, emb, ivf, pq).collect())
    assert(batch == indexed)

    // stream form: the same row-wise encode in append mode — arriving
    // vectors index themselves without any re-fit
    val data = emb.collect().map(r => (r.getLong(0), r.getSeq[Float](1))).toSeq
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Seq[Float])]
    val q = Similarity.encodeForAppend(spark,
        input.toDF().toDF("vec_id", "embedding"), ivf, pq)
      .writeStream.format("memory").queryName("append_enc")
      .outputMode("append").start()
    try {
      input.addData(data)
      q.processAllAvailable()
      val streamed = rowSet(spark.table("append_enc").collect())
      assert(streamed == indexed)
    } finally q.stop()
  }

  test("streaming hourly agg equals the batch query on the same data") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Ev]
    val result = EventStreams.hourlyAgg(input.toDF())
    val q = result.writeStream.format("memory").queryName("hourly")
      .outputMode(OutputMode.Complete()).start()
    // feed in three chunks to exercise incremental state
    val evs = eventsAsCase()
    evs.grouped(math.max(1, evs.size / 3)).foreach { chunk =>
      input.addData(chunk)
      q.processAllAvailable()
    }
    q.stop()

    val streamed = spark.table("hourly")
      .select("ws", "event_type", "c", "s").orderBy("ws", "event_type").collect()
    val batch = graft.operators.Relational.q19WindowAgg(spark, sf).collect()
    assert(streamed.length == batch.length)
    streamed.zip(batch).foreach { case (s, b) =>
      assert(s.getTimestamp(0) == b.getTimestamp(0))
      assert(s.getString(1) == b.getString(1))
      assert(s.getLong(2) == b.getLong(2))
      assert(math.abs(s.getDouble(3) - b.getDouble(3)) < 1e-9)
    }
  }

  test("watermark drops rows later than the horizon in append mode") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Ev]
    val result = EventStreams.hourlyAgg(input.toDF(), watermark = "10 minutes")
    val q = result.writeStream.format("memory").queryName("late")
      .outputMode(OutputMode.Append()).start()

    def ts(min: Int) = Timestamp.valueOf(f"2024-01-01 ${min / 60}%02d:${min % 60}%02d:00")
    // window [00:00,01:00): two on-time rows
    input.addData(Ev(1, ts(5), 1, "a", 1.0), Ev(2, ts(30), 1, "a", 2.0))
    q.processAllAvailable()
    // advance event time far past the watermark horizon → closes hour 0
    input.addData(Ev(3, ts(200), 1, "a", 4.0))
    q.processAllAvailable()
    // late row targeting the closed window: must be DROPPED
    input.addData(Ev(4, ts(10), 1, "a", 100.0))
    q.processAllAvailable()
    input.addData(Ev(5, ts(400), 1, "a", 8.0))
    q.processAllAvailable()
    q.stop()

    val rows = spark.table("late").orderBy("ws").collect()
    val hour0 = rows.filter(_.getTimestamp(0) == Timestamp.valueOf("2024-01-01 00:00:00"))
    assert(hour0.length == 1)
    assert(hour0.head.getLong(2) == 2, "late row must not be counted")
    assert(math.abs(hour0.head.getDouble(3) - 3.0) < 1e-9, "late row value must not be summed")
  }

  test("session windows merge events within the gap") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Ev]
    val q = EventStreams.sessionAgg(input.toDF()).writeStream
      .format("memory").queryName("sessions").outputMode(OutputMode.Complete()).start()
    def ts(min: Int) = Timestamp.valueOf(f"2024-01-01 ${min / 60}%02d:${min % 60}%02d:00")
    // user 1: two sessions (gap > 30 min between minute 40 and 90)
    input.addData(
      Ev(1, ts(0), 1, "a", 1.0), Ev(2, ts(20), 1, "a", 1.0), Ev(3, ts(40), 1, "a", 1.0),
      Ev(4, ts(90), 1, "a", 1.0),
      Ev(5, ts(0), 2, "a", 1.0))
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("sessions").collect()
    val u1 = rows.filter(_.getLong(1) == 1)
    assert(u1.length == 2, s"expected 2 sessions, got ${u1.length}")
    assert(u1.map(_.getLong(2)).sorted.toSeq == Seq(1L, 3L))
  }

  test("streaming dedup drops re-delivered events across micro-batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Ev]
    val q = EventStreams.dedupStream(input.toDF()).writeStream
      .format("memory").queryName("dedup_stream").outputMode(OutputMode.Append()).start()
    def ts(min: Int) = Timestamp.valueOf(f"2024-01-01 00:$min%02d:00")
    input.addData(Ev(1, ts(1), 1, "a", 1.0), Ev(2, ts(2), 1, "a", 2.0))
    q.processAllAvailable()
    // re-delivery of event 1 in a later micro-batch: must be dropped
    input.addData(Ev(1, ts(1), 1, "a", 1.0), Ev(3, ts(3), 1, "a", 3.0))
    q.processAllAvailable()
    q.stop()
    val ids = spark.table("dedup_stream").select("event_id").collect().map(_.getLong(0)).sorted
    assert(ids.toSeq == Seq(1L, 2L, 3L), s"got ${ids.toSeq}")
  }

  test("mapGroupsWithState running totals match batch aggregation") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Ev]
    val q = EventStreams.runningTotals(spark, input.toDF()).writeStream
      .format("memory").queryName("running").outputMode(OutputMode.Update()).start()
    val evs = eventsAsCase()
    evs.grouped(math.max(1, evs.size / 2)).foreach { chunk =>
      input.addData(chunk)
      q.processAllAvailable()
    }
    q.stop()
    // last update per user must equal the batch totals
    val streamed = spark.table("running").groupBy("user_id")
      .agg(max("n").as("n"), max("total").as("total"))
    val batch = Tables.events(spark, sf).groupBy("user_id")
      .agg(count(lit(1)).as("n"), sum("value").as("total"))
    val joined = streamed.alias("s").join(batch.alias("b"), "user_id")
      .select(col("s.n"), col("b.n"), col("s.total"), col("b.total")).collect()
    assert(joined.nonEmpty)
    joined.foreach { r =>
      assert(r.getLong(0) == r.getLong(1))
      assert(math.abs(r.getDouble(2) - r.getDouble(3)) < 1e-6)
    }
  }

  test("streaming near-dup candidates equal batch and cover batch LSH pairs") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val docs = Tables.documents(spark, sf).select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
    val input = MemoryStream[(Long, String)]
    val stream = DocStreams.nearDupCandidates(spark, input.toDF().toDF("doc_id", "text"))
    val q = stream.writeStream.format("memory").queryName("neardup")
      .outputMode(OutputMode.Append()).start()
    // three chunks: pairs must surface across batch boundaries via state.
    // Two shingle-less short docs ride along — they must never pair with
    // anything (a NULL signature must not collapse into a shared bucket).
    val shorties = Seq((900001L, "hello world"), (900002L, "foo bar"))
    (docs ++ shorties).grouped(math.max(1, docs.size / 3)).foreach { chunk =>
      input.addData(chunk)
      q.processAllAvailable()
    }
    q.stop()
    val streamed = spark.table("neardup").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(!streamed.exists { case (a, b) => a >= 900000L || b >= 900000L },
      "short docs must not produce candidates")
    // identical operator over the same data as one static frame
    val batch = DocStreams.nearDupCandidates(spark,
      Tables.documents(spark, sf).select("doc_id", "text")).collect()
      .map(p => (p.a_id, p.b_id)).toSet
    assert(streamed == batch, s"stream ${streamed.size} vs batch ${batch.size}")
    assert(streamed.nonEmpty)
    // every batch-LSH near-dup pair (est >= 0.5) shares a band, so the
    // candidate stream must cover them all
    val lsh = graft.operators.Dedup.minhashLsh(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(lsh.subsetOf(streamed), s"missing ${(lsh -- streamed).size} LSH pairs")
  }

  test("near-dup horizon evicts idle band state but keeps pairs inside it") {
    runNearDupHorizonTest()
  }

  test("streaming embedding near-dup: verified pairs equal the batch bucketed path") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val sf01 = "/root/testdata/sf0.01"
    import graft.operators.Dedup
    // exact oracle pairs (precision gate) and the batch bucketed path
    // (equality gate: 1-bit flips are symmetric, so the stream finds a
    // pair iff some table's home buckets are within Hamming 1 — the same
    // condition the batch equi join expresses, independent of arrival order)
    val exact = Dedup.embeddingCosine(spark, sf01).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val batch = Dedup.embeddingCosineBucketed(spark, sf01).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val rows = Tables.embeddings(spark, sf01).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1)))
    val input = MemoryStream[(Long, Seq[Float])]
    val q = EmbedStreams.nearDupPairs(spark,
        input.toDF().toDF("vec_id", "embedding"))
      .writeStream.format("memory").queryName("emb_nd")
      .outputMode(OutputMode.Append()).start()
    // two chunks to exercise cross-batch state
    val (first, second) = rows.splitAt(rows.length / 2)
    input.addData(first.toSeq); q.processAllAvailable()
    input.addData(second.toSeq); q.processAllAvailable()
    q.stop()
    val got = spark.table("emb_nd").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got.subsetOf(exact), // every emitted pair is exact-verified
      s"false positives: ${(got -- exact).take(5)}")
    assert(got == batch, // and the stream loses nothing vs the batch join
      s"missing=${(batch -- got).take(5)} extra=${(got -- batch).take(5)}")
  }

  // NOTE: with a registered ProcessingTimeTimeout the micro-batch engine
  // keeps scheduling no-data batches to evaluate timers, so
  // processAllAvailable never quiesces — the test polls the memory sink
  // with a deadline instead. (The continuous batches are also what FIRES
  // the timers without needing new input.)
  private def runNearDupHorizonTest(): Unit = {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    def rowsOf(name: String): Set[(Long, Long)] = spark.table(name).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    def awaitRows(name: String, n: Int): Unit = {
      val t0 = System.currentTimeMillis
      while (spark.table(name).count() < n &&
        System.currentTimeMillis - t0 < 60000) Thread.sleep(100)
    }
    // every phase transition is gated on the STATE-STORE METRICS, not
    // wall-clock sleeps: a loaded host can delay any batch arbitrarily,
    // so "sleep 2 s and hope the batch ran" is a flake — observing
    // numRowsTotal cross a threshold is not
    def awaitState(q: org.apache.spark.sql.streaming.StreamingQuery,
        what: String)(pred: Long => Boolean): Unit = {
      val t0 = System.currentTimeMillis
      def cur: Option[Long] = Option(q.lastProgress)
        .flatMap(p => p.stateOperators.headOption).map(_.numRowsTotal)
      while (!cur.exists(pred) && System.currentTimeMillis - t0 < 60000)
        Thread.sleep(50)
      assert(cur.exists(pred), s"$what never observed (last state rows: $cur)")
    }
    // two identical docs = guaranteed band collision in every band
    val text = "alpha beta gamma delta epsilon zeta eta theta iota kappa"

    // inside a generous horizon (10 min): the duplicate pair IS emitted
    // across separate batches
    val input = MemoryStream[(Long, String)]
    val qKeep = DocStreams.nearDupCandidates(spark,
        input.toDF().toDF("doc_id", "text"), horizonMs = Some(600000L))
      .writeStream.format("memory").queryName("nd_keep")
      .outputMode(OutputMode.Append()).start()
    input.addData(Seq((1L, text)))
    awaitState(qKeep, "doc 1 state registration")(_ > 0) // doc 1's batch committed
    input.addData(Seq((2L, text)))
    awaitRows("nd_keep", 1)
    qKeep.stop()
    assert(rowsOf("nd_keep") == Set((1L, 2L)),
      s"expected the in-horizon pair, got ${rowsOf("nd_keep")}")

    // past a short horizon: the idle bucket's lease lapses, a timer batch
    // evicts the state, and the late duplicate pairs with NOTHING —
    // exactly the dedup-horizon semantics
    val input2 = MemoryStream[(Long, String)]
    val qEvict = DocStreams.nearDupCandidates(spark,
        input2.toDF().toDF("doc_id", "text"), horizonMs = Some(500L))
      .writeStream.format("memory").queryName("nd_evict")
      .outputMode(OutputMode.Append()).start()
    input2.addData(Seq((1L, text)))
    awaitState(qEvict, "doc 1 state registration")(_ > 0)
    awaitState(qEvict, "horizon eviction")(_ == 0) // timer batch evicted doc 1
    input2.addData(Seq((2L, text)))
    // doc 2's batch committed ⇒ any (wrong) within-state pair would
    // already be in the sink
    awaitState(qEvict, "doc 2 state registration")(_ > 0)
    qEvict.stop()
    assert(rowsOf("nd_evict").isEmpty,
      s"state past the horizon must be evicted (no pair), got ${rowsOf("nd_evict")}")
  }

  test("stream-stream interval join (click attribution) equals the batch join") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Ev]
    val result = EventStreams.clickAttribution(input.toDF())
    val q = result.writeStream.format("memory").queryName("attrib")
      .outputMode(OutputMode.Append()).start()
    val evs = eventsAsCase()
    try {
      evs.grouped(math.max(1, evs.size / 4)).foreach { chunk =>
        input.addData(chunk)
        q.processAllAvailable()
      }
    } finally q.stop()

    def key(rows: Array[org.apache.spark.sql.Row]) =
      rows.map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val streamed = key(spark.table("attrib").collect())
    val batch = key(EventStreams.clickAttribution(
      Tables.events(spark, sf)).collect())
    assert(batch.nonEmpty, "fixture must produce at least one attributed click")
    assert(streamed == batch)
  }
}

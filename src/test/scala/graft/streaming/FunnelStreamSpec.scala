package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sources.Tables

/** Batch ≡ stream parity for the funnel and retention operators: the
  * flatMapGroupsWithState forms, fed the same events as an out-of-order
  * multi-batch stream, emit exactly the batch per-user frames (and hence
  * the same step counts / cohort table). A far-future sentinel event
  * advances the watermark past every deadline so all users finalize; the
  * sentinel user is excluded from the comparison. */
class FunnelStreamSpec extends SparkSpec {

  case class Ev(event_id: Long, ts: Timestamp, user_id: Long, event_type: String, value: Double)

  private val SentinelUser = -1L

  private def feed(chunks: Seq[Seq[Ev]], sentinelTs: Timestamp)(
      mk: org.apache.spark.sql.DataFrame => org.apache.spark.sql.Dataset[_]): Seq[org.apache.spark.sql.Row] = {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Ev]
    val name = s"fs_${System.nanoTime()}"
    val q = mk(input.toDF()).toDF().writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    chunks.foreach { c => input.addData(c); q.processAllAvailable() }
    input.addData(Ev(0L, sentinelTs, SentinelUser, "view", 0.0))
    q.processAllAvailable()
    // one more empty-ish nudge so timeout-only batches run
    input.addData(Ev(1L, sentinelTs, SentinelUser, "view", 0.0))
    q.processAllAvailable()
    q.stop()
    spark.table(name).collect().toSeq
  }

  private def loadEvents(): (Seq[Seq[Ev]], Timestamp) = {
    val evs = Tables.events(spark, sf)
      .select("event_id", "ts", "user_id", "event_type", "value").collect()
      .map(r => Ev(r.getLong(0), r.getTimestamp(1), r.getLong(2), r.getString(3), r.getDouble(4)))
      .toSeq
    val maxTs = evs.map(_.ts.getTime).max
    // deliberately NOT time-ordered (collect order), split across batches
    val chunks = evs.grouped(math.max(1, evs.size / 3)).toSeq
    (chunks, new Timestamp(maxTs + 100L * 24 * 3600 * 1000))
  }

  test("streaming funnel per-user (tv, tc, tp) equals the batch recurrence") {
    val (chunks, sentinel) = loadEvents()
    // watermark delay wider than the corpus span: no late-drop, pure
    // out-of-order stress; the sentinel still closes every deadline
    val rows = feed(chunks, sentinel)(df =>
      FunnelStreams.funnelStream(spark, df, watermark = "40 days"))
    val streamed = rows
      .filter(_.getAs[Long]("user_id") != SentinelUser)
      .map(r => r.getAs[Long]("user_id") ->
        (Option(r.get(r.fieldIndex("tv_us"))).map(_.asInstanceOf[Long]),
          Option(r.get(r.fieldIndex("tc_us"))).map(_.asInstanceOf[Long]),
          Option(r.get(r.fieldIndex("tp_us"))).map(_.asInstanceOf[Long])))
      .toMap

    // batch per-user frames, re-derived with the same semantics as
    // EventAnalytics.funnel's tv/tc/tp stages
    val ev = Tables.events(spark, sf)
    val horizon = expr("INTERVAL 24 HOURS")
    val tv = ev.filter(col("event_type") === "view")
      .groupBy("user_id").agg(min("ts").as("tv"))
    val tc = ev.filter(col("event_type") === "click")
      .join(tv, Seq("user_id"))
      .filter(col("ts") > col("tv") && col("ts") <= col("tv") + horizon)
      .groupBy("user_id").agg(min("ts").as("tc"), min("tv").as("tv"))
    val tp = ev.filter(col("event_type") === "purchase")
      .join(tc, Seq("user_id"))
      .filter(col("ts") > col("tc") && col("ts") <= col("tv") + horizon)
      .groupBy("user_id").agg(min("ts").as("tp"))
    def usMap(df: org.apache.spark.sql.DataFrame, c: String): Map[Long, Long] =
      df.selectExpr("user_id", s"unix_micros($c)").collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val (btv, btc, btp) = (usMap(tv, "tv"), usMap(tc, "tc"), usMap(tp, "tp"))

    assert(streamed.keySet == btv.keySet,
      s"user sets differ: stream ${streamed.size} vs batch ${btv.size}")
    assert(btc.nonEmpty && btp.nonEmpty, "fixture funnel is trivial")
    streamed.foreach { case (u, (stv, stc, stp)) =>
      assert(stv == btv.get(u), s"user $u tv: $stv vs ${btv.get(u)}")
      assert(stc == btc.get(u), s"user $u tc: $stc vs ${btc.get(u)}")
      assert(stp == btp.get(u), s"user $u tp: $stp vs ${btp.get(u)}")
    }
  }

  test("a user returning after finalization emits no second row (tombstone)") {
    // tight watermark so user 1 FINALIZES mid-stream, then returns far
    // beyond the deadline — the regression this guards: state re-creation
    // after timeout emitted a duplicate (and for retention, wrong-cohort)
    // row per returning user
    val t0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    def at(hours: Long) = new Timestamp(t0.getTime + hours * 3600 * 1000)
    val early = Seq(
      Ev(1L, at(0), 1L, "view", 0.0),
      Ev(2L, at(1), 1L, "click", 0.0))
    // sentinel-driven watermark far past user 1's funnel deadline (24h)
    // and retention window (7d), then user 1 comes back
    val late = Seq(
      Ev(3L, at(24 * 40), 1L, "view", 0.0),
      Ev(4L, at(24 * 40 + 1), 1L, "click", 0.0),
      Ev(5L, at(24 * 40 + 2), 1L, "purchase", 0.0))
    val sentinel = at(24 * 80)

    val funnelRows = feed(Seq(early, Seq(Ev(9L, at(24 * 30), SentinelUser, "view", 0.0)), late),
      sentinel)(df => FunnelStreams.funnelStream(spark, df, watermark = "1 hour"))
      .filter(_.getAs[Long]("user_id") == 1L)
    assert(funnelRows.length == 1, s"returning user emitted ${funnelRows.length} funnel rows")
    val r = funnelRows.head
    // the surviving row is the FIRST funnel: tv at hour 0, tc at hour 1,
    // no purchase inside (tv, tv+24h]
    assert(r.getAs[Long]("tv_us") == at(0).getTime * 1000L)
    assert(r.getAs[Long]("tc_us") == at(1).getTime * 1000L)
    assert(r.isNullAt(r.fieldIndex("tp_us")))

    val retRows = feed(Seq(early, Seq(Ev(9L, at(24 * 30), SentinelUser, "view", 0.0)), late),
      sentinel)(df => FunnelStreams.retentionStream(spark, df, watermark = "1 hour"))
      .filter(_.getAs[Long]("user_id") == 1L)
    assert(retRows.length == 1, s"returning user founded ${retRows.length} cohorts")
    assert(retRows.head.getAs[Int]("d0_day") == (t0.getTime / (86400L * 1000)).toInt)
    assert(retRows.head.getAs[scala.collection.Seq[Int]]("ks").toSeq == Seq(0))
  }

  test("streaming retention (d0, k) pairs equal the batch cohort table") {
    val (chunks, sentinel) = loadEvents()
    val rows = feed(chunks, sentinel)(df =>
      FunnelStreams.retentionStream(spark, df, watermark = "40 days"))
    // explode (user, d0, ks) into (d0, k) -> distinct users
    val streamed = rows
      .filter(_.getAs[Long]("user_id") != SentinelUser)
      .flatMap { r =>
        val d0 = r.getAs[Int]("d0_day")
        r.getAs[scala.collection.Seq[Int]]("ks").map(k => ((d0, k), r.getAs[Long]("user_id")))
      }
      .groupBy(_._1).map { case (key, xs) => key -> xs.map(_._2).distinct.size.toLong }

    val batch = graft.operators.EventAnalytics.retention(spark, sf)
      .selectExpr("CAST(datediff(d0, DATE '1970-01-01') AS INT) AS d0_day", "k", "users")
      .collect().map(r => ((r.getInt(0), r.getInt(1)), r.getLong(2))).toMap

    assert(batch.nonEmpty && streamed == batch,
      s"retention differs: stream ${streamed.size} cells vs batch ${batch.size}")
  }
}

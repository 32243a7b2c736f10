package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

import graft.SparkSpec
import graft.sources.Tables

/** The two sessionization forms agree: the batch lag/running-sum
  * operator (q29) and Structured Streaming's session_window produce the
  * same per-user session multiset on the same events — the contract
  * that lets a deployment sessionize the live stream and the backfill
  * with interchangeable code paths. (Boundary semantics: session_window
  * closes at gap ≥ 30 min, the batch form at > 30 min — they can differ
  * only on a gap equal to EXACTLY 1800.000000 s, which the spec verifies
  * is absent from the corpus rather than silently assuming.) */
class SessionStreamSpec extends SparkSpec {

  case class Ev(event_id: Long, ts: Timestamp, user_id: Long, event_type: String, value: Double)

  test("streaming session_window sessions equal the batch q29 sessions") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    // precondition for form-equivalence: no exact-1800s gap in the data
    val us = Tables.events(spark, sf)
      .selectExpr("user_id", "unix_micros(ts) AS us").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    val exactGap = us.groupBy(_._1).values.exists { g =>
      val s = g.map(_._2).sorted
      s.zip(s.tail).exists { case (a, b) => b - a == 1800000000L }
    }
    assert(!exactGap, "corpus has an exact-30min gap; forms legitimately diverge")

    val evs = Tables.events(spark, sf)
      .select("event_id", "ts", "user_id", "event_type", "value").collect()
      .map(r => Ev(r.getLong(0), r.getTimestamp(1), r.getLong(2), r.getString(3), r.getDouble(4)))
      .toSeq
    val input = MemoryStream[Ev]
    val result = EventStreams.sessionAgg(input.toDF())
    val q = result.writeStream.format("memory").queryName("sess")
      .outputMode(OutputMode.Complete()).start()
    evs.grouped(math.max(1, evs.size / 3)).foreach { chunk =>
      input.addData(chunk); q.processAllAvailable()
    }
    q.stop()

    // compare per-user session (start, count) sets
    val streamed = spark.table("sess")
      .selectExpr("user_id", "unix_micros(ss)", "c").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val batch = graft.operators.EventAnalytics.sessionize(spark, sf)
      .selectExpr("user_id", "unix_micros(start_ts)", "n_events").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(batch.nonEmpty && streamed == batch,
      s"forms disagree: stream ${streamed.size} vs batch ${batch.size} sessions")
  }
}

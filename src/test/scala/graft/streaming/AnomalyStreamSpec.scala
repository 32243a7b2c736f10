package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.Quality
import graft.sources.Tables

/** Streaming anomaly detection ≡ the batch q31 detector on the same
  * events and the same trained baseline (one shared scorer drives both). */
class AnomalyStreamSpec extends SparkSpec {

  case class Ev(event_id: Long, ts: Timestamp, user_id: Long, event_type: String, value: Double)

  test("streamed spike flags equal batch q31 given the same baseline") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val stats = Quality.hourlyStats(Quality.hourlyCounts(spark, sf)).cache()
    val batch = Quality.eventAnomalies(spark, sf).collect()
      .map(r => (r.getString(0), r.getTimestamp(1), r.getLong(2), r.getDouble(3))).toSet

    val evs = Tables.events(spark, sf)
      .select("event_id", "ts", "user_id", "event_type", "value").collect()
      .map(r => Ev(r.getLong(0), r.getTimestamp(1), r.getLong(2), r.getString(3), r.getDouble(4)))
      .toSeq
    val input = MemoryStream[Ev]
    // Update-mode sink contract: keyed last-wins upsert over the
    // changed-window emissions (flags are monotone, so the accumulated
    // map converges to the batch flag set)
    val upserts = scala.collection.concurrent.TrieMap.empty[(String, Timestamp), (Long, Double)]
    // watermark wider than the corpus span: the un-time-ordered collect
    // feed must not late-drop (Update mode enforces the drop Complete
    // mode ignored); pure out-of-order incremental-update stress
    val q = AnomalyStream.start(input.toDF(), stats, "anomaly_stream",
      flagged => flagged.collect().foreach { r =>
        upserts((r.getString(0), r.getTimestamp(1))) = (r.getLong(2), r.getDouble(3))
      }, watermark = "40 days")
    try {
      // three chunks exercise incremental window state
      evs.grouped(math.max(1, evs.size / 3)).foreach { chunk =>
        input.addData(chunk)
        q.processAllAvailable()
      }
    } finally q.stop()

    val streamed = upserts.toSet[((String, Timestamp), (Long, Double))]
      .map { case ((t, h), (c, z)) => (t, h, c, z) }
    assert(streamed == batch, s"stream flagged ${streamed.size}, batch ${batch.size}")
    assert(streamed.nonEmpty)
  }
}

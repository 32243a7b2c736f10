package graft.operators

import graft.SparkSpec
import graft.sources.Tables

/** Funnel / retention / interval join vs independent brute-force scans
  * over the collected event log. */
class EventAnalyticsSpec extends SparkSpec {

  private lazy val events: Seq[(Long, Long, String, Long)] =
    Tables.events(spark, sf)
      .selectExpr("event_id", "user_id", "event_type", "unix_micros(ts) AS us")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3))).toSeq

  private val HourUs = 3600L * 1000000L

  test("funnel ≡ brute force (strict order within 24h of first view)") {
    val byUser = events.groupBy(_._2)
    val win = 24 * HourUs
    var s1 = 0L; var s2 = 0L; var s3 = 0L
    byUser.foreach { case (_, evs) =>
      val tv = evs.filter(_._3 == "view").map(_._4).minOption
      tv.foreach { v =>
        s1 += 1
        val tc = evs.filter(e => e._3 == "click" && e._4 > v && e._4 <= v + win)
          .map(_._4).minOption
        tc.foreach { c =>
          s2 += 1
          val tp = evs.filter(e => e._3 == "purchase" && e._4 > c && e._4 <= v + win)
            .map(_._4).minOption
          if (tp.isDefined) s3 += 1
        }
      }
    }
    val got = EventAnalytics.funnel(spark, sf).collect()
      .map(r => r.getInt(0) -> r.getLong(2)).toMap
    assert(got == Map(1 -> s1, 2 -> s2, 3 -> s3), s"got $got vs ($s1,$s2,$s3)")
    assert(s1 > 0 && s1 >= s2 && s2 >= s3)
  }

  test("retention ≡ brute force day-k cohorts") {
    val dayUs = 24 * HourUs
    val active = events.map(e => (e._2, e._4 / dayUs)).distinct
    val d0 = active.groupBy(_._1).map { case (u, ds) => u -> ds.map(_._2).min }
    val expected = active
      .map { case (u, d) => (d0(u), d - d0(u), u) }
      .filter(t => t._2 >= 0 && t._2 <= 7)
      .groupBy(t => (t._1, t._2)).map { case (k, v) => k -> v.map(_._3).distinct.size }
    val got = EventAnalytics.retention(spark, sf).collect()
      .map(r => (r.getDate(0).toLocalDate.toEpochDay, r.getInt(1).toLong) -> r.getLong(2))
      .toMap
    // brute-force day buckets are epoch-days of the µs timestamp (UTC,
    // same convention as to_date under the UTC session timezone)
    assert(got.size == expected.size)
    expected.foreach { case ((d, k), n) =>
      assert(got((d, k)) == n.toLong, s"cohort $d day $k")
    }
  }

  test("interval join ≡ brute force clicks-after-error") {
    val errors = events.filter(_._3 == "error")
    val clicks = events.filter(_._3 == "click").map(_._4)
    val expected = errors.map { e =>
      e._1 -> clicks.count(c => c > e._4 && c <= e._4 + HourUs).toLong
    }.filter(_._2 > 0).toMap
    val got = EventAnalytics.intervalJoin(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == expected)
    assert(got.nonEmpty)
  }
}

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

  test("attribution ≡ brute force last-touch within 24h") {
    // brute force off the full collected log: per purchase, the latest
    // strictly-preceding non-purchase event (ties broken by event_id —
    // the operator's window order) within the horizon
    val withVal = Tables.events(spark, sf)
      .selectExpr("event_id", "user_id", "event_type", "unix_micros(ts) AS us",
        "ROUND(value, 2) AS v")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3), r.getDouble(4)))
    val byUser = withVal.groupBy(_._2)
    val credited: Seq[(String, Double)] = byUser.values.toSeq.flatMap { evs =>
      val sorted = evs.sortBy(e => (e._4, e._1))
      sorted.zipWithIndex.flatMap { case (p, i) =>
        if (p._3 != "purchase") None
        else sorted.take(i).filter(_._3 != "purchase").lastOption
          .filter(t => p._4 - t._4 <= EventAnalytics.AttributionHorizonUs)
          .map(t => (t._3, p._5))
      }
    }
    val exp = credited.groupBy(_._1).map { case (ch, vs) =>
      ch -> (vs.size.toLong, math.rint(vs.map(_._2).sum * 100) / 100) }
    val got = EventAnalytics.attribution(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(got.keySet == exp.keySet && got.nonEmpty)
    got.foreach { case (ch, (n, v)) =>
      assert(n == exp(ch)._1, s"$ch count $n vs ${exp(ch)._1}")
      assert(math.abs(v - exp(ch)._2) < 0.02, s"$ch value $v vs ${exp(ch)._2}")
    }
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

  test("sessionize ≡ brute force gap splitting; sessions partition each user's events") {
    val gapUs = 30L * 60L * 1000000L
    // brute force: per user, sort by (ts, event_id), split on >30min gaps
    val expected = events.groupBy(_._2).flatMap { case (uid, evs) =>
      val sorted = evs.sortBy(e => (e._4, e._1))
      val sessions = sorted.foldLeft(List.empty[List[(Long, Long, String, Long)]]) {
        case (acc, e) => acc match {
          case cur :: rest if e._4 - cur.head._4 <= gapUs => (e :: cur) :: rest
          case _ => List(e) :: acc
        }
      }.reverse.map(_.reverse)
      sessions.zipWithIndex.map { case (s, i) =>
        (uid, i + 1L) -> (s.size.toLong, s.head._4, s.last._4)
      }
    }
    val got = EventAnalytics.sessionize(spark, sf)
      .selectExpr("user_id", "session_idx", "n_events",
        "unix_micros(start_ts)", "unix_micros(end_ts)", "duration_s")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
      .toMap
    assert(got.size == expected.size)
    expected.foreach { case (k, (n, s, e)) =>
      val (gn, gs, ge, gd) = got(k)
      assert((gn, gs, ge) == ((n, s, e)), s"session $k")
      assert(gd == (e - s) / 1000000L, s"duration $k")
    }
    // sessions partition the user's events exactly
    val totalEvents = got.values.map(_._1).sum
    assert(totalEvents == events.size.toLong)
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

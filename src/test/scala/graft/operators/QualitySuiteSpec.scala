package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sources.Tables

/** The data-quality constraint suite and the event anomaly detector:
  * the oracle covers value parity, these cover the gate semantics (a
  * deliberately failing check must go red, passing ones green) and the
  * z-score arithmetic against a driver-side recount. */
class QualitySuiteSpec extends SparkSpec {

  test("dq_checks: red where the data violates, green everywhere else") {
    val rows = Quality.dqChecks(spark, sf).collect()
      .map(r => r.getAs[String]("check") ->
        (r.getAs[Long]("violations"), r.getAs[Long]("total"), r.getAs[Boolean]("pass")))
      .toMap
    assert(rows.size == 8)
    val negBal = Tables.customer(spark, sf).filter(col("c_acctbal") < 0).count()
    assert(negBal > 0, "fixture lost its negative balances — the red-row check is vacuous")
    assert(rows("customer_acctbal_nonnegative") ==
      ((negBal, Tables.customer(spark, sf).count(), false)))
    (rows - "customer_acctbal_nonnegative").foreach { case (name, (v, _, pass)) =>
      assert(v == 0L && pass, s"$name unexpectedly failing")
    }
    // pass is DERIVED from violations, never independent
    rows.values.foreach { case (v, _, pass) => assert(pass == (v == 0L)) }
  }

  test("q31_anomaly: flagged z-scores match a driver-side recount, all above threshold") {
    val hourly = Tables.events(spark, sf)
      .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("h"))
      .agg(count(lit(1)).as("c"))
      .collect()
      .map(r => (r.getString(0), r.getTimestamp(1), r.getLong(2)))
    val byType = hourly.groupBy(_._1).map { case (t, rs) =>
      val cs = rs.map(_._3.toDouble)
      val mu = cs.sum / cs.length
      val sd = math.sqrt(cs.map(x => (x - mu) * (x - mu)).sum / cs.length)
      t -> (mu, sd)
    }
    val flagged = Quality.eventAnomalies(spark, sf).collect()
    assert(flagged.nonEmpty, "fixture has no spikes — detector untested")
    flagged.foreach { r =>
      val (mu, sd) = byType(r.getAs[String]("event_type"))
      val z = (r.getAs[Long]("c") - mu) / sd
      assert(z > Quality.AnomalyZ)
      assert(math.abs(r.getAs[Double]("z") - math.round(z * 1e4) / 1e4) < 1e-9)
    }
    // completeness: every driver-side exceedance is flagged
    val expected = hourly.count { case (t, _, c) =>
      val (mu, sd) = byType(t); (c - mu) / sd > Quality.AnomalyZ
    }
    assert(flagged.length == expected)
  }
}

package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Data-quality gates over the warehouse tables — the constraint-suite
  * operator (the Deequ / dbt-test shape): uniqueness, referential
  * integrity, ranges, null rates, each reported as (check, violations,
  * total, pass). A pipeline runs this BEFORE publishing a snapshot
  * version; the check frame is what lands in the run's audit log.
  *
  * Scale shape: all checks against one table share ONE aggregation pass
  * over one scan (the Deequ trick — `count(CASE WHEN …)` columns in a
  * single agg), so the suite costs #tables scans regardless of how many
  * constraints it carries; the referential check is the lone join, a
  * broadcast-or-shuffled anti-join on the key it guards.
  */
object Quality {

  def dqChecks(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
    val ord = Tables.orders(spark, dir)
    val cust = Tables.customer(spark, dir)

    // one agg pass per table, many checks per pass
    val liAgg = li.agg(
      count(lit(1)).as("total"),
      sum(when(col("l_quantity") < 1 || col("l_quantity") > 50, 1L).otherwise(0L)).as("qty_range"),
      sum(when(col("l_discount") < 0 || col("l_discount") > 0.1, 1L).otherwise(0L)).as("disc_range"),
      sum(when(col("l_shipdate").isNull, 1L).otherwise(0L)).as("ship_null"))
    val ordAgg = ord.agg(
      count(lit(1)).as("total"),
      (count(lit(1)) - countDistinct(col("o_orderkey"))).as("pk_dup"),
      sum(when(col("o_totalprice") <= 0, 1L).otherwise(0L)).as("price_pos"))
    val custAgg = cust.agg(
      count(lit(1)).as("total"),
      sum(when(col("c_acctbal").isNull, 1L).otherwise(0L)).as("bal_null"),
      // a plausible-but-wrong constraint that FAILS on TPC-H-shaped data
      // (acctbal spans negative values) — the suite must demonstrate a red
      // row, not only green ones
      sum(when(col("c_acctbal") < 0, 1L).otherwise(0L)).as("bal_neg"))
    // referential integrity: lineitem.l_orderkey ⊆ orders.o_orderkey
    val orphans = li.select(col("l_orderkey"))
      .join(ord.select(col("o_orderkey")), col("l_orderkey") === col("o_orderkey"),
        "left_anti")
      .agg(count(lit(1)).as("violations"))
    // the referential row's total rides liAgg's already-computed count —
    // a separate li.count() would be a THIRD full lineitem scan, against
    // this operator's own one-agg-pass-per-table design
    val orphanRow = orphans.crossJoin(liAgg.select(col("total")))

    def row(name: String, agg: DataFrame, violCol: String): DataFrame =
      agg.select(lit(name).as("check"), col(violCol).cast("long").as("violations"),
        col("total").cast("long").as("total"))
    val frame = row("lineitem_discount_range", liAgg, "disc_range")
      .unionAll(row("lineitem_quantity_range", liAgg, "qty_range"))
      .unionAll(row("lineitem_shipdate_not_null", liAgg, "ship_null"))
      .unionAll(orphanRow.select(lit("lineitem_orderkey_ref").as("check"),
        col("violations").cast("long"), col("total").cast("long")))
      .unionAll(row("orders_orderkey_unique", ordAgg, "pk_dup"))
      .unionAll(row("orders_totalprice_positive", ordAgg, "price_pos"))
      .unionAll(row("customer_acctbal_not_null", custAgg, "bal_null"))
      .unionAll(row("customer_acctbal_nonnegative", custAgg, "bal_neg"))
    frame.withColumn("pass", col("violations") === 0L).orderBy("check")
  }

  /** Windowed anomaly detection over the event stream: hourly counts per
    * event type, flagged where the count exceeds the type's mean by
    * [[AnomalyZ]] population standard deviations — the ops-dashboard
    * spike detector. Two aggs: (type, hour) counts (one shuffle on a
    * bounded key), then a per-type stats frame (event-type-sized,
    * broadcast back). At 100 TB the hourly frame is ~types×8760/yr rows
    * — the stats join never sees raw events. */
  val AnomalyZ = 3.0

  /** Per-type hourly counts — the frame both the batch detector and the
    * streaming sibling ([[graft.streaming.AnomalyStream]]) score. */
  def hourlyCounts(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("h"))
      .agg(count(lit(1)).as("c"))

  /** Baseline per-type (mu, sd) — in production this is TRAINED on
    * history and broadcast to the scorer; the batch demo derives it from
    * the same corpus it scores. */
  def hourlyStats(hourly: DataFrame): DataFrame =
    hourly.groupBy("event_type")
      .agg(avg("c").as("mu"), stddev_pop("c").as("sd"))

  /** The shared scorer: one stream-or-batch hourly frame against one
    * broadcast stats frame — batch q31 and the streaming form flag the
    * SAME rows because this is literally the same code. */
  def scoreHourly(hourly: DataFrame, stats: DataFrame, z: Double = AnomalyZ): DataFrame =
    hourly.join(broadcast(stats), Seq("event_type"))
      .withColumn("z", (col("c") - col("mu")) / col("sd"))
      .filter(col("z") > z)
      .select(col("event_type"), col("h"), col("c"), round(col("z"), 4).as("z"))

  def eventAnomalies(spark: SparkSession, dir: String): DataFrame = {
    val hourly = hourlyCounts(spark, dir)
    scoreHourly(hourly, hourlyStats(hourly)).orderBy("event_type", "h")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "dq_checks" -> dqChecks _,
    "q31_anomaly" -> eventAnomalies _,
  )

  val oracleSql: Map[String, String] = Map(
    "dq_checks" ->
      """WITH li AS (SELECT CAST(COUNT(*) AS BIGINT) AS total,
        |CAST(SUM(CASE WHEN l_quantity < 1 OR l_quantity > 50 THEN 1 ELSE 0 END) AS BIGINT) AS qty_range,
        |CAST(SUM(CASE WHEN l_discount < 0 OR l_discount > 0.1 THEN 1 ELSE 0 END) AS BIGINT) AS disc_range,
        |CAST(SUM(CASE WHEN l_shipdate IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS ship_null
        |FROM lineitem),
        |ord AS (SELECT CAST(COUNT(*) AS BIGINT) AS total,
        |CAST(COUNT(*) - COUNT(DISTINCT o_orderkey) AS BIGINT) AS pk_dup,
        |CAST(SUM(CASE WHEN o_totalprice <= 0 THEN 1 ELSE 0 END) AS BIGINT) AS price_pos
        |FROM orders),
        |cust AS (SELECT CAST(COUNT(*) AS BIGINT) AS total,
        |CAST(SUM(CASE WHEN c_acctbal IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS bal_null,
        |CAST(SUM(CASE WHEN c_acctbal < 0 THEN 1 ELSE 0 END) AS BIGINT) AS bal_neg
        |FROM customer),
        |orph AS (SELECT CAST(COUNT(*) AS BIGINT) AS violations,
        |(SELECT CAST(COUNT(*) AS BIGINT) FROM lineitem) AS total
        |FROM lineitem WHERE l_orderkey NOT IN (SELECT o_orderkey FROM orders)),
        |f AS (
        |SELECT 'lineitem_discount_range' AS check, disc_range AS violations, total FROM li
        |UNION ALL SELECT 'lineitem_quantity_range', qty_range, total FROM li
        |UNION ALL SELECT 'lineitem_shipdate_not_null', ship_null, total FROM li
        |UNION ALL SELECT 'lineitem_orderkey_ref', violations, total FROM orph
        |UNION ALL SELECT 'orders_orderkey_unique', pk_dup, total FROM ord
        |UNION ALL SELECT 'orders_totalprice_positive', price_pos, total FROM ord
        |UNION ALL SELECT 'customer_acctbal_not_null', bal_null, total FROM cust
        |UNION ALL SELECT 'customer_acctbal_nonnegative', bal_neg, total FROM cust)
        |SELECT "check", violations, total, violations = 0 AS pass
        |FROM f ORDER BY "check"""".stripMargin.replaceAll("\n", " "),
    "q31_anomaly" ->
      s"""WITH hourly AS (SELECT event_type, date_trunc('hour', ts) AS h, COUNT(*) AS c
        |FROM events GROUP BY 1, 2),
        |stats AS (SELECT event_type, AVG(c) AS mu, stddev_pop(c) AS sd
        |FROM hourly GROUP BY 1)
        |SELECT hourly.event_type AS event_type, hourly.h AS h, CAST(c AS BIGINT) AS c,
        |ROUND((c - mu) / sd, 4) AS z
        |FROM hourly JOIN stats ON hourly.event_type = stats.event_type
        |WHERE (c - mu) / sd > $AnomalyZ
        |ORDER BY 1, 2""".stripMargin.replaceAll("\n", " "),
  )
}

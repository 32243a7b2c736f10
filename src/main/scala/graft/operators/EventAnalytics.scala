package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Sequential event analytics over the events stream — the funnel and
  * cohort-retention queries every product-analytics deployment runs
  * (SURVEY §2.G relational surface, G8/G14 composition).
  *
  * Both are expressed as per-user aggregates joined back against the
  * event scan. The per-user frames are deliberately NOT broadcast-hinted:
  * user cardinality is unbounded (10⁸–10⁹ users at corpus scale puts a
  * (key, timestamp) frame past Spark's 8 GB broadcast limit and any
  * driver heap), and an explicit hint would override the size-based
  * planner that exists to prevent exactly that. Un-hinted, AQE picks a
  * broadcast join when the frame is genuinely small and a shuffled
  * hash/sort-merge join when it isn't — and because every stage (tv, tc,
  * tp, cohort) hash-partitions on user_id, the consecutive joins and
  * aggregates reuse one Exchange instead of re-shuffling the event scan.
  */
object EventAnalytics {

  /** Ordered conversion funnel view → click → purchase, each step within
    * `windowHours` of the user's FIRST view and strictly after the
    * previous step (the standard strict-order funnel semantics). One row
    * per step with the surviving user count. */
  def funnel(spark: SparkSession, dir: String, windowHours: Int = 24): DataFrame = {
    val ev = Tables.events(spark, dir)
    val horizon = expr(s"INTERVAL $windowHours HOURS")
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
    def step(n: Int, name: String, d: DataFrame): DataFrame =
      d.agg(count(lit(1)).as("users"))
        .select(lit(n).as("step"), lit(name).as("name"), col("users"))
    step(1, "view", tv)
      .unionByName(step(2, "click", tc))
      .unionByName(step(3, "purchase", tp))
      .orderBy("step")
  }

  /** Day-k cohort retention: users grouped by their first-activity day;
    * for each cohort and offset k ∈ [0, maxDays], how many of its users
    * were active on day₀+k. */
  def retention(spark: SparkSession, dir: String, maxDays: Int = 7): DataFrame = {
    val ev = Tables.events(spark, dir)
    val active = ev.select(col("user_id"), to_date(col("ts")).as("day")).distinct()
    val cohort = active.groupBy("user_id").agg(min("day").as("d0"))
    active.join(cohort, Seq("user_id"))
      .withColumn("k", datediff(col("day"), col("d0")))
      .filter(col("k") >= 0 && col("k") <= maxDays)
      .groupBy(col("d0"), col("k"))
      .agg(countDistinct("user_id").as("users"))
      .orderBy("d0", "k")
  }

  /** Pure interval join without an equi key — "clicks within the hour
    * after each error" — rewritten as a BINNED equi join: the probe side
    * keys on its hour bucket, the interval side explodes into the (≤2)
    * hour buckets its window overlaps, the join runs on the bucket, and
    * the exact interval predicate filters residually. A naive
    * formulation is a BroadcastNestedLoopJoin — O(N·M) comparisons; the
    * binned form shuffles each side once on a uniform time key and
    * compares only within-bucket pairs (the manual form of the
    * bin-based range-join optimization; NewOpsPlanSpec asserts the
    * no-NLJ plan). Each probe row lives in exactly ONE bucket, so no
    * pair can match twice — no post-join dedup needed. */
  def intervalJoin(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    val hourBin = (c: Column) => floor(unix_timestamp(c) / lit(3600L))
    val errors = ev.filter(col("event_type") === "error")
      .select(col("event_id"), col("ts").as("ets"),
        explode(sequence(hourBin(col("ts")), hourBin(col("ts")) + 1)).as("bin"))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("ts").as("cts"), hourBin(col("ts")).as("bin"))
    errors.join(clicks, Seq("bin"))
      .filter(col("cts") > col("ets") &&
        col("cts") <= col("ets") + expr("INTERVAL 1 HOURS"))
      .groupBy("event_id")
      .agg(count(lit(1)).as("clicks"))
      .orderBy("event_id")
  }

  /** Gap-based sessionization: per user, a new session starts after
    * `gapMinutes` of silence; one row per session with count/bounds/
    * duration/value totals. The classic lag → break-flag → running-sum
    * pattern: ONE shuffle on user_id, then both windows and the final
    * aggregate run inside the same partitioning (no second Exchange —
    * asserted in NewOpsPlanSpec).
    *
    * Scale note: the window partitions by user, so state is bounded by
    * the busiest user's history, not the stream. A pathological bot user
    * is the skew case — at 100 TB that user belongs in the STREAMING
    * form (EventStreams' session_window keeps only the open session in
    * state and evicts on watermark), which is why both forms exist. */
  def sessionize(spark: SparkSession, dir: String, gapMinutes: Int = 30): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val gapped = Tables.events(spark, dir)
      .select(col("user_id"), col("ts"), col("event_id"), col("value"))
      .withColumn("prev", lag("ts", 1).over(w))
      // µs arithmetic on both engines (unix_micros / epoch_us): Spark's
      // unix_timestamp truncates to seconds and would split a 1800.4 s
      // gap differently than the oracle
      .withColumn("brk",
        when(col("prev").isNull ||
          unix_micros(col("ts")) - unix_micros(col("prev")) > gapMinutes * 60L * 1000000L, 1L)
          .otherwise(0L))
      .withColumn("session_idx",
        sum("brk").over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    gapped.groupBy("user_id", "session_idx")
      .agg(count(lit(1)).as("n_events"),
        min("ts").as("start_ts"), max("ts").as("end_ts"),
        round(sum("value"), 2).as("total_value"))
      .withColumn("duration_s",
        ((unix_micros(col("end_ts")) - unix_micros(col("start_ts"))) / lit(1000000L))
          .cast("long"))
      .select("user_id", "session_idx", "n_events", "start_ts", "end_ts",
        "duration_s", "total_value")
      .orderBy("user_id", "session_idx")
  }

  /** Event-flow transitions (the "user paths" product-analytics view):
    * per user, order events by time and count each (event_type →
    * next_event_type) step, with '∅' closing every user's sequence.
    * One lead() window over the SAME user_id partitioning sessionize
    * uses (one shuffle), then a hash agg on a key whose cardinality is
    * event-type² — the output is planner-table-sized no matter how many
    * events feed it, which is what makes the flow view cheap to keep
    * fresh at 100 TB. */
  def pathTransitions(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    Tables.events(spark, dir)
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .withColumn("next", coalesce(lead("event_type", 1).over(w), lit("∅")))
      .groupBy(col("event_type").as("step"), col("next"))
      .agg(count(lit(1)).as("c"))
      .orderBy("step", "next")
  }

  /** Attribution lookback window. */
  val AttributionHorizonUs: Long = 24L * 3600 * 1000000

  /** Last-touch attribution — the classic marketing-analytics question:
    * each purchase credits the user's most recent NON-purchase event
    * (its "channel") within a 24 h lookback. One running ignore-nulls
    * last() over the user timeline (two projections of the same window
    * frame pick the same row — their CASE nulls coincide), then a
    * channel-sized aggregate: the q29 single-user-exchange shape, no
    * self-join of the log against itself. Value sums follow the
    * ly_incr_matview rounding discipline (round per event, round the
    * sum) so engine summation order can't flip the hash. */
  def attribution(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val notPurchase = col("event_type") =!= "purchase"
    Tables.events(spark, dir)
      .select(col("event_id"), col("user_id"), col("ts"), col("event_type"),
        round(col("value"), 2).as("value"))
      .withColumn("ch", last(when(notPurchase, col("event_type")), ignoreNulls = true).over(w))
      .withColumn("cts", last(when(notPurchase, col("ts")), ignoreNulls = true).over(w))
      .filter(col("event_type") === "purchase" && col("ch").isNotNull &&
        unix_micros(col("ts")) - unix_micros(col("cts")) <= AttributionHorizonUs)
      .groupBy(col("ch").as("channel"))
      .agg(count(lit(1)).as("purchases"),
        round(sum("value"), 2).as("attributed_value"))
      .orderBy("channel")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q34_attribution" -> attribution _,
    "q30_paths" -> pathTransitions _,
    "q26_funnel" -> ((s: SparkSession, d: String) => funnel(s, d)),
    "q27_retention" -> ((s: SparkSession, d: String) => retention(s, d)),
    "q28_interval_join" -> intervalJoin _,
    "q29_sessionize" -> ((s: SparkSession, d: String) => sessionize(s, d)),
  )

  val oracleSql: Map[String, String] = Map(
    "q34_attribution" ->
      s"""WITH e AS (SELECT event_id, user_id, ts, event_type, ROUND(value, 2) AS value FROM events),
        |lt AS (SELECT *,
        |last_value(CASE WHEN event_type <> 'purchase' THEN event_type END IGNORE NULLS)
        |OVER w AS ch,
        |last_value(CASE WHEN event_type <> 'purchase' THEN ts END IGNORE NULLS)
        |OVER w AS cts
        |FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
        |ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING))
        |SELECT ch AS channel, CAST(COUNT(*) AS BIGINT) AS purchases,
        |ROUND(SUM(value), 2) AS attributed_value
        |FROM lt WHERE event_type = 'purchase' AND ch IS NOT NULL
        |AND epoch_us(ts) - epoch_us(cts) <= $AttributionHorizonUs
        |GROUP BY 1 ORDER BY 1""".stripMargin.replaceAll("\n", " "),
    "q30_paths" ->
      """WITH t AS (SELECT event_type AS step,
        |COALESCE(lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id), '∅') AS next
        |FROM events)
        |SELECT step, next, CAST(COUNT(*) AS BIGINT) AS c
        |FROM t GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin.replaceAll("\n", " "),
    "q26_funnel" ->
      """WITH tv AS (SELECT user_id, MIN(ts) AS tv FROM events
        |WHERE event_type = 'view' GROUP BY 1),
        |tc AS (SELECT e.user_id, MIN(e.ts) AS tc, MIN(tv.tv) AS tv
        |FROM events e JOIN tv ON e.user_id = tv.user_id
        |WHERE e.event_type = 'click' AND e.ts > tv.tv
        |AND e.ts <= tv.tv + INTERVAL 24 HOUR GROUP BY 1),
        |tp AS (SELECT e.user_id, MIN(e.ts) AS tp
        |FROM events e JOIN tc ON e.user_id = tc.user_id
        |WHERE e.event_type = 'purchase' AND e.ts > tc.tc
        |AND e.ts <= tc.tv + INTERVAL 24 HOUR GROUP BY 1)
        |SELECT 1 AS step, 'view' AS name, COUNT(*) AS users FROM tv
        |UNION ALL SELECT 2, 'click', COUNT(*) FROM tc
        |UNION ALL SELECT 3, 'purchase', COUNT(*) FROM tp
        |ORDER BY step""".stripMargin.replaceAll("\n", " "),
    "q27_retention" ->
      """WITH active AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events),
        |cohort AS (SELECT user_id, MIN(day) AS d0 FROM active GROUP BY 1)
        |SELECT c.d0, CAST(date_diff('day', c.d0, a.day) AS INTEGER) AS k,
        |COUNT(DISTINCT a.user_id) AS users
        |FROM active a JOIN cohort c ON a.user_id = c.user_id
        |WHERE date_diff('day', c.d0, a.day) BETWEEN 0 AND 7
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin.replaceAll("\n", " "),
    "q29_sessionize" ->
      """WITH g AS (SELECT user_id, ts, event_id, value,
        |CASE WHEN lag(ts) OVER w IS NULL
        |OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000 THEN 1 ELSE 0 END AS brk
        |FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |s AS (SELECT *, SUM(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |ROWS UNBOUNDED PRECEDING) AS session_idx FROM g)
        |SELECT user_id, CAST(session_idx AS BIGINT) AS session_idx,
        |CAST(COUNT(*) AS BIGINT) AS n_events,
        |MIN(ts) AS start_ts, MAX(ts) AS end_ts,
        |CAST((epoch_us(MAX(ts)) - epoch_us(MIN(ts))) // 1000000 AS BIGINT) AS duration_s,
        |ROUND(SUM(value), 2) AS total_value
        |FROM s GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin.replaceAll("\n", " "),
    "q28_interval_join" ->
      """SELECT e.event_id, COUNT(*) AS clicks
        |FROM events e JOIN events c
        |ON c.ts > e.ts AND c.ts <= e.ts + INTERVAL 1 HOUR
        |WHERE e.event_type = 'error' AND c.event_type = 'click'
        |GROUP BY 1 ORDER BY 1""".stripMargin.replaceAll("\n", " "),
  )
}

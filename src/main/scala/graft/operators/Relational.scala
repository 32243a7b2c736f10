package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** General relational operator surface (SURVEY.md §2.G, G1–G20).
  *
  * Every query is declared with the DataFrame/Column API so Catalyst owns the
  * physical strategy: filters/projections reach the parquet scan (pushdown +
  * pruning), small dimension tables are broadcast, aggregations run
  * partial+final, and AQE can re-plan shuffles at runtime. Determinism rule
  * for the DuckDB hash-compare: every query ends in a total ORDER BY over its
  * output and float aggregates are ROUNDed, so summation-order differences
  * between engines cannot flip the hash.
  *
  * Scale notes (100 TB): the fact tables (lineitem/orders/events) are only
  * ever shuffled on their join/group keys; dimension tables (region, nation,
  * customer at TPC-H ratios, part) stay broadcast-joined — no shuffle of the
  * fact side for dim joins. Nothing below collects to the driver.
  */
object Relational {

  /** G1 — projection / filter / predicates. Filter + projection push into the
    * parquet scan (PushedFilters in explain). */
  def q1FilterProject(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") >= lit("1995-01-01").cast("timestamp") &&
        col("l_returnflag") === "R")
      .select(col("l_orderkey"), col("l_linenumber"),
        // product has ≤4 fractional digits; DECIMAL(18,4) makes it exact so
        // HALF_UP rounding agrees bit-for-bit with the DuckDB oracle
        round((col("l_extendedprice") * (lit(1) - col("l_discount")))
          .cast("decimal(18,4)"), 2).cast("double").as("net"))
      .orderBy("l_orderkey", "l_linenumber")

  /** G2 — hash aggregation with grouping (partial+final HashAggregate). */
  def q2Agg(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        count(lit(1)).as("cnt"),
        round(sum("l_quantity"), 2).as("sq"),
        round(avg("l_extendedprice"), 2).as("ap"))
      .orderBy("l_returnflag", "l_linestatus")

  /** G3 — equi inner joins; nation (25 rows) and customer are broadcast by
    * Catalyst's size estimate; `broadcast()` hints pin the dim sides so the
    * plan survives missing stats at scale. */
  def q3Join(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .join(Tables.customer(spark, dir), col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables.nation(spark, dir)),
        col("c_nationkey") === col("n_nationkey"))
      .groupBy("n_name")
      .agg(count(lit(1)).as("c"), round(sum("o_totalprice"), 2).as("s"))
      .orderBy("n_name")

  /** G4 — left outer join; COUNT(col) counts only matched (non-null) rows. */
  def q4OuterJoin(spark: SparkSession, dir: String): DataFrame =
    Tables.customer(spark, dir)
      .join(Tables.orders(spark, dir), col("c_custkey") === col("o_custkey"), "left")
      .groupBy("c_custkey")
      .agg(count(col("o_orderkey")).as("c"))
      .orderBy("c_custkey")

  /** G5 — anti join (NOT IN with non-null keys ≡ left_anti). */
  def q5AntiJoin(spark: SparkSession, dir: String): DataFrame =
    Tables.customer(spark, dir)
      .join(Tables.orders(spark, dir), col("c_custkey") === col("o_custkey"), "left_anti")
      .select("c_custkey")
      .orderBy("c_custkey")

  /** G6 — equi join with a non-equi residual predicate (l_quantity > p_size):
    * Catalyst keeps the hash join on the equi key and applies the residual as
    * a post-join filter — no nested-loop blowup. */
  def q6RangeJoin(spark: SparkSession, dir: String): DataFrame =
    Tables.part(spark, dir)
      .join(Tables.lineitem(spark, dir),
        col("l_partkey") === col("p_partkey") && col("l_quantity") > col("p_size"))
      .groupBy("p_partkey")
      .agg(count(lit(1)).as("c"))
      .orderBy("p_partkey")

  /** G7 — as-of join ("latest prior event id per event"). The oracle's
    * quadratic self-join form is re-expressed as a single window pass:
    * MAX(event_id) over (PARTITION BY user ORDER BY µs(ts) RANGE UNBOUNDED
    * PRECEDING .. -1) gives the max id among *strictly earlier* events —
    * O(n log n) with one shuffle on user_id instead of an O(n²) join.
    * Inner-join semantics: rows with no prior event are dropped. */
  def q7AsOfJoin(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(spark, dir)
      .select(col("event_id"), col("user_id"), unix_micros(col("ts")).as("ts_us"))
    val w = Window.partitionBy("user_id").orderBy("ts_us")
      .rangeBetween(Window.unboundedPreceding, -1)
    e.withColumn("prev", max("event_id").over(w))
      .filter(col("prev").isNotNull)
      .select("event_id", "prev")
      .orderBy("event_id")
  }

  /** G8 — ranking + analytic window functions with an explicit frame. */
  def q8Window(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    val wRun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.orders(spark, dir)
      .select(col("o_custkey"), col("o_orderkey"),
        row_number().over(w).as("rn"),
        round(sum("o_totalprice").over(wRun), 2).as("run"))
      .orderBy("o_custkey", "o_orderkey")
  }

  /** G9 — top-k per group via window rank; at scale this is the
    * shuffle-once pattern (no global sort of the full table). */
  def q9TopKPerGroup(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("c_nationkey").orderBy(col("c_acctbal").desc, col("c_custkey"))
    Tables.customer(spark, dir)
      .select(col("c_nationkey"), col("c_custkey"), col("c_acctbal"),
        row_number().over(w).as("rn"))
      .filter(col("rn") <= 3)
      .orderBy("c_nationkey", "rn")
  }

  /** G10 — exact distinct aggregation (COUNT DISTINCT expands to a two-phase
    * aggregate). The approximate path (`approx_count_distinct`, HLL) is the
    * 100 TB variant — exercised in tests, not hash-matchable vs an oracle. */
  def q10Distinct(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .groupBy("o_orderstatus")
      .agg(countDistinct(col("o_custkey")).as("u"))
      .orderBy("o_orderstatus")

  /** G11 — ROLLUP grouping sets with GROUPING() indicators. */
  def q11Rollup(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .rollup("l_returnflag", "l_linestatus")
      .agg(count(lit(1)).as("c"),
        grouping(col("l_returnflag")).cast("int").as("g1"),
        grouping(col("l_linestatus")).cast("int").as("g2"))
      .select("l_returnflag", "l_linestatus", "g1", "g2", "c")
      .orderBy(col("g1"), col("g2"),
        col("l_returnflag").asc_nulls_first, col("l_linestatus").asc_nulls_first)

  /** G12 — set operation (INTERSECT = distinct semi-join under Catalyst). */
  def q12SetOps(spark: SparkSession, dir: String): DataFrame =
    Tables.customer(spark, dir).select(col("c_nationkey").as("k"))
      .intersect(Tables.supplier(spark, dir).select(col("s_nationkey").as("k")))
      .orderBy("k")

  /** G13 — string scalar functions (all codegen'd, no UDFs). */
  def q13String(spark: SparkSession, dir: String): DataFrame =
    Tables.part(spark, dir)
      .filter(col("p_name").like("%a%"))
      .select(col("p_partkey"),
        upper(substring(col("p_name"), 1, 5)).as("u"),
        length(col("p_type")).cast("long").as("lt"))
      .orderBy("p_partkey")

  /** G14 — date/time scalar functions. */
  def q14Date(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .groupBy(year(col("o_orderdate")).cast("long").as("y"),
        month(col("o_orderdate")).cast("long").as("m"))
      .agg(count(lit(1)).as("c"))
      .orderBy("y", "m")

  /** G15 — math scalar functions (log10/pow mirror the reference's own
    * serve-time ops, main.py:36-37). */
  def q15Math(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .filter(col("l_orderkey") <= 100)
      .select(col("l_orderkey"), col("l_linenumber"),
        round(log10(col("l_extendedprice")), 6).as("lg"),
        round(sqrt(col("l_quantity")), 6).as("sq"))
      .orderBy("l_orderkey", "l_linenumber")

  /** G16 — higher-order array functions over the embedding column: squared
    * L2 norm via transform+aggregate (pure Column exprs — whole-stage
    * codegen, no UDF). */
  def q16Array(spark: SparkSession, dir: String): DataFrame =
    Tables.embeddings(spark, dir)
      .select(col("vec_id"),
        round(
          aggregate(transform(col("embedding"), x => x.cast("double") * x.cast("double")),
            lit(0.0), (acc, x) => acc + x),
          4).as("sqnorm"))
      .orderBy("vec_id")

  /** G17 — map functions: build a map column and extract by key (the
    * reference analog is the composition map, SURVEY §2.A A4). */
  def q17Map(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .filter(col("l_orderkey") <= 50)
      .select(col("l_orderkey"), col("l_linenumber"),
        element_at(map(col("l_returnflag"), col("l_quantity")), col("l_returnflag")).as("v"))
      .orderBy("l_orderkey", "l_linenumber")

  /** G18 — JSON path extraction from the events.props JSON string. */
  def q18Json(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .select(col("event_id"), get_json_object(col("props"), "$.k").as("k"))
      .orderBy("event_id")

  /** G19 — tumbling-window aggregation, batch form; the streaming variant
    * (withWatermark + same window spec) must produce identical final state —
    * equivalence asserted in StreamingSpec. */
  def q19WindowAgg(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(window(col("ts"), "1 hour").getField("start").as("ws"), col("event_type"))
      .agg(count(lit(1)).as("c"), round(sum("value"), 2).as("s"))
      .orderBy("ws", "event_type")

  /** G20 — exact dedup with a deterministic documented tiebreak (first order
    * per customer by orderdate then orderkey): window rn=1, the same
    * semantics the reference's training-set construction needs (§2.F). */
  def q20Dedup(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    Tables.orders(spark, dir)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select("o_custkey", "o_orderkey", "o_totalprice")
      .orderBy("o_custkey")
  }

  /** G5 variant with a non-empty result (every customer has orders at
    * sf0.01, so q5 is vacuous there): orders with no line items (257 rows
    * at sf0.01). */
  def q5bUnorderedParts(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .join(Tables.lineitem(spark, dir), col("o_orderkey") === col("l_orderkey"), "left_anti")
      .select("o_orderkey")
      .orderBy("o_orderkey")

  /** Correlated scalar subquery (Catalyst decorrelates to an aggregate +
    * join): customers' orders that exceed 1.5× their own average. The
    * DataFrame form IS the decorrelated plan — a window average — proving
    * the equivalence the optimizer performs. */
  def q21Subquery(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("o_custkey")
    Tables.orders(spark, dir)
      .withColumn("avg_price", avg("o_totalprice").over(w))
      .filter(col("o_totalprice") > col("avg_price") * 1.5)
      .select(col("o_orderkey"), round(col("o_totalprice"), 2).as("p"))
      .orderBy("o_orderkey")
  }

  /** Pivot (wide aggregation): quantity sums per returnflag × linestatus. */
  def q22Pivot(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .groupBy("l_returnflag")
      .pivot("l_linestatus", Seq("F", "O"))
      .agg(round(sum("l_quantity"), 2))
      .withColumnsRenamed(Map("F" -> "f_qty", "O" -> "o_qty"))
      .orderBy("l_returnflag")

  /** All relational queries keyed by their SparkEntry name. */
  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q1_filter_project" -> q1FilterProject _,
    "q2_agg" -> q2Agg _,
    "q3_join" -> q3Join _,
    "q4_outer_join" -> q4OuterJoin _,
    "q5_anti_join" -> q5AntiJoin _,
    "q6_range_join" -> q6RangeJoin _,
    "q7_asof_join" -> q7AsOfJoin _,
    "q8_window" -> q8Window _,
    "q9_topk_group" -> q9TopKPerGroup _,
    "q10_distinct" -> q10Distinct _,
    "q11_rollup" -> q11Rollup _,
    "q12_setops" -> q12SetOps _,
    "q13_string" -> q13String _,
    "q14_date" -> q14Date _,
    "q15_math" -> q15Math _,
    "q16_array" -> q16Array _,
    "q17_map" -> q17Map _,
    "q18_json" -> q18Json _,
    "q19_window_agg" -> q19WindowAgg _,
    "q20_dedup" -> q20Dedup _,
    "q5b_unordered_parts" -> q5bUnorderedParts _,
    "q21_subquery" -> q21Subquery _,
    "q22_pivot" -> q22Pivot _,
  )

  /** DuckDB oracle SQL per query (driver runs these on the same parquet). */
  val oracleSql: Map[String, String] = Map(
    "q1_filter_project" ->
      """SELECT l_orderkey, l_linenumber,
        |CAST(ROUND(CAST(l_extendedprice*(1-l_discount) AS DECIMAL(18,4)),2) AS DOUBLE) AS net
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1995-01-01' AND l_returnflag = 'R'
        |ORDER BY l_orderkey, l_linenumber""".stripMargin.replaceAll("\n", " "),
    "q2_agg" ->
      """SELECT l_returnflag, l_linestatus, COUNT(*) AS cnt,
        |ROUND(SUM(l_quantity),2) AS sq, ROUND(AVG(l_extendedprice),2) AS ap
        |FROM lineitem GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin.replaceAll("\n", " "),
    "q3_join" ->
      """SELECT n_name, COUNT(*) AS c, ROUND(SUM(o_totalprice),2) AS s
        |FROM orders JOIN customer ON o_custkey=c_custkey
        |JOIN nation ON c_nationkey=n_nationkey
        |GROUP BY n_name ORDER BY n_name""".stripMargin.replaceAll("\n", " "),
    "q4_outer_join" ->
      """SELECT c_custkey, COUNT(o_orderkey) AS c
        |FROM customer LEFT JOIN orders ON c_custkey=o_custkey
        |GROUP BY c_custkey ORDER BY c_custkey""".stripMargin.replaceAll("\n", " "),
    "q5_anti_join" ->
      """SELECT c_custkey FROM customer
        |WHERE c_custkey NOT IN (SELECT o_custkey FROM orders)
        |ORDER BY c_custkey""".stripMargin.replaceAll("\n", " "),
    "q6_range_join" ->
      """SELECT p_partkey, COUNT(*) AS c
        |FROM part JOIN lineitem ON l_partkey=p_partkey AND l_quantity > p_size
        |GROUP BY p_partkey ORDER BY p_partkey""".stripMargin.replaceAll("\n", " "),
    "q7_asof_join" ->
      """SELECT e1.event_id, MAX(e2.event_id) AS prev
        |FROM events e1 JOIN events e2
        |ON e2.user_id=e1.user_id AND e2.ts < e1.ts
        |GROUP BY e1.event_id ORDER BY e1.event_id""".stripMargin.replaceAll("\n", " "),
    "q8_window" ->
      """SELECT o_custkey, o_orderkey,
        |CAST(ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS INTEGER) AS rn,
        |ROUND(SUM(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),2) AS run
        |FROM orders ORDER BY o_custkey, o_orderkey""".stripMargin.replaceAll("\n", " "),
    "q9_topk_group" ->
      """SELECT c_nationkey, c_custkey, c_acctbal, rn FROM (
        |SELECT c_nationkey, c_custkey, c_acctbal,
        |CAST(ROW_NUMBER() OVER (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey) AS INTEGER) AS rn
        |FROM customer) t WHERE rn <= 3 ORDER BY c_nationkey, rn""".stripMargin.replaceAll("\n", " "),
    "q10_distinct" ->
      """SELECT o_orderstatus, COUNT(DISTINCT o_custkey) AS u
        |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin.replaceAll("\n", " "),
    "q11_rollup" ->
      """SELECT l_returnflag, l_linestatus,
        |CAST(GROUPING(l_returnflag) AS INTEGER) AS g1,
        |CAST(GROUPING(l_linestatus) AS INTEGER) AS g2, COUNT(*) AS c
        |FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
        |ORDER BY g1, g2, l_returnflag NULLS FIRST, l_linestatus NULLS FIRST"""
        .stripMargin.replaceAll("\n", " "),
    "q12_setops" ->
      """SELECT c_nationkey AS k FROM customer
        |INTERSECT SELECT s_nationkey FROM supplier ORDER BY k""".stripMargin.replaceAll("\n", " "),
    "q13_string" ->
      """SELECT p_partkey, UPPER(SUBSTRING(p_name,1,5)) AS u,
        |CAST(LENGTH(p_type) AS BIGINT) AS lt
        |FROM part WHERE p_name LIKE '%a%' ORDER BY p_partkey""".stripMargin.replaceAll("\n", " "),
    "q14_date" ->
      """SELECT CAST(YEAR(o_orderdate) AS BIGINT) AS y,
        |CAST(MONTH(o_orderdate) AS BIGINT) AS m, COUNT(*) AS c
        |FROM orders GROUP BY 1, 2 ORDER BY y, m""".stripMargin.replaceAll("\n", " "),
    "q15_math" ->
      """SELECT l_orderkey, l_linenumber,
        |ROUND(LOG10(l_extendedprice),6) AS lg, ROUND(SQRT(l_quantity),6) AS sq
        |FROM lineitem WHERE l_orderkey <= 100
        |ORDER BY l_orderkey, l_linenumber""".stripMargin.replaceAll("\n", " "),
    "q16_array" ->
      """SELECT vec_id,
        |ROUND(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE)*CAST(x AS DOUBLE))),4) AS sqnorm
        |FROM embeddings ORDER BY vec_id""".stripMargin.replaceAll("\n", " "),
    "q17_map" ->
      """SELECT l_orderkey, l_linenumber, l_quantity AS v
        |FROM lineitem WHERE l_orderkey <= 50
        |ORDER BY l_orderkey, l_linenumber""".stripMargin.replaceAll("\n", " "),
    "q18_json" ->
      """SELECT event_id, json_extract_string(props,'$.k') AS k
        |FROM events ORDER BY event_id""".stripMargin.replaceAll("\n", " "),
    "q19_window_agg" ->
      """SELECT date_trunc('hour', ts) AS ws, event_type, COUNT(*) AS c,
        |ROUND(SUM(value),2) AS s FROM events
        |GROUP BY 1, 2 ORDER BY ws, event_type""".stripMargin.replaceAll("\n", " "),
    "q20_dedup" ->
      """SELECT o_custkey, o_orderkey, o_totalprice FROM (
        |SELECT o_custkey, o_orderkey, o_totalprice,
        |ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS rn
        |FROM orders) t WHERE rn = 1 ORDER BY o_custkey""".stripMargin.replaceAll("\n", " "),
    "q5b_unordered_parts" ->
      """SELECT o_orderkey FROM orders
        |WHERE NOT EXISTS (SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey)
        |ORDER BY o_orderkey""".stripMargin.replaceAll("\n", " "),
    "q21_subquery" ->
      """SELECT o_orderkey, ROUND(o_totalprice, 2) AS p FROM orders o
        |WHERE o_totalprice > (SELECT AVG(o2.o_totalprice) * 1.5 FROM orders o2
        |WHERE o2.o_custkey = o.o_custkey)
        |ORDER BY o_orderkey""".stripMargin.replaceAll("\n", " "),
    "q22_pivot" ->
      """SELECT l_returnflag,
        |ROUND(SUM(CASE WHEN l_linestatus = 'F' THEN l_quantity END), 2) AS f_qty,
        |ROUND(SUM(CASE WHEN l_linestatus = 'O' THEN l_quantity END), 2) AS o_qty
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin.replaceAll("\n", " "),
  )
}

package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Sketch-mergeable distinct counts — the incremental-distinct pattern a
  * 100 TB log needs: exact COUNT(DISTINCT) re-scans history on every
  * refresh, but a per-partition HLL sketch table (here per (event_type,
  * day)) is built once per partition, is ORDER-INSENSITIVE and
  * idempotent under re-merge, and answers "distinct users per type over
  * any day range" by unioning KB-sized sketches — cost ∝ partitions
  * touched, never rows. Uses Spark's built-in DataSketches HLL
  * aggregates (hll_sketch_agg / hll_union_agg, SPARK-16484 family), so
  * the sketch bytes are the cross-language DataSketches wire format a
  * warehouse ecosystem already speaks.
  *
  * Oracle shape (the ml_golden_gate pattern): DuckDB cannot evaluate
  * DataSketches, so Verify EXPORTS the per-type merged estimates as
  * parquet; the registered gate query recomputes the EXACT distinct in
  * both engines and each side derives the same accuracy boolean from
  * the same exported estimate bytes — the estimate itself is
  * deterministic (HLL register state is a per-bucket max, insensitive
  * to row order and partitioning). SketchSpec carries the merge law
  * (per-day union ≡ one-shot sketch) and the published-error bound. */
object Sketches {

  /** lgK = 12 → 4 KB registers, ~0.8% relative standard error. */
  val LgK = 12

  /** Gate tolerance: 6σ at lgK=12 — a failure means broken plumbing,
    * not sketch noise. */
  val GateTol = 0.05

  /** Export path consumed by BOTH engines of the ds_hll_distinct oracle;
    * corpus-derived (a fixed shared path would let a stale export from a
    * different SF be scored silently — the SemDedup ADVICE lesson). */
  def exportPath(dir: String): String = ExportPaths.forCorpus("hll", dir)

  /** The per-partition sketch table: one HLL over user_id per
    * (event_type, day) — what a production pipeline would persist
    * alongside each ingested partition (or in a [[Snapshots]] manifest's
    * batch dir) and never rebuild. */
  def dailySketches(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(hll_sketch_agg(col("user_id"), LgK).as("sk"))

  /** Merge the per-day sketches per type and estimate — the read path a
    * dashboard pays: sketch-table rows ∝ types × days, never events. */
  def mergedEstimates(spark: SparkSession, dir: String): DataFrame =
    dailySketches(spark, dir)
      .groupBy("event_type")
      .agg(hll_sketch_estimate(hll_union_agg(col("sk"))).as("est"))

  /** First-half-of-span day cutoff as a ONE-ROW frame (derived from the
    * tiny daily-sketch table, crossJoin-broadcast to consumers — a
    * global window over raw events would funnel the corpus through one
    * task). Both engines of the range gate recompute it with the same
    * integer arithmetic. */
  private def cutoffFrame(spark: SparkSession, dir: String): DataFrame =
    dailySketches(spark, dir).agg(
      date_add(min(col("day")),
        (datediff(max(col("day")), min(col("day"))) / 2).cast("int")).as("cut"))

  /** Day-RANGE estimates: union only the first half of the span's daily
    * sketches — the read path behind "distinct over any day range by
    * merging that range's sketches"; cost ∝ sketch rows in range. */
  def rangeEstimates(spark: SparkSession, dir: String): DataFrame =
    dailySketches(spark, dir)
      .crossJoin(cutoffFrame(spark, dir))
      .filter(col("day") <= col("cut"))
      .groupBy("event_type")
      .agg(hll_sketch_estimate(hll_union_agg(col("sk"))).as("est"))

  /** Run by Verify ahead of the query dump. */
  @volatile private var exportedDir: String = "/root/testdata/sf0.01"
  def exportEstimates(spark: SparkSession, dir: String): Unit = {
    exportedDir = dir
    mergedEstimates(spark, dir).coalesce(1).write.mode("overwrite").parquet(exportPath(dir))
    rangeEstimates(spark, dir).coalesce(1).write.mode("overwrite")
      .parquet(rangeExportPath(dir))
    kllEstimates(spark, dir).coalesce(1).write.mode("overwrite")
      .parquet(kllExportPath(dir))
    overlapEstimates(spark, dir).coalesce(1).write.mode("overwrite")
      .parquet(thetaExportPath(dir))
    sourceOverlapEstimates(spark, dir).coalesce(1).write.mode("overwrite")
      .parquet(thetaSourceExportPath(dir))
  }

  // ---- Theta sketches (the set-operation member of the sketch surface;
  // engine-native TypedImperativeAggregates — see functions.ThetaBuildAgg).
  // HLL answers |A|; theta additionally answers |A ∩ B| / |A ∪ B| from
  // the sketches alone — the cross-segment overlap question (shared
  // audience between event types here; cross-source content overlap and
  // eval-contamination mass are the same shape) that exact SQL must
  // re-scan the log per PAIR to answer. ----

  import graft.functions.ThetaBuildAgg.{thetaAgg, thetaUnionAgg, thetaIntersectEstimate, thetaUnionEstimate}

  def thetaExportPath(dir: String): String = ExportPaths.forCorpus("theta", dir)

  /** Per-(event_type, day) theta sketch over user_id — the persisted
    * partition-sketch artifact, same shape as [[dailySketches]]. */
  def thetaDailySketches(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(thetaAgg(col("user_id")).as("sk"))

  /** Pairwise audience overlap: union each type's daily sketches, then
    * intersect/union every type PAIR from the per-type sketches alone.
    * Cost ∝ types² × sketch bytes — never events; the exact form below
    * (the gate) pays a distinct + self-join over the log per refresh. */
  def overlapEstimates(spark: SparkSession, dir: String): DataFrame = {
    val perType = thetaDailySketches(spark, dir)
      .groupBy("event_type")
      .agg(thetaUnionAgg(col("sk")).as("sk"))
    perType.select(col("event_type").as("t1"), col("sk").as("sk1"))
      .join(perType.select(col("event_type").as("t2"), col("sk").as("sk2")),
        col("t1") < col("t2"))
      .select(col("t1"), col("t2"),
        thetaIntersectEstimate(col("sk1"), col("sk2")).as("est_inter"),
        thetaUnionEstimate(col("sk1"), col("sk2")).as("est_union"))
  }

  // ---- Theta CONTENT overlap across sources: the dedup-planning matrix
  // ("how much of source A already sits in source B") answered from
  // per-source shingle sketches alone — exact SQL pays a shingle
  // self-join per refresh; the sketch table is sources × 4 KB and any
  // pair's overlap reads two sketches. ----

  def thetaSourceExportPath(dir: String): String = ExportPaths.forCorpus("theta_src", dir)

  /** Distinct (source, shingle) frame — [[Dedup.shingles]] joined back to
    * its source labels (uniform doc_id keys). */
  private def sourceShingles(spark: SparkSession, dir: String): DataFrame =
    Dedup.shingles(spark, dir)
      .join(Tables.documents(spark, dir).select("doc_id", "source"), Seq("doc_id"))
      .select(col("source"), col("s")).distinct()

  /** Per-source theta sketch over 60-bit shingle keys (md5-derived so the
    * exact-side set in BOTH engines is the same md5 family; the hex→long
    * truncation only feeds the sketch) + pairwise intersections. */
  def sourceOverlapEstimates(spark: SparkSession, dir: String): DataFrame = {
    val items = sourceShingles(spark, dir)
      .select(col("source"),
        conv(substring(md5(col("s")), 1, 15), 16, 10).cast("long").as("item"))
    val perSrc = items.groupBy("source").agg(thetaAgg(col("item")).as("sk"))
    perSrc.select(col("source").as("s1"), col("sk").as("sk1"))
      .join(perSrc.select(col("source").as("s2"), col("sk").as("sk2")),
        col("s1") < col("s2"))
      .select(col("s1"), col("s2"),
        thetaIntersectEstimate(col("sk1"), col("sk2")).as("est_inter"))
  }

  /** Registered gate: exact pairwise shared-shingle counts (one distinct
    * frame, self-joined on the md5 key — recomputed independently by
    * both engines) + accuracy booleans against the exported estimates.
    * Pairs sharing nothing carry no gate row (inner join, both sides). */
  def thetaSourceGate(spark: SparkSession, dir: String): DataFrame = {
    val est = spark.read.parquet(thetaSourceExportPath(dir))
    val sh = sourceShingles(spark, dir).select(col("source"), md5(col("s")).as("h"))
    sh.select(col("source").as("s1"), col("h"))
      .join(sh.select(col("source").as("s2"), col("h")), Seq("h"))
      .filter(col("s1") < col("s2"))
      .groupBy("s1", "s2").agg(count(lit(1)).as("exact_shared"))
      .join(broadcast(est), Seq("s1", "s2"))
      .select(col("s1"), col("s2"), col("exact_shared"),
        (abs(col("est_inter") - col("exact_shared"))
          / greatest(col("exact_shared"), lit(1L)) < GateTol).as("inter_ok"))
      .orderBy("s1", "s2")
  }

  /** Registered gate (the HLL export-gate pattern): both engines compute
    * the EXACT pairwise overlap/union from the log — one distinct
    * (type, user) frame, self-joined on user with t1 < t2 — plus
    * accuracy booleans against the exported estimates. At oracle SFs the
    * sketches hold fewer than 2^lgK entries, i.e. run in exact mode, so
    * the booleans are deterministic with the whole GateTol as margin;
    * sampling-mode error is SketchSpec's job. */
  def thetaOverlapGate(spark: SparkSession, dir: String): DataFrame = {
    val est = spark.read.parquet(thetaExportPath(dir))
    val tu = Tables.events(spark, dir)
      .select(col("event_type"), col("user_id")).distinct()
    val inter = tu.select(col("event_type").as("t1"), col("user_id"))
      .join(tu.select(col("event_type").as("t2"), col("user_id")), Seq("user_id"))
      .filter(col("t1") < col("t2"))
      .groupBy("t1", "t2").agg(count(lit(1)).as("exact_inter"))
    val cnt = tu.groupBy("event_type").agg(count(lit(1)).as("cu"))
    inter
      .join(cnt.select(col("event_type").as("t1"), col("cu").as("c1")), Seq("t1"))
      .join(cnt.select(col("event_type").as("t2"), col("cu").as("c2")), Seq("t2"))
      .join(broadcast(est), Seq("t1", "t2"))
      .select(col("t1"), col("t2"), col("exact_inter"),
        (col("c1") + col("c2") - col("exact_inter")).as("exact_union"),
        (abs(col("est_inter") - col("exact_inter")) / greatest(col("exact_inter"), lit(1L))
          < GateTol).as("inter_ok"),
        (abs(col("est_union") - (col("c1") + col("c2") - col("exact_inter")))
          / (col("c1") + col("c2") - col("exact_inter")) < GateTol).as("union_ok"))
      .orderBy("t1", "t2")
  }

  // ---- KLL quantile sketches (the quantile member of the sketch trio;
  // engine-native TypedImperativeAggregate — see functions.KllBuildAgg) ----

  import graft.functions.KllBuildAgg.{kllAgg, kllUnionAgg, kllQuantile}

  /** Rank tolerance for the KLL gate: k=200 gives ~1.65% normalized rank
    * error at 99% confidence — 0.05 is ~3× that; a failure means broken
    * plumbing, not sketch noise. */
  val KllRankTol = 0.05

  def kllExportPath(dir: String): String = ExportPaths.forCorpus("kll", dir)

  /** Per-(event_type, day) KLL sketch over `value` — the persisted
    * partition-sketch artifact, exactly the [[dailySketches]] shape with
    * quantile state instead of distinct-count state. */
  def kllDailySketches(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(kllAgg(col("value")).as("sk"))

  /** Read path: union each type's daily sketches, read off p50/p95 —
    * cost ∝ sketch rows, never events. */
  def kllEstimates(spark: SparkSession, dir: String): DataFrame =
    kllDailySketches(spark, dir)
      .groupBy("event_type")
      .agg(kllUnionAgg(col("sk")).as("sk"))
      .select(col("event_type"),
        kllQuantile(col("sk"), lit(0.5)).as("est_p50"),
        kllQuantile(col("sk"), lit(0.95)).as("est_p95"))

  /** Registered gate (the HLL export-gate pattern): both engines compute
    * the EXACT normalized rank of the exported estimates — the fraction
    * of values ≤ estimate, an integer-count division both engines get
    * bit-identical — and assert it sits within KllRankTol of the asked
    * quantile. */
  def kllGate(spark: SparkSession, dir: String): DataFrame = {
    val est = spark.read.parquet(kllExportPath(dir))
    Tables.events(spark, dir)
      .select(col("event_type"), col("value"))
      .join(broadcast(est), Seq("event_type"))
      .groupBy("event_type")
      .agg(
        count(lit(1)).as("n_events"),
        avg(when(col("value") <= col("est_p50"), 1.0).otherwise(0.0)).as("r50"),
        avg(when(col("value") <= col("est_p95"), 1.0).otherwise(0.0)).as("r95"))
      .select(col("event_type"), col("n_events"),
        (abs(col("r50") - 0.5) < KllRankTol).as("p50_ok"),
        (abs(col("r95") - 0.95) < KllRankTol).as("p95_ok"))
      .orderBy("event_type")
  }

  def rangeExportPath(dir: String): String = ExportPaths.forCorpus("hll_range", dir)

  /** Range gate: exact distinct over the SAME first-half day filter
    * (both engines recompute cutoff + exact) + the exported range
    * estimate's accuracy boolean. */
  def sketchRangeGate(spark: SparkSession, dir: String): DataFrame = {
    val est = spark.read.parquet(rangeExportPath(dir))
    Tables.events(spark, dir)
      .select(col("user_id"), col("event_type"), to_date(col("ts")).as("day"))
      .crossJoin(cutoffFrame(spark, dir))
      .filter(col("day") <= col("cut"))
      .groupBy("event_type")
      .agg(countDistinct("user_id").as("exact_users"))
      .join(est, Seq("event_type"))
      .select(col("event_type"), col("exact_users"),
        (abs(col("est").cast("double") - col("exact_users")) / col("exact_users")
          < GateTol).as("est_ok"))
      .orderBy("event_type")
  }

  /** Registered gate: exact per-type distinct users (recomputed
    * independently by both engines) + the exported merged-sketch
    * estimate's accuracy boolean from the same bytes. */
  def sketchDistinctGate(spark: SparkSession, dir: String): DataFrame = {
    val est = spark.read.parquet(exportPath(dir))
    Tables.events(spark, dir)
      .groupBy("event_type")
      .agg(countDistinct("user_id").as("exact_users"))
      .join(est, Seq("event_type"))
      .select(col("event_type"), col("exact_users"),
        (abs(col("est").cast("double") - col("exact_users")) / col("exact_users")
          < GateTol).as("est_ok"))
      .orderBy("event_type")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ds_hll_distinct" -> sketchDistinctGate _,
    "ds_hll_range" -> sketchRangeGate _,
    "ds_kll_quantiles" -> kllGate _,
    "ds_theta_overlap" -> thetaOverlapGate _,
    "ds_theta_sources" -> thetaSourceGate _,
  )

  def oracleSql: Map[String, String] = Map(
    "ds_theta_sources" ->
      s"""WITH est AS (SELECT s1, s2, est_inter FROM '${thetaSourceExportPath(exportedDir)}/*.parquet'),
        |d AS (SELECT doc_id, source, string_split(text, ' ') AS t FROM documents),
        |sh AS (SELECT DISTINCT source, md5(t[i] || ' ' || t[i+1] || ' ' || t[i+2]) AS h
        |FROM d, LATERAL (SELECT unnest(generate_series(1, len(t) - 2)) AS i)),
        |i AS (SELECT a.source AS s1, b.source AS s2, COUNT(*) AS exact_shared
        |FROM sh a JOIN sh b ON a.h = b.h AND a.source < b.source GROUP BY 1, 2)
        |SELECT i.s1, i.s2, CAST(i.exact_shared AS BIGINT) AS exact_shared,
        |ABS(est.est_inter - i.exact_shared) / GREATEST(i.exact_shared, 1) < $GateTol AS inter_ok
        |FROM i JOIN est ON est.s1 = i.s1 AND est.s2 = i.s2
        |ORDER BY i.s1, i.s2""".stripMargin.replaceAll("\n", " "),
    "ds_theta_overlap" ->
      s"""WITH est AS (SELECT t1, t2, est_inter, est_union FROM '${thetaExportPath(exportedDir)}/*.parquet'),
        |tu AS (SELECT DISTINCT event_type, user_id FROM events),
        |i AS (SELECT a.event_type AS t1, b.event_type AS t2, COUNT(*) AS exact_inter
        |FROM tu a JOIN tu b ON a.user_id = b.user_id AND a.event_type < b.event_type GROUP BY 1, 2),
        |cnt AS (SELECT event_type, COUNT(*) AS cu FROM tu GROUP BY 1)
        |SELECT i.t1, i.t2, CAST(i.exact_inter AS BIGINT) AS exact_inter,
        |CAST(c1.cu + c2.cu - i.exact_inter AS BIGINT) AS exact_union,
        |ABS(est.est_inter - i.exact_inter) / GREATEST(i.exact_inter, 1) < $GateTol AS inter_ok,
        |ABS(est.est_union - (c1.cu + c2.cu - i.exact_inter)) / (c1.cu + c2.cu - i.exact_inter) < $GateTol AS union_ok
        |FROM i JOIN cnt c1 ON i.t1 = c1.event_type JOIN cnt c2 ON i.t2 = c2.event_type
        |JOIN est ON est.t1 = i.t1 AND est.t2 = i.t2
        |ORDER BY i.t1, i.t2""".stripMargin.replaceAll("\n", " "),
    "ds_kll_quantiles" ->
      s"""WITH est AS (SELECT event_type, est_p50, est_p95 FROM '${kllExportPath(exportedDir)}/*.parquet'),
        |j AS (SELECT e.event_type, e.value, est.est_p50, est.est_p95
        |FROM events e JOIN est USING (event_type))
        |SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_events,
        |ABS(AVG(CASE WHEN value <= est_p50 THEN 1.0 ELSE 0.0 END) - 0.5) < $KllRankTol AS p50_ok,
        |ABS(AVG(CASE WHEN value <= est_p95 THEN 1.0 ELSE 0.0 END) - 0.95) < $KllRankTol AS p95_ok
        |FROM j GROUP BY event_type ORDER BY event_type""".stripMargin
        .replaceAll("\n", " "),
    "ds_hll_distinct" ->
      s"""WITH est AS (SELECT event_type, est FROM '${exportPath(exportedDir)}/*.parquet'),
        |ex AS (SELECT event_type, COUNT(DISTINCT user_id) AS exact_users
        |FROM events GROUP BY event_type)
        |SELECT ex.event_type, CAST(ex.exact_users AS BIGINT) AS exact_users,
        |ABS(CAST(est AS DOUBLE) - ex.exact_users) / ex.exact_users < $GateTol AS est_ok
        |FROM ex JOIN est USING (event_type) ORDER BY event_type""".stripMargin
        .replaceAll("\n", " "),
    "ds_hll_range" ->
      s"""WITH est AS (SELECT event_type, est FROM '${rangeExportPath(exportedDir)}/*.parquet'),
        |cut AS (SELECT MIN(CAST(ts AS DATE))
        |+ CAST(FLOOR(DATEDIFF('day', MIN(CAST(ts AS DATE)), MAX(CAST(ts AS DATE))) / 2) AS INT) AS cut
        |FROM events),
        |ex AS (SELECT event_type, COUNT(DISTINCT user_id) AS exact_users
        |FROM events, cut WHERE CAST(ts AS DATE) <= cut GROUP BY event_type)
        |SELECT ex.event_type, CAST(ex.exact_users AS BIGINT) AS exact_users,
        |ABS(CAST(est AS DOUBLE) - ex.exact_users) / ex.exact_users < $GateTol AS est_ok
        |FROM ex JOIN est USING (event_type) ORDER BY event_type""".stripMargin
        .replaceAll("\n", " "),
  )
}

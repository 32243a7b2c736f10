package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Deterministic corpus-subsampling operators for training-data pipelines
  * (north-star extension alongside SURVEY.md §2.G G20-G22): every
  * large-scale dataset build needs to cut a corpus down — a uniform
  * Bernoulli gate for "x% of everything" and a stratified per-group quota
  * for "k docs per language/source/domain".
  *
  * Both are HASH-deterministic, not RNG-driven: the keep decision is a
  * pure function of the row key, so (a) two engines agree row-for-row
  * (DuckDB equality oracle, not a statistical gate), (b) re-runs and
  * retries are idempotent at any parallelism — the property that matters
  * when a 1000-executor job retries a task, and (c) the sample is stable
  * under corpus append (adding rows never flips an existing row's
  * decision — reservoir sampling cannot offer that).
  */
object Sampling {

  /** Uniform Bernoulli gate: keep a row iff md5(key) sorts below a hex
    * threshold prefix. Lowercase-hex comparison == numeric comparison, so
    * a 2-hex-digit prefix "1a" keeps ≈ 0x1a/256 ≈ 10.2% of rows. A
    * narrow filter on a scan — predicate-computable per row, no shuffle,
    * scan-bound at 100 TB. */
  def bernoulliSample(spark: SparkSession, dir: String,
      thresholdHex: String = "1a"): DataFrame =
    Tables.documents(spark, dir)
      .filter(md5(col("doc_id").cast("string")) < thresholdHex)
      .select(col("doc_id"), col("lang"), col("n_chars"))
      .orderBy("doc_id")

  /** Stratified exact-k sample: per stratum (lang), keep the k rows whose
    * key-hash sorts first — a deterministic "random" quota per group.
    * One shuffle (the window partition on lang); with heavily skewed
    * strata at scale, the same result is computable as per-partition
    * top-k + merge (aggregate min-k), but the window form is the
    * clearest statement and AQE handles moderate skew. */
  def stratifiedSample(spark: SparkSession, dir: String, k: Int = 20): DataFrame = {
    val w = Window.partitionBy("lang")
      .orderBy(md5(col("doc_id").cast("string")), col("doc_id"))
    Tables.documents(spark, dir)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .select(col("lang"), col("doc_id"), col("rn"))
      .orderBy("lang", "rn")
  }

  /** Temperature-weighted domain mixture sampling (the multilingual /
    * multi-domain rebalancing rule: target share of domain d ∝ c_d^α,
    * α<1 upweights small domains — Conneau & Lample 2019 §3.1, also the
    * Pile / ROOTS mixture construction). For a token budget of `target`
    * documents, domain d gets expected take n_d = target·c_d^α/Σc^α,
    * i.e. per-row keep probability p_d = n_d/c_d, capped at 1.
    *
    * The keep decision stays HASH-deterministic: p_d is materialized as
    * an 8-hex-digit md5-prefix threshold (⌊p·2³²⌋ as zero-padded hex, so
    * lexicographic compare == numeric compare, same trick as
    * [[bernoulliSample]]). Plan shape at 100 TB: one tiny groupBy for the
    * domain counts (20 rows), a broadcast join of the per-domain
    * thresholds, then a scan-bound filter — no corpus shuffle. */
  def mixtureSample(spark: SparkSession, dir: String,
      target: Double = 200.0, alpha: Double = 0.5): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val w = Window.partitionBy() // 20-row frame: the global window is fine
    val rates = docs.groupBy("source")
      .agg(count(lit(1)).cast("double").as("cnt"))
      .withColumn("p", least(lit(1.0),
        lit(target) * pow(col("cnt"), alpha) / sum(pow(col("cnt"), alpha)).over(w) / col("cnt")))
      .withColumn("thr",
        lpad(lower(hex(floor(col("p") * lit(4294967296.0)).cast("long"))), 8, "0"))
      .select("source", "p", "thr")
    docs.join(broadcast(rates), "source")
      .filter(col("p") >= 1.0 ||
        substring(md5(col("doc_id").cast("string")), 1, 8) < col("thr"))
      .select(col("doc_id"), col("source"))
      .orderBy("doc_id")
  }

  /** Deterministic global training shuffle: every epoch-0 data loader
    * wants the corpus in a "random" order that is (a) reproducible, (b)
    * stable under task retries, and (c) computable without a global
    * sort. Order key = md5(seed:doc_id); shard = first hex nibble (the
    * [[Sharding]] ranges); position = rank of the hash WITHIN the shard.
    * Readers stream shards round-robin for a fully shuffled epoch.
    *
    * Plan shape: ONE shuffle on the shard key, then a per-shard window —
    * state bounded by shard size, no single-partition global sort. At
    * 100 TB the nibble widens (2-3 hex chars → 256-4096 shards) so each
    * shard fits an executor; the operator is otherwise unchanged. */
  def globalShuffle(spark: SparkSession, dir: String, seed: String = "ep0"): DataFrame = {
    val h = md5(concat(lit(seed), lit(":"), col("doc_id").cast("string")))
    val w = Window.partitionBy("shard").orderBy("h", "doc_id")
    Tables.documents(spark, dir)
      .select(col("doc_id"), h.as("h"))
      .withColumn("shard", conv(substring(col("h"), 1, 1), 16, 10).cast("int"))
      .withColumn("pos", row_number().over(w))
      .select("shard", "pos", "doc_id")
      .orderBy("shard", "pos")
  }

  /** Greedy selection under a token budget: keep the highest-quality
    * documents whose cumulative token count fits `budget` — the data-
    * selection step between scoring and training ("spend my 10B-token
    * budget on the best docs").
    *
    * The naive form is a cumulative sum over ONE global score order — a
    * single-partition window (the giant-state shape this repo's plan
    * audits exist to catch). This is the two-level form that scales:
    * quality scores quantize to 3-dp BUCKETS (≤1001 rows), the bucket
    * token totals cumulate on that tiny frame to find the cutoff bucket,
    * whole buckets above the cutoff keep everything, and only INSIDE the
    * cutoff bucket does a per-bucket window (state ∝ one bucket) order
    * docs by hash to spend the residual budget. Fully deterministic:
    * integer token sums, hash tie-break — DuckDB equality oracle. */
  def tokenBudgetSelect(spark: SparkSession, dir: String,
      budget: Long = 10000L): DataFrame = {
    val alpha = length(regexp_replace(col("text"), "[^A-Za-z]", ""))
      .cast("double") / length(col("text"))
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id"),
        size(split(col("text"), " ")).cast("long").as("nt"),
        round(round(alpha, 6), 3).as("bucket"))
    val cum = docs.groupBy("bucket").agg(sum("nt").as("btok"))
      .withColumn("cumtok", sum("btok").over(
        Window.orderBy(col("bucket").desc).rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("prevtok", col("cumtok") - col("btok"))
      .filter(col("prevtok") < budget) // buckets entirely past the budget drop here
      .select("bucket", "cumtok", "prevtok")
    val wb = Window.partitionBy("bucket").orderBy(md5(col("doc_id").cast("string")), col("doc_id"))
    docs.join(broadcast(cum), Seq("bucket"))
      .withColumn("bcum", sum("nt").over(wb.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      // whole bucket fits, or this doc still fits the residual budget
      .filter(col("cumtok") <= budget || col("prevtok") + col("bcum") <= budget)
      .select(col("doc_id"), col("bucket"), col("nt"))
      .orderBy("doc_id")
  }

  /** Weighted sampling WITHOUT replacement (Efraimidis & Spirakis 2006):
    * each row draws key u^(1/w) (u uniform, w the row's weight) and the
    * top-k keys are the sample — inclusion probability exactly
    * proportional to weight, sequentially without replacement. For
    * integer weights this engine uses the distributionally identical
    * MAX-OF-w-UNIFORMS form (max of w i.i.d. uniforms ~ u^(1/w)): draw w
    * hash values per row and keep the max. That keeps the whole
    * computation in md5/hex-string space — no ln/pow, so no libm-ulp
    * cross-engine tie risk (the tx_tfidf lesson) and the usual
    * determinism triple holds: engines agree row-for-row, task retries
    * are idempotent, appends never flip an existing row's key.
    *
    * Weight here: w = 1 + n_chars/100 (docs sampled ∝ length, the
    * token-budget-aware sampling rule). Plan shape at 100 TB: explode
    * ×w (w ≤ 6 here; for large weights switch to the float u^(1/w) form
    * — documented, not needed for integral small w), per-doc max = one
    * hash agg with map-side combine, then global top-k = sort+limit
    * which Spark plans as TakeOrderedAndProject (per-partition top-k +
    * driver merge of k·partitions rows, never a global sort). */
  def weightedSample(spark: SparkSession, dir: String, k: Int = 25): DataFrame = {
    // explicit floor: a bare int cast truncates in Spark but ROUNDS in
    // DuckDB — floor on both sides keeps the weight cross-engine exact
    val w = (lit(1) + floor(col("n_chars") / lit(100.0))).cast("int")
    Tables.documents(spark, dir)
      .select(col("doc_id"), w.as("w"))
      .withColumn("key",
        aggregate(
          transform(sequence(lit(1), col("w")),
            r => md5(concat(col("doc_id").cast("string"), lit(":"), r.cast("string")))),
          lit(""), (acc, h) => greatest(acc, h)))
      .orderBy(col("key").desc, col("doc_id"))
      .limit(k)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ds_sample" -> ((s: SparkSession, d: String) => bernoulliSample(s, d)),
    "ds_weighted" -> ((s: SparkSession, d: String) => weightedSample(s, d)),
    "ds_stratified" -> ((s: SparkSession, d: String) => stratifiedSample(s, d)),
    "ds_mixture" -> ((s: SparkSession, d: String) => mixtureSample(s, d)),
    "ds_shuffle" -> ((s: SparkSession, d: String) => globalShuffle(s, d)),
    "ds_token_budget" -> ((s: SparkSession, d: String) => tokenBudgetSelect(s, d)),
  )

  val oracleSql: Map[String, String] = Map(
    // DuckDB can't lateral-parameterize generate_series here; weights are
    // bounded (w = 1 + n_chars/100 ≤ ~7 on these fixtures), so cross join
    // a fixed 1..32 series and filter r <= w
    "ds_weighted" ->
      """WITH d AS (SELECT doc_id, CAST(1 + floor(n_chars / 100.0) AS INTEGER) AS w FROM documents),
        |k AS (SELECT doc_id, w, max(md5(CAST(doc_id AS VARCHAR) || ':' || CAST(r AS VARCHAR))) AS key
        |FROM d CROSS JOIN (SELECT unnest(generate_series(1, 32)) AS r) t
        |WHERE r <= w GROUP BY doc_id, w)
        |SELECT doc_id, w, key FROM k ORDER BY key DESC, doc_id LIMIT 25""".stripMargin.replaceAll("\n", " "),
    "ds_sample" ->
      """SELECT doc_id, lang, n_chars FROM documents
        |WHERE md5(CAST(doc_id AS VARCHAR)) < '1a'
        |ORDER BY doc_id""".stripMargin.replaceAll("\n", " "),
    "ds_stratified" ->
      """SELECT lang, doc_id, rn FROM (
        |SELECT lang, doc_id, CAST(ROW_NUMBER() OVER (PARTITION BY lang
        |ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS INTEGER) AS rn
        |FROM documents)
        |WHERE rn <= 20 ORDER BY lang, rn""".stripMargin.replaceAll("\n", " "),
    "ds_mixture" ->
      """WITH c AS (SELECT source, CAST(count(*) AS DOUBLE) AS cnt FROM documents GROUP BY source),
        |r AS (SELECT source, least(1.0, 200.0 * pow(cnt, 0.5) / SUM(pow(cnt, 0.5)) OVER () / cnt) AS p FROM c)
        |SELECT d.doc_id, d.source FROM documents d JOIN r ON d.source = r.source
        |WHERE p >= 1.0 OR substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 8)
        |  < lpad(lower(hex(CAST(floor(p * 4294967296.0) AS BIGINT))), 8, '0')
        |ORDER BY d.doc_id""".stripMargin.replaceAll("\n", " "),
    "ds_shuffle" ->
      """WITH h AS (SELECT doc_id, md5('ep0:' || CAST(doc_id AS VARCHAR)) AS h FROM documents),
        |s AS (SELECT doc_id, h, CAST(strpos('0123456789abcdef', substr(h, 1, 1)) - 1 AS INTEGER) AS shard FROM h)
        |SELECT shard, CAST(ROW_NUMBER() OVER (PARTITION BY shard ORDER BY h, doc_id) AS INTEGER) AS pos, doc_id
        |FROM s ORDER BY shard, pos""".stripMargin.replaceAll("\n", " "),
    "ds_token_budget" ->
      """WITH d AS (SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS nt,
        |round(round(CAST(length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS DOUBLE) / length(text), 6), 3) AS bucket
        |FROM documents),
        |c AS (SELECT bucket, SUM(nt) AS btok FROM d GROUP BY bucket),
        |cc AS (SELECT bucket, SUM(btok) OVER (ORDER BY bucket DESC ROWS UNBOUNDED PRECEDING) AS cumtok,
        |SUM(btok) OVER (ORDER BY bucket DESC ROWS UNBOUNDED PRECEDING) - btok AS prevtok FROM c),
        |j AS (SELECT d.doc_id, d.bucket, d.nt, cc.cumtok, cc.prevtok,
        |SUM(d.nt) OVER (PARTITION BY d.bucket ORDER BY md5(CAST(d.doc_id AS VARCHAR)), d.doc_id
        |ROWS UNBOUNDED PRECEDING) AS bcum
        |FROM d JOIN cc ON d.bucket = cc.bucket WHERE cc.prevtok < 10000)
        |SELECT doc_id, bucket, nt FROM j
        |WHERE cumtok <= 10000 OR prevtok + bcum <= 10000
        |ORDER BY doc_id""".stripMargin.replaceAll("\n", " "),
  )
}

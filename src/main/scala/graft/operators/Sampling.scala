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

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ds_sample" -> ((s: SparkSession, d: String) => bernoulliSample(s, d)),
    "ds_stratified" -> ((s: SparkSession, d: String) => stratifiedSample(s, d)),
    "ds_mixture" -> ((s: SparkSession, d: String) => mixtureSample(s, d)),
  )

  val oracleSql: Map[String, String] = Map(
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
  )
}

package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** DSIR — data selection via importance resampling (Xie et al., NeurIPS
  * 2023): score every raw-corpus document by how much more likely its
  * hashed n-gram bag is under a TARGET domain's distribution than under
  * the raw corpus's, then keep the top of the ranking. The standard
  * pretraining-data recipe for "make the crawl look like the target
  * domain" without training a classifier.
  *
  * Re-expression (all Column math, cross-engine deterministic):
  *   - features: the bag of unigrams + bigrams, each hashed into one of
  *     [[Buckets]] = 16³ buckets via its md5 prefix (md5 is the engine's
  *     portable hash family — the DuckDB oracle computes identical
  *     buckets);
  *   - the two bucket distributions are Laplace-smoothed multinomials:
  *     p̂_b = (ct_b + 1)/(Nt + B) over the target slice (here `lang='en'`,
  *     the stand-in for "quality domain sample"), q̂_b likewise over the
  *     whole corpus;
  *   - per-doc importance weight = MEAN over the doc's grams of
  *     ln p̂_bucket − ln q̂_bucket (length-normalized so the ranking is not
  *     a document-length ranking);
  *   - selection = top-[[TopK]] by (rounded weight, doc_id) — the
  *     deterministic-rank variant of the paper's Gumbel-noised sampling
  *     (hash-seeded Gumbel noise would bolt on exactly like
  *     [[Sampling]]'s deterministic Bernoulli draw).
  *
  * Scale shape (100 TB): both distributions collapse to ≤ B = 4096 rows
  * via map-side-combined hash aggs (the gram fan-out never shuffles raw
  * text, only (bucket) keys); the log-ratio table is broadcast back, so
  * scoring is scan → broadcast join → per-doc agg whose partial combine
  * collapses each document's grams inside its own input partition — the
  * one shuffle carries one row per document. Weight rounding (6 dp) sits
  * ~7 orders above double reassociation error, same contract as
  * tx_perplexity's rounded cross entropy.
  */
object Dsir {

  /** Hash-feature space size: md5-prefix buckets (16³). */
  val Buckets = 4096

  /** Selection size for ds_dsir_select. */
  val TopK = 50

  /** Unigram + bigram bag over whitespace tokens (bag, not set: DSIR
    * weights are count-weighted; the bigram guard mirrors the short-doc
    * fix in TextAnalysis.repetition — Spark's sequence(1,0) descends). */
  private def grams: Column = {
    val t = split(col("text"), " ")
    val bi = when(size(t) >= 2,
      transform(sequence(lit(0), size(t) - 2),
        i => concat_ws(" ", element_at(t, i + 1), element_at(t, i + 2))))
      .otherwise(array().cast("array<string>"))
    concat(t, bi)
  }

  /** (doc_id, lang, b): one row per gram occurrence, bucketed. Shared by
    * both queries via a memoized slot (the gram fan-out is the expensive
    * frame; weights + selection would otherwise recompute it). */
  private def gramBuckets(spark: SparkSession, dir: String): DataFrame =
    PersistSlots.cached(spark, s"dsir-grams:$dir")(
      Tables.documents(spark, dir)
        .select(col("doc_id"), col("lang"), explode(grams).as("g"))
        .select(col("doc_id"), col("lang"), substring(md5(col("g")), 1, 3).as("b")))

  /** Per-document importance weights: (doc_id, n_grams, w). */
  def weights(spark: SparkSession, dir: String, target: Column = col("lang") === "en"): DataFrame = {
    val gb = gramBuckets(spark, dir)
    val raw = gb.groupBy("b").agg(count(lit(1)).as("cr"))
    val tgt = gb.filter(target).groupBy("b").agg(count(lit(1)).as("ct"))
    // corpus totals ride a 1-row broadcast (never a driver collect)
    val tot = gb.agg(count(lit(1)).as("nr"),
      count(when(target, 1)).as("nt"))
    val lr = raw.join(broadcast(tgt), Seq("b"), "left").crossJoin(broadcast(tot))
      .select(col("b"),
        (log((coalesce(col("ct"), lit(0L)) + lit(1.0)) / (col("nt") + lit(Buckets))) -
          log((col("cr") + lit(1.0)) / (col("nr") + lit(Buckets)))).as("lr"))
    gb.join(broadcast(lr), Seq("b"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_grams"), round(avg(col("lr")), 6).as("w"))
      .orderBy("doc_id")
  }

  /** Score a STREAM of documents against the FROZEN bucket distributions
    * fitted on `dir` — ingest-time DSIR (fit the target/raw multinomials
    * once on the reference corpus, weight every arriving crawl doc).
    * Stream-static: the ≤B-row log-ratio table joins each micro-batch's
    * grams (broadcast-sized by construction); the per-doc agg runs in
    * update mode (docs arrive whole in a batch). A stream gram can land
    * in a bucket the frozen RAW table never populated — the left join +
    * ln((nr+B)/(nt+B)) floor covers it (ct = cr = 0 smoothing mass),
    * which self-scoring never hits but fresh crawl data can. */
  def scoreStream(spark: SparkSession, dir: String, docs: DataFrame,
      target: Column = col("lang") === "en"): DataFrame = {
    val gb = gramBuckets(spark, dir)
    val raw = gb.groupBy("b").agg(count(lit(1)).as("cr"))
    val tgt = gb.filter(target).groupBy("b").agg(count(lit(1)).as("ct"))
    val Seq(nr, nt) = gb.agg(count(lit(1)), count(when(target, 1)))
      .collect().head.toSeq.map(_.asInstanceOf[Long].toDouble)
    val lr = raw.join(broadcast(tgt), Seq("b"), "left")
      .select(col("b"),
        (log((coalesce(col("ct"), lit(0L)) + lit(1.0)) / lit(nt + Buckets)) -
          log((col("cr") + lit(1.0)) / lit(nr + Buckets))).as("lr"))
    val floor = math.log((nr + Buckets) / (nt + Buckets))
    docs.select(col("doc_id"), explode(grams).as("g"))
      .withColumn("b", substring(md5(col("g")), 1, 3))
      .join(lr, Seq("b"), "left")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_grams"),
        round(avg(coalesce(col("lr"), lit(floor))), 6).as("w"))
  }

  /** Top-K selection by rounded weight (doc_id tiebreak). */
  def select(spark: SparkSession, dir: String): DataFrame =
    weights(spark, dir)
      .orderBy(col("w").desc, col("doc_id"))
      .limit(TopK)
      .select(col("doc_id"), col("w"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ds_dsir" -> ((s: SparkSession, d: String) => weights(s, d)),
    "ds_dsir_select" -> ((s: SparkSession, d: String) => select(s, d)),
  )

  private val gramCte =
    """WITH toks AS (SELECT doc_id, lang, string_split(text,' ') AS t FROM documents),
      |g1 AS (SELECT doc_id, lang, unnest(t) AS g FROM toks),
      |g2 AS (SELECT doc_id, lang, t[i] || ' ' || t[i+1] AS g
      |FROM toks, LATERAL (SELECT unnest(generate_series(1, len(t)-1)) AS i)),
      |g AS (SELECT doc_id, lang, substr(md5(g),1,3) AS b
      |FROM (SELECT * FROM g1 UNION ALL SELECT * FROM g2)),
      |raw AS (SELECT b, COUNT(*) AS cr FROM g GROUP BY 1),
      |tgt AS (SELECT b, COUNT(*) AS ct FROM g WHERE lang='en' GROUP BY 1),
      |tot AS (SELECT (SELECT COUNT(*) FROM g) AS nr, (SELECT COUNT(*) FROM g WHERE lang='en') AS nt),
      |lr AS (SELECT r.b, ln((COALESCE(t.ct,0)+1.0)/(tot.nt+4096)) - ln((r.cr+1.0)/(tot.nr+4096)) AS lr
      |FROM raw r LEFT JOIN tgt t USING (b), tot),
      |perdoc AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_grams, ROUND(AVG(lr.lr),6) AS w
      |FROM g JOIN lr USING (b) GROUP BY doc_id)""".stripMargin

  val oracleSql: Map[String, String] = Map(
    "ds_dsir" ->
      (gramCte + " SELECT doc_id, n_grams, w FROM perdoc ORDER BY doc_id")
        .replaceAll("\n", " "),
    "ds_dsir_select" ->
      (gramCte + s" SELECT doc_id, w FROM perdoc ORDER BY w DESC, doc_id LIMIT $TopK")
        .replaceAll("\n", " "),
  )
}

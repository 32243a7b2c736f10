package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** RAG-style document chunking (north-star extension alongside SURVEY.md
  * §2.G G22): split every document into overlapping token windows — the
  * unit of work for embedding pipelines, retrieval indexes, and
  * fixed-context training examples.
  *
  * The whole operator is one `transform` + `posexplode` over the token
  * array: chunk starts are `sequence(1, n_tokens, stride)` and each chunk
  * is a `slice` of the array, so chunking is per-row Column math — no
  * shuffle, no UDF, scan-bound at 100 TB. The `chunk_fp` md5 doubles as
  * the chunk-level dedup key (chunks from boilerplate-heavy corpora
  * collapse with the same hash-groupBy used for exact doc dedup).
  */
object Chunking {

  /** Tokens per chunk. */
  val Width = 32
  /** Tokens between consecutive chunk starts (Width − Stride = 8 overlap). */
  val Stride = 24

  /** One row per (doc, chunk): 0-based chunk index, chunk text, token
    * count (tail chunks are shorter), and the chunk content hash. */
  def chunks(spark: SparkSession, dir: String,
      width: Int = Width, stride: Int = Stride): DataFrame = {
    val t = split(col("text"), " ")
    val nt = size(t)
    val pieces = transform(sequence(lit(1), nt, lit(stride)), s =>
      struct(
        concat_ws(" ", slice(t, s, lit(width))).as("chunk"),
        least(lit(width), nt - s + lit(1)).cast("long").as("n_tok")))
    Tables.documents(spark, dir)
      .select(col("doc_id"), posexplode(pieces).as(Seq("chunk_idx", "c")))
      .select(col("doc_id"), col("chunk_idx"),
        col("c.chunk").as("chunk"), col("c.n_tok").as("n_tok"),
        md5(col("c.chunk")).as("chunk_fp"))
      .orderBy("doc_id", "chunk_idx")
  }

  /** Dataset-card corpus report: the one-row summary a pipeline publishes
    * with every shipped dataset (counts, token volume, language spread,
    * exact length quantiles, exact-dup rate). One aggregation pass; the
    * exact percentiles are a sort-based aggregate per group at this
    * cardinality and stay the ORACLE form (cross-engine exactness);
    * `exactQuantiles = false` swaps in `approx_percentile` — the
    * bounded-state 100 TB form a dominant language can't blow up
    * (AdaptiveQuantileSpec pins the two on the fixture). */
  def corpusReport(spark: SparkSession, dir: String,
      exactQuantiles: Boolean = true): DataFrame = {
    val nt = size(split(col("text"), " "))
    // approx path: ONE sketch for both quantiles (identical aggregate
    // expressions are computed once), accuracy 1000 — see adaptiveQuality
    def pct(q: Double): Column =
      if (exactQuantiles) expr(s"percentile(nt, $q)")
      else element_at(expr(s"approx_percentile(nt, array(0.5D, 0.9D), 1000)"),
        if (q == 0.5) 1 else 2).cast("double")
    Tables.documents(spark, dir)
      .select(col("lang"), col("n_chars"), nt.cast("long").as("nt"),
        md5(col("text")).as("fp"))
      .groupBy("lang")
      .agg(
        count(lit(1)).as("docs"),
        sum("nt").as("tokens"),
        round(avg("n_chars"), 4).as("avg_chars"),
        // interpolated quantiles: both engines use the (n−1)·q rank with
        // linear interpolation; round(4) absorbs the a·(1−f)+b·f vs
        // a+(b−a)·f last-ulp association difference
        round(pct(0.5), 4).as("p50_tokens"),
        round(pct(0.9), 4).as("p90_tokens"),
        (count(lit(1)) - countDistinct(col("fp"))).as("exact_dups"))
      .orderBy("lang")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "tx_chunks" -> ((s: SparkSession, d: String) => chunks(s, d)),
    "report_corpus" -> ((s: SparkSession, d: String) => corpusReport(s, d)),
  )

  val oracleSql: Map[String, String] = Map(
    "tx_chunks" ->
      s"""WITH d AS (SELECT doc_id, string_split(text,' ') AS t FROM documents),
        |e AS (SELECT doc_id, CAST((i-1)//$Stride AS INTEGER) AS chunk_idx,
        |array_to_string(t[i:i+${Width - 1}], ' ') AS chunk,
        |CAST(least($Width, len(t)-i+1) AS BIGINT) AS n_tok
        |FROM d, LATERAL (SELECT unnest(generate_series(1, len(t), $Stride)) AS i))
        |SELECT doc_id, chunk_idx, chunk, n_tok, md5(chunk) AS chunk_fp
        |FROM e ORDER BY doc_id, chunk_idx""".stripMargin.replaceAll("\n", " "),
    "report_corpus" ->
      """WITH d AS (SELECT lang, n_chars,
        |CAST(len(string_split(text,' ')) AS BIGINT) AS nt, md5(text) AS fp
        |FROM documents)
        |SELECT lang, COUNT(*) AS docs, CAST(SUM(nt) AS BIGINT) AS tokens,
        |ROUND(AVG(n_chars), 4) AS avg_chars,
        |ROUND(quantile_cont(nt, 0.5), 4) AS p50_tokens,
        |ROUND(quantile_cont(nt, 0.9), 4) AS p90_tokens,
        |COUNT(*) - COUNT(DISTINCT fp) AS exact_dups
        |FROM d GROUP BY lang ORDER BY lang""".stripMargin.replaceAll("\n", " "),
  )
}

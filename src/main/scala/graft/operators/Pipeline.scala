package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Composite corpus-cleaning pipeline — the end-to-end keep/drop decision
  * a training-data pipeline applies before tokenization, composed from
  * the already-oracled primitives (language ID, quality counters,
  * repetition, span-level dedup) in the order real pipelines run them
  * (cheap scan-bound filters first, the shuffle-bearing dedup last):
  *
  *   1. non_english  — heuristic language ID != en
  *   2. too_short    — fewer than MinTokens whitespace tokens
  *   3. repetitive   — duplicate-token ratio above MaxDupTokRatio
  *   4. duplicated   — at least half the doc's 10-token spans already
  *                     occurred earlier in the corpus (first-occurrence
  *                     order, the dd_span_exact rule)
  *
  * First failing rule wins; survivors read `ok`. One row per document
  * (doc_id, keep, reason) — the verdict table a pipeline would join
  * against the corpus to materialize the cleaned split.
  *
  * Scale shape: rules 1–3 are pure per-row Column math fused into the
  * scan; rule 4 joins the span-dedup aggregate, whose own plan is the
  * skew-safe min(struct) hash agg (see Dedup.spanDedup). Nothing here
  * adds a shuffle beyond the one dedup already pays.
  */
object Pipeline {

  val MinTokens = 20
  val MaxDupTokRatio = 0.65

  def clean(spark: SparkSession, dir: String): DataFrame = {
    val t = split(col("text"), " ")
    val nt = size(t)
    val perDoc = Tables.documents(spark, dir)
      .select(col("doc_id"),
        TextAnalysis.predLangCol.as("pl"),
        nt.cast("long").as("nt"),
        (lit(1.0) - size(array_distinct(t)).cast("double") / nt).as("dup_ratio"))
    val spans = Dedup.spanDedup(spark, dir)
      .select(col("doc_id"), col("n_spans"), col("n_dup_spans"))
    val reason = when(col("pl") =!= "en", lit("non_english"))
      .when(col("nt") < MinTokens, lit("too_short"))
      .when(col("dup_ratio") > MaxDupTokRatio, lit("repetitive"))
      // integer form of n_dup/n >= 0.5 — no float compare in the rule
      .when(col("n_dup_spans") * 2 >= col("n_spans"), lit("duplicated"))
      .otherwise(lit("ok"))
    perDoc.join(spans, Seq("doc_id"))
      .select(col("doc_id"), reason.as("reason"))
      .select(col("doc_id"), (col("reason") === "ok").as("keep"), col("reason"))
      .orderBy("doc_id")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "pipeline_clean" -> clean _,
  )

  val oracleSql: Map[String, String] = Map(
    "pipeline_clean" -> {
      val spanCte =
        """sp AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
          |chunks AS (SELECT doc_id, i AS span_idx,
          |array_to_string(t[(i*10+1):(i*10+10)], ' ') AS span
          |FROM sp, LATERAL (SELECT unnest(range(0, CAST(ceil(len(t)/10.0) AS BIGINT))) AS i)),
          |ranked AS (SELECT doc_id, span_idx, span,
          |row_number() OVER (PARTITION BY span ORDER BY doc_id, span_idx) AS rn FROM chunks),
          |spans AS (SELECT doc_id, count(*) AS n_spans,
          |sum(CASE WHEN rn > 1 THEN 1 ELSE 0 END) AS n_dup_spans
          |FROM ranked GROUP BY doc_id)""".stripMargin.replaceAll("\n", " ")
      val scoreCte =
        s"s AS (SELECT doc_id, text, ${TextAnalysis.langScoreSql} FROM documents)"
      val qCte =
        s"""q AS (SELECT doc_id, ${TextAnalysis.langCaseSql} AS pl,
          |len(string_split(text,' ')) AS nt,
          |1.0 - len(list_distinct(string_split(text,' ')))*1.0/len(string_split(text,' ')) AS dup_ratio
          |FROM s)""".stripMargin.replaceAll("\n", " ")
      val reasonCte =
        s"""r AS (SELECT q.doc_id,
          |CASE WHEN pl <> 'en' THEN 'non_english'
          |WHEN nt < $MinTokens THEN 'too_short'
          |WHEN dup_ratio > $MaxDupTokRatio THEN 'repetitive'
          |WHEN n_dup_spans * 2 >= n_spans THEN 'duplicated'
          |ELSE 'ok' END AS reason
          |FROM q JOIN spans ON q.doc_id = spans.doc_id)""".stripMargin.replaceAll("\n", " ")
      s"WITH $spanCte, $scoreCte, $qCte, $reasonCte " +
        "SELECT doc_id, reason = 'ok' AS keep, reason FROM r ORDER BY doc_id"
    },
  )
}

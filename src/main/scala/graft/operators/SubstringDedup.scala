package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Position-granular repeated-substring detection — the ExactSubstr dedup
  * of Lee et al. 2021 ("Deduplicating Training Data Makes Language Models
  * Better"): any token substring of length ≥ L that appears more than
  * once in the corpus is reported as a per-document removal span. Their
  * implementation builds a corpus suffix array; the Spark-native
  * re-expression is sliding L-token shingles at EVERY position (a
  * duplicated substring of length ≥ L duplicates all of its L-shingles,
  * and maximal runs of duplicated positions reconstruct the maximal
  * duplicated substrings — same output, no suffix array):
  *
  *   1. (doc_id, pos, md5(shingle)) for every position — explode, no
  *      shuffle; 2. duplicated shingle hashes — hash agg with map-side
  *      combine, vocabulary-of-shingles sized; 3. join positions back on
  *      the hash (uniform key, id-only rows); 4. merge adjacent
  *      duplicated positions into maximal spans — a gaps-and-islands
  *      window per doc over DUPLICATED positions only, so the window
  *      input is bounded by duplication density, not corpus size.
  *
  * Unlike [[Dedup.spanDedup]] (C4-style fixed 10-token grid, first
  * occurrence KEPT), this reports every occurrence of every repeated
  * substring at token granularity — the two operators are the
  * grid-vs-suffix ends of the span-dedup spectrum.
  */
object SubstringDedup {

  /** Minimum duplicated run length in tokens (Lee et al. use 50 BPE
    * tokens at web scale; 10 matches this corpus's ~100-token docs). */
  val L = 10

  /** Per-document maximal duplicated-substring spans:
    * (doc_id, span_start, span_end, dup_tokens), 1-based inclusive token
    * positions.
    *
    * `fastHash` swaps the md5 shingle key (the DuckDB-oracle form) for
    * xxhash64 — an 8-byte long instead of a 32-char string, so the one
    * corpus-sized shuffle (the shingle duplicate count) carries 4× fewer
    * key bytes. Same spans barring a 64-bit collision
    * (SubstringDedupSpec asserts fast ≡ md5 output); the shingle frame is
    * deliberately recomputed for the position join-back rather than
    * collected per hash — collect_list would pile a boilerplate shingle's
    * 10⁸ positions onto one key, the join-back keeps them spread. */
  def duplicatedSpans(spark: SparkSession, dir: String,
      fastHash: Boolean = false): DataFrame = {
    val t = split(col("text"), " ")
    val nt = size(t)
    // guard nt < L: sequence(1, nt-L+1) would step DOWNWARD (see
    // TextAnalysis.repetition) — emit no positions instead
    val starts = when(nt >= lit(L), sequence(lit(1), nt - lit(L - 1)))
      .otherwise(array().cast("array<int>"))
    def shingleKey(c: Column): Column = if (fastHash) xxhash64(c) else md5(c)
    // spread: the per-position shingle hash is the heavy narrow stage
    // and runs at scan parallelism (Tables.spread scaladoc)
    val shingles = Tables.spread(spark, Tables.documents(spark, dir))
      .select(col("doc_id"), explode(starts).as("pos"),
        split(col("text"), " ").as("t"))
      .select(col("doc_id"), col("pos"),
        shingleKey(concat_ws(" ", slice(col("t"), col("pos"), lit(L)))).as("h"))

    val dup = shingles.groupBy("h").agg(count(lit(1)).as("n"))
      .filter(col("n") > 1).select("h")

    val positions = shingles.join(dup, Seq("h")).select("doc_id", "pos")

    // gaps-and-islands: spans [pos, pos+L-1] chain while the next start is
    // within L of the previous (overlapping or touching runs merge)
    val w = Window.partitionBy("doc_id").orderBy("pos")
    positions
      .withColumn("brk",
        when(lag(col("pos"), 1).over(w).isNull ||
          col("pos") > lag(col("pos"), 1).over(w) + lit(L), 1).otherwise(0))
      .withColumn("island", sum("brk").over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy("doc_id", "island")
      .agg(min("pos").cast("long").as("span_start"),
        (max("pos") + lit(L - 1)).cast("long").as("span_end"))
      .select(col("doc_id"), col("span_start"), col("span_end"),
        (col("span_end") - col("span_start") + 1).as("dup_tokens"))
      .orderBy("doc_id", "span_start")
  }

  /** Documents with every duplicated span excised (all copies removed, the
    * Lee et al. policy) — the scrub consumer of [[duplicatedSpans]]. One
    * join + per-row array filter; docs without spans pass through. */
  def scrub(spark: SparkSession, dir: String): DataFrame = {
    val spans = duplicatedSpans(spark, dir)
      .groupBy("doc_id")
      .agg(collect_list(struct(col("span_start"), col("span_end"))).as("spans"))
    Tables.documents(spark, dir)
      .join(spans, Seq("doc_id"), "left")
      .select(col("doc_id"),
        when(col("spans").isNull, col("text")).otherwise(
          concat_ws(" ", filter(
            transform(split(col("text"), " "),
              (tok, i) => struct(tok.as("tok"), (i + 1).as("p"))),
            s => !exists(col("spans"),
              sp => s.getField("p") >= sp.getField("span_start") &&
                s.getField("p") <= sp.getField("span_end"))).getField("tok")
          )).as("clean_text"))
      .orderBy("doc_id")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "dd_substring_spans" -> ((s: SparkSession, d: String) => duplicatedSpans(s, d)),
  )

  val oracleSql: Map[String, String] = Map(
    "dd_substring_spans" ->
      s"""WITH d AS (SELECT doc_id, string_split(text,' ') AS t FROM documents),
        |s AS (SELECT doc_id, i AS pos, md5(array_to_string(t[i:i+${L - 1}], ' ')) AS h
        |FROM d, LATERAL (SELECT unnest(generate_series(1, len(t)-${L - 1})) AS i)),
        |dup AS (SELECT h FROM s GROUP BY h HAVING COUNT(*) > 1),
        |p AS (SELECT doc_id, pos FROM s JOIN dup USING (h)),
        |isl AS (SELECT doc_id, pos, CASE WHEN lag(pos) OVER w IS NULL
        |OR pos > lag(pos) OVER w + $L THEN 1 ELSE 0 END AS brk
        |FROM p WINDOW w AS (PARTITION BY doc_id ORDER BY pos)),
        |g AS (SELECT doc_id, pos, SUM(brk) OVER
        |(PARTITION BY doc_id ORDER BY pos) AS island FROM isl)
        |SELECT doc_id, CAST(MIN(pos) AS BIGINT) AS span_start,
        |CAST(MAX(pos) + ${L - 1} AS BIGINT) AS span_end,
        |CAST(MAX(pos) + ${L - 1} - MIN(pos) + 1 AS BIGINT) AS dup_tokens
        |FROM g GROUP BY doc_id, island
        |ORDER BY doc_id, span_start""".stripMargin.replaceAll("\n", " "),
  )
}

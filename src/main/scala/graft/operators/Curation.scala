package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Corpus-curation gates that run between dedup and the final training
  * mix (north-star extension alongside [[Sampling]] / [[TextAnalysis]]):
  * per-source frequency capping and lexicon-based content filtering —
  * the two cheap, deterministic policies every large corpus build
  * applies (C4 caps page counts per domain; RefinedWeb and Gopher both
  * gate on blocklist lexicons before any model-based scoring).
  */
object Curation {

  /** Cap documents per source: keep the best [[CapPerSource]] docs of
    * each source by (n_chars desc, doc_id) — the anti-domination rule
    * that stops one crawler domain from owning the training mix.
    *
    * Scale shape: one window over source (a bounded-cardinality key —
    * sources are domains, not documents) ranking by an existing column;
    * a single hash-partition shuffle on source, no joins, no driver
    * state. Skewed sources are the expected case (that is WHY the cap
    * exists) — rank-then-filter only ships (doc_id, source, n_chars)
    * rows into the window, never text, so even a source holding half
    * the corpus moves key-plus-scalar tuples; at 100 TB the same plan
    * runs with text columns pruned at the scan.
    */
  val CapPerSource = 40

  def domainCap(spark: SparkSession, dir: String, cap: Int = CapPerSource): DataFrame = {
    val w = Window.partitionBy("source").orderBy(col("n_chars").desc, col("doc_id"))
    Tables.documents(spark, dir)
      .select(col("doc_id"), col("source"), col("n_chars"))
      .withColumn("rn", row_number().over(w))
      .withColumn("keep", col("rn") <= cap)
      .orderBy("doc_id")
  }

  /** First-K quota used by the streaming admission gate
    * (graft.streaming.CurationStreams) and its batch twin below: 10
    * binds on every oracle fixture (25 docs/source), so both verdicts
    * occur in the oracled row. */
  val FirstCap = 10

  /** Batch twin of the STREAMING cap policy: first-K by arrival order
    * (doc_id) rather than best-K by length — the exact per-doc verdicts
    * CurationStreams.capStream emits, as one window query, so the
    * streaming policy has a DuckDB-oracle-checkable form (CapStreamSpec
    * pins stream ≡ this frame). Same single source-keyed shuffle and
    * skew story as [[domainCap]]. */
  def domainCapFirst(spark: SparkSession, dir: String, cap: Int = FirstCap): DataFrame = {
    val w = Window.partitionBy("source").orderBy("doc_id")
    Tables.documents(spark, dir)
      .select(col("doc_id"), col("source"))
      .withColumn("rn", row_number().over(w).cast("long"))
      .withColumn("admitted", col("rn") <= cap)
      .orderBy("doc_id")
  }

  /** Blocklist lexicon for [[blocklistGate]]: exact whole-token matching
    * after lowercasing — the word-boundary gate shape used by the C4
    * cleanup's "bad words" filter and Gopher's safe-list rules (toxicity
    * / NSFW / spam keyword filtering are all this operator with a
    * different governed list). The fixture corpus is synthetic database
    * jargon, so the demo list holds terms that actually occur there
    * (plus one absent term — absent entries must cost nothing and match
    * nothing); the plan shape is list-size-independent: the lexicon
    * rides as one literal array inside a scan-bound per-row filter. */
  val Blocklist: Seq[String] = Seq("slow", "dup", "stall")

  val BlockThreshold = 0.05

  /** Per-document blocklist signal: lexicon hits over whole lowercased
    * tokens, rate = hits/tokens, flagged iff rate > [[BlockThreshold]].
    * Pure per-row Column math (filter over the token array against a
    * literal list — no explode, no shuffle, scan-bound at any corpus
    * size), the same plan family as [[TextAnalysis.quality]]. */
  def blocklistGate(spark: SparkSession, dir: String): DataFrame = {
    val t: Column = split(lower(col("text")), " ")
    val hits = size(filter(t, x => x.isin(Blocklist.map(s => s: Any): _*)))
    Tables.documents(spark, dir)
      .select(col("doc_id"),
        hits.cast("long").as("block_hits"),
        round(hits.cast("double") / size(t), 4).as("block_rate"))
      .withColumn("flagged", col("block_rate") > BlockThreshold)
      .orderBy("doc_id")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ds_domain_cap" -> ((s: SparkSession, d: String) => domainCap(s, d)),
    "ds_domain_cap_first" -> ((s: SparkSession, d: String) => domainCapFirst(s, d)),
    "tx_blocklist" -> blocklistGate _,
  )

  private def inList(xs: Seq[String]) = xs.map(s => s"'$s'").mkString("(", ",", ")")

  val oracleSql: Map[String, String] = Map(
    "ds_domain_cap" ->
      s"""SELECT doc_id, source, n_chars,
        |CAST(row_number() OVER (PARTITION BY source ORDER BY n_chars DESC, doc_id) AS BIGINT) AS rn,
        |row_number() OVER (PARTITION BY source ORDER BY n_chars DESC, doc_id) <= $CapPerSource AS keep
        |FROM documents ORDER BY doc_id""".stripMargin.replaceAll("\n", " "),
    "ds_domain_cap_first" ->
      s"""SELECT doc_id, source,
        |CAST(row_number() OVER (PARTITION BY source ORDER BY doc_id) AS BIGINT) AS rn,
        |row_number() OVER (PARTITION BY source ORDER BY doc_id) <= $FirstCap AS admitted
        |FROM documents ORDER BY doc_id""".stripMargin.replaceAll("\n", " "),
    "tx_blocklist" ->
      s"""WITH h AS (SELECT doc_id,
        |len(list_filter(string_split(lower(text), ' '), x -> x IN ${inList(Blocklist)})) AS block_hits,
        |len(string_split(lower(text), ' ')) AS nt
        |FROM documents)
        |SELECT doc_id, CAST(block_hits AS BIGINT) AS block_hits,
        |ROUND(CAST(block_hits AS DOUBLE) / nt, 4) AS block_rate,
        |ROUND(CAST(block_hits AS DOUBLE) / nt, 4) > $BlockThreshold AS flagged
        |FROM h ORDER BY doc_id""".stripMargin.replaceAll("\n", " "),
  )
}

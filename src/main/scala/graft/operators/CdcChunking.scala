package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Content-defined chunking (CDC) — chunk boundaries chosen by a rolling
  * content hash instead of fixed offsets (the LBFS/rsync idea, the
  * backbone of storage dedup): a boundary falls after token i whenever
  * the hash of the last `W` tokens lands in 1/`D` of the hash space. A
  * local edit (insert/delete/replace) only disturbs boundaries whose
  * window overlaps the edit — downstream chunks realign, so their
  * fingerprints still dedup against the unedited copy. Fixed-width
  * chunking ([[Chunking]]) loses ALL fingerprints after one inserted
  * token; CdcChunkingSpec measures both behaviors.
  *
  * Everything is per-row Column math (boundary positions → start/end
  * zip → slice), so like Chunking the operator is scan-bound with zero
  * shuffle at any corpus size. Boundary rule: first md5 nibble of the
  * 3-token window = '0' (P = 1/16 ⇒ mean chunk ≈ 16 tokens) — the same
  * hex-range trick as [[Sharding]], exactly mirrorable in DuckDB.
  * Production CDC adds min/max chunk clamps (sequential state, a
  * mapPartitions pass); the unclamped rule keeps the operator
  * whole-stage-codegen and cross-engine exact.
  */
object CdcChunking {

  /** Rolling window width in tokens. */
  val W = 3
  /** A boundary fires with probability 1/16 per eligible position. */
  val BoundaryNibble = "0"

  /** CDC chunks for any (doc_id, text) frame (shared with the spec's
    * edited-copy comparison). */
  def chunksFor(docs: DataFrame): DataFrame = {
    val t = split(col("text"), " ")
    val nt = size(t)
    def win(i: Column): Column =
      concat_ws(" ", element_at(t, i - 2), element_at(t, i - 1), element_at(t, i))
    // boundary AFTER token i, for i in [W, nt-1] (never after the last
    // token — no empty tail chunk); nt<W+1 ⇒ no boundaries, one chunk
    val bpos = when(nt >= lit(W + 1),
      filter(sequence(lit(W), nt - 1),
        i => substring(md5(win(i)), 1, 1) === BoundaryNibble))
      .otherwise(array().cast("array<int>"))
    val starts = concat(array(lit(1)), transform(bpos, b => b + 1))
    val ends = concat(bpos, array(nt))
    val chunks = zip_with(starts, ends,
      (s, e) => concat_ws(" ", slice(t, s, e - s + 1)))
    docs
      .select(col("doc_id"), posexplode(chunks).as(Seq("chunk_idx", "chunk")))
      .select(col("doc_id"), col("chunk_idx"), col("chunk"),
        size(split(col("chunk"), " ")).cast("long").as("n_tok"),
        md5(col("chunk")).as("chunk_fp"))
      .orderBy("doc_id", "chunk_idx")
  }

  // spread: the window-md5 map stage is the whole cost and is narrow —
  // an under-split fixture scan serializes it (measured: a FLAT ~13 s
  // wall at sf0.1 and 10× on one/ten cores; ~1 s spread across 32)
  def cdcChunks(spark: SparkSession, dir: String): DataFrame =
    chunksFor(Tables.spread(spark, Tables.documents(spark, dir)))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "tx_cdc_chunks" -> cdcChunks _,
  )

  val oracleSql: Map[String, String] = Map(
    "tx_cdc_chunks" ->
      s"""WITH d AS (SELECT doc_id, string_split(text,' ') AS t FROM documents),
        |b AS (SELECT doc_id, t,
        |list_filter(generate_series($W, len(t)-1),
        |i -> substr(md5(t[i-2] || ' ' || t[i-1] || ' ' || t[i]), 1, 1) = '$BoundaryNibble') AS bp
        |FROM d),
        |se AS (SELECT doc_id, t,
        |[1] || list_transform(bp, x -> x + 1) AS starts,
        |bp || [len(t)] AS ends FROM b),
        |e AS (SELECT doc_id, CAST(ci - 1 AS INTEGER) AS chunk_idx,
        |array_to_string(t[starts[ci]:ends[ci]], ' ') AS chunk
        |FROM se, LATERAL (SELECT unnest(generate_series(1, len(starts))) AS ci))
        |SELECT doc_id, chunk_idx, chunk,
        |CAST(len(string_split(chunk,' ')) AS BIGINT) AS n_tok,
        |md5(chunk) AS chunk_fp
        |FROM e ORDER BY doc_id, chunk_idx""".stripMargin.replaceAll("\n", " "),
  )
}

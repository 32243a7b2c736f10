package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.materials.Materials
import graft.ml.DielectricModel
import graft.operators.{Bpe, CdcChunking, Chunking, Curation, Decontam, Dedup, Doremi, Dsir, EntityResolution, EventAnalytics, Graphs, JoinOpt, Mining, Multimodal, NgramLm, Packing, Pipeline, Quality, Quantize, RecallGates, Relational, Retrieval, Sampling, SemDedup, Sharding, Similarity, SimilarityJoin, Sketches, SkewJoin, Snapshots, SubstringDedup, TextAnalysis}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` maps every implemented operator (SURVEY.md §2 inventory) to a
  * DataFrame builder `(spark, sfDir) => df`; `oracleSql` carries the DuckDB
  * equivalent for the driver's hash-compare. Column names are aligned
  * between the two on purpose — the compare sorts columns by name.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * A revenue-by-nation rollup exercising scan→broadcast join→agg→sort. */
  def entry(spark: SparkSession): DataFrame =
    Relational.q3Join(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Relational.queries ++ SkewJoin.queries ++ JoinOpt.queries ++
      EventAnalytics.queries ++ Dedup.queries ++ SemDedup.queries ++
      Dsir.queries ++ SubstringDedup.queries ++ CdcChunking.queries ++
      Similarity.queries ++ TextAnalysis.queries ++ Chunking.queries ++
      NgramLm.queries ++ Retrieval.queries ++ Sampling.queries ++ Curation.queries ++ Sketches.queries ++ Doremi.queries ++
      Graphs.queries ++ SimilarityJoin.queries ++ Mining.queries ++ EntityResolution.queries ++
      Snapshots.queries ++ Quality.queries ++ Sharding.queries ++
      Packing.queries ++ Quantize.queries ++ Bpe.queries ++ Decontam.queries ++
      RecallGates.queries ++
      Pipeline.queries ++ Multimodal.queries ++
      Materials.queries ++ DielectricModel.queries ++
      graft.ml.QualityClassifier.queries ++
      graft.ml.ScalerDrift.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    Relational.oracleSql ++ SkewJoin.oracleSql ++ JoinOpt.oracleSql ++
      EventAnalytics.oracleSql ++ Dedup.oracleSql ++ SemDedup.oracleSql ++
      Dsir.oracleSql ++ SubstringDedup.oracleSql ++ CdcChunking.oracleSql ++
      Similarity.oracleSql ++ TextAnalysis.oracleSql ++ Chunking.oracleSql ++
      NgramLm.oracleSql ++ Retrieval.oracleSql ++ Sampling.oracleSql ++ Curation.oracleSql ++ Sketches.oracleSql ++ Doremi.oracleSql ++
      Graphs.oracleSql ++ SimilarityJoin.oracleSql ++ Mining.oracleSql ++ EntityResolution.oracleSql ++
      Snapshots.oracleSql ++ Quality.oracleSql ++ Sharding.oracleSql ++
      Packing.oracleSql ++ Quantize.oracleSql ++ Bpe.oracleSql ++ Decontam.oracleSql ++
      RecallGates.oracleSql ++
      Pipeline.oracleSql ++ Multimodal.oracleSql ++ Materials.oracleSql ++
      DielectricModel.oracleSql ++ graft.ml.QualityClassifier.oracleSql

  /** Headline subset used by Bench (fast, scale-sensitive queries across
    * all operator families: relational, dedup, similarity, text — and,
    * since r7, the round-6 families: lakehouse commit+time-travel,
    * sketch range reads, winnowing + its pair join, record linkage,
    * graph, attribution, bitext ANN — so a perf regression in the
    * newest surface shows in the per-round artifact diff). */
  def benchQueries: Seq[String] = Seq(
    "q1_filter_project", "q2_agg", "q3_join", "q6_range_join",
    "q7_asof_join", "q8_window", "q10_distinct", "q11_rollup",
    "q16_array", "q19_window_agg",
    // dd_embed_cos_lsh (bucketed equi join), NOT dd_embed_cos: the exact
    // quadratic form is the ORACLE role; a BroadcastNestedLoop must not
    // sit in the headline set it would dominate at 100x scale
    "dd_minhash_lsh", "dd_minhash_lsh_fast", "dd_embed_cos_lsh", "ann_topk", "tx_quality",
    // round-6 families
    "ly_snapshot", "ds_hll_range", "tx_winnowing", "dd_winnow_pairs",
    "er_link", "q32_pagerank", "q34_attribution", "mine_bitext_ann",
    // r8: the triangle pipeline earned a tracked number after its
    // bloom-prefilter/persist/shuffle-hash rework (10× shuffle cut at
    // sf0.1, spill zeroed at 10× — BENCH_NOTES r8)
    "q33_triangles",
    // r9: the exact set-similarity join earned a tracked number after
    // its positional-filter/packed-verify rework (the decade probe
    // caught the fan-out verify at 221× growth — BENCH_NOTES r9)
    "dd_ppjoin")

  /** Bench-only substitutions: export-gate queries (ds_*, q32) read a
    * Verify-written parquet and spend their time re-verifying — the
    * benched form is the RAW computation, which is the production
    * workload (the gate is the oracle harness, not the operator). */
  def benchOverrides: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q32_pagerank" -> ((s, d) => graft.operators.Graphs.pagerankRaw(s, d)),
    "ds_hll_range" -> ((s, d) => graft.operators.Sketches.rangeEstimates(s, d)),
    "dd_embed_cos_lsh" -> ((s, d) => Dedup.embeddingCosineBucketed(s, d)),
    // the RAW ANN miner, not the RecallGates gate form: the gate
    // recomputes the exact X×Y cartesian Mining.mineBitext on every
    // pass — the one headline number that would grow quadratically
    // with SF (VERDICT r7 #1). PlanAuditSpec pins the invariant that
    // every benched gate-form query carries a raw override.
    "mine_bitext_ann" -> ((s, d) => Mining.mineBitextAnn(s, d)),
  )
}

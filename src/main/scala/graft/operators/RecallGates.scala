package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Export-gate oracles for the recall-by-design rows — the approximate
  * operators whose OUTPUT is intentionally not equal to the exact form
  * (ANN top-k shortlists, LSH-bucketed pair candidates, bloom
  * membership): r6 recorded them `no_oracle` (rows-only). The gate
  * pattern upgrades each to a driver-verified QUALITY contract, the same
  * discipline as ml_golden_gate / ds_hll:
  *
  *   1. Verify EXPORTS the approximate result (the ids only — small);
  *   2. the registered query and its DuckDB oracle both read those same
  *      bytes, each recomputes the EXACT reference independently (brute
  *      force top-k / exact pair join / exact membership — every exact
  *      form here is itself a long-green equality-oracled row, so its
  *      cross-engine determinism is already established), and each
  *      derives the same integers + margin-protected booleans.
  *
  * What each gate pins: ANN families — recall@k above the per-family
  * floor in [[AnnRecallBounds]] (measured 0.87–0.98, floors set at
  * measured-minus-a-few-flips, so a boolean flip needs a real
  * regression, not a tie-break ulp); bitext ANN — pair recall plus a
  * bounded non-exact-pair ratio; bucketed embedding near-dup — recall
  * AND the subset property (the in-bucket verify uses the exact cosine
  * threshold, so every emitted pair must be a true pair); bloom
  * decontamination — the one-sided-error law per document (no false
  * negatives: flagged ≥ exact contaminated, same gram totals).
  *
  * The RAW operators stay available for bench/specs ([[SparkEntry
  * .benchOverrides]] points the headline names at them — the gate is
  * oracle harness, not workload).
  */
object RecallGates {

  /** Per-family recall@k floors, set at measured-minus-margin (VERDICT
    * r7 #2 — a uniform 0.6 floor against measured 0.88–0.98 would sleep
    * through a genuine index collapse to 0.65). Each bound sits a
    * handful of flip granularities (1/exact_rows per tie-break flip —
    * 1/60 for the sf0.01 top-k gates) under the measured value, so a
    * boolean flip needs a real regression, not an ulp; RecallGatesSpec
    * recomputes the live recall per family and asserts it clears the
    * bound with ≥3 flips of headroom, so the floor can be tightened
    * mechanically each round. r9 ratchet (VERDICT r8 #5), floors =
    * binding-SF measured − 3 flips: lsh 0.9333 (sf0.001; 0.97 at
    * sf0.01) → 0.88; ivf 0.8667/0.88 → 0.81; ivfpq 0.8667/0.88 → 0.81;
    * pca 0.95/0.98 → 0.89. */
  val AnnRecallBounds: Map[String, Double] = Map(
    "ann_lsh_topk" -> 0.88,
    "ann_ivf_topk" -> 0.81,
    "ann_ivfpq_topk" -> 0.81,
    "ann_pca_topk" -> 0.89,
  )

  /** Bitext ANN: pair recall floor (measured 0.9160 at sf0.001 / 0.92 at
    * sf0.01; r9 ratchet → 0.87) and the max ratio of mined pairs the
    * exact miner rejects (measured 0.11; candidate-list margins can only
    * shift, not improve, cosines). */
  val BitextRecallBound = 0.87
  val BitextExtraBound = 0.25

  /** Bucketed embedding near-dup recall floor (measured 0.86 at sf0.01,
    * 1.0 at sf0.001; r9 ratchet → 0.80; precision is exactly 1 by
    * construction — gated as subset_ok). */
  val EmbedLshRecallBound = 0.80

  private final case class Fam(name: String, tag: String,
      raw: (SparkSession, String) => DataFrame) {
    def bound: Double = AnnRecallBounds(name)
  }

  private val annFams = Seq(
    Fam("ann_lsh_topk", "annlsh", (s, d) => Similarity.lshTopK(s, d)),
    Fam("ann_ivf_topk", "annivf", (s, d) => Similarity.ivfTopK(s, d)),
    Fam("ann_ivfpq_topk", "annpq", (s, d) => Similarity.ivfPqTopK(s, d)),
    Fam("ann_pca_topk", "annpca", (s, d) => Similarity.pcaTopK(s, d)),
  )

  def exportPath(tag: String, dir: String): String = ExportPaths.forCorpus(tag, dir)

  @volatile private var exportedDir: String = "/root/testdata/sf0.01"

  private def writeExport(df: DataFrame, tag: String, dir: String,
      cols: Seq[String]): Unit =
    df.select(cols.map(col): _*).coalesce(1)
      .write.mode("overwrite").parquet(exportPath(tag, dir))

  /** Run by Verify ahead of the query dump. The seven exports are
    * independent writes over shared per-corpus artifacts; the shared
    * LSH index is pre-built once (PersistSlots builds are per-key
    * locked, but pre-building avoids even the benign double-plan race)
    * and the exports then run a few in flight (guide §2.6) so one
    * family's stage tail back-fills the next family's jobs. */
  def exportAll(spark: SparkSession, dir: String): Unit = {
    exportedDir = dir
    Similarity.buildLshIndex(spark, dir) // shared by lsh/bitext/embed
    val pool = java.util.concurrent.Executors.newFixedThreadPool(3)
    implicit val ec: scala.concurrent.ExecutionContext =
      scala.concurrent.ExecutionContext.fromExecutorService(pool)
    val futs = (
      annFams.map(f => () => writeExport(f.raw(spark, dir), f.tag, dir, Seq("q_id", "nbr_id"))) ++
      Seq(
        () => writeExport(Mining.mineBitextAnn(spark, dir), "bitextann", dir, Seq("x_id", "y_id")),
        () => writeExport(Dedup.embeddingCosineBucketed(spark, dir), "embedlsh", dir, Seq("a_id", "b_id")),
        () => exportBloomDc(spark, dir))
    ).map(f => scala.concurrent.Future(f()))
    try futs.foreach(f => scala.concurrent.Await.result(f,
      scala.concurrent.duration.Duration.Inf))
    finally pool.shutdown()
  }

  private def exportBloomDc(spark: SparkSession, dir: String): Unit =
    writeExport(Decontam.bloomDecontam(spark, dir), "bloomdc", dir,
      Seq("doc_id", "n_grams", "n_flagged"))

  /** Read the export, building it first if absent (bare spec/audit runs). */
  private def ensure(spark: SparkSession, dir: String, tag: String,
      cols: Seq[String])(raw: => DataFrame): DataFrame = {
    val p = new org.apache.hadoop.fs.Path(exportPath(tag, dir))
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) writeExport(raw, tag, dir, cols)
    spark.read.parquet(exportPath(tag, dir))
  }

  private def annGate(spark: SparkSession, dir: String, fam: Fam): DataFrame = {
    val ann = ensure(spark, dir, fam.tag, Seq("q_id", "nbr_id"))(fam.raw(spark, dir))
    val exact = Similarity.bruteForceTopK(spark, dir).select("q_id", "nbr_id")
    val hits = ann.join(exact, Seq("q_id", "nbr_id")).agg(count(lit(1)).as("hits"))
    val a = ann.agg(countDistinct("q_id").as("n_q"), count(lit(1)).as("ann_rows"))
    val e = exact.agg(count(lit(1)).as("exact_rows"))
    a.crossJoin(e).crossJoin(hits) // 1-row aggs (the dq_checks allowance)
      .select(col("n_q"), col("ann_rows"), col("exact_rows"),
        (col("hits").cast("double") / col("exact_rows") >= fam.bound).as("recall_ok"))
  }

  private def bitextGate(spark: SparkSession, dir: String): DataFrame = {
    val ann = ensure(spark, dir, "bitextann", Seq("x_id", "y_id"))(
      Mining.mineBitextAnn(spark, dir))
    val exact = Mining.mineBitext(spark, dir).select("x_id", "y_id")
    val hits = ann.join(exact, Seq("x_id", "y_id")).agg(count(lit(1)).as("hits"))
    val a = ann.agg(count(lit(1)).as("ann_pairs"))
    val e = exact.agg(count(lit(1)).as("exact_pairs"))
    e.crossJoin(a).crossJoin(hits)
      .select(col("exact_pairs"), col("ann_pairs"),
        (col("hits").cast("double") / col("exact_pairs") >= BitextRecallBound).as("recall_ok"),
        ((col("ann_pairs") - col("hits")).cast("double") / col("ann_pairs")
          <= BitextExtraBound).as("extra_ok"))
  }

  private def embedLshGate(spark: SparkSession, dir: String): DataFrame = {
    val lsh = ensure(spark, dir, "embedlsh", Seq("a_id", "b_id"))(
      Dedup.embeddingCosineBucketed(spark, dir))
    val exact = Dedup.embeddingCosine(spark, dir).select("a_id", "b_id")
    val hits = lsh.join(exact, Seq("a_id", "b_id")).agg(count(lit(1)).as("hits"))
    val l = lsh.agg(count(lit(1)).as("lsh_pairs"))
    val e = exact.agg(count(lit(1)).as("exact_pairs"))
    e.crossJoin(l).crossJoin(hits)
      .select(col("exact_pairs"), col("lsh_pairs"),
        (col("hits") === col("lsh_pairs")).as("subset_ok"),
        (col("hits").cast("double") / col("exact_pairs") >= EmbedLshRecallBound).as("recall_ok"))
  }

  private def bloomGate(spark: SparkSession, dir: String): DataFrame = {
    val bloom = ensure(spark, dir, "bloomdc", Seq("doc_id", "n_grams", "n_flagged"))(
      Decontam.bloomDecontam(spark, dir))
    val exact = TextAnalysis.contamination(spark, dir)
      .select(col("doc_id"), col("n_grams").as("eg"), col("n_contaminated").as("ec"))
    bloom.join(exact, Seq("doc_id"))
      .select(col("doc_id"), col("n_grams"), col("n_flagged"),
        (col("n_grams") === col("eg")).as("grams_ok"),
        (col("n_flagged") >= col("ec")).as("fn_free"))
      .orderBy("doc_id")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] =
    annFams.map(f => f.name ->
      ((s: SparkSession, d: String) => annGate(s, d, f))).toMap ++ Map(
      "mine_bitext_ann" -> ((s: SparkSession, d: String) => bitextGate(s, d)),
      "dd_embed_cos_lsh" -> ((s: SparkSession, d: String) => embedLshGate(s, d)),
      "tx_decontam_bloom" -> ((s: SparkSession, d: String) => bloomGate(s, d)),
    )

  // ---- DuckDB sides: same exported bytes, independent exact recompute ----

  private val dotSql =
    "list_sum(list_transform(list_zip(a.embedding, b.embedding), " +
      "p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)))"

  /** Exact top-K per query — the ann_topk oracle's CTE (long-green
    * equality row, so the exact sets are cross-engine stable). */
  private def exactTopKCte: String =
    s"""scored AS (SELECT a.vec_id AS q_id, b.vec_id AS nbr_id, $dotSql AS cs
      |FROM embeddings a JOIN embeddings b ON a.vec_id <> b.vec_id
      |WHERE a.vec_id < ${Similarity.QuerySetSize}),
      |ranked AS (SELECT q_id, nbr_id,
      |ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY ROUND(cs,6) DESC, nbr_id) AS rank
      |FROM scored),
      |ex AS (SELECT q_id, nbr_id FROM ranked WHERE rank <= ${Similarity.TopK})""".stripMargin

  private def annGateSql(fam: Fam): String =
    s"""WITH ann AS (SELECT q_id, nbr_id FROM '${exportPath(fam.tag, exportedDir)}/*.parquet'),
      |$exactTopKCte
      |SELECT (SELECT CAST(COUNT(DISTINCT q_id) AS BIGINT) FROM ann) AS n_q,
      |(SELECT CAST(COUNT(*) AS BIGINT) FROM ann) AS ann_rows,
      |(SELECT CAST(COUNT(*) AS BIGINT) FROM ex) AS exact_rows,
      |(SELECT COUNT(*) FROM ann JOIN ex USING (q_id, nbr_id))::DOUBLE
      |/ (SELECT COUNT(*) FROM ex) >= ${fam.bound} AS recall_ok"""
      .stripMargin.replaceAll("\n", " ")

  /** Exact bitext pair set — the mine_bitext oracle's CTEs. */
  private def bitextExactCte: String =
    s"""p AS (SELECT a.vec_id AS x_id, b.vec_id AS y_id, $dotSql AS cs
      |FROM embeddings a JOIN embeddings b
      |ON a.label % 2 = 0 AND b.label % 2 = 1),
      |r AS (SELECT *,
      |ROW_NUMBER() OVER (PARTITION BY x_id ORDER BY cs DESC, y_id) AS rx,
      |ROW_NUMBER() OVER (PARTITION BY y_id ORDER BY cs DESC, x_id) AS ry FROM p),
      |ax AS (SELECT x_id, AVG(cs) AS ax FROM r WHERE rx <= ${Mining.MineK} GROUP BY 1),
      |ay AS (SELECT y_id, AVG(cs) AS ay FROM r WHERE ry <= ${Mining.MineK} GROUP BY 1),
      |ex AS (SELECT r.x_id, r.y_id FROM r JOIN ax USING (x_id) JOIN ay USING (y_id)
      |WHERE r.rx = 1 AND r.ry = 1
      |AND r.cs / ((ax.ax + ay.ay) / 2) >= ${Mining.MineMargin})""".stripMargin

  /** Exact embedding near-dup pairs — the dd_embed_cos oracle's join. */
  private val embedExactCte =
    s"""ex AS (SELECT a.vec_id AS a_id, b.vec_id AS b_id
      |FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
      |WHERE $dotSql >= 0.45)""".stripMargin

  /** Exact contamination counts — the tx_decontam oracle's shingle CTEs. */
  private val contamExactCte =
    """toks AS (SELECT doc_id, string_split(text,' ') t FROM documents),
      |sh AS (SELECT DISTINCT doc_id, t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS s
      |FROM toks, LATERAL (SELECT unnest(generate_series(1, len(t)-2)) i)),
      |test AS (SELECT * FROM sh WHERE doc_id % 10 = 0),
      |train AS (SELECT DISTINCT s FROM sh WHERE doc_id % 10 <> 0),
      |ex AS (SELECT t.doc_id, CAST(COUNT(*) AS BIGINT) AS eg,
      |CAST(SUM(CASE WHEN tr.s IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS ec
      |FROM test t LEFT JOIN train tr ON t.s = tr.s GROUP BY 1)""".stripMargin

  def oracleSql: Map[String, String] =
    annFams.map(f => f.name -> annGateSql(f)).toMap ++ Map(
      "mine_bitext_ann" ->
        s"""WITH ann AS (SELECT x_id, y_id FROM '${exportPath("bitextann", exportedDir)}/*.parquet'),
          |$bitextExactCte
          |SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM ex) AS exact_pairs,
          |(SELECT CAST(COUNT(*) AS BIGINT) FROM ann) AS ann_pairs,
          |(SELECT COUNT(*) FROM ann JOIN ex USING (x_id, y_id))::DOUBLE
          |/ (SELECT COUNT(*) FROM ex) >= $BitextRecallBound AS recall_ok,
          |((SELECT COUNT(*) FROM ann) - (SELECT COUNT(*) FROM ann JOIN ex USING (x_id, y_id)))::DOUBLE
          |/ (SELECT COUNT(*) FROM ann) <= $BitextExtraBound AS extra_ok"""
          .stripMargin.replaceAll("\n", " "),
      "dd_embed_cos_lsh" ->
        s"""WITH lsh AS (SELECT a_id, b_id FROM '${exportPath("embedlsh", exportedDir)}/*.parquet'),
          |$embedExactCte
          |SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM ex) AS exact_pairs,
          |(SELECT CAST(COUNT(*) AS BIGINT) FROM lsh) AS lsh_pairs,
          |(SELECT COUNT(*) FROM lsh JOIN ex USING (a_id, b_id)) = (SELECT COUNT(*) FROM lsh) AS subset_ok,
          |(SELECT COUNT(*) FROM lsh JOIN ex USING (a_id, b_id))::DOUBLE
          |/ (SELECT COUNT(*) FROM ex) >= $EmbedLshRecallBound AS recall_ok"""
          .stripMargin.replaceAll("\n", " "),
      "tx_decontam_bloom" ->
        s"""WITH bl AS (SELECT doc_id, n_grams, n_flagged FROM '${exportPath("bloomdc", exportedDir)}/*.parquet'),
          |$contamExactCte
          |SELECT bl.doc_id, bl.n_grams, bl.n_flagged,
          |bl.n_grams = ex.eg AS grams_ok,
          |bl.n_flagged >= ex.ec AS fn_free
          |FROM bl JOIN ex USING (doc_id) ORDER BY bl.doc_id"""
          .stripMargin.replaceAll("\n", " "),
    )
}

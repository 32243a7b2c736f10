package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Bloom-filter decontamination — the approximate sibling of
  * [[TextAnalysis.contamination]]'s exact shingle join (the GPT-3 paper's
  * eval decontamination ran exactly this way: a membership filter over
  * train n-grams, Brown et al. 2020 §C).
  *
  * Plan-shape tradeoff, stated honestly:
  *   - The EXACT form shuffles both shingle sides of an equi join —
  *     unavoidable when the train side's distinct-shingle set outgrows
  *     executor memory (~10¹⁰ shingles ≈ 12 GB of bloom bits at 1% fpp).
  *   - This BLOOM form aggregates the train shingles into an O(bits)
  *     sketch (distributed build: per-partition filters OR-merged — order
  *     insensitive, so the result is deterministic), broadcasts it, and
  *     probes the TEST side in place: the test corpus never shuffles at
  *     all. For the standard case — train is the 100 TB side, test is an
  *     eval suite probed constantly — this turns every re-check into a
  *     scan-bound map job.
  *   - Errors are ONE-SIDED: no false negatives ever (a contaminated
  *     shingle is always flagged — DecontamSpec asserts flagged ⊇ exact
  *     per document), false positives bounded by fpp.
  * The sketch library hashes with a fixed Murmur3 seed and the merge is
  * a bitset OR, so the sketch — and this operator's output — is
  * bit-reproducible regardless of partitioning (built via [[Blooms]],
  * which also avoids `stat.bloomFilter`'s silent 4M-item clamp). No SQL
  * expression exists for the sketch (rows-only driver check; the exact
  * join tx_contamination is the oracled sibling).
  */
object Decontam {

  /** Per-test-document flagged-shingle counts from a bloom built over the
    * train split (doc_id mod 10 partitioning, matching contamination). */
  def bloomDecontam(spark: SparkSession, dir: String, fpp: Double = 0.01): DataFrame = {
    val sh = PersistSlots.cached(spark, s"ngram-shingles:$dir")(
      Dedup.shingles(spark, dir))
    val train = sh.filter(col("doc_id") % 10 =!= 0).select("s")
    // size the filter on the distinct-shingle estimate (HLL, one cheap
    // pass with map-side partials) — the exact count would cost a shuffle
    val est = train.agg(approx_count_distinct("s").as("n"))
      .collect()(0).getLong(0)
    // Blooms, not stat.bloomFilter: the SQL aggregate's silent 4M-item /
    // 67M-bit clamp would saturate on a real train split (billions of
    // shingles) and flag EVERY test gram — a correctness cliff here, not
    // just lost pruning (the one-sided-error contract survives only
    // because fp→1 keeps it vacuous)
    val bloom = Blooms.ofStrings(train, col("s"), est, fpp)
    val bc = spark.sparkContext.broadcast(bloom)
    val might = udf((s: String) => bc.value.mightContainString(s))
    sh.filter(col("doc_id") % 10 === 0)
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_grams"),
        sum(when(might(col("s")), lit(1L)).otherwise(lit(0L))).as("n_flagged"))
      .withColumn("ratio", col("n_flagged").cast("double") / col("n_grams"))
      .orderBy("doc_id")
  }

  /** Contamination-ratio threshold above which a test document is dropped
    * (sits near the fixture's median ratio so the verdict split is
    * non-trivial at oracle SF). */
  val MaxRatio = 0.6

  /** The decontamination VERDICT frame computed by EXACT membership — the
    * oracled sibling of [[bloomDecontam]] (the bloom's false positives
    * make its counts sketch-dependent; the verdict contract — which docs
    * ship — is exact and fully SQL-expressible, reusing the same shingle
    * family as tx_contamination). DecontamSpec ties the two: the bloom's
    * one-sided error means every exact-dropped doc is also bloom-dropped. */
  def decontamVerdicts(spark: SparkSession, dir: String,
      maxRatio: Double = MaxRatio): DataFrame =
    TextAnalysis.contamination(spark, dir)
      .withColumn("keep", col("ratio") <= maxRatio)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // tx_decontam_bloom is registered in [[RecallGates]] since r7: the
    // sketch counts are fpp-dependent by design, and the gate form
    // (exported per-doc counts + both engines checking the one-sided-
    // error law against an independent exact recompute) is
    // driver-ORACLED instead of rows-only
    "tx_decontam" -> ((s: SparkSession, d: String) => decontamVerdicts(s, d)),
  )

  val oracleSql: Map[String, String] = Map(
    "tx_decontam" ->
      s"""WITH toks AS (SELECT doc_id, string_split(text,' ') t FROM documents),
        |sh AS (SELECT DISTINCT doc_id, t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS s
        |FROM toks, LATERAL (SELECT unnest(generate_series(1, len(t)-2)) i)),
        |test AS (SELECT * FROM sh WHERE doc_id % 10 = 0),
        |train AS (SELECT DISTINCT s FROM sh WHERE doc_id % 10 <> 0)
        |SELECT t.doc_id, CAST(COUNT(*) AS BIGINT) AS n_grams,
        |CAST(SUM(CASE WHEN tr.s IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_contaminated,
        |CAST(SUM(CASE WHEN tr.s IS NOT NULL THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*) AS ratio,
        |(CAST(SUM(CASE WHEN tr.s IS NOT NULL THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*)) <= $MaxRatio AS keep
        |FROM test t LEFT JOIN train tr ON t.s = tr.s
        |GROUP BY 1 ORDER BY 1""".stripMargin.replaceAll("\n", " "),
  )
}

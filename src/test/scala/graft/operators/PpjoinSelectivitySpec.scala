package graft.operators

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** PPJoin filter selectivity as an EXECUTABLE assertion (the GraphOpsSpec
  * wedge-gate lesson applied to the set-similarity join): the fixture
  * corpus's flat 31-token vocabulary makes every within-replica pair
  * mid-overlap, so there the prefix postings are long and the positional
  * filter prunes little (documented in BENCH_NOTES r9). This spec builds
  * the ZIPF-SHAPED regime the published algorithm targets — a skewed
  * vocabulary with three document-frequency tiers — and asserts each
  * filter's MEASURED effect, so a regression that silently disables a
  * prune (the r8 saturated-bloom class: output-identical, quadratically
  * slower) fails a test instead of needing a manual decade probe.
  *
  * Corpus: 12 groups × 10 docs. Every doc carries 16 corpus-wide
  * boilerplate tokens (pure-boiler shingles ⇒ df = 120), 6 group tokens
  * (group-tier shingles ⇒ df = 10), and 14 doc-unique content tokens
  * (df = 1; the first two docs of each group are IDENTICAL, making their
  * content tier df = 2 — the 12 planted exact-dup pairs). Each doc has
  * 34 distinct shingles, so at τ = 0.5 the prefix is 18 shingles: the
  * full content tier plus 4 group-tier shingles — and NO boilerplate.
  *
  * The three measured claims:
  *   1. frequency ordering alone keeps corpus-wide boilerplate out of
  *      EVERY prefix (no stop-list needed): without it, 14 pure-boiler
  *      shingles with df = 120 would each post a 120-doc list ⇒ all
  *      C(120,2) = 7140 pairs become candidates;
  *   2. the prefix join therefore yields only within-group candidates
  *      (45 per group × 12 = 540 pairs), and the POSITIONAL filter then
  *      prunes every non-qualifying one: group pairs share their first
  *      prefix shingle at position 15, so overlap ≤ 1 + (34−15) = 20 <
  *      ⌈τ/(1+τ)·68⌉ = 23 — only the 12 planted pairs survive to verify;
  *   3. losslessness on this skewed corpus: the full operator's output
  *      equals an independently computed exact j ≥ τ pair set.
  */
class PpjoinSelectivitySpec extends SparkSpec {

  private lazy val dir: String = {
    import spark.implicits._
    val boiler = (0 until 16).map(k => s"b$k").mkString(" ")
    val rows = (0 until 120).map { i =>
      val grp = i / 10
      // first two docs of each group share one content block (df = 2)
      val contentOwner = if (i % 10 == 1) i - 1 else i
      val content = (0 until 14).map(k => s"u${contentOwner}x$k").mkString(" ")
      val medium = (0 until 6).map(k => s"g${grp}x$k").mkString(" ")
      (i.toLong, s"$content $medium $boiler")
    }
    val d = Files.createTempDirectory("ppjoin_zipf").toString
    rows.toDF("doc_id", "text")
      .selectExpr("doc_id", "text", "'xx' AS lang", "'src0' AS source",
        "CAST(length(text) AS BIGINT) AS n_chars")
      .coalesce(1)
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    d
  }

  private lazy val sh =
    PersistSlots.cached(spark, s"ppjoin-shingles:$dir")(Dedup.shingles(spark, dir))
  private lazy val prefix = SimilarityJoin.prefixFrame(spark, dir, sh)

  /** Exact j ≥ τ pairs by brute-force shingle self-join — the oracle the
    * operator's own DuckDB gate uses, recomputed independently here. */
  private lazy val exactPairs: Set[(Long, Long)] = {
    val sizes = sh.groupBy("doc_id").agg(count(lit(1)).as("n"))
    sh.select(col("doc_id").as("a_id"), col("s"))
      .join(sh.select(col("doc_id").as("b_id"), col("s")), Seq("s"))
      .filter(col("a_id") < col("b_id"))
      .groupBy("a_id", "b_id").agg(count(lit(1)).as("c"))
      .join(sizes.select(col("doc_id").as("a_id"), col("n").as("na")), Seq("a_id"))
      .join(sizes.select(col("doc_id").as("b_id"), col("n").as("nb")), Seq("b_id"))
      .filter(col("c") / (col("na") + col("nb") - col("c")) >= SimilarityJoin.Tau)
      .select("a_id", "b_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
  }

  test("corpus sanity: three df tiers, 34 shingles/doc, 12 planted exact-dup pairs") {
    val tiers = prefixTiers(sh)
    assert(tiers === Set(1L, 2L, 10L, 120L), s"df tiers: $tiers")
    val ns = sh.groupBy("doc_id").agg(count(lit(1)).as("n"))
      .select("n").distinct().collect().map(_.getLong(0)).toSet
    assert(ns === Set(34L), s"per-doc shingle counts: $ns")
    assert(exactPairs === (0 until 12).map(g => (10L * g, 10L * g + 1)).toSet)
  }

  private def prefixTiers(frame: org.apache.spark.sql.DataFrame): Set[Long] =
    frame.groupBy("s").agg(count(lit(1)).as("df"))
      .select("df").distinct().collect().map(_.getLong(0)).toSet

  test("frequency ordering keeps every corpus-wide boilerplate shingle out of every prefix") {
    val nDocs = 120L
    // pure-boiler shingles exist (df = corpus size)...
    val boilerShingles = sh.groupBy("s").agg(count(lit(1)).as("df"))
      .filter(col("df") === nDocs).count()
    assert(boilerShingles === 14L, s"pure-boiler shingles: $boilerShingles")
    // ...and not one of them survives into any prefix row
    val inPrefix = prefix.filter(col("df") === nDocs).count()
    assert(inPrefix === 0L,
      s"$inPrefix boilerplate postings entered a prefix — the rare-first " +
        "ordering (the no-stop-list quadratic protection) is broken")
  }

  test("prefix join yields only within-group candidates; positional filter prunes every non-qualifying one") {
    val shared = SimilarityJoin.sharedCandidates(prefix)
    val sharedPairs = shared.select("a_id", "b_id").distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // claim 1's consequence, measured: candidates = within-group only
    // (540 = 12 × C(10,2)), nowhere near the all-pairs 7140 a flat
    // posting list would produce
    assert(sharedPairs.size === 540, s"shared candidate pairs: ${sharedPairs.size}")
    assert(sharedPairs.forall { case (a, b) => a / 10 == b / 10 },
      "a cross-group pair entered the candidate set — boilerplate leaked into a prefix")

    // claim 2, measured: the positional filter's survivors are EXACTLY
    // the qualifying pairs — 97.8% of candidates pruned before verify
    val survivors = SimilarityJoin.positionalSurvivors(shared)
      .select("a_id", "b_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(survivors === exactPairs,
      s"positional survivors ${survivors.size} != qualifying pairs ${exactPairs.size} — " +
        "the filter is either lossy (missing pairs) or inert (the r8 silent-prefilter class)")
  }

  test("losslessness on the Zipf corpus: full operator output equals the exact pair set, j = 1 on planted dups") {
    val out = SimilarityJoin.ppjoinPairs(spark, dir)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    assert(out.keySet === exactPairs)
    assert(out.values.forall(_ == 1.0), s"planted exact dups must score j = 1.0: $out")
  }
}

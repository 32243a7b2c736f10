package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Prefix-filtering set-similarity join (the PPJoin candidate rule of
  * Xiao, Wang, Lin & Yu, WWW 2008 §3; also AllPairs, Bayardo et al. WWW
  * 2007) — the EXACT-result alternative to MinHash-LSH banding for the
  * same "all pairs with Jaccard ≥ τ" question.
  *
  * Where LSH trades recall for candidate volume (a banding miss is a
  * false negative the verify step can't recover), prefix filtering is
  * LOSSLESS: order each document's shingle set by ascending global
  * document frequency (rarest first) and keep only its first
  * |d| − ⌈τ·|d|⌉ + 1 shingles as its *prefix*. Any pair with
  * Jaccard ≥ τ must share ≥ ⌈τ·|d|⌉ shingles, which cannot all hide in
  * the ≤ ⌈τ·|d|⌉ − 1 shingles outside the prefix — so every qualifying
  * pair shares a prefix shingle and the candidate set provably covers
  * the answer. Because prefixes hold the RAREST shingles, the inverted
  * index the candidates come from has short posting lists exactly where
  * the join happens — boilerplate shingles (the quadratic-blowup risk of
  * a naive shingle self-join) are pushed out of every prefix by the
  * frequency ordering itself, no stop-shingle cap needed.
  *
  * Scale shape at 100 TB: document-frequency table (hash agg), one
  * per-doc window for the frequency ordering (state ∝ document shingle
  * count), prefix-posting self-join on the rare-shingle key (short
  * lists), a length filter (τ·max ≤ min is necessary for j ≥ τ), the
  * POSITIONAL filter (PPJoin's own candidate prune — overlap bounded by
  * the first shared shingle's positions), then exact verification ∝
  * candidates — in-row over broadcast packed shingle arrays while the
  * corpus fits the JoinBacks budget (the r9 rework: the per-shingle
  * fan-out verify re-exchanged cand × |A| rows by (b_id, s) — 211 M
  * records at 10×, 87% of the operator's shuffle and 221× the sf0.1
  * volume, caught by the r9 decade probe), per-shingle fan-out past it.
  * Registered as dd_ppjoin with the SAME exact-pair-set oracle as
  * dd_ngram_jaccard: a single missed candidate fails the gate, making
  * the lossless-ness a tested claim, not a comment.
  */
object SimilarityJoin {

  /** Jaccard threshold shared with the Dedup family. */
  val Tau = 0.5

  /** Conservative in-memory bytes per packed shingle row (a ~20-char
    * 3-gram string + array-element and hash-slot overhead) — the sizing
    * input for broadcasting the packed verify tables. */
  val PackedShingleBytes = 64L

  /** The slot-materialized rare-first prefix frame: per-doc ascending
    * (df, s) order, prefix = first n − ⌈τ·n⌉ + 1. pos (the shingle's
    * rank in the doc's FULL ordered list) and df ride along: the
    * positional filter needs both. Slot-materialized (the winnow-fps
    * lesson): the self-join consumes it twice, and un-persisted the
    * whole df-join + window pipeline executes once per side — 4 extra
    * shingle-keyed exchanges measured at 10×. Exposed per stage (with
    * [[sharedCandidates]]/[[positionalSurvivors]]) so
    * PpjoinSelectivitySpec can assert each filter's MEASURED effect on
    * a Zipf-vocabulary corpus, not just the mechanism's presence. */
  private[operators] def prefixFrame(spark: SparkSession, dir: String,
      sh: DataFrame): DataFrame = {
    val sizes = sh.groupBy("doc_id").agg(count(lit(1)).as("n"))
    // global document frequency per shingle — the ordering key that makes
    // prefixes rare-first (and posting lists short where it matters)
    val freq = sh.groupBy("s").agg(count(lit(1)).as("df"))
    val pos = row_number().over(Window.partitionBy("doc_id").orderBy("df", "s"))
    PersistSlots.cached(spark, s"ppjoin-prefix:$dir")(
      sh.join(freq, Seq("s"))
        .join(sizes, Seq("doc_id"))
        .withColumn("pos", pos)
        .filter(col("pos") <= col("n") - ceil(col("n") * lit(Tau)).cast("long") + 1)
        .select(col("doc_id"), col("s"), col("df"), col("pos"), col("n")))
  }

  /** Candidate rows (one per shared prefix shingle): pairs sharing a
    * prefix shingle, plus the length filter
    * (j ≥ τ ⇒ τ·max(|A|,|B|) ≤ min(|A|,|B|)). The r10 rework dropped
    * `df` from the join payload — it ordered [[positionalSurvivors]]'
    * former min_by, which the per-row filter form no longer needs. */
  private[operators] def sharedCandidates(prefix: DataFrame): DataFrame =
    prefix
      .select(col("doc_id").as("a_id"), col("s"),
        col("pos").as("ia"), col("n").as("na"))
      .join(prefix.select(col("doc_id").as("b_id"), col("s"),
        col("pos").as("ib"), col("n").as("nb")), Seq("s"))
      .filter(col("a_id") < col("b_id") &&
        least(col("na"), col("nb")) >= lit(Tau) * greatest(col("na"), col("nb")))

  /** POSITIONAL filter (the "PP" of Xiao et al. §3.2, relational form à
    * la Vernica et al. SIGMOD 2010): both docs' shingle lists follow the
    * same global (df, s) total order, so the pair's FIRST shared prefix
    * shingle has no shared shingle before it in either list, and total
    * overlap ≤ 1 + min(na − ia, nb − ib) at its positions. j ≥ τ needs
    * overlap ≥ ⌈τ/(1+τ)·(na+nb)⌉; pairs whose bound falls short are
    * pruned BEFORE the verify step ever sees them.
    *
    * Per-ROW form (r10): the bound is applied to EVERY shared-prefix
    * row and a pair survives iff any row passes. This is exactly the
    * first-shared-shingle rule it replaces — shared rows appear in the
    * same relative order in both docs (one global order), so the first
    * shared row has the MINIMAL ia and ib of the pair, i.e. the maximal
    * bound: some row passes iff the first row passes. What the rewrite
    * buys (guide §2.3): the filter now sits BEFORE the pair exchange
    * (only passing rows cross; the min_by form shipped every candidate
    * row into the aggregate), and the per-row min_by(struct, struct) —
    * two struct allocations per candidate row, the measured hot spot of
    * the 61 CPU-s candidate stage at sf0.1 — disappears; the remaining
    * pair dedup is a plain distinct.
    *
    * Integer-vs-real comparison (k ≥ x ⟺ k ≥ ⌈x⌉) with the constant
    * τ/(1+τ) rounding DOWN in IEEE — borderline pairs are kept, never
    * lost, so FP cannot break the losslessness the oracle checks. */
  private[operators] def positionalSurvivors(shared: DataFrame): DataFrame =
    shared
      .filter(lit(1) + least(col("na") - col("ia"), col("nb") - col("ib")) >=
        (col("na") + col("nb")) * lit(Tau / (1 + Tau)))
      .select("a_id", "b_id", "na", "nb")
      .distinct()

  /** Exact j ≥ τ near-dup pairs via prefix filtering + positional filter
    * + exact verify. */
  def ppjoinPairs(spark: SparkSession, dir: String): DataFrame = {
    val shKey = s"ppjoin-shingles:$dir"
    val sh = PersistSlots.cached(spark, shKey)(Dedup.shingles(spark, dir))
    val prefix = prefixFrame(spark, dir, sh)
    val cand = positionalSurvivors(sharedCandidates(prefix))

    // exact verification ∝ candidates. Two shapes (the JoinBacks branch):
    //   - packed broadcast (default while the corpus fits): per-doc
    //     sorted shingle arrays ship TO the candidate stream and the
    //     intersection computes in-row — no verify exchange at all. The
    //     per-shingle fan-out alternative exchanged cand × |A| rows
    //     re-keyed by (b_id, s): 211 M records at 10×, 87% of the
    //     operator's total shuffle (BENCH_NOTES r9);
    //   - fan-out (past the broadcast budget): the id-keyed per-shingle
    //     join — linear in candidate-shingle rows, never wide rows
    //     through an exchange, the 100 TB fallback.
    // unknown count (a cleared slot) must force the FALLBACK, not a
    // sentinel multiplication: Long.MaxValue × width overflows NEGATIVE
    // and would have sailed through the fits() guard as "free to
    // broadcast" (r9 review find; fits() now also rejects negatives)
    val packedFits = PersistSlots.rowCount(spark, shKey)
      .exists(n => JoinBacks.fits(spark, n * PackedShingleBytes, sides = 2))
    val inter =
      if (packedFits) {
        // ONE broadcast relation for both sides (r9): per-side aliased
        // projections canonicalize differently and ReuseExchange could
        // not fire — each pass aggregated + shipped the packed table
        // twice; joining the same un-aliased frame twice makes the
        // second BroadcastExchange a ReusedExchange. Slot-materialized:
        // the pack aggregation (collect_list + sort per doc) otherwise
        // re-runs inside every pass's broadcast build; the slot only
        // exists when packedFits, so its footprint is budget-bounded.
        val packed = broadcast(PersistSlots.cached(spark,
          s"packed-shingles:$dir")(sh.groupBy("doc_id")
          .agg(sort_array(collect_list(col("s"))).as("ss"))))
        // the intersection scalar runs as a codegen two-pointer walk over
        // the sorted arrays (graft_sorted_intersect_count) — the
        // array_intersect HOF builds a per-row hash set + output array,
        // which dominated the operator once the exchanges were gone
        cand
          .join(packed, col("a_id") === col("doc_id"))
          .select(col("a_id"), col("b_id"), col("na"), col("nb"), col("ss").as("sa"))
          .join(packed, col("b_id") === col("doc_id"))
          .select(col("a_id"), col("b_id"), col("na"), col("nb"),
            graft.plans.SetOps.sortedIntersectCount(col("sa"), col("ss")).as("c"))
      } else {
        cand
          .join(sh.select(col("doc_id").as("a_id"), col("s")), Seq("a_id"))
          .join(sh.select(col("doc_id").as("b_id"), col("s")), Seq("b_id", "s"))
          .groupBy("a_id", "b_id", "na", "nb").agg(count(lit(1)).as("c"))
      }

    inter
      .withColumn("j", col("c") / (col("na") + col("nb") - col("c")))
      .filter(col("j") >= Tau)
      .select(col("a_id"), col("b_id"), round(col("j"), 4).as("j"))
      .orderBy("a_id", "b_id")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // equality-oracled vs the EXACT pair set: lossless-ness is the gate
    "dd_ppjoin" -> ppjoinPairs _,
  )

  val oracleSql: Map[String, String] = Map(
    // identical oracle to dd_ngram_jaccard — the exact j ≥ 0.5 pair set
    "dd_ppjoin" -> Dedup.oracleSql("dd_ngram_jaccard"),
  )
}

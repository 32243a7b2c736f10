package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Deduplication operators for large-scale text/embedding corpora
  * (north-star extension; SURVEY.md §2.F/§2.G G20–G21).
  *
  * All variants are pure Column-API pipelines (whole-stage codegen, no UDFs):
  * cross-engine determinism comes from md5 hex strings as the hash family,
  * which both Spark and the DuckDB oracle compute identically.
  *
  * Scale design (100 TB): exact dedup and minhash-LSH shuffle on *hash keys*
  * (uniformly distributed — no skew); the only quadratic operator is the
  * exact-pair verification, which is always gated behind a candidate
  * generator (LSH bands) so the pair space is tiny. The brute-force pair
  * queries exist as oracles for the small-SF gate, not as the scale path.
  */
object Dedup {

  /** Word tokens of documents.text. */
  private def tokens: Column = split(col("text"), " ")

  /** Distinct word-level 3-gram shingles per document: (doc_id, s).
    * Package-visible: TextAnalysis.contamination reuses the same shingle
    * family so both operators agree on what "an n-gram" is. */
  private[operators] def shingles(spark: SparkSession, dir: String): DataFrame = {
    val t = tokens
    Tables.spread(spark, Tables.documents(spark, dir))
      .select(col("doc_id"),
        explode(array_distinct(
          when(size(t) >= 3,
            transform(sequence(lit(0), size(t) - 3), i =>
              concat_ws(" ", element_at(t, i + 1), element_at(t, i + 2), element_at(t, i + 3))))
            .otherwise(array().cast("array<string>")))).as("s"))
  }

  /** Exact dedup by content hash: one group per md5(text) with survivor
    * (min doc_id) and multiplicity — the hash-groupBy pattern that scales to
    * any corpus size (shuffle key = uniform md5). */
  def exact(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .groupBy(md5(col("text")).as("h"))
      .agg(count(lit(1)).as("c"), min("doc_id").as("keep"))
      .orderBy("h")

  /** Exact n-gram Jaccard near-dup pairs (j ≥ 0.5): shingle inverted index →
    * self-join on shingle → |∩| / (|A|+|B|−|∩|). The shingle join is the
    * scale bottleneck by design — this is the *oracle* form; minhashLsh below
    * is the 100 TB path. */
  def ngramJaccard(spark: SparkSession, dir: String): DataFrame =
    ngramJaccardImpl(spark, dir, maxShingleDocFreq = Int.MaxValue)

  /** The exact-pair form with optional stop-shingle protection: shingles
    * appearing in more than `maxShingleDocFreq` documents are excluded
    * from the inverted-index join (but still count toward |A|,|B|). At
    * 100 TB a boilerplate shingle shared by millions of docs would
    * otherwise create a single quadratic join group — this caps the
    * worst-case group size at maxShingleDocFreq² while only *lowering*
    * |∩| (a document pair sharing nothing but boilerplate drops out,
    * which is the intended semantics of stop-shingling). The declared
    * oracle query runs without the cap (exact). */
  def ngramJaccardImpl(spark: SparkSession, dir: String,
      maxShingleDocFreq: Int): DataFrame = {
    // MEMORY_AND_DISK (via the memoized slot), not MEMORY_ONLY: at 100 TB
    // the exploded shingle frame exceeds executor memory, and MEMORY_ONLY
    // eviction would silently recompute the md5 fan-out for each of the
    // 3 plan branches; the slot also shares one materialized frame across
    // repeated invocations
    val sh = PersistSlots.cached(spark, s"ngram-shingles:$dir")(shingles(spark, dir))
    val sizes = sh.groupBy("doc_id").agg(count(lit(1)).as("n"))
    val joinable =
      if (maxShingleDocFreq == Int.MaxValue) sh
      else {
        val df = sh.groupBy("s").agg(count(lit(1)).as("docfreq"))
          .filter(col("docfreq") <= maxShingleDocFreq)
        sh.join(df.select("s"), Seq("s"))
      }
    val a = joinable.select(col("doc_id").as("a_id"), col("s"))
    val b = joinable.select(col("doc_id").as("b_id"), col("s"))
    val inter = a.join(b, Seq("s")).filter(col("a_id") < col("b_id"))
      .groupBy("a_id", "b_id").agg(count(lit(1)).as("c"))
    inter
      .join(sizes.select(col("doc_id").as("a_id"), col("n").as("na")), Seq("a_id"))
      .join(sizes.select(col("doc_id").as("b_id"), col("n").as("nb")), Seq("b_id"))
      .withColumn("j", col("c") / (col("na") + col("nb") - col("c")))
      .filter(col("j") >= 0.5)
      .select(col("a_id"), col("b_id"), round(col("j"), 4).as("j"))
      .orderBy("a_id", "b_id")
  }

  /** Tokens per span for spanDedup (non-overlapping chunks). */
  val SpanTokens = 10

  /** C4-style span-level exact dedup (Raffel et al., JMLR 2020 §2.2
    * deduplicates three-sentence spans; this is the k-token-chunk variant
    * for corpora without sentence structure): each document is cut into
    * non-overlapping SpanTokens-token chunks, and every chunk whose exact
    * text already occurred earlier in the corpus — ordered by
    * (doc_id, span_idx) — is removed. Output per doc: span counts and the
    * surviving text (NULL when every span was seen before, i.e. the whole
    * document is assembled from earlier content).
    *
    * Scale shape: first-occurrence is `min(struct(doc_id, span_idx))`
    * grouped by span — a hash aggregate with map-side partial combine, so
    * a boilerplate span repeated 10⁸ times collapses to one row per map
    * partition BEFORE the shuffle (a row_number window over the same
    * partition key would instead sort the full 10⁸-row group on one
    * reducer). The join back to chunks shuffles both sides on the span
    * hash — uniform unless one span dominates, which the partial agg
    * already absorbed on the build side. */
  def spanDedup(spark: SparkSession, dir: String): DataFrame = {
    val t = tokens
    val chunks = Tables.spread(spark, Tables.documents(spark, dir))
      .select(col("doc_id"), posexplode(
        transform(sequence(lit(0L), ceil(size(t) / lit(SpanTokens.toDouble)) - 1),
          i => array_join(slice(t, (i * SpanTokens + 1).cast("int"), lit(SpanTokens)), " ")))
        .as(Seq("span_idx", "span")))
    val firsts = chunks.groupBy("span")
      .agg(min(struct(col("doc_id"), col("span_idx"))).as("first"))
    chunks.join(firsts, Seq("span"))
      .withColumn("is_dup",
        col("first.doc_id") =!= col("doc_id") || col("first.span_idx") =!= col("span_idx"))
      .groupBy("doc_id")
      .agg(
        count(lit(1)).as("n_spans"),
        sum(when(col("is_dup"), 1L).otherwise(0L)).as("n_dup_spans"),
        collect_list(when(!col("is_dup"), struct(col("span_idx"), col("span")))).as("kept"))
      .select(col("doc_id"), col("n_spans"), col("n_dup_spans"),
        when(size(col("kept")) === 0, lit(null).cast("string"))
          .otherwise(array_join(transform(sort_array(col("kept")), x => x("span")), " "))
          .as("text_dedup"))
      .orderBy("doc_id")
  }

  val MinhashFuncs = 16
  val MinhashBands = 4 // 4 bands × 4 rows

  /** Per-doc minhash signature columns mh0..mh15: MIN(md5("<seed>:"||shingle)).
    * One groupBy computes all 16 mins in a single pass (partial+final agg).
    *
    * Deliberately md5-per-seed (16 independent hash functions), NOT
    * Kirsch–Mitzenmacher g_i = h1 + i·h2 double hashing: measured on this
    * corpus, the linear family shares its argmin shingle across i (a
    * shingle with small h1 AND h2 wins every function), inflating the
    * match estimate — candidate pairs at est ≥ 0.5 went 25 → 101. The
    * md5 cost is parallelized by the repartition in shingles(). */
  private def signatures(spark: SparkSession, dir: String): DataFrame = {
    val aggs = (0 until MinhashFuncs).map(i =>
      min(md5(concat(lit(s"$i:"), col("s")))).as(s"mh$i"))
    shingles(spark, dir).groupBy("doc_id").agg(aggs.head, aggs.tail: _*)
  }

  /** MinHash signature table (the reusable artifact: at scale it is computed
    * once and persisted; candidate generation joins signatures, never text). */
  def minhashSignatures(spark: SparkSession, dir: String): DataFrame =
    signatures(spark, dir)
      .select(col("doc_id") +: (0 until MinhashFuncs).map(i => col(s"mh$i")): _*)
      .orderBy("doc_id")

  /** xxhash64-seeded minhash signatures — the 100 TB hashing path: one
    * codegen'd 64-bit xxhash per (seed, shingle) instead of an md5 hex
    * string (no 32-char string materialization, no hex encode). Seeding
    * via a leading literal column gives 16 independent functions, same
    * estimator family as the md5 form. NOT in the oracle set (DuckDB's
    * hash() is a different xxhash flavor) — spec'd against the md5
    * family's near-dup pairs instead. */
  private def signaturesFast(spark: SparkSession, dir: String): DataFrame = {
    val aggs = (0 until MinhashFuncs).map(i =>
      min(xxhash64(lit(i), col("s"))).as(s"mh$i"))
    shingles(spark, dir).groupBy("doc_id").agg(aggs.head, aggs.tail: _*)
  }

  /** MinHash + LSH banding near-dup pairs: candidates = docs sharing one
    * full band (4 of 4 sig rows equal), verified by estimated Jaccard
    * (matching sigs / 16) ≥ 0.5. The band join is an *equi* join on
    * (band_idx, band_hash) — shuffle on a uniform key, no cross product
    * anywhere: this is the shape that survives 100 TB. */
  def minhashLsh(spark: SparkSession, dir: String): DataFrame =
    lshPairs(spark, s"lsh-md5:$dir", signatures(spark, dir), parts => md5(concat(parts: _*)))

  /** The xxhash64 form of the near-dup pipeline — the full 100 TB shape:
    * cheap 64-bit banded candidate generation (see signaturesFast),
    * then EXACT n-gram Jaccard verification on the candidates only (the
    * production LSH-then-verify pattern: verification cost ∝ candidates
    * × doc length, never corpus²). Because the verification measure is
    * exact Jaccard — not an engine-internal hash estimate — the output
    * is DuckDB-oracled against the full exact-Jaccard pair set: the gate
    * asserts the banding missed NOTHING at the 0.5 threshold on this
    * corpus, a strictly stronger check than the r2 pair-overlap spec. */
  def minhashLshFast(spark: SparkSession, dir: String): DataFrame =
    minhashLshFastCore(spark, dir).orderBy("a_id", "b_id")

  /** The unsorted pair set behind [[minhashLshFast]] — internal consumers
    * ([[cluster]]'s edge feed) read this form: the registered query's
    * presentation `orderBy` is a global sort (range exchange) that a
    * downstream groupBy/union immediately destroys. */
  private def minhashLshFastCore(spark: SparkSession, dir: String): DataFrame = {
    // 8 bands x 2 rows, NOT the md5 family's 4x4: the banding threshold
    // (1/b)^(1/r) must sit BELOW the verified j >= 0.5 contract (4x4's
    // ~0.71 left a ~1.4% per-pair miss rate at j = 0.9, and the equality
    // oracle caught exactly such a miss); 8x2's ~0.35 pushes the miss
    // probability at j >= 0.9 under 2e-6, at the cost of more (still
    // exact-verified) candidates.
    val cand = lshCandidates(spark, s"lsh-xxh:$dir",
      signaturesFast(spark, dir), parts => xxhash64(parts: _*), nBands = 8)
    verifyJaccard(spark, dir, cand, "a_id", "b_id")
  }

  /** Exact Jaccard (j ≥ 0.5) verification of an (aCol, bCol) candidate
    * pair frame against the corpus shingle sets — the shared verify tail
    * of [[minhashLshFastCore]] and [[incrementalPairs]].
    *
    * Two shapes, the [[SimilarityJoin.ppjoinPairs]] JoinBacks branch
    * (r9): while the packed per-doc sorted shingle arrays fit the
    * broadcast budget, they ship TO the candidate stream and the
    * intersection computes in-row (codegen two-pointer walk) — no
    * verify exchange, and |A|/|B| read off the packed arrays, dropping
    * the two sizes joins. Past the budget, the per-shingle fan-out form
    * (cand ⋈ shingles(a) ⋈ shingles(b, s) → pair hash agg) — linear in
    * candidate-shingle rows, never wide rows through an exchange — is
    * the 100 TB fallback. Shingle sets are distinct per doc, so the
    * in-row intersect count equals the fan-out join count row for row. */
  private def verifyJaccard(spark: SparkSession, dir: String,
      cand: DataFrame, aCol: String, bCol: String): DataFrame = {
    val shKey = s"ngram-shingles:$dir"
    val sh = PersistSlots.cached(spark, shKey)(shingles(spark, dir))
    val packedFits = PersistSlots.rowCount(spark, shKey)
      .exists(n => JoinBacks.fits(spark, n * SimilarityJoin.PackedShingleBytes, sides = 2))
    val scored =
      if (packedFits) {
        // slot-shared with ppjoin's packed verify (one pack aggregation
        // per corpus, not one per pass per consumer); budget-bounded —
        // the slot only exists when packedFits
        val packed = broadcast(PersistSlots.cached(spark,
          s"packed-shingles:$dir")(sh.groupBy("doc_id")
          .agg(sort_array(collect_list(col("s"))).as("ss"))))
        cand
          .join(packed, col(aCol) === col("doc_id"))
          .select(col(aCol), col(bCol), col("ss").as("sa"))
          .join(packed, col(bCol) === col("doc_id"))
          .select(col(aCol), col(bCol),
            size(col("sa")).cast("long").as("na"),
            size(col("ss")).cast("long").as("nb"),
            graft.plans.SetOps.sortedIntersectCount(col("sa"), col("ss")).as("c"))
      } else {
        val sizes = sh.groupBy("doc_id").agg(count(lit(1)).as("n"))
        cand
          .join(sh.select(col("doc_id").as(aCol), col("s")), Seq(aCol))
          .join(sh.select(col("doc_id").as(bCol), col("s")), Seq(bCol, "s"))
          .groupBy(aCol, bCol).agg(count(lit(1)).as("c"))
          .join(sizes.select(col("doc_id").as(aCol), col("n").as("na")), Seq(aCol))
          .join(sizes.select(col("doc_id").as(bCol), col("n").as("nb")), Seq(bCol))
      }
    scored
      .withColumn("j", col("c") / (col("na") + col("nb") - col("c")))
      .filter(col("j") >= 0.5)
      .select(col(aCol), col(bCol), round(col("j"), 4).as("j"))
  }

  /** Deterministic ingest-batch membership: ~1/16 of documents (md5
    * prefix '0') play "tonight's new batch"; the rest are the already-
    * deduplicated historical corpus. md5-based so the DuckDB oracle
    * draws the identical split. */
  private[operators] def isNewBatch: Column =
    substring(md5(col("doc_id").cast("string")), 1, 1) === "0"

  /** The persisted incremental-dedup store: band keys of the HISTORY
    * corpus only — (doc_id, band_idx, band_hash), ~8 longs per document.
    * At 100 TB this is the whole point: the nightly job reads THIS
    * artifact (≈0.1% of corpus bytes), never the historical text. */
  def buildBandStore(spark: SparkSession, dir: String): DataFrame =
    bandKeys(signaturesFast(spark, dir).filter(isNewBatch.unary_!), nBands = 8)

  /** Persist the band store crash-safely: stage to `<path>_staged`, then
    * delete + rename (the Similarity meta-flip discipline). A plain
    * in-place overwrite deletes the live store BEFORE writing, so a
    * mid-write crash costs a full history re-derive — the exact read the
    * artifact exists to avoid. [[loadBandStore]] completes an
    * interrupted flip. */
  def saveBandStore(store: DataFrame, path: String): Unit = {
    val sc = store.sparkSession.sparkContext
    store.write.mode("overwrite").parquet(s"${path}_staged")
    val fs = new org.apache.hadoop.fs.Path(path).getFileSystem(sc.hadoopConfiguration)
    val live = new org.apache.hadoop.fs.Path(path)
    if (fs.exists(live)) fs.delete(live, true)
    fs.rename(new org.apache.hadoop.fs.Path(s"${path}_staged"), live)
  }

  def loadBandStore(spark: SparkSession, path: String): DataFrame = {
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val live = new org.apache.hadoop.fs.Path(path)
    val staged = new org.apache.hadoop.fs.Path(s"${path}_staged")
    if (!fs.exists(live) && fs.exists(staged)) fs.rename(staged, live)
    spark.read.parquet(path)
  }

  /** Incremental near-dup detection: new-batch documents vs the
    * historical store (Lee et al. 2022 "Deduplicating Training Data
    * Makes Language Models Better" §4 runs exactly this shape nightly —
    * dedup each crawl increment against the accumulated corpus).
    *
    * Candidates = new-batch band keys equi-joined against the store
    * (uniform hash keys, shuffle ∝ batch + store, never history text);
    * verification = EXACT n-gram Jaccard confined to candidates, with
    * the history side's shingles re-derived only for MATCHED doc_ids
    * (the join-back is candidate-bounded). Output (new_id, hist_id, j ≥
    * 0.5) is equality-oracled against the exact cross-batch Jaccard pair
    * set — a banding miss fails the gate, same contract as
    * dd_minhash_lsh_fast. */
  def incrementalPairs(spark: SparkSession, dir: String,
      store0: Option[DataFrame] = None): DataFrame = {
    val store = store0.getOrElse(
      PersistSlots.cached(spark, s"incr-store:$dir")(buildBandStore(spark, dir)))
    val newBands = bandKeys(signaturesFast(spark, dir).filter(isNewBatch), nBands = 8)
    val cand = newBands
      .select(col("doc_id").as("new_id"), col("band_idx"), col("band_hash"))
      .join(store.select(col("doc_id").as("hist_id"), col("band_idx"), col("band_hash")),
        Seq("band_idx", "band_hash"))
      .select("new_id", "hist_id").distinct()
    verifyJaccard(spark, dir, cand, "new_id", "hist_id")
      .orderBy("new_id", "hist_id")
  }

  /** Exploded (doc_id, band_idx, band_hash) rows for a signature frame —
    * shared by lshCandidates (self-join form) and the incremental store
    * (asymmetric new-vs-history form). */
  private def bandKeys(sig: DataFrame, nBands: Int): DataFrame = {
    val rows = MinhashFuncs / nBands
    val bandCols = (0 until nBands).map { bi =>
      val parts = (bi * rows until (bi + 1) * rows).map(i => col(s"mh$i"))
      struct(lit(bi).as("band_idx"), xxhash64(parts: _*).as("band_hash"))
    }
    sig.select(col("doc_id"), explode(array(bandCols: _*)).as("bd"))
      .select(col("doc_id"), col("bd.band_idx").as("band_idx"),
        col("bd.band_hash").as("band_hash"))
  }

  /** Banded candidate pairs (a_id < b_id, distinct) from a signature
    * frame — the equi-join candidate generation both verify flavors
    * share. */
  private def lshCandidates(spark: SparkSession, slot: String, sig0: DataFrame,
      bandHash: Seq[Column] => Column, nBands: Int = MinhashBands): DataFrame = {
    val rows = MinhashFuncs / nBands
    // materialized once via the memoized slot: the signature frame feeds
    // three plan branches (bands + both join sides) and would recompute
    // 3x per call — and fully per invocation — otherwise; disk spill
    // keeps the guarantee when signatures outgrow memory
    val sig = PersistSlots.cached(spark, slot)(sig0)
    val bandCols = (0 until nBands).map { bi =>
      val parts = (bi * rows until (bi + 1) * rows).map(i => col(s"mh$i"))
      struct(lit(bi).as("band_idx"), bandHash(parts).as("band_hash"))
    }
    val bands = sig.select(col("doc_id"), explode(array(bandCols: _*)).as("bd"))
      .select(col("doc_id"), col("bd.band_idx").as("band_idx"), col("bd.band_hash").as("band_hash"))
    bands.alias("x").join(bands.alias("y"), Seq("band_idx", "band_hash"))
      .filter(col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("a_id"), col("y.doc_id").as("b_id"))
      .distinct()
  }

  private def lshPairs(spark: SparkSession, slot: String, sig0: DataFrame,
      bandHash: Seq[Column] => Column): DataFrame = {
    val sig = PersistSlots.cached(spark, slot)(sig0)
    val cand = lshCandidates(spark, slot, sig0, bandHash)
    val sa = sig.select(col("doc_id").as("a_id") +: (0 until MinhashFuncs).map(i => col(s"mh$i").as(s"a$i")): _*)
    val sb = sig.select(col("doc_id").as("b_id") +: (0 until MinhashFuncs).map(i => col(s"mh$i").as(s"b$i")): _*)
    val matches = (0 until MinhashFuncs)
      .map(i => when(col(s"a$i") === col(s"b$i"), 1).otherwise(0))
      .reduce(_ + _)
    cand.join(sa, Seq("a_id")).join(sb, Seq("b_id"))
      .withColumn("est", matches.cast("double") / MinhashFuncs)
      .filter(col("est") >= 0.5)
      .select(col("a_id"), col("b_id"), round(col("est"), 4).as("est"))
      .orderBy("a_id", "b_id")
  }

  /** 32-bit SimHash fingerprint per document: bit j is the sign of the sum
    * over tokens (with multiplicity) of ±1 by the high bit of the j-th
    * md5 nibble. Emitted as a bitstring so the oracle compares exactly.
    *
    * One [[graft.functions.SimhashAgg]] pass (r9): the previous
    * explode(1..32) → (doc, bit) hash agg → collect_list reassembly
    * materialized tokens × 32 aggregate-input rows (16 M at sf0.1, ∝
    * corpus tokens at scale) for per-bit integer sums the aggregate
    * computes in-buffer from the md5 string directly — guide §2.3,
    * aggregate before you shuffle. Bitstrings are bit-identical
    * (commutative int sums, same bit rule; the unchanged DuckDB oracle
    * gates it). */
  def simhash(spark: SparkSession, dir: String): DataFrame =
    Tables.spread(spark, Tables.documents(spark, dir))
      .select(col("doc_id"), explode(tokens).as("tok"))
      .select(col("doc_id"), md5(col("tok")).as("h"))
      .groupBy("doc_id")
      .agg(graft.functions.SimhashAgg.simhashBits(col("h"),
        graft.functions.SimhashAgg.HighBit32).as("sh"))
      .orderBy("doc_id")

  val SimhashMaxHamming = 1 // 32-bit fingerprints on a shared-vocab corpus: hd<=1 keeps the true near-dups, hd>=2 is dominated by vocabulary collisions

  /** SimHash near-dup pairs within Hamming distance `SimhashMaxHamming` via
    * pigeonhole banding: split the 32-bit fingerprint into hd+1 bands —
    * any pair at Hamming distance ≤ hd agrees EXACTLY on at least one band
    * (pigeonhole principle, so candidate generation is lossless, unlike
    * minhash-LSH). Candidates come from an equi join on (band_idx,
    * band_bits) — shuffle on a uniform key, same 100 TB shape as
    * minhashLsh; the exact Hamming distance is then verified per candidate.
    * No nested-loop/cartesian anywhere (asserted in PlanSpec). */
  def simhashPairs(spark: SparkSession, dir: String): DataFrame = {
    val nBands = SimhashMaxHamming + 1
    val bandLen = 32 / nBands // 32-bit fingerprint, hd<=1 → two 16-bit halves
    val fp = PersistSlots.cached(spark, s"simhash-fp:$dir")(simhash(spark, dir))
    val bandCols = (0 until nBands).map { bi =>
      struct(lit(bi).as("band_idx"),
        substring(col("sh"), bi * bandLen + 1, bandLen).as("band_bits"))
    }
    val bands = fp.select(col("doc_id"), col("sh"),
        explode(array(bandCols: _*)).as("bd"))
      .select(col("doc_id"), col("sh"),
        col("bd.band_idx").as("band_idx"), col("bd.band_bits").as("band_bits"))
    val x = bands.select(col("doc_id").as("a_id"), col("sh").as("sha"),
      col("band_idx"), col("band_bits"))
    val y = bands.select(col("doc_id").as("b_id"), col("sh").as("shb"),
      col("band_idx"), col("band_bits"))
    val cand = x.join(y, Seq("band_idx", "band_bits"))
      .filter(col("a_id") < col("b_id"))
      .select("a_id", "b_id", "sha", "shb")
      .dropDuplicates("a_id", "b_id")
    cand
      .withColumn("hd", hammingBits(col("sha"), col("shb"), 32))
      .filter(col("hd") <= SimhashMaxHamming)
      .orderBy("a_id", "b_id")
      .select("a_id", "b_id", "hd")
  }

  /** Hamming distance between two n-char '0'/'1' bitstrings via 32-bit
    * word parse + XOR + popcount — exactly the per-character comparison
    * sum (each word compares disjoint bit ranges), at 2 conv+1 xor+1
    * popcount per word instead of 32 substring/compare expressions per
    * candidate (r9: the unrolled form was ~95% of the pair stage's CPU
    * on the collision-heavy 32-bit family). 32-bit words so the conv
    * result always fits a signed long. */
  private def hammingBits(a: Column, b: Column, n: Int): Column =
    (0 until n by 32).map { off =>
      val w = math.min(32, n - off)
      bit_count(conv(substring(a, off + 1, w), 2, 10).cast("long")
        .bitwiseXOR(conv(substring(b, off + 1, w), 2, 10).cast("long")))
    }.reduce(_ + _).cast("long")

  /** 64-bit SimHash fingerprints — the production width (a 32-bit space
    * saturates near √2³² ≈ 65k docs by birthday collision; 64 bits
    * carries billions). Bit j (0..63) is the sign of Σ_tokens (±1 from
    * bit j%4 of md5 nibble j div 4) — 64 independent hyperplane bits
    * from the first 16 md5 nibbles, pure hex/bit arithmetic BOTH
    * engines replay exactly (the mm_cdc_chunks discipline; the earlier
    * xxhash64 basis had no DuckDB equivalent and left this row
    * rows-only). Emitted as a 64-char bitstring like [[simhash]]: a
    * BIGINT emission needs 1<<63, which DuckDB's checked shift refuses;
    * engine-side the bitstring packs to BIGINT in one conv() select if
    * storage dominates. */
  def simhash64(spark: SparkSession, dir: String): DataFrame =
    // one SimhashAgg pass — see [[simhash]]: the exploded form put
    // tokens × 64 rows (32 M at sf0.1) through the (doc, bit) aggregate
    Tables.spread(spark, Tables.documents(spark, dir))
      .select(col("doc_id"), explode(tokens).as("tok"))
      .select(col("doc_id"), md5(col("tok")).as("h"))
      .groupBy("doc_id")
      .agg(graft.functions.SimhashAgg.simhashBits(col("h"),
        graft.functions.SimhashAgg.Nibble64).as("fp"))
      .orderBy("doc_id")

  // hd ≤ 1 via two 32-bit pigeonhole halves: measured at sf0.01, hd ≤ 1
  // emits ONLY true j ≥ 0.5 near-dups (5 pairs on the md5-nibble family,
  // zero vocabulary collisions) while hd ≥ 2 admits same-vocabulary
  // false positives — and the 32-bit band keyspace (4G buckets) keeps
  // bucket groups tiny at any corpus size, unlike 16-bit quarters
  val Simhash64MaxHamming = 1

  /** 64-bit SimHash near-dup pairs: pigeonhole banding (hd+1 bands —
    * any pair at Hamming ≤ hd agrees exactly on ≥ 1 band, lossless
    * candidate generation), exact Hamming verify over the bitstring.
    * Oracled since r7 (the md5-nibble basis is cross-engine); the
    * oracle computes the same hd ≤ 1 pair set from the full pair space
    * — losslessness makes banded and exhaustive forms equal by
    * construction. ExtensionsSpec additionally asserts perfect
    * precision against the exact j ≥ 0.5 pair set and the no-NLJ plan
    * shape. The hamming radius is the precision/recall knob (hd ≤ 3
    * lifts recall but admits same-vocabulary collisions). */
  def simhash64Pairs(spark: SparkSession, dir: String): DataFrame = {
    val nBands = Simhash64MaxHamming + 1
    val fp = PersistSlots.cached(spark, s"simhash64-fp:$dir")(simhash64(spark, dir))
    val bandLen = 64 / nBands
    val bandCols = (0 until nBands).map { bi =>
      struct(lit(bi).as("band_idx"),
        substring(col("fp"), bi * bandLen + 1, bandLen).as("band_bits"))
    }
    val bands = fp.select(col("doc_id"), col("fp"),
        explode(array(bandCols: _*)).as("bd"))
      .select(col("doc_id"), col("fp"),
        col("bd.band_idx").as("band_idx"), col("bd.band_bits").as("band_bits"))
    val x = bands.select(col("doc_id").as("a_id"), col("fp").as("fpa"),
      col("band_idx"), col("band_bits"))
    val y = bands.select(col("doc_id").as("b_id"), col("fp").as("fpb"),
      col("band_idx"), col("band_bits"))
    val cand = x.join(y, Seq("band_idx", "band_bits"))
      .filter(col("a_id") < col("b_id"))
      .select("a_id", "b_id", "fpa", "fpb")
      .dropDuplicates("a_id", "b_id")
    cand
      .withColumn("hd", hammingBits(col("fpa"), col("fpb"), 64))
      .filter(col("hd") <= Simhash64MaxHamming)
      .select("a_id", "b_id", "hd")
      .orderBy("a_id", "b_id")
  }

  /** Embedding near-dup pairs: cosine ≥ 0.45 (vectors are L2-normalized so
    * cosine = dot). Brute-force pair join as the exact oracle; the scale
    * path buckets vectors first (sign-random-projection tables as in
    * Similarity.lshTopK, or IVF cells as in Similarity.ivfTopK) and runs
    * this exact verify only within buckets. */
  def embeddingCosine(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val a = e.select(col("vec_id").as("a_id"), col("v").as("va"))
    val b = e.select(col("vec_id").as("b_id"), col("v").as("vb"))
    a.join(b, col("a_id") < col("b_id"))
      .withColumn("cs", graft.plans.VectorOps.dot(col("va"), col("vb")))
      .filter(col("cs") >= 0.45)
      .select(col("a_id"), col("b_id"), round(col("cs"), 4).as("cs"))
      .orderBy("a_id", "b_id")
  }

  /** The 100 TB embedding near-dup path: sign-random-projection buckets
    * (Similarity's 8 tables × 6 bits, multi-probe over 1-bit flips on
    * one join side) generate candidates via an equi join on
    * (tbl, bucket); only candidates get the exact dot-product verify.
    * Same contract as minhashLsh-vs-ngramJaccard: embeddingCosine is
    * the quadratic oracle, this is the scale shape (recall measured in
    * ExtensionsSpec). */
  def embeddingCosineBucketed(spark: SparkSession, dir: String,
      threshold: Double = 0.45, deepProbes: Boolean = false,
      index: Option[Similarity.LshIndex] = None): DataFrame = {
    val e = Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    // ONE bucket artifact per corpus, shared with Similarity.lshTopK
    // (id-only rows; persistable via saveLshIndex — a cold session loads
    // the index instead of re-hashing). Bucket width scales with the
    // corpus (constant occupancy — see Similarity.lshBitsFor):
    // fixed-width buckets made candidates grow as N²/2^bits, measured
    // catastrophically at the 10× evidence run
    val idx = index.getOrElse(Similarity.buildLshIndex(spark, dir))
    val nBits = idx.nBits
    // the ALL-PAIRS path pins its table count at the base LshTables: its
    // candidate volume is ∝ N·occupancy·tables, so riding lshTablesFor's
    // recall-driven table growth (an ANN-side knob: per-QUERY cost there)
    // would scale pair generation superlinearly. Tables 0..7 are the same
    // hyperplane family regardless of how many tables the shared index
    // carries, so at the oracle SFs (where lshTablesFor = LshTables) this
    // filter is the identity and every plan/result stays byte-identical.
    val b =
      if (idx.nTables > Similarity.LshTables)
        idx.buckets.filter(col("tbl") < Similarity.LshTables)
      else idx.buckets
    // probe depth = recall/cost knob: 1-bit flips are the scale operating
    // point (probing 7/64 buckets); 2-bit flips (22/64) buy the ~2e-4
    // miss rate that supports a full equality oracle at the gate SF, at a
    // cost that grows toward a fractional corpus scan — fine for the
    // correctness gate, wrong for the benched scale path.
    // packed long (tbl, bucket) key (r10): bijective, so the candidate
    // set is EXACTLY the (tbl, bucket) string join's — Similarity.bucketKey
    val bk = Similarity.bucketKey(col("tbl"), col("bucket"), nBits)
    val probes =
      if (deepProbes) Similarity.probeKeys2(bk, nBits)
      else Similarity.probeKeys(bk, nBits)
    // candidate generation is ID-ONLY: shipping the 64-dim vectors
    // through the bucket join put ~1 KB per candidate row on the shuffle
    // (measured 9.6 s at sf0.1); generating (a_id, b_id) first and
    // joining the vectors back by id afterwards keeps the wide rows out
    // of the fan-out entirely
    val x = b.select(col("vec_id").as("a_id"), explode(probes).as("bk"))
    val y = b.select(col("vec_id").as("b_id"), bk.as("bk"))
    val cand = x.join(y, Seq("bk"))
      .filter(col("a_id") < col("b_id"))
      .select("a_id", "b_id")
      .distinct()
    // the join-backs BROADCAST the vector table (ship the table to the
    // candidate stream, not the stream to the table — [[JoinBacks]]): a
    // shuffle join re-exchanges every candidate carrying the vector
    // payload on the second join-back — the term that made this row
    // "disk-bound on one box" at 100× (and ENOSPC'd the bitext sibling,
    // BENCH_NOTES r8). Sized from the index's corpus count (no extra
    // count() job) against a memory-conf-derived budget that prices both
    // broadcast projections at once; past it the branch falls back to
    // the shuffle form (the FilteredAnn cardinality-branch idiom).
    // ONE broadcast relation for both join-backs (r9): per-side aliased
    // projections canonicalize differently (output names differ), so
    // ReuseExchange could not fire and each pass built + shipped the
    // same vector table twice; joining the same un-aliased frame twice
    // makes the second BroadcastExchange a ReusedExchange — one build,
    // halved broadcast memory footprint at every scale.
    val joinBack = JoinBacks.vectorJoinBack(spark, idx.nVectors, Similarity.Dim)
    val vt = joinBack(e.select(col("vec_id"), col("v")))
    cand
      .join(vt, col("a_id") === col("vec_id"))
      .select(col("a_id"), col("b_id"), col("v").as("va"))
      .join(vt, col("b_id") === col("vec_id"))
      .withColumn("cs", graft.plans.VectorOps.dot(col("va"), col("v")))
      .filter(col("cs") >= threshold)
      .select(col("a_id"), col("b_id"), round(col("cs"), 4).as("cs"))
      .orderBy("a_id", "b_id")
  }

  /** Connected-components dedup clustering over the exact near-dup pair
    * graph (j ≥ 0.5): every document connected through any CHAIN of
    * near-dup pairs lands in one cluster labeled by the cluster's min
    * doc_id, which is also the survivor. This is the missing step between
    * pair detection and actually deduplicating a corpus: near-duplication
    * is not transitive, so per-pair survivor rules (keep a < b) can keep
    * two documents that share a middle neighbor or drop every copy.
    *
    * Scale shape: Hash-Min label propagation (the MapReduce CC family of
    * Rastogi et al. 2013; CC-MR / large-star–small-star are the published
    * optimizations of the same idea): label(v) ← min over v's closed
    * neighborhood, iterated to fixpoint. Each round is ONE shuffle keyed
    * by doc_id (uniform — no giant-component key because labels travel to
    * vertices, vertices never gather their component); rounds grow with
    * component DIAMETER, and near-dup clusters are near-cliques around a
    * shared template, so 2–3 rounds close real corpora. The driver loop
    * polls only a convergence count — no edge or label data ever lands on
    * the driver. */
  def cluster(spark: SparkSession, dir: String,
      pairs0: Option[DataFrame] = None): DataFrame = {
    // pair feed: the banded-then-exact-verified scale path, NOT the
    // uncapped inverted-index self-join of [[ngramJaccard]] (r9 review
    // find: cluster/canonical were the only registered consumers still
    // riding the quadratic oracle form at 100 TB — its boilerplate
    // shingle groups are exactly what the banding sidesteps). The two
    // feeds emit the SAME pair set wherever the dd_minhash_lsh_fast
    // equality gate holds (banding misses nothing at j ≥ 0.5 on this
    // family); pass ngramJaccard output via pairs0 for the
    // certified-exact form. The converged label frame is memoized per
    // corpus — canonical() and repeated invocations reuse it instead of
    // re-running the iterative job (and un-slotted persists leaked one
    // cached edge+label frame pair per call).
    val labels = pairs0 match {
      case Some(p) => propagateLabels(p.select("a_id", "b_id"))
      case None => PersistSlots.cached(spark, s"cc-labels:$dir")(
        propagateLabels(minhashLshFastCore(spark, dir).select("a_id", "b_id")))
    }
    val sizes = labels.groupBy(col("label").as("cluster"))
      .agg(count(lit(1)).as("cluster_size"))
    labels.select(col("doc_id"), col("label").as("cluster"))
      .join(sizes, Seq("cluster"))
      .select(col("doc_id"), col("cluster"), col("cluster_size"),
        (col("doc_id") === col("cluster")).as("keep"))
      .orderBy("doc_id")
  }

  /** Hash-Min label propagation to fixpoint over an (a_id, b_id) pair
    * frame: label(v) = min doc_id reachable from v, i.e. connected
    * components. FAILS LOUDLY if the fixpoint is not reached within
    * `maxRounds` — rounds grow with component diameter, and the previous
    * silent exit returned labels that look valid (every doc labeled, one
    * min per partial component) but split long chains: a wrong answer no
    * downstream check can see. Real near-dup clusters are near-cliques
    * (2–3 rounds); a corpus that legitimately needs more rounds raises
    * the cap explicitly. */
  private[operators] def propagateLabels(pairs: DataFrame,
      maxRounds: Int = 50): DataFrame = {
    val lvl = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    val p = pairs.toDF("a_id", "b_id")
    val edges = p.union(p.select(col("b_id"), col("a_id")))
      .toDF("u", "v")
      .persist(lvl)
    var labels = edges.groupBy(col("u")).agg(min(col("v")).as("mv"))
      .select(col("u").as("doc_id"), least(col("u"), col("mv")).as("label"))
      .persist(lvl)
    var changed = 1L
    var rounds = 0
    while (changed > 0 && rounds < maxRounds) {
      val prev = labels
      // cutLineage, not persist: each round references `labels` twice
      // (join + union), so an un-cut plan DOUBLES per round — 2^rounds
      // logical nodes; the SQL listener's plan render OOM'd the driver on
      // a 29-round fixture before a single task ran. Persist does not
      // truncate the logical plan; re-rooting at a materialized scan does
      // (the standard iterative-Spark discipline).
      val next = PersistSlots.cutLineage(
        edges.join(labels.withColumnRenamed("doc_id", "u"), Seq("u"))
          .select(col("v").as("doc_id"), col("label"))
          .union(labels)
          .groupBy("doc_id").agg(min("label").as("label")))
      changed = next.join(prev.withColumnRenamed("label", "old"), Seq("doc_id"))
        .filter(col("label") < col("old")).count()
      prev.unpersist(false)
      labels = next
      rounds += 1
    }
    // the labels are materialized (the convergence count executed them),
    // so the edge feed's cache can go now rather than leak per call
    edges.unpersist(false)
    if (changed > 0) {
      labels.unpersist(false)
      throw new IllegalStateException(
        s"connected-components label propagation did not converge in $maxRounds " +
          s"rounds ($changed labels still moving) — a component's diameter exceeds " +
          "the round cap; raise maxRounds rather than consuming split clusters")
    }
    labels
  }

  /** Containment near-dup (directed inclusion): cont = |A∩B| /
    * min(|A|,|B|) over shingle sets — the signal Jaccard structurally
    * misses. A short document quoted whole inside a long one has
    * j = |A|/|B| ≈ 0 but containment ≈ 1; Broder's original resemblance
    * paper defines both measures for exactly this reason, and corpus
    * builds use containment to catch quote-inclusion and boilerplate-
    * wrapped copies. Same inverted-index join and memoized shingle frame
    * as [[ngramJaccardImpl]] — only the final ratio differs, so the
    * scale shape is identical (one shingle-keyed shuffle, pair work ∝
    * co-occurrences). */
  def containment(spark: SparkSession, dir: String,
      threshold: Double = 0.8): DataFrame = {
    val sh = PersistSlots.cached(spark, s"ngram-shingles:$dir")(shingles(spark, dir))
    val sizes = sh.groupBy("doc_id").agg(count(lit(1)).as("n"))
    val a = sh.select(col("doc_id").as("a_id"), col("s"))
    val b = sh.select(col("doc_id").as("b_id"), col("s"))
    val inter = a.join(b, Seq("s")).filter(col("a_id") < col("b_id"))
      .groupBy("a_id", "b_id").agg(count(lit(1)).as("c"))
    inter
      .join(sizes.select(col("doc_id").as("a_id"), col("n").as("na")), Seq("a_id"))
      .join(sizes.select(col("doc_id").as("b_id"), col("n").as("nb")), Seq("b_id"))
      .withColumn("cont", col("c") / least(col("na"), col("nb")))
      .filter(col("cont") >= threshold)
      .select(col("a_id"), col("b_id"), round(col("cont"), 4).as("cont"))
      .orderBy("a_id", "b_id")
  }

  /** Cluster canonicalization — the survivor-selection step after
    * [[cluster]]: within each near-dup cluster keep the BEST document
    * (longest by n_chars, doc_id tiebreak), not the arbitrary min-id.
    * This is the policy real corpus builds want (the near-dup family of
    * a page usually spans truncated copies; min-id keeps whichever
    * crawled first, best-quality keeps the fullest), and it composes:
    * any scoring column ([[graft.ml.QualityClassifier]]'s score, a
    * model-based signal) drops in for n_chars unchanged.
    *
    * Scale shape: the label frame (doc_id, cluster) joins a two-column
    * slice of documents, then one window + one argmax-join keyed by
    * cluster — text never enters a shuffle, and cluster keys are as
    * uniform as [[cluster]]'s labels (no giant-component gather: the
    * window ranks only the cluster's members, which are near-clique
    * duplicate sets, not the corpus). */
  def canonical(spark: SparkSession, dir: String): DataFrame = {
    val labels = cluster(spark, dir).select("doc_id", "cluster")
    val withQ = labels.join(
      Tables.documents(spark, dir).select("doc_id", "n_chars"), Seq("doc_id"))
    val w = Window.partitionBy("cluster").orderBy(col("n_chars").desc, col("doc_id"))
    val canon = withQ.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("cluster"), col("doc_id").as("canonical"))
    withQ.join(canon, Seq("cluster"))
      .select(col("doc_id"), col("cluster"), col("n_chars"), col("canonical"),
        (col("doc_id") === col("canonical")).as("keep"))
      .orderBy("doc_id")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "dd_exact" -> exact _,
    "dd_cluster" -> ((s: SparkSession, d: String) => cluster(s, d)),
    "dd_canonical" -> canonical _,
    "dd_containment" -> ((s: SparkSession, d: String) => containment(s, d)),
    "dd_span_exact" -> spanDedup _,
    "dd_ngram_jaccard" -> ngramJaccard _,
    "dd_minhash_sig" -> minhashSignatures _,
    "dd_minhash_lsh" -> minhashLsh _,
    // oracled: xxhash64-banded candidates + EXACT Jaccard verify must
    // reproduce the full exact pair set (candidate coverage gate)
    "dd_minhash_lsh_fast" -> minhashLshFast _,
    // incremental (new-batch vs persisted history store): candidates from
    // the band-store equi join, exact-verified — oracled vs the exact
    // cross-batch Jaccard pair set (a store miss fails the gate)
    "dd_incremental" -> ((s: SparkSession, d: String) => incrementalPairs(s, d)),
    "dd_simhash" -> simhash _,
    "dd_simhash_pairs" -> simhashPairs _,
    // the 64-bit production family: md5-nibble hyperplane bits (r7 —
    // cross-engine arithmetic, fully oracled); ExtensionsSpec adds the
    // precision + no-NLJ plan gates
    "dd_simhash64" -> simhash64 _,
    "dd_simhash64_pairs" -> simhash64Pairs _,
    "dd_embed_cos" -> embeddingCosine _,
    // dd_embed_cos_lsh (the benched 1-bit-probe scale path) is
    // registered in [[RecallGates]] since r7: recall-by-design, and the
    // gate form (exported pairs + subset/recall booleans vs the exact
    // recompute) is driver-ORACLED instead of rows-only; Bench runs the
    // raw form via SparkEntry.benchOverrides
    // oracled: 2-bit multi-probe buckets + exact-cosine verify must
    // reproduce the full exact pair set at the 0.45 threshold
    "dd_embed_cos_lsh_deep" -> ((s: SparkSession, d: String) =>
      embeddingCosineBucketed(s, d, deepProbes = true)),
  )

  private val shingleCte =
    """WITH toks AS (SELECT doc_id, string_split(text,' ') t FROM documents),
      |sh AS (SELECT DISTINCT doc_id, t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS s
      |FROM toks, LATERAL (SELECT unnest(generate_series(1, len(t)-2)) i))""".stripMargin

  private val sigCte = shingleCte + ", sig AS (SELECT doc_id, " +
    (0 until MinhashFuncs).map(i => s"MIN(md5('$i:' || s)) AS mh$i").mkString(", ") +
    " FROM sh GROUP BY doc_id)"

  // 64-bit simhash fingerprints: bit j = sign of Σ (±1 from bit j%4 of
  // md5 nibble j div 4) — the exact arithmetic of [[simhash64]]
  private val simhash64Cte =
    """WITH h AS (SELECT doc_id, md5(unnest(string_split(text,' '))) h FROM documents),
      |bits AS (SELECT doc_id, j,
      |CASE WHEN SUM(CASE WHEN (((instr('0123456789abcdef', substr(h, CAST(j // 4 AS INT) + 1, 1)) - 1)
      |>> CAST(j % 4 AS INT)) & 1) = 1 THEN 1 ELSE -1 END) > 0
      |THEN '1' ELSE '0' END AS b
      |FROM h, (SELECT unnest(generate_series(0,63)) j) GROUP BY doc_id, j),
      |fps AS (SELECT doc_id, string_agg(b, '' ORDER BY j) AS fp FROM bits GROUP BY doc_id)"""
      .stripMargin.replaceAll("\n", " ")

  val oracleSql: Map[String, String] = Map(
    "dd_exact" ->
      """SELECT md5(text) AS h, COUNT(*) AS c, MIN(doc_id) AS keep
        |FROM documents GROUP BY md5(text) ORDER BY h""".stripMargin.replaceAll("\n", " "),
    "dd_span_exact" ->
      """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
        |chunks AS (SELECT doc_id, i AS span_idx,
        |array_to_string(t[(i*10+1):(i*10+10)], ' ') AS span
        |FROM toks, LATERAL (SELECT unnest(range(0, CAST(ceil(len(t)/10.0) AS BIGINT))) AS i)),
        |ranked AS (SELECT doc_id, span_idx, span,
        |row_number() OVER (PARTITION BY span ORDER BY doc_id, span_idx) AS rn FROM chunks)
        |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_spans,
        |CAST(sum(CASE WHEN rn > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_spans,
        |string_agg(CASE WHEN rn = 1 THEN span END, ' ' ORDER BY span_idx) AS text_dedup
        |FROM ranked GROUP BY doc_id ORDER BY doc_id""".stripMargin.replaceAll("\n", " "),
    // the oracle computes the SAME clusters as a transitive closure: a
    // recursive reachability CTE to every reachable vertex, labeled by
    // the min — tiny at oracle SF, where Spark runs the scalable
    // label-propagation form instead
    "dd_cluster" ->
      (shingleCte.replaceFirst("WITH ", "WITH RECURSIVE ") + """,
        |sizes AS (SELECT doc_id, count(*) n FROM sh GROUP BY 1),
        |inter AS (SELECT a.doc_id a_id, b.doc_id b_id, count(*) c
        |FROM sh a JOIN sh b ON a.s=b.s AND a.doc_id<b.doc_id GROUP BY 1,2),
        |pairs AS (SELECT a_id, b_id FROM inter
        |JOIN sizes sa ON sa.doc_id=a_id JOIN sizes sb ON sb.doc_id=b_id
        |WHERE c*1.0/(sa.n+sb.n-c) >= 0.5),
        |edges AS (SELECT a_id u, b_id v FROM pairs UNION ALL SELECT b_id AS u, a_id AS v FROM pairs),
        |reach(u, v) AS (SELECT u, v FROM edges
        |UNION SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u),
        |lbl AS (SELECT u AS doc_id, LEAST(u, MIN(v)) AS cluster FROM reach GROUP BY u)
        |SELECT l.doc_id, l.cluster, CAST(cs.n AS BIGINT) AS cluster_size,
        |l.doc_id = l.cluster AS keep
        |FROM lbl l JOIN (SELECT cluster, COUNT(*) n FROM lbl GROUP BY 1) cs USING (cluster)
        |ORDER BY doc_id""").stripMargin.replaceAll("\n", " "),
    // same transitive closure, then survivor = argmax(n_chars, min doc_id)
    // per cluster — the quality-based canonicalization policy
    "dd_canonical" ->
      (shingleCte.replaceFirst("WITH ", "WITH RECURSIVE ") + """,
        |sizes AS (SELECT doc_id, count(*) n FROM sh GROUP BY 1),
        |inter AS (SELECT a.doc_id a_id, b.doc_id b_id, count(*) c
        |FROM sh a JOIN sh b ON a.s=b.s AND a.doc_id<b.doc_id GROUP BY 1,2),
        |pairs AS (SELECT a_id, b_id FROM inter
        |JOIN sizes sa ON sa.doc_id=a_id JOIN sizes sb ON sb.doc_id=b_id
        |WHERE c*1.0/(sa.n+sb.n-c) >= 0.5),
        |edges AS (SELECT a_id u, b_id v FROM pairs UNION ALL SELECT b_id AS u, a_id AS v FROM pairs),
        |reach(u, v) AS (SELECT u, v FROM edges
        |UNION SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u),
        |lbl AS (SELECT u AS doc_id, LEAST(u, MIN(v)) AS cluster FROM reach GROUP BY u),
        |canon AS (SELECT cluster, doc_id AS canonical FROM (
        |SELECT l.cluster, l.doc_id,
        |row_number() OVER (PARTITION BY l.cluster ORDER BY d.n_chars DESC, l.doc_id) AS rn
        |FROM lbl l JOIN documents d USING (doc_id)) WHERE rn = 1)
        |SELECT l.doc_id, l.cluster, d.n_chars, c.canonical, l.doc_id = c.canonical AS keep
        |FROM lbl l JOIN documents d USING (doc_id) JOIN canon c USING (cluster)
        |ORDER BY doc_id""").stripMargin.replaceAll("\n", " "),
    "dd_containment" ->
      (shingleCte + """,
        |sizes AS (SELECT doc_id, count(*) n FROM sh GROUP BY 1),
        |inter AS (SELECT a.doc_id a_id, b.doc_id b_id, count(*) c
        |FROM sh a JOIN sh b ON a.s=b.s AND a.doc_id<b.doc_id GROUP BY 1,2)
        |SELECT a_id, b_id, ROUND(c*1.0/LEAST(sa.n, sb.n), 4) AS cont FROM inter
        |JOIN sizes sa ON sa.doc_id=a_id JOIN sizes sb ON sb.doc_id=b_id
        |WHERE c*1.0/LEAST(sa.n, sb.n) >= 0.8
        |ORDER BY a_id, b_id""").stripMargin.replaceAll("\n", " "),
    "dd_ngram_jaccard" ->
      (shingleCte + """,
        |sizes AS (SELECT doc_id, count(*) n FROM sh GROUP BY 1),
        |inter AS (SELECT a.doc_id a_id, b.doc_id b_id, count(*) c
        |FROM sh a JOIN sh b ON a.s=b.s AND a.doc_id<b.doc_id GROUP BY 1,2)
        |SELECT a_id, b_id, ROUND(c*1.0/(sa.n+sb.n-c),4) AS j FROM inter
        |JOIN sizes sa ON sa.doc_id=a_id JOIN sizes sb ON sb.doc_id=b_id
        |WHERE c*1.0/(sa.n+sb.n-c) >= 0.5 ORDER BY a_id, b_id""").stripMargin.replaceAll("\n", " "),
    // the fast LSH path is exact-verified, so its oracle IS the exact
    // Jaccard pair set: a banding miss at j >= 0.5 fails the gate
    "dd_minhash_lsh_fast" -> (shingleCte + """,
        |sizes AS (SELECT doc_id, count(*) n FROM sh GROUP BY 1),
        |inter AS (SELECT a.doc_id a_id, b.doc_id b_id, count(*) c
        |FROM sh a JOIN sh b ON a.s=b.s AND a.doc_id<b.doc_id GROUP BY 1,2)
        |SELECT a_id, b_id, ROUND(c*1.0/(sa.n+sb.n-c),4) AS j FROM inter
        |JOIN sizes sa ON sa.doc_id=a_id JOIN sizes sb ON sb.doc_id=b_id
        |WHERE c*1.0/(sa.n+sb.n-c) >= 0.5 ORDER BY a_id, b_id""").stripMargin.replaceAll("\n", " "),
    "dd_minhash_sig" ->
      (sigCte + " SELECT * FROM sig ORDER BY doc_id").replaceAll("\n", " "),
    // the incremental path is exact-verified, so its oracle is the exact
    // Jaccard pair set RESTRICTED to (new batch × history) — the same
    // md5-prefix split both engines derive independently
    "dd_incremental" -> (shingleCte + """,
        |sizes AS (SELECT doc_id, count(*) n FROM sh GROUP BY 1),
        |inter AS (SELECT a.doc_id a_id, b.doc_id b_id, count(*) c
        |FROM sh a JOIN sh b ON a.s=b.s AND a.doc_id<b.doc_id GROUP BY 1,2),
        |jp AS (SELECT a_id, b_id, c*1.0/(sa.n+sb.n-c) AS j FROM inter
        |JOIN sizes sa ON sa.doc_id=a_id JOIN sizes sb ON sb.doc_id=b_id
        |WHERE c*1.0/(sa.n+sb.n-c) >= 0.5),
        |fl AS (SELECT a_id, b_id, j,
        |substr(md5(CAST(a_id AS VARCHAR)),1,1)='0' AS a_new,
        |substr(md5(CAST(b_id AS VARCHAR)),1,1)='0' AS b_new FROM jp)
        |SELECT CASE WHEN a_new THEN a_id ELSE b_id END AS new_id,
        |CASE WHEN a_new THEN b_id ELSE a_id END AS hist_id, ROUND(j,4) AS j
        |FROM fl WHERE a_new <> b_new ORDER BY new_id, hist_id""").stripMargin.replaceAll("\n", " "),
    "dd_minhash_lsh" ->
      (sigCte + """
        |SELECT a.doc_id AS a_id, b.doc_id AS b_id, ROUND((""" +
        (0 until MinhashFuncs).map(i => s"CASE WHEN a.mh$i=b.mh$i THEN 1 ELSE 0 END").mkString(" + ") +
        s""")/${MinhashFuncs}.0, 4) AS est
        |FROM sig a JOIN sig b ON a.doc_id < b.doc_id
        |WHERE (""" +
        (0 until MinhashBands).map { bi =>
          (bi * 4 until bi * 4 + 4).map(i => s"a.mh$i=b.mh$i").mkString("(", " AND ", ")")
        }.mkString(" OR ") +
        """) AND (""" +
        (0 until MinhashFuncs).map(i => s"CASE WHEN a.mh$i=b.mh$i THEN 1 ELSE 0 END").mkString(" + ") +
        s""") >= ${MinhashFuncs / 2}
        |ORDER BY a_id, b_id""").stripMargin.replaceAll("\n", " "),
    "dd_simhash" ->
      """WITH h AS (SELECT doc_id, md5(unnest(string_split(text,' '))) h FROM documents),
        |bits AS (SELECT doc_id, j,
        |CASE WHEN SUM(CASE WHEN strpos('89abcdef', substr(h, j, 1)) > 0 THEN 1 ELSE -1 END) > 0
        |THEN '1' ELSE '0' END AS b
        |FROM h, (SELECT unnest(generate_series(1,32)) j) GROUP BY doc_id, j)
        |SELECT doc_id, string_agg(b, '' ORDER BY j) AS sh FROM bits
        |GROUP BY doc_id ORDER BY doc_id""".stripMargin.replaceAll("\n", " "),
    "dd_simhash64" -> (simhash64Cte +
      " SELECT doc_id, fp FROM fps ORDER BY doc_id"),
    // losslessness of the pigeonhole banding means the banded engine
    // result equals the exhaustive hd <= radius pair set — which is what
    // the oracle computes (the oracle role tolerates the quadratic form)
    "dd_simhash64_pairs" -> (simhash64Cte +
      s""" SELECT a.doc_id AS a_id, b.doc_id AS b_id,
        |CAST(SUM(CASE WHEN substr(a.fp, j, 1) <> substr(b.fp, j, 1) THEN 1 ELSE 0 END) AS BIGINT) AS hd
        |FROM fps a JOIN fps b ON a.doc_id < b.doc_id,
        |(SELECT unnest(generate_series(1, 64)) AS j)
        |GROUP BY 1, 2
        |HAVING SUM(CASE WHEN substr(a.fp, j, 1) <> substr(b.fp, j, 1) THEN 1 ELSE 0 END) <= $Simhash64MaxHamming
        |ORDER BY a_id, b_id""".stripMargin.replaceAll("\n", " ")),
    "dd_simhash_pairs" ->
      ("""WITH h AS (SELECT doc_id, md5(unnest(string_split(text,' '))) h FROM documents),
        |bits AS (SELECT doc_id, j,
        |CASE WHEN SUM(CASE WHEN strpos('89abcdef', substr(h, j, 1)) > 0 THEN 1 ELSE -1 END) > 0
        |THEN '1' ELSE '0' END AS b
        |FROM h, (SELECT unnest(generate_series(1,32)) j) GROUP BY doc_id, j),
        |fp AS (SELECT doc_id, string_agg(b, '' ORDER BY j) AS sh FROM bits GROUP BY doc_id)
        |SELECT a.doc_id AS a_id, b.doc_id AS b_id, CAST((""" +
        (1 to 32).map(j => s"CASE WHEN substr(a.sh,$j,1) <> substr(b.sh,$j,1) THEN 1 ELSE 0 END")
          .mkString(" + ") +
        """) AS BIGINT) AS hd
        |FROM fp a JOIN fp b ON a.doc_id < b.doc_id
        |WHERE (""" +
        (1 to 32).map(j => s"CASE WHEN substr(a.sh,$j,1) <> substr(b.sh,$j,1) THEN 1 ELSE 0 END")
          .mkString(" + ") +
        """) <= 1
        |ORDER BY a_id, b_id""").stripMargin.replaceAll("\n", " "),
    "dd_embed_cos" ->
      """SELECT a.vec_id AS a_id, b.vec_id AS b_id,
        |ROUND(list_sum(list_transform(list_zip(a.embedding, b.embedding),
        |p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE))), 4) AS cs
        |FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
        |WHERE list_sum(list_transform(list_zip(a.embedding, b.embedding),
        |p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE))) >= 0.45
        |ORDER BY a_id, b_id""".stripMargin.replaceAll("\n", " "),
    // the deep-probe bucketed path is exact-verified: equality with the
    // exact pair set gates candidate coverage of the 2-bit probes
    "dd_embed_cos_lsh_deep" ->
      """SELECT a.vec_id AS a_id, b.vec_id AS b_id,
        |ROUND(list_sum(list_transform(list_zip(a.embedding, b.embedding),
        |p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE))), 4) AS cs
        |FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
        |WHERE list_sum(list_transform(list_zip(a.embedding, b.embedding),
        |p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE))) >= 0.45
        |ORDER BY a_id, b_id""".stripMargin.replaceAll("\n", " "),
  )
}

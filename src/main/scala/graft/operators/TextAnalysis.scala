package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Text-analysis operators for training-data pipelines (north-star
  * extension; SURVEY.md §2.G G22): token counting, quality scoring,
  * document fingerprinting, language identification.
  *
  * Everything is Column-expression based (codegen; embarrassingly parallel —
  * no shuffle except the per-lang aggregate), so throughput is scan-bound at
  * any corpus size.
  */
object TextAnalysis {

  private[graft] def toks: Column = split(col("text"), " ")

  /** Small english stopword core used for the quality ratio (documents are
    * space-tokenized in this corpus; the list is a constant, broadcast-free
    * IN predicate). */
  val Stopwords: Seq[String] = Seq("the", "a", "of", "and", "to", "in", "is", "on", "for", "it")

  /** Per-language marker words for the langid heuristic (real-world lists;
    * scores are marker-hit counts over the token stream, CJK charset
    * short-circuits to zh). */
  val LangMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "to", "is", "you", "that", "was", "with"),
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "ein", "ich", "mit"),
    "es" -> Seq("el", "los", "las", "que", "es", "una", "por", "con", "para"),
    "fr" -> Seq("le", "les", "est", "et", "des", "une", "dans", "pour", "vous"),
  )

  /** Corpus stats per language tag (the deterministic core of G22). */
  def langStats(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .groupBy("lang")
      .agg(count(lit(1)).as("c"), sum("n_chars").cast("long").as("s"))
      .orderBy("lang")

  /** Whitespace token count plus a BPE-ish subword estimate: words are
    * regex-split into letter runs / digit runs / single punctuation, the
    * usual pre-tokenizer shape, and ceil(len/4) approximates subword
    * fan-out for long words. */
  def tokenCounts(spark: SparkSession, dir: String): DataFrame =
    Tables.spread(spark, Tables.documents(spark, dir))
      .select(col("doc_id"),
        size(toks).cast("long").as("nt"),
        size(filter(split(col("text"), "[^A-Za-z0-9]+"), x => length(x) > 0))
          .cast("long").as("nw"),
        aggregate(transform(toks, t => ceil(length(t) / lit(4.0)).cast("long")),
          lit(0L), _ + _).as("bpe_est"))
      .orderBy("doc_id")

  /** Quality scoring: token count, mean token length, stopword ratio,
    * alphabetic-character ratio — the standard cheap filters applied before
    * expensive pipeline stages. */
  def quality(spark: SparkSession, dir: String): DataFrame = {
    val t = toks
    val nt = size(t)
    val stopHits = size(filter(t, x => x.isin(Stopwords.map(s => s: Any): _*)))
    val alpha = length(regexp_replace(col("text"), "[^A-Za-z]", ""))
    // deliberately NOT Tables.spread (r9 optimization round, measured):
    // the scoring is ~0.4 s of single-task work at sf0.1, and spreading
    // it cost MORE wall (0.74 → 1.05 s) — the raw-text exchange plus the
    // extra stage and sort-sampling pass outweigh the parallelism at this
    // per-doc cost; a pre-split 100 TB corpus parallelizes by its natural
    // splits with no operator change (contrast tx_cdc_chunks, whose 13 s
    // of per-doc CPU is what spread exists for)
    Tables.documents(spark, dir)
      .select(col("doc_id"),
        nt.cast("long").as("n_tokens"),
        round(aggregate(transform(t, x => length(x).cast("double")), lit(0.0), _ + _) / nt, 4)
          .as("avg_tok_len"),
        round(stopHits.cast("double") / nt, 4).as("stop_ratio"),
        round(alpha.cast("double") / length(col("text")), 4).as("alpha_ratio"))
      .orderBy("doc_id")
  }

  /** Repetition signals (the Gopher corpus-quality rules, Rae et al. 2021
    * §A1.1: repeated tokens and dominant n-grams mark low-quality or
    * machine-generated text):
    *   dup_tok_ratio    = 1 − distinct_tokens / tokens
    *   top_bigram_frac  = token share of the most frequent word 2-gram
    *   top_trigram_frac = token share of the most frequent word 3-gram
    * Pure per-row Column math (the n-gram mode is computed inside the
    * array, O(distinct·n) per doc — no explode, no shuffle), so the
    * operator is scan-bound at any corpus size. */
  def repetition(spark: SparkSession, dir: String): DataFrame = {
    val t = toks
    val docs = Tables.documents(spark, dir).select(col("doc_id"), t.as("t"))
    // top n-gram count per doc as explode → two hash aggregates keyed by
    // (doc, gram) then (doc) — codegen'd, LINEAR in tokens. The previous
    // form (array_max over filter-counts per distinct gram, all
    // interpreted HOFs) was O(grams²) PER DOCUMENT — 80 s of the sf0.01
    // Verify wall, and a per-row quadratic at any scale.
    // Docs shorter than the gram have no n-grams: sequence(1, nt-n+1)
    // would step DOWNWARD (start > stop defaults to step -1), so the
    // gram array short-circuits to empty; explode then drops the doc and
    // the left join below restores it with share 0.0.
    def topShare(n: Int, out: String): DataFrame = {
      val grams = when(size(col("t")) >= n,
        transform(sequence(lit(1), size(col("t")) - lit(n - 1)),
          i => concat_ws(" ", (0 until n).map(k => element_at(col("t"), i + lit(k))): _*)))
        .otherwise(array().cast("array<string>"))
      docs.select(col("doc_id"), size(col("t")).as("nt"), explode(grams).as("g"))
        .groupBy(col("doc_id"), col("nt"), col("g")).agg(count(lit(1)).as("c"))
        .groupBy(col("doc_id"), col("nt")).agg(max(col("c")).as("top"))
        // occurrences overlap, so count·n can exceed the doc: cap the
        // covered-token estimate at nt (an all-one-token doc scores 1.0)
        .select(col("doc_id"),
          round(least(col("top") * n, col("nt").cast("long")).cast("double")
            / col("nt"), 4).as(out))
    }
    docs.select(col("doc_id"),
        round(lit(1.0) - size(array_distinct(col("t"))).cast("double")
          / size(col("t")), 4).as("dup_tok_ratio"))
      .join(topShare(2, "top_bigram_frac"), Seq("doc_id"), "left")
      .join(topShare(3, "top_trigram_frac"), Seq("doc_id"), "left")
      .select(col("doc_id"), col("dup_tok_ratio"),
        coalesce(col("top_bigram_frac"), lit(0.0)).as("top_bigram_frac"),
        coalesce(col("top_trigram_frac"), lit(0.0)).as("top_trigram_frac"))
      .orderBy("doc_id")
  }

  /** Per-document top-3 TF-IDF terms. Ranking uses the RATIONAL surrogate
    * score c·N/(nt·df) — monotone in tf·idf for the reported rows because
    * ln is increasing, but computed purely from integer ratios, so both
    * engines produce bit-identical ranking doubles (a natural-log ulp
    * difference between libm and DuckDB could otherwise flip a near-tie);
    * the displayed tfidf column carries the standard (c/nt)·ln(N/df),
    * rounded. Scale shape: one explode + two hash aggregations keyed by
    * (term) then (doc_id, term) — uniform keys, map-side combine, no
    * driver state; the window ranks 3 rows per doc. */
  def tfidf(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val n = docs.count() // corpus size N for idf — one metadata-cheap count
    val toksWithCount = docs
      .select(col("doc_id"), size(toks).as("nt"), explode(toks).as("term"))
      .groupBy("doc_id", "nt", "term").agg(count(lit(1)).as("c"))
    val df_ = toksWithCount.groupBy("term")
      .agg(countDistinct(col("doc_id")).as("df"))
    val w = Window.partitionBy("doc_id").orderBy(col("score").desc, col("term"))
    toksWithCount.join(df_, Seq("term"))
      .withColumn("score",
        (col("c") * lit(n.toDouble)) / (col("nt") * col("df")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 3)
      .select(col("doc_id"), col("term"), col("rank"),
        round(col("c") / col("nt").cast("double") * log(lit(n.toDouble) / col("df")), 4)
          .as("tfidf"))
      .orderBy("doc_id", "rank")
  }

  /** Train/test contamination check — the decontamination operator every
    * training-data pipeline runs before an eval split ships: for each
    * TEST document (doc_id ≡ 0 mod 10), the fraction of its distinct
    * 3-gram shingles that appear in ANY train document. Shingle family
    * shared with Dedup (same tokenization, same n). Scale shape: the
    * train shingle set is corpus-sized, so membership is an equi JOIN on
    * the shingle (uniform key, shuffle both sides), never a broadcast or
    * driver-side set. The ratio is emitted UNROUNDED: IEEE division of
    * two exact integers is bit-identical across engines, while rounding a
    * rational double is the known decimal-boundary trap. */
  def contamination(spark: SparkSession, dir: String): DataFrame = {
    // same memo slot as ngramJaccard: one materialized shingle frame per
    // corpus serves both operators (and the test/train branches below)
    val sh = PersistSlots.cached(spark, s"ngram-shingles:$dir")(
      Dedup.shingles(spark, dir))
    val test = sh.filter(col("doc_id") % 10 === 0)
    val train = sh.filter(col("doc_id") % 10 =!= 0).select("s").distinct()
    test.join(train.withColumn("hit", lit(1L)), Seq("s"), "left")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_grams"),
        sum(coalesce(col("hit"), lit(0L))).as("n_contaminated"))
      .withColumn("ratio", col("n_contaminated").cast("double") / col("n_grams"))
      .orderBy("doc_id")
  }

  /** Corpus-level heavy hitters: the exact top-k terms by occurrence
    * (explode → hash agg with map-side combine → global top-k). The exact
    * form is the oracle; [[cmsTopTerms]] is the sketch path a 100 TB run
    * would use to pre-screen candidates without a full vocabulary shuffle.
    * Ties break on the term so the top-k cut is deterministic. */
  def topTerms(spark: SparkSession, dir: String, k: Int = 20): DataFrame =
    Tables.documents(spark, dir)
      .select(explode(toks).as("term"))
      .groupBy("term").agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("term"))
      .limit(k)

  /** Count-min-sketch estimates for a set of probe terms (Cormode &
    * Muthukrishnan 2005). The sketch is built by Spark's native
    * `stat.countMinSketch` — a treeAggregate of fixed-size (depth×width)
    * arrays, so the build is one map-side pass + a driver merge of
    * ~KB-sized sketches regardless of corpus size; estimates are
    * one-sided (≥ true count, ≤ true + εN with prob 1−δ). Used by
    * HeavyHittersSpec to assert the error law against [[topTerms]]. */
  def cmsTopTerms(spark: SparkSession, dir: String, probes: Seq[String],
      eps: Double = CmsEps, confidence: Double = CmsConfidence): Seq[(String, Long)] = {
    val terms = Tables.documents(spark, dir).select(explode(toks).as("term"))
    val cms = terms.stat.countMinSketch(col("term"), eps, confidence, seed = CmsSeed)
    probes.map(t => t -> cms.estimateCount(t))
  }

  /** CMS parameters shared by the batch path above and the streaming twin
    * (CmsStream): the stream ≡ batch CELL-IDENTICAL merge contract needs
    * the same eps/confidence/seed on both sides (same dims + hash
    * functions); re-declared copies could drift, and mismatched blobs
    * fail to merge (r9 review find). */
  val CmsEps = 0.001
  val CmsConfidence = 0.99
  val CmsSeed = 42

  /** The content-fingerprint key: md5 over case-folded, whitespace-
    * collapsed text. One definition — StreamClean's duplicate verdicts
    * are documented as keyed on EXACTLY this normalization. */
  private[graft] def fpCol(text: Column): Column =
    md5(trim(regexp_replace(lower(text), "\\s+", " ")))

  /** Content fingerprint: md5 over case-folded, whitespace-collapsed text —
    * the normalization-then-hash dedup key. */
  def fingerprint(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"), fpCol(col("text")).as("fp"))
      .orderBy("doc_id")

  /** Heuristic language ID: CJK charset ⇒ zh, else argmax of marker-word
    * hits with a fixed priority tiebreak (en > de > es > fr). Pure Column
    * expression — array of (score, priority, lang) structs reduced with
    * array_max, which compares structs lexicographically. */
  def langId(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"), predLangCol.as("pred_lang"))
      .orderBy("doc_id")

  /** The language prediction as a reusable Column over a `text` column
    * (shared by tx_langid, the composite cleaning pipeline, and the
    * streaming clean). */
  private[graft] def predLangCol: Column = {
    val t = toks
    val scored = LangMarkers.zipWithIndex.map { case ((lang, markers), i) =>
      struct(
        size(filter(t, x => x.isin(markers.map(s => s: Any): _*))).as("score"),
        lit(LangMarkers.size - i).as("prio"),
        lit(lang).as("lang"))
    }
    when(col("text").rlike("[\\u4e00-\\u9fff]"), lit("zh"))
      .otherwise(array_max(array(scored: _*)).getField("lang"))
  }

  /** PII redaction patterns, applied in order (SSN-shaped ids before
    * phone numbers — fixed-width alternatives must not race). Each is a
    * (name, regex, replacement) triple; the regexes are deliberately
    * RE2-safe (no backreferences, no lookaround) so the exact same
    * pattern strings run under Spark's Java regex AND the DuckDB oracle. */
  val PiiPatterns: Seq[(String, String, String)] = Seq(
    ("email", "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ssn", "\\b\\d{3}-\\d{2}-\\d{4}\\b", "<ID>"),
    ("phone", "\\b\\d{3}-\\d{3}-\\d{4}\\b", "<PHONE>"),
    ("ip", "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b", "<IP>"),
  )

  /** Redact all PII patterns from a text column — the reusable scrubbing
    * operator (pure codegen'd regexp_replace chain, scan-bound). */
  def redactPii(c: Column): Column =
    PiiPatterns.foldLeft(c) { case (acc, (_, pat, repl)) => regexp_replace(acc, pat, repl) }

  /** PII scrubbing over the corpus. The synthetic corpus carries no PII,
    * so the query first APPENDS deterministic doc_id-derived contact
    * blocks (emails / phones / IPs / SSN-shaped ids, on disjoint doc_id
    * residues so counts vary and most docs stay clean) — the oracle
    * builds the identical enriched text in SQL, which makes the
    * redaction semantics themselves the thing under hash-compare. */
  def piiScrub(spark: SparkSession, dir: String): DataFrame = {
    val id = col("doc_id")
    def mod(m: Int) = (id % m).cast("string")
    val enriched = concat(col("text"),
      when(id % 3 === 0, concat(lit(" contact user"), id.cast("string"),
        lit("@ex"), mod(7), lit(".com"))).otherwise(lit("")),
      when(id % 4 === 0, concat(lit(" tel 555-"), lpad(mod(1000), 3, "0"),
        lit("-"), lpad(mod(10000), 4, "0"))).otherwise(lit("")),
      when(id % 5 === 0, concat(lit(" host 10."), mod(256), lit(".0."), mod(100)))
        .otherwise(lit("")),
      when(id % 7 === 0, concat(lit(" ref 123-45-"), lpad(mod(10000), 4, "0")))
        .otherwise(lit("")))
    def nMatches(pat: String) = (size(split(col("t"), pat, -1)) - 1).cast("long")
    Tables.documents(spark, dir)
      .select(id, enriched.as("t"))
      .select(id,
        nMatches(PiiPatterns(0)._2).as("n_email"),
        nMatches(PiiPatterns(1)._2).as("n_ssn"),
        nMatches(PiiPatterns(2)._2).as("n_phone"),
        nMatches(PiiPatterns(3)._2).as("n_ip"),
        redactPii(col("t")).as("scrubbed"))
      .orderBy("doc_id")
  }

  /** Adaptive per-domain quality gating: instead of one global threshold
    * (the [[quality]] signals compared against fixed cutoffs), calibrate
    * the cutoff PER LANGUAGE as that language's q-quantile of the score —
    * the CCNet-style recalibration that keeps a fixed-threshold filter
    * from silently over-dropping a whole low-resource language whose
    * score distribution sits lower. Score here = alphabetic-character
    * ratio (the cheapest [[quality]] signal); the machinery generalizes
    * to any scalar.
    *
    * Scale shape: thresholds collapse to one row per language (exact
    * interpolated percentile, the report_corpus convention) and ride a
    * broadcast back onto the scan — the corpus is read once, the gate is
    * a scan-fused comparison. Scores are rounded (6 dp) BEFORE the
    * percentile so both engines interpolate identical inputs.
    *
    * Quantile path: EXACT `percentile` buffers every score of a group in
    * one aggregation buffer — fine at oracle SF (hash-match with DuckDB),
    * a giant-state agg for a dominant language at corpus scale. The
    * `exactQuantiles = false` path swaps in `approx_percentile`
    * (GK sketch, bounded state, map-side mergeable) — the 100 TB form;
    * AdaptiveQuantileSpec pins the two within the sketch's rank error on
    * the fixture. */
  def adaptiveQuality(spark: SparkSession, dir: String, q: Double = 0.10,
      exactQuantiles: Boolean = true): DataFrame = {
    val alpha = length(regexp_replace(col("text"), "[^A-Za-z]", ""))
      .cast("double") / length(col("text"))
    val scored = Tables.documents(spark, dir)
      .select(col("doc_id"), col("lang"), round(alpha, 6).as("score"))
    val thrExpr = if (exactQuantiles) s"percentile(score, $q)"
      // accuracy 1000 (rank error ≤ n/1000): sketch compression cost grows
      // with accuracy — 10000 measured 20× slower than the exact sort at
      // 10× while 1000 is faster than it; the fixture-adjacency guarantee
      // (rank error < 1) holds for groups under 1000 rows either way
      else s"approx_percentile(score, $q, 1000)"
    val thr = scored.groupBy("lang")
      .agg(round(expr(thrExpr), 6).as("thr"))
    scored.join(broadcast(thr), Seq("lang"))
      .withColumn("keep", col("score") >= col("thr"))
      .select("doc_id", "lang", "score", "thr", "keep")
      .orderBy("doc_id")
  }

  /** Segment width for boilerplate removal (distinct from Dedup.SpanTokens
    * so the two operators' artifacts can't be confused). */
  val BoilerSeg = 8

  /** Cross-document boilerplate removal (the CCNet / RefinedWeb rule:
    * a LINE recurring across many documents of one domain is navigation/
    * footer boilerplate, not content — Wenzek et al. 2020 §4.1 dedups
    * "all documents... at the paragraph level" for exactly this; Penedo
    * et al. 2023 §G filter lines duplicated across pages of a domain).
    * This corpus has no newlines, so the "line" unit is the non-
    * overlapping BoilerSeg-token segment, and the rule is COUNT-based:
    * a segment seen in ≥2 DISTINCT docs of the same source is removed
    * from ALL of them — distinct from [[Dedup.spanDedup]]'s global
    * first-occurrence rule, which keeps the first copy and is source-
    * blind. Output per doc: segment counts and the reassembled clean
    * text (NULL when everything was boilerplate).
    *
    * Scale shape: segment explode (narrow), one (source, segment)
    * distinct-count agg — the distinct pre-aggregates on (source, seg,
    * doc_id) so a segment repeated 10⁶ times INSIDE one doc collapses
    * map-side — then a join back on the same key and a per-doc
    * reassembly agg whose state is bounded by document length. */
  def boilerplate(spark: SparkSession, dir: String): DataFrame = {
    val t = toks
    val segs = Tables.documents(spark, dir)
      .select(col("doc_id"), col("source"), posexplode(
        transform(sequence(lit(0L), ceil(size(t) / lit(BoilerSeg.toDouble)) - 1),
          i => array_join(slice(t, (i * BoilerSeg + 1).cast("int"), lit(BoilerSeg)), " ")))
        .as(Seq("seg_idx", "seg")))
    val counts = segs.groupBy("source", "seg")
      .agg(countDistinct("doc_id").as("dc"))
    segs.join(counts, Seq("source", "seg"))
      .withColumn("is_bp", col("dc") >= 2)
      .groupBy("doc_id")
      .agg(
        count(lit(1)).as("n_segs"),
        sum(when(col("is_bp"), 1L).otherwise(0L)).as("n_removed"),
        collect_list(when(!col("is_bp"), struct(col("seg_idx"), col("seg")))).as("kept"))
      .select(col("doc_id"), col("n_segs"), col("n_removed"),
        when(size(col("kept")) === 0, lit(null).cast("string"))
          .otherwise(array_join(transform(sort_array(col("kept")), x => x("seg")), " "))
          .as("text_clean"))
      .orderBy("doc_id")
  }

  /** Winnowing k-gram size (word-grams here; the paper uses char-grams —
    * the guarantee carries over with tokens as the alphabet). */
  val WinK = 3

  /** Winnowing window: one fingerprint selected per WinW consecutive
    * gram hashes → density 2/(WinW+1), and any shared token run of
    * ≥ WinW + WinK − 1 tokens shares ≥ 1 fingerprint. */
  val WinW = 4

  /** Winnowing document fingerprints (Schleimer, Wilkerson & Aiken,
    * SIGMOD 2003 — the MOSS local fingerprinting scheme): hash every
    * WinK-gram, slide a WinW window over the hash sequence, select the
    * window MINIMUM (rightmost on ties), dedupe selections. Guarantees
    * (unlike minhash, which is global per doc): every shared run of
    * ≥ WinW+WinK−1 tokens between two documents shares a fingerprint,
    * at a bounded ~2/(WinW+1) sample density.
    *
    * Hash family is md5 hex (the [[Dedup]] discipline): window min =
    * lexicographic min over fixed-width hex strings, identical in both
    * engines — no integer-width or libm trap. Short docs clamp to one
    * window over all their grams; docs under WinK tokens emit nothing.
    *
    * Scale shape: pure per-row Column math (grams, window mins and
    * rightmost-argmin all inside the token array) + one explode — scan-
    * bound, zero shuffle before the output sort; the fingerprint table
    * is the ~2/(WinW+1)-density artifact downstream copy-detection joins
    * consume. */
  def winnowing(spark: SparkSession, dir: String): DataFrame = {
    // window-function form end to end, not per-row lambda folds: HOFs
    // (transform/aggregate) run INTERPRETED (~50 µs/step measured — 15 s
    // at sf0.1), while lead() gram assembly and min-over-a-row-window are
    // codegen'd and share ONE doc_id exchange + per-doc sort
    // (embarrassingly parallel, no skew — docs are length-bounded).
    // min(struct(h, −i)) picks the window's min hash AND its rightmost
    // tie position in one pass (struct ordering is lexicographic: h
    // first, then min(−i) = max i).
    val dw = Window.partitionBy("doc_id").orderBy("i")
    val g = Tables.documents(spark, dir)
      .select(col("doc_id"), posexplode(toks).as(Seq("i0", "tok")))
      .select(col("doc_id"), (col("i0") + 1).as("i"), col("tok"))
      .select(col("doc_id"), col("i"),
        md5(concat_ws(" ",
          col("tok") +: (1 until WinK).map(k => lead("tok", k).over(dw)): _*)).as("h"),
        // a full WinK-gram exists iff the last member does (split() never
        // yields nulls, so a null lead means end-of-doc)
        lead("tok", WinK - 1).over(dw).isNotNull.as("full"))
      .filter(col("full"))
    val win = Window.partitionBy("doc_id").orderBy("i").rowsBetween(0, WinW - 1)
    g.select(col("doc_id"), col("i").as("j"),
        min(struct(col("h").as("h"), (-col("i")).as("ni"))).over(win).as("mn"),
        count(lit(1)).over(win).as("wlen"))
      // full windows, plus the clamped j = 1 window of gram-poor docs
      .filter(col("wlen") === WinW || col("j") === 1)
      .select(col("doc_id"), (-col("mn.ni")).cast("int").as("pos"), col("mn.h").as("fp"))
      .distinct()
      .orderBy("doc_id", "pos")
  }

  /** Pair floor for winnowing copy detection: with density 2/(WinW+1)
    * a shared fingerprint stands for ~(WinW+1)/2 shared grams, so 5
    * shared fingerprints ≈ a dozen shared 3-gram windows. */
  val WinMinShared = 5

  /** Max doc-frequency for a fingerprint to enter the pair join: a
    * fingerprint shared by more docs than this is boilerplate, not
    * copying, and its join bucket is df² pairs — one license header
    * shared by 10⁶ docs is a 10¹²-pair bucket at corpus scale. Dropping
    * it caps the worst bucket at WinMaxFpDf² while only LOWERING shared
    * counts (a pair sharing nothing but boilerplate drops out — the
    * intended stop-list semantics, same as ngramJaccard's). Fixture max
    * df is 7, so oracle SFs are untouched; the oracle SQL applies the
    * same cap, keeping the two engines equivalent at ANY SF. */
  val WinMaxFpDf = 50

  /** Winnowing copy-detection pairs — the MOSS join (Schleimer 2003 §5):
    * documents sharing ≥ WinMinShared selected fingerprints. This is
    * what the fingerprint table EXISTS for: the join runs over the
    * ~2/(WinW+1)-density artifact instead of full shingle sets (cf.
    * dd_ngram_jaccard's inverted index — same candidates-then-count
    * shape at a fraction of the index size), and the winnowing guarantee
    * bounds what it can miss: any shared run of ≥ WinW+WinK−1 tokens
    * contributes at least one shared fingerprint.
    *
    * Scale shape: distinct (doc, fp) → df stop-list ([[WinMaxFpDf]]) →
    * fp-keyed equi self-join → pair hash agg. */
  def winnowPairs(spark: SparkSession, dir: String): DataFrame =
    winnowPairsImpl(spark, dir, WinMaxFpDf)

  /** The pair join with an explicit df cap (Int.MaxValue = uncapped, for
    * the spec's capped-vs-uncapped contrast on a constructed hot-fp
    * corpus). */
  def winnowPairsImpl(spark: SparkSession, dir: String,
      maxFpDocFreq: Int): DataFrame = {
    // slot-materialized: the capped plan reads the fingerprint table from
    // THREE branches (df aggregate + both self-join sides) and would
    // recompute the posexplode+window winnowing pipeline per branch (a
    // measured 1.4× at 10×); the slot holds the small (doc_id, fp) rows.
    // fp rides as BINARY(16) (r10, guide §2.3 — narrower keys): unhex is
    // injective on md5 hex, so the distinct/join/count structure is
    // untouched while the self-join's key exchange carries 16 bytes
    // instead of a 32-char string and compares bytes instead of UTF8.
    val fps = PersistSlots.cached(spark, s"winnow-fps:$dir")(
      winnowing(spark, dir).select(col("doc_id"), unhex(col("fp")).as("fp")).distinct())
    val joinable =
      if (maxFpDocFreq == Int.MaxValue) fps
      else {
        // hash-agg + equi join on fp, NOT a count-window: a window over
        // the fp partition runs through sort-based WindowExec (measured
        // 24 s vs 7 s at 10× — the full fps frame sorts by fp), while
        // the df table is fingerprint-cardinality-sized and its join
        // rides the same fp-keyed exchange the self-join needs anyway.
        // Slot-materialized (r9 optimization round): the stop-list is a
        // per-corpus artifact and its aggregation re-ran inside every
        // pass's broadcast build (~0.6 s/pass at sf0.1)
        val df = PersistSlots.cached(spark, s"winnow-df:$maxFpDocFreq:$dir")(
          fps.groupBy("fp").agg(count(lit(1)).as("docfreq"))
            .filter(col("docfreq") <= maxFpDocFreq))
        fps.join(df.select("fp"), Seq("fp"))
      }
    joinable.select(col("doc_id").as("a_id"), col("fp"))
      .join(joinable.select(col("doc_id").as("b_id"), col("fp")), Seq("fp"))
      .filter(col("a_id") < col("b_id"))
      .groupBy("a_id", "b_id").agg(count(lit(1)).as("shared"))
      .filter(col("shared") >= WinMinShared)
      .orderBy("a_id", "b_id")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "tx_winnowing" -> winnowing _,
    "dd_winnow_pairs" -> winnowPairs _,
    // the streaming MOSS twin replayed in batch mode (VERDICT r7 #7):
    // same two keyed-state stages the stream runs, handed the static
    // corpus — the driver's oracle (the dd_winnow_pairs SQL) now gates
    // the streaming code path, not just its spec
    "dd_moss_stream" -> ((s: SparkSession, d: String) =>
      graft.streaming.MossStreams.confirmedPairs(s,
          Tables.documents(s, d).select("doc_id", "text"))
        .filter(col("ok"))
        .select(col("a_id"), col("b_id"), col("shared"))
        .orderBy("a_id", "b_id")),
    "tx_boilerplate" -> boilerplate _,
    "tx_quality_adaptive" -> ((s: SparkSession, d: String) => adaptiveQuality(s, d)),
    "tx_pii" -> piiScrub _,
    "tx_lang_stats" -> langStats _,
    "tx_tokens" -> tokenCounts _,
    "tx_quality" -> quality _,
    "tx_fingerprint" -> fingerprint _,
    "tx_langid" -> langId _, // oracled below; accuracy also checked in ExtensionsSpec
    "tx_repetition" -> repetition _,
    "tx_tfidf" -> tfidf _,
    "tx_contamination" -> contamination _,
    "tx_top_terms" -> ((s: SparkSession, d: String) => topTerms(s, d)),
  )

  private def inList(xs: Seq[String]) = xs.map(s => s"'$s'").mkString("(", ",", ")")

  // window starts: full windows (wlen = WinW), plus the clamped j = 1
  // window for docs with fewer grams than the window; rightmost argmin
  // via MAX(i) over the window's min-hash positions. Shared by the
  // fingerprint dump and the copy-detection pair oracle.
  private val winnowCte =
    s"""WITH d AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
      |g AS (SELECT doc_id, i, md5(${(0 until WinK).map(k => s"t[i+$k]").mkString(" || ' ' || ")}) AS h
      |FROM d, LATERAL (SELECT unnest(generate_series(1, len(t) - ${WinK - 1})) AS i)),
      |wm AS (SELECT doc_id, i AS j,
      |MIN(h) OVER (PARTITION BY doc_id ORDER BY i ROWS BETWEEN CURRENT ROW AND ${WinW - 1} FOLLOWING) AS winmin,
      |COUNT(*) OVER (PARTITION BY doc_id ORDER BY i ROWS BETWEEN CURRENT ROW AND ${WinW - 1} FOLLOWING) AS wlen
      |FROM g),
      |sel AS (SELECT wm.doc_id, wm.j, wm.winmin, MAX(g2.i) AS pos
      |FROM wm JOIN g g2 ON g2.doc_id = wm.doc_id
      |AND g2.i BETWEEN wm.j AND wm.j + ${WinW - 1} AND g2.h = wm.winmin
      |WHERE wm.wlen = $WinW OR wm.j = 1
      |GROUP BY 1, 2, 3)""".stripMargin

  /** Shared by dd_winnow_pairs and its streaming-replay twin
    * dd_moss_stream — identical semantics, one SQL. */
  private val winnowPairsSql: String =
    s"""$winnowCte,
      |fps AS (SELECT DISTINCT doc_id, winmin AS fp FROM sel),
      |ok AS (SELECT fp FROM fps GROUP BY fp HAVING COUNT(*) <= $WinMaxFpDf),
      |j AS (SELECT doc_id, fp FROM fps WHERE fp IN (SELECT fp FROM ok))
      |SELECT a.doc_id AS a_id, b.doc_id AS b_id, COUNT(*) AS shared
      |FROM j a JOIN j b ON a.fp = b.fp AND a.doc_id < b.doc_id
      |GROUP BY 1, 2 HAVING COUNT(*) >= $WinMinShared
      |ORDER BY a_id, b_id""".stripMargin.replaceAll("\n", " ")

  val oracleSql: Map[String, String] = Map(
    "tx_winnowing" ->
      s"""$winnowCte
        |SELECT DISTINCT doc_id, CAST(pos AS INT) AS pos, winmin AS fp
        |FROM sel ORDER BY doc_id, pos""".stripMargin.replaceAll("\n", " "),
    "dd_winnow_pairs" -> winnowPairsSql,
    "dd_moss_stream" -> winnowPairsSql,
    "tx_boilerplate" ->
      s"""WITH toks AS (SELECT doc_id, source, string_split(text, ' ') t FROM documents),
        |seg AS (SELECT doc_id, source, i - 1 AS seg_idx,
        |list_aggregate(t[(i-1)*$BoilerSeg+1 : i*$BoilerSeg], 'string_agg', ' ') AS s
        |FROM toks, LATERAL (SELECT unnest(generate_series(1, CAST(ceil(len(t)/$BoilerSeg.0) AS INT))) i)),
        |c AS (SELECT source, s, count(DISTINCT doc_id) AS dc FROM seg GROUP BY 1, 2)
        |SELECT seg.doc_id, count(*) AS n_segs,
        |CAST(sum(CASE WHEN c.dc >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_removed,
        |string_agg(CASE WHEN c.dc < 2 THEN seg.s END, ' ' ORDER BY seg.seg_idx) AS text_clean
        |FROM seg JOIN c ON seg.source = c.source AND seg.s = c.s
        |GROUP BY seg.doc_id ORDER BY seg.doc_id""".stripMargin.replaceAll("\n", " "),
    "tx_quality_adaptive" ->
      """WITH s AS (SELECT doc_id, lang,
        |ROUND(CAST(length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS DOUBLE)
        |/ length(text), 6) AS score FROM documents),
        |t AS (SELECT lang, ROUND(quantile_cont(score, 0.1), 6) AS thr FROM s GROUP BY 1)
        |SELECT doc_id, s.lang, score, thr, score >= thr AS keep
        |FROM s JOIN t USING (lang) ORDER BY doc_id""".stripMargin.replaceAll("\n", " "),
    "tx_pii" -> {
      // enrichment + patterns generated from PiiPatterns so the two
      // engines cannot drift
      val Seq(email, ssn, phone, ip) = PiiPatterns.map(_._2)
      val repl = PiiPatterns.foldLeft("t") { case (acc, (_, pat, r)) =>
        s"regexp_replace($acc, '$pat', '$r', 'g')"
      }
      def n(pat: String, as: String) =
        s"CAST(len(regexp_split_to_array(t, '$pat')) - 1 AS BIGINT) AS $as"
      """WITH enriched AS (SELECT doc_id, text ||
        |CASE WHEN doc_id % 3 = 0 THEN ' contact user' || doc_id || '@ex' || (doc_id % 7) || '.com' ELSE '' END ||
        |CASE WHEN doc_id % 4 = 0 THEN ' tel 555-' || lpad(CAST(doc_id % 1000 AS VARCHAR), 3, '0') || '-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') ELSE '' END ||
        |CASE WHEN doc_id % 5 = 0 THEN ' host 10.' || (doc_id % 256) || '.0.' || (doc_id % 100) ELSE '' END ||
        |CASE WHEN doc_id % 7 = 0 THEN ' ref 123-45-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') ELSE '' END AS t
        |FROM documents)
        |SELECT doc_id, """.stripMargin.replaceAll("\n", " ") +
        s"${n(email, "n_email")}, ${n(ssn, "n_ssn")}, ${n(phone, "n_phone")}, " +
        s"${n(ip, "n_ip")}, $repl AS scrubbed FROM enriched ORDER BY doc_id"
    },
    "tx_lang_stats" ->
      """SELECT lang, COUNT(*) AS c, CAST(SUM(n_chars) AS BIGINT) AS s
        |FROM documents GROUP BY lang ORDER BY lang""".stripMargin.replaceAll("\n", " "),
    "tx_tokens" ->
      """SELECT doc_id, CAST(len(string_split(text,' ')) AS BIGINT) AS nt,
        |CAST(len(list_filter(regexp_split_to_array(text,'[^A-Za-z0-9]+'), x -> length(x) > 0)) AS BIGINT) AS nw,
        |CAST(list_sum(list_transform(string_split(text,' '), t -> CAST(ceil(length(t)/4.0) AS BIGINT))) AS BIGINT) AS bpe_est
        |FROM documents ORDER BY doc_id""".stripMargin.replaceAll("\n", " "),
    "tx_quality" ->
      ("""SELECT doc_id,
        |CAST(len(string_split(text,' ')) AS BIGINT) AS n_tokens,
        |ROUND(list_sum(list_transform(string_split(text,' '), x -> CAST(length(x) AS DOUBLE)))
        |/ len(string_split(text,' ')), 4) AS avg_tok_len,
        |ROUND(CAST(len(list_filter(string_split(text,' '), x -> x IN """ + inList(Stopwords) + """)) AS DOUBLE)
        |/ len(string_split(text,' ')), 4) AS stop_ratio,
        |ROUND(CAST(length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS DOUBLE)
        |/ length(text), 4) AS alpha_ratio
        |FROM documents ORDER BY doc_id""").stripMargin.replaceAll("\n", " "),
    "tx_fingerprint" ->
      """SELECT doc_id, md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS fp
        |FROM documents ORDER BY doc_id""".stripMargin.replaceAll("\n", " "),
    "tx_repetition" ->
      """WITH s AS (SELECT doc_id, string_split(text,' ') AS t FROM documents),
        |g AS (SELECT doc_id, t, len(t) AS nt,
        |list_transform(range(1, len(t)), i -> t[i] || ' ' || t[i+1]) AS bg,
        |list_transform(range(1, len(t)-1), i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]) AS tg
        |FROM s)
        |SELECT doc_id,
        |ROUND(1.0 - CAST(len(list_distinct(t)) AS DOUBLE) / nt, 4) AS dup_tok_ratio,
        |ROUND(CAST(LEAST(COALESCE(list_max(list_transform(list_distinct(bg),
        |b -> len(list_filter(bg, x -> x = b)))), 0) * 2, nt) AS DOUBLE) / nt, 4) AS top_bigram_frac,
        |ROUND(CAST(LEAST(COALESCE(list_max(list_transform(list_distinct(tg),
        |b -> len(list_filter(tg, x -> x = b)))), 0) * 3, nt) AS DOUBLE) / nt, 4) AS top_trigram_frac
        |FROM g ORDER BY doc_id""".stripMargin.replaceAll("\n", " "),
    "tx_langid" ->
      (s"WITH s AS (SELECT doc_id, text, $langScoreSql FROM documents) " +
        s"SELECT doc_id, $langCaseSql AS pred_lang FROM s ORDER BY doc_id"),
    "tx_tfidf" ->
      """WITH n AS (SELECT COUNT(*) cnt FROM documents),
        |d AS (SELECT doc_id, string_split(text,' ') t FROM documents),
        |tc AS (SELECT doc_id, len(t) nt, tok AS term, COUNT(*) c
        |FROM d, LATERAL (SELECT unnest(t) AS tok) GROUP BY 1,2,3),
        |dfreq AS (SELECT term, COUNT(DISTINCT doc_id) df FROM tc GROUP BY 1),
        |scored AS (SELECT doc_id, term, nt, c, df,
        |(c * CAST(n.cnt AS DOUBLE)) / (nt * df) AS score
        |FROM tc JOIN dfreq USING (term) CROSS JOIN n),
        |ranked AS (SELECT doc_id, term, c, nt, df,
        |row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, term) rnk
        |FROM scored)
        |SELECT r.doc_id, r.term, CAST(r.rnk AS INTEGER) AS rank,
        |ROUND(r.c / CAST(r.nt AS DOUBLE) * ln(CAST(n.cnt AS DOUBLE) / r.df), 4) AS tfidf
        |FROM ranked r CROSS JOIN n WHERE r.rnk <= 3
        |ORDER BY doc_id, rank""".stripMargin.replaceAll("\n", " "),
    "tx_contamination" ->
      """WITH toks AS (SELECT doc_id, string_split(text,' ') t FROM documents),
        |sh AS (SELECT DISTINCT doc_id, t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS s
        |FROM toks, LATERAL (SELECT unnest(generate_series(1, len(t)-2)) i)),
        |test AS (SELECT * FROM sh WHERE doc_id % 10 = 0),
        |train AS (SELECT DISTINCT s FROM sh WHERE doc_id % 10 <> 0)
        |SELECT t.doc_id, CAST(COUNT(*) AS BIGINT) AS n_grams,
        |CAST(SUM(CASE WHEN tr.s IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_contaminated,
        |CAST(SUM(CASE WHEN tr.s IS NOT NULL THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*) AS ratio
        |FROM test t LEFT JOIN train tr ON t.s = tr.s
        |GROUP BY 1 ORDER BY 1""".stripMargin.replaceAll("\n", " "),
    "tx_top_terms" ->
      """SELECT term, COUNT(*) AS c
        |FROM (SELECT unnest(string_split(text,' ')) AS term FROM documents)
        |GROUP BY term ORDER BY c DESC, term LIMIT 20""".stripMargin.replaceAll("\n", " "),
  )

  /** DuckDB marker-score columns s_<lang>, generated from LangMarkers so
    * Spark and oracle can't drift (shared with the pipeline oracle). */
  private[operators] def langScoreSql: String =
    LangMarkers.map { case (lang, markers) =>
      s"len(list_filter(string_split(text,' '), x -> x IN ${inList(markers)})) AS s_$lang"
    }.mkString(", ")

  /** DuckDB CASE over the s_<lang> columns + the CJK short-circuit; tie
    * priority = LangMarkers order (en > de > es > fr), like the
    * (score, prio) struct max on the Spark side. */
  private[operators] def langCaseSql: String = {
    val langs = LangMarkers.map(_._1)
    val cases = langs.init.zipWithIndex.map { case (l, i) =>
      val rest = langs.drop(i + 1).map(o => s"s_$l >= s_$o").mkString(" AND ")
      s"WHEN $rest THEN '$l'"
    }.mkString(" ")
    "CASE WHEN regexp_matches(text, '[\\x{4e00}-\\x{9fff}]') THEN 'zh' " +
      cases + s" ELSE '${langs.last}' END"
  }
}

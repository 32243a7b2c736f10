package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Distributed n-gram language model + per-document perplexity scoring —
  * the CCNet-style quality signal (Wenzek et al. 2020 train a KenLM and
  * rank CommonCrawl documents by perplexity; low-perplexity ≈ clean
  * prose). This is the trainable counterpart to the heuristic rules in
  * [[TextAnalysis.quality]].
  *
  * Model: bigram LM with add-k smoothing,
  *   p(w₂|w₁) = (c(w₁w₂) + k) / (c(w₁) + k·V),
  * trained on the corpus itself (self-perplexity — the CCNet setup trains
  * on a clean reference corpus; the plan shape is identical).
  *
  * Scale shape at 100 TB: bigram/unigram counts are hash aggregations
  * over exploded token streams (uniform keys, map-side combine) producing
  * vocabulary-sized count tables; scoring joins each document's bigrams
  * against those tables on the n-gram key — shuffle joins on uniform
  * keys, never a broadcast of the corpus and no driver state (V is one
  * scalar aggregate). Per-doc cross entropy is then a single groupBy.
  *
  * Plan-shape note (measured, 10× ScaleUp corpus): pre-aggregating the
  * occurrence stream to per-doc bigram counts before the scoring joins
  * looks cheaper on paper but measured SLOWER (9.0 → 10.6 s warm) — the
  * (doc_id,w₁,w₂) pre-aggregation is a full shuffle of the occurrence
  * stream, while this form never shuffles it: the count tables aggregate
  * with map-side combine, AQE broadcasts them (they are vocabulary-sized),
  * and the per-doc groupBy partial-aggregates to one row per doc before
  * its exchange.
  *
  * Determinism for the cross-engine oracle: counts are exact integers in
  * both engines; the only floats are the final −avg(ln·) (rounded to 4dp;
  * a libm-ulp difference would need to land within ~1e-14 of a rounding
  * boundary to flip the hash) and ppl, which is exp() of the ALREADY
  * ROUNDED cross entropy so it inherits that determinism.
  */
object NgramLm {

  /** Add-k smoothing constant. */
  val K = 0.5

  /** Per-document bigram cross entropy (nats) and perplexity. */
  def perplexity(spark: SparkSession, dir: String): DataFrame = {
    // spread: the bigram explode + scoring joins are the narrow heavy
    // stage and run at scan parallelism (Tables.spread scaladoc)
    val docs = Tables.spread(spark, Tables.documents(spark, dir))
    val t = split(col("text"), " ")

    val bigrams = bigramsOf(docs)

    val uni = docs.select(explode(t).as("w1"))
      .groupBy("w1").agg(count(lit(1)).as("c1"))
    // V: one scalar aggregate over the vocabulary-sized frame (at 100 TB
    // this is a count of a table that already fits the shuffle tier)
    val v = uni.count().toDouble
    val bi = bigrams.groupBy("w1", "w2").agg(count(lit(1)).as("c12"))

    val xent = -avg(log((col("c12") + lit(K)) / (col("c1") + lit(K * v))))
    bigrams
      .join(bi, Seq("w1", "w2"))
      .join(uni, Seq("w1"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("m"), round(xent, 4).as("xent"))
      .withColumn("ppl", round(exp(col("xent")), 4))
      .orderBy("doc_id")
  }

  /** Bigram rows (doc_id, w1, w2) for any (doc_id, text) frame — works
    * identically on static and streaming input (pure flatMap). Guarded
    * for docs with <2 tokens: sequence(1, nt−1) would otherwise step
    * DOWNWARD (start > stop defaults to step −1) and element_at(t, 0)
    * throws — the short-doc trap that once crashed repetition(). Such
    * docs simply contribute no bigrams (matching the oracle, where
    * generate_series(1, 0) is empty). */
  private def bigramsOf(docs: DataFrame): DataFrame = {
    val t = split(col("text"), " ")
    val starts = when(size(t) >= 2, sequence(lit(1), size(t) - 1))
      .otherwise(array().cast("array<int>"))
    docs.select(col("doc_id"),
        explode(transform(starts, i =>
          struct(element_at(t, i).as("w1"), element_at(t, i + lit(1)).as("w2")))).as("bg"))
      .select(col("doc_id"), col("bg.w1").as("w1"), col("bg.w2").as("w2"))
  }

  /** Score a STREAM of documents against the frozen LM trained on `dir` —
    * the serve half of the CCNet setup (train once on a clean corpus,
    * score every arriving crawl doc). Stream-static joins: each
    * micro-batch's bigrams join the static count tables (broadcast-sized
    * here; uniform-key shuffle joins past broadcast size), then one
    * streaming per-doc aggregation (update mode — each doc arrives whole
    * in a batch). LEFT joins + coalesce handle n-grams the frozen LM has
    * never seen (c=0 smoothing mass), which self-scoring never hits but
    * fresh stream data will. */
  def scoreStream(spark: SparkSession, dir: String, docs: DataFrame): DataFrame = {
    val trainBigrams = bigramsOf(Tables.documents(spark, dir))
    val uni = Tables.documents(spark, dir)
      .select(explode(split(col("text"), " ")).as("w1"))
      .groupBy("w1").agg(count(lit(1)).as("c1"))
    val v = uni.count().toDouble
    val bi = trainBigrams.groupBy("w1", "w2").agg(count(lit(1)).as("c12"))
    val logp = log((coalesce(col("c12"), lit(0L)) + lit(K)) /
      (coalesce(col("c1"), lit(0L)) + lit(K * v)))
    bigramsOf(docs)
      .join(bi, Seq("w1", "w2"), "left")
      .join(uni, Seq("w1"), "left")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("m"), round(-avg(logp), 4).as("xent"))
      .withColumn("ppl", round(exp(col("xent")), 4))
  }

  /** Absolute discount for interpolated Kneser-Ney. */
  val KnD = 0.75

  /** Per-document perplexity under an interpolated Kneser-Ney bigram LM
    * (Kneser & Ney 1995; Chen & Goodman 1999 empirically crown it among
    * n-gram smoothers — KenLM, the CCNet scorer, implements exactly this
    * family):
    *
    *   p(w₂|w₁) = max(c₁₂ − d, 0)/c₁ + (d·N₁₊(w₁·)/c₁)·p_cont(w₂)
    *   p_cont(w₂) = N₁₊(·w₂) / N₁₊(··)
    *
    * The continuation distribution counts DISTINCT left contexts, not
    * raw frequency — the "San Francisco" insight: "Francisco" is
    * frequent but predictable only after "San", so its unigram backoff
    * mass should be tiny. [[perplexity]]'s add-k form can't express
    * that; this is the quality-scoring upgrade, not a replacement (both
    * stay registered).
    *
    * Scale shape identical to [[perplexity]]: four count tables off the
    * exploded bigram stream (c₁₂, c₁, N₁₊(w₁·), N₁₊(·w₂) — all hash
    * aggs with map-side combine, vocabulary-sized), one scalar bigram-
    * type count, scoring joins on uniform n-gram keys, one per-doc agg.
    * Self-scoring means every scored bigram has c₁₂ ≥ 1 > d, so the
    * max(·,0) clamp never zeroes a seen pair; fresh-data scoring reuses
    * the scoreStream left-join discipline.
    *
    * Determinism: every count is an exact integer in both engines; the
    * probability is one fixed parenthesization of IEEE ops, and the
    * final −avg(ln·) rounds to 4dp (the tx_perplexity discipline). */
  def perplexityKn(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.spread(spark, Tables.documents(spark, dir))
    val bigrams = bigramsOf(docs)
    val bi = bigrams.groupBy("w1", "w2").agg(count(lit(1)).as("c12"))
    // the KN count tables: the denominator is the LEFT-CONTEXT count
    // Σc₁₂(w₁,·), not the raw unigram count — they differ for document-
    // final words, and only the former makes p(·|w₁) a true distribution
    // (the simplex law MixtureSpec asserts); nfol/nprec count DISTINCT
    // continuations/contexts
    val cl = bi.groupBy("w1").agg(sum("c12").as("c1"))          // Σc₁₂(w₁·)
    val nfol = bi.groupBy("w1").agg(count(lit(1)).as("nfol"))   // N₁₊(w₁·)
    val nprec = bi.groupBy("w2").agg(count(lit(1)).as("nprec")) // N₁₊(·w₂)
    val btypes = bi.count().toDouble                            // N₁₊(··)
    val p = (greatest(col("c12") - lit(KnD), lit(0.0)) / col("c1")) +
      ((lit(KnD) * col("nfol")) / col("c1")) * (col("nprec") / lit(btypes))
    bigrams
      .join(bi, Seq("w1", "w2"))
      .join(cl, Seq("w1"))
      .join(nfol, Seq("w1"))
      .join(nprec, Seq("w2"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("m"), round(-avg(log(p)), 4).as("xent"))
      .withColumn("ppl", round(exp(col("xent")), 4))
      .orderBy("doc_id")
  }

  /** Collocation floor: pairs seen fewer times carry no PMI signal
    * (Church & Hanks 1990 recommend dropping hapax pairs outright). */
  val MinPairCount = 5

  /** Reported collocations. */
  val TopColloc = 20

  /** PMI collocation mining (Church & Hanks 1990 "Word Association
    * Norms, Mutual Information, and Lexicography") — the phrase-mining
    * signal: bigrams whose joint frequency beats the independence
    * expectation. PMI = ln(c₁₂·T / (c₁·c₂)); ranking and emission use
    * the RATIONAL lift c₁₂·T/(c₁·c₂) — ln is monotone, so top-k by lift
    * IS top-k by PMI, and the lift is one IEEE multiply/divide chain
    * over exact integer counts, bit-identical cross-engine (the
    * tx_tfidf libm discipline). Ties at the cut break on (w1, w2).
    *
    * Scale shape: the same two vocabulary-sized hash-agg count tables
    * the LM builds (uniform keys, map-side combine), two equi joins of
    * the MinPairCount-filtered bigram table against the unigram table,
    * and a global top-k (TakeOrdered — partial top-k per partition,
    * never a full sort). */
  def collocations(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.spread(spark, Tables.documents(spark, dir))
    val uni = docs.select(explode(split(col("text"), " ")).as("w"))
      .groupBy("w").agg(count(lit(1)).as("c"))
    // T: one scalar off the vocabulary-sized frame (the NgramLm V discipline)
    val t = uni.agg(sum("c")).collect()(0).getLong(0).toDouble
    val bi = bigramsOf(docs).groupBy("w1", "w2").agg(count(lit(1)).as("c12"))
      .filter(col("c12") >= MinPairCount)
    bi.join(uni.select(col("w").as("w1"), col("c").as("c1")), Seq("w1"))
      .join(uni.select(col("w").as("w2"), col("c").as("c2")), Seq("w2"))
      .select(col("w1"), col("w2"), col("c12"),
        (col("c12").cast("double") * lit(t) / (col("c1").cast("double") * col("c2").cast("double")))
          .as("lift"))
      .orderBy(desc("lift"), col("w1"), col("w2"))
      .limit(TopColloc)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "tx_perplexity" -> perplexity _,
    "tx_perplexity_kn" -> perplexityKn _,
    "tx_collocations" -> collocations _,
  )

  val oracleSql: Map[String, String] = Map(
    "tx_perplexity_kn" ->
      s"""WITH d AS (SELECT doc_id, string_split(text,' ') AS t FROM documents),
        |bg AS (SELECT doc_id, t[i] AS w1, t[i+1] AS w2
        |FROM d, LATERAL (SELECT unnest(generate_series(1, len(t)-1)) AS i)),
        |bc AS (SELECT w1, w2, COUNT(*) AS c12 FROM bg GROUP BY 1, 2),
        |uni AS (SELECT w1, CAST(SUM(c12) AS BIGINT) AS c1 FROM bc GROUP BY 1),
        |nf AS (SELECT w1, COUNT(*) AS nfol FROM bc GROUP BY 1),
        |np AS (SELECT w2, COUNT(*) AS nprec FROM bc GROUP BY 1),
        |bt AS (SELECT CAST(COUNT(*) AS DOUBLE) AS b FROM bc),
        |x AS (SELECT bg.doc_id, CAST(COUNT(*) AS BIGINT) AS m,
        |ROUND(-AVG(ln((GREATEST(bc.c12 - ${KnD}e0, 0.0e0) / uni.c1)
        |+ ((${KnD}e0 * nf.nfol) / uni.c1) * (np.nprec / bt.b))), 4) AS xent
        |FROM bg JOIN bc ON bg.w1 = bc.w1 AND bg.w2 = bc.w2
        |JOIN uni ON bg.w1 = uni.w1 JOIN nf ON bg.w1 = nf.w1
        |JOIN np ON bg.w2 = np.w2 CROSS JOIN bt
        |GROUP BY bg.doc_id)
        |SELECT doc_id, m, xent, ROUND(exp(xent), 4) AS ppl
        |FROM x ORDER BY doc_id""".stripMargin.replaceAll("\n", " "),
    "tx_collocations" ->
      s"""WITH d AS (SELECT doc_id, string_split(text,' ') AS t FROM documents),
        |uni AS (SELECT w, COUNT(*) AS c FROM (SELECT unnest(t) AS w FROM d) GROUP BY 1),
        |tot AS (SELECT CAST(SUM(c) AS DOUBLE) AS t FROM uni),
        |bi AS (SELECT t[i] AS w1, t[i+1] AS w2, COUNT(*) AS c12
        |FROM d, LATERAL (SELECT unnest(generate_series(1, len(t)-1)) AS i)
        |GROUP BY 1, 2 HAVING COUNT(*) >= $MinPairCount)
        |SELECT bi.w1, bi.w2, bi.c12,
        |bi.c12::DOUBLE * tot.t / (u1.c::DOUBLE * u2.c::DOUBLE) AS lift
        |FROM bi JOIN uni u1 ON bi.w1 = u1.w JOIN uni u2 ON bi.w2 = u2.w CROSS JOIN tot
        |ORDER BY lift DESC, bi.w1, bi.w2 LIMIT $TopColloc""".stripMargin
        .replaceAll("\n", " "),
    "tx_perplexity" ->
      s"""WITH d AS (SELECT doc_id, string_split(text,' ') AS t FROM documents),
        |bi AS (SELECT doc_id, t[i] AS w1, t[i+1] AS w2
        |FROM d, LATERAL (SELECT unnest(generate_series(1, len(t)-1)) AS i)),
        |uni AS (SELECT w1, COUNT(*) AS c1
        |FROM (SELECT unnest(t) AS w1 FROM d) GROUP BY 1),
        |vv AS (SELECT CAST(COUNT(*) AS DOUBLE) AS v FROM uni),
        |bc AS (SELECT w1, w2, COUNT(*) AS c12 FROM bi GROUP BY 1, 2),
        |x AS (SELECT bi.doc_id, CAST(COUNT(*) AS BIGINT) AS m,
        |ROUND(-AVG(ln((bc.c12 + $K) / (uni.c1 + $K * vv.v))), 4) AS xent
        |FROM bi JOIN bc ON bi.w1 = bc.w1 AND bi.w2 = bc.w2
        |JOIN uni ON bi.w1 = uni.w1 CROSS JOIN vv
        |GROUP BY bi.doc_id)
        |SELECT doc_id, m, xent, ROUND(exp(xent), 4) AS ppl
        |FROM x ORDER BY doc_id""".stripMargin.replaceAll("\n", " "),
  )
}

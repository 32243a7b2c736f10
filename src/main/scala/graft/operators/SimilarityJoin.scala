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
  * lists), a length filter (τ·max ≤ min is necessary for j ≥ τ), then
  * exact verification ∝ candidates. Registered as dd_ppjoin with the
  * SAME exact-pair-set oracle as dd_ngram_jaccard: a single missed
  * candidate fails the gate, making the lossless-ness a tested claim,
  * not a comment.
  */
object SimilarityJoin {

  /** Jaccard threshold shared with the Dedup family. */
  val Tau = 0.5

  /** Exact j ≥ τ near-dup pairs via prefix filtering + exact verify. */
  def ppjoinPairs(spark: SparkSession, dir: String): DataFrame = {
    val sh = PersistSlots.cached(spark, s"ppjoin-shingles:$dir")(
      Dedup.shingles(spark, dir))
    val sizes = sh.groupBy("doc_id").agg(count(lit(1)).as("n"))

    // global document frequency per shingle — the ordering key that makes
    // prefixes rare-first (and posting lists short where it matters)
    val freq = sh.groupBy("s").agg(count(lit(1)).as("df"))

    // per-doc ascending (df, s) order; prefix = first n − ceil(τ·n) + 1
    val pos = row_number().over(Window.partitionBy("doc_id").orderBy("df", "s"))
    val prefix = sh.join(freq, Seq("s"))
      .join(sizes, Seq("doc_id"))
      .withColumn("pos", pos)
      .filter(col("pos") <= col("n") - ceil(col("n") * lit(Tau)).cast("long") + 1)
      .select(col("doc_id"), col("s"), col("n"))

    // candidates: pairs sharing a prefix shingle, plus the length filter
    // (j ≥ τ ⇒ τ·max(|A|,|B|) ≤ min(|A|,|B|)); distinct before verify so
    // a pair sharing k prefix shingles is verified once, not k times
    val cand = prefix.select(col("doc_id").as("a_id"), col("s"), col("n").as("na"))
      .join(prefix.select(col("doc_id").as("b_id"), col("s"), col("n").as("nb")), Seq("s"))
      .filter(col("a_id") < col("b_id") &&
        least(col("na"), col("nb")) >= lit(Tau) * greatest(col("na"), col("nb")))
      .select("a_id", "b_id", "na", "nb")
      .distinct()

    // exact verification ∝ candidates: fan each candidate out over A's
    // shingles, count matches against B's shingle set
    val inter = cand
      .join(sh.select(col("doc_id").as("a_id"), col("s")), Seq("a_id"))
      .join(sh.select(col("doc_id").as("b_id"), col("s")), Seq("b_id", "s"))
      .groupBy("a_id", "b_id", "na", "nb").agg(count(lit(1)).as("c"))

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

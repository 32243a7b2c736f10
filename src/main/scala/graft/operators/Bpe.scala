package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Byte-pair-encoding tokenizer, trained distributed (Sennrich, Haddow &
  * Birch, ACL 2016 — the algorithm behind GPT-2/RoBERTa vocabularies;
  * the brief's "token counting (BPE-ish regex)" upgraded to the real
  * learned thing).
  *
  * Scale design, which is the whole point at 100 TB:
  *   - The corpus is reduced ONCE to a (word, count) table. Every
  *     training iteration then works on the WORD VOCABULARY (Heaps' law:
  *     ~10⁶–10⁷ rows for a 10¹¹-token corpus), never the corpus itself.
  *   - One merge round = one map-side-combined pair-count aggregation
  *     over the vocab plus a distributed top-1 (orderBy.limit(1)) — no
  *     driver-side scan of the vocab, no collect of anything bigger than
  *     the single winning pair.
  *   - The winning pair applies as a narrow map; the vocab frame is
  *     re-persisted per round and the predecessor released, so lineage
  *     stays O(1) across rounds.
  *   - ENCODING with the learned merges also never touches the corpus
  *     per-token: each DISTINCT word is encoded once on the vocab table,
  *     then a broadcast join stamps the (word → n_tokens) map onto the
  *     corpus scan.
  *
  * Determinism: ties on pair count break by lexicographic pair order, so
  * the merge table is a pure function of the corpus — retries and
  * re-runs yield byte-identical vocabularies.
  */
object Bpe {

  /** End-of-word marker glued to a word's final character (the paper's
    * '</w>'): lets the learner distinguish suffix pairs from mid-word
    * pairs, and makes decode unambiguous. */
  private val Eow = "</w>"

  private def initSymbols(word: String): Seq[String] = {
    val cs = word.map(_.toString)
    if (cs.isEmpty) Seq.empty
    else cs.init :+ (cs.last + Eow)
  }

  /** Train `nMerges` BPE merges over the documents' whitespace words.
    * Returns the ordered merge table (highest-priority first). */
  def train(spark: SparkSession, dir: String, nMerges: Int = 40): Seq[(String, String)] = {
    import spark.implicits._
    // localCheckpoint (not persist): each round's vocab derives from the
    // previous one, and an un-truncated logical plan grows by one
    // map-stage per round — 40 rounds of lineage make Catalyst re-plan
    // (and AQE re-print) a plan of unbounded size. Checkpointing cuts the
    // plan at the materialized RDD, keeping every round's planning O(1).
    var vocab = Tables.documents(spark, dir)
      .select(explode(split(col("text"), " ")).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy("w").agg(count(lit(1)).as("cnt"))
      .as[(String, Long)]
      .map { case (w, c) => (initSymbols(w), c) }
      .toDF("syms", "cnt")
      .localCheckpoint()

    val merges = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    var round = 0
    var done = false
    while (round < nMerges && !done) {
      // size(syms) == 1 would make sequence(1, 0) step DOWNWARD (the
      // repetition() trap) — single-symbol words have no pairs, drop them
      val top = vocab.filter(size(col("syms")) > 1).select(explode(expr(
          "transform(sequence(1, size(syms) - 1), i -> struct(syms[i-1] AS a, syms[i] AS b))"))
          .as("p"), col("cnt"))
        .groupBy(col("p.a").as("a"), col("p.b").as("b"))
        .agg(sum("cnt").as("n"))
        .orderBy(desc("n"), asc("a"), asc("b"))
        .limit(1).collect()
      if (top.isEmpty || top(0).getAs[Long]("n") < 2L) done = true
      else {
        val (a, b) = (top(0).getString(0), top(0).getString(1))
        merges += ((a, b))
        vocab = vocab.as[(Seq[String], Long)]
          .map { case (syms, c) => (mergeOnce(syms, a, b), c) }
          .toDF("syms", "cnt")
          .localCheckpoint()
      }
      round += 1
    }
    merges.toSeq
  }

  private def mergeOnce(syms: Seq[String], a: String, b: String): Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var i = 0
    while (i < syms.length) {
      if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b) {
        out += a + b; i += 2
      } else { out += syms(i); i += 1 }
    }
    out.toSeq
  }

  /** Encode one word with the learned merges, in training priority order
    * (each merge applied exhaustively before the next — the reference
    * greedy-by-priority BPE apply). */
  def encodeWord(word: String, merges: Seq[(String, String)]): Seq[String] = {
    var syms = initSymbols(word)
    merges.foreach { case (a, b) =>
      if (syms.length > 1) syms = mergeOnce(syms, a, b)
    }
    syms
  }

  /** Per-document BPE token counts under a vocabulary trained on the
    * same corpus. Each DISTINCT word is encoded once; the corpus pass is
    * a broadcast-join + arithmetic. */
  def tokenize(spark: SparkSession, dir: String, nMerges: Int = 40): DataFrame = {
    import spark.implicits._
    val merges = train(spark, dir, nMerges)
    val bc = spark.sparkContext.broadcast(merges)
    val wordCost = Tables.documents(spark, dir)
      .select(explode(split(col("text"), " ")).as("w"))
      .filter(length(col("w")) > 0)
      .distinct()
      .as[String]
      .map(w => (w, encodeWord(w, bc.value).length.toLong))
      .toDF("w", "bpe_len")
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id"), explode(split(col("text"), " ")).as("w"))
      .filter(length(col("w")) > 0)
    docs.join(broadcast(wordCost), "w")
      .groupBy("doc_id")
      .agg(count(lit(1)).cast("long").as("nt"),
        sum("bpe_len").cast("long").as("bpe_tokens"))
      .orderBy("doc_id")
  }

  /** Registered rows-only query (BPE's iterative merge loop has no SQL
    * expression — spec-gated instead: BpeSpec checks the learned merges
    * against a hand-computed fixture and the lossless-decode property). */
  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "tx_bpe" -> ((s: SparkSession, d: String) => tokenize(s, d)),
  )

  val oracleSql: Map[String, String] = Map.empty
}

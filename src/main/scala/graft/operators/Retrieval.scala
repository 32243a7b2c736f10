package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** BM25 ranked retrieval over the document corpus (Robertson/Spärck
  * Jones probabilistic relevance, the Lucene-default scoring) — the
  * keyword-search half of a corpus workbench (RAG retrieval pairs it
  * with [[Chunking]]; dedup diagnostics use it to pull the docs behind
  * a suspicious n-gram).
  *
  * score(d) = Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1−b+b·len_d/avglen)),
  * idf(t) = ln(1 + (N−df+0.5)/(df+0.5))  (Lucene's positive variant).
  *
  * Scale shape (100 TB): the postings build is one explode + filter on
  * the query terms — the scan never materializes a full inverted index
  * for an ad-hoc query, only the ≤|terms| postings lists actually asked
  * for. df/avglen/N collapse to a ≤|terms|-row and a 1-row broadcast;
  * scoring is a per-doc hash agg over the filtered postings. For a
  * standing search service the same math runs against a PRE-BUILT
  * (term-bucketed) postings table — the ad-hoc form here is the one an
  * engine must not botch into a corpus×terms nested loop (plan-gated).
  */
object Retrieval {

  /** Fixed demo query: two mid-frequency terms + one rare term (idf
    * contrast) from the corpus vocabulary. */
  val QueryTerms: Seq[String] = Seq("join", "window", "dup")

  val K1 = 1.2
  val B = 0.75
  val TopN = 20

  def bm25(spark: SparkSession, dir: String,
      terms: Seq[String] = QueryTerms): DataFrame = {
    val toks = Tables.documents(spark, dir)
      .select(col("doc_id"), explode(split(col("text"), " ")).as("w"))
    val lens = toks.groupBy("doc_id").agg(count(lit(1)).as("len"))
    // N and avglen: 1-row broadcast (never a driver round-trip)
    val stats = lens.agg(count(lit(1)).as("n_docs"), avg("len").as("avglen"))
    val hits = toks.filter(col("w").isin(terms.map(t => t: Any): _*))
    val df_ = hits.groupBy("w").agg(countDistinct("doc_id").as("df"))
    val tf = hits.groupBy("doc_id", "w").agg(count(lit(1)).as("tf"))
    val scored = tf
      .join(broadcast(df_), Seq("w"))
      .join(lens, Seq("doc_id"))
      .crossJoin(broadcast(stats))
      .withColumn("idf",
        log(lit(1.0) + (col("n_docs") - col("df") + lit(0.5)) / (col("df") + lit(0.5))))
      .withColumn("s",
        col("idf") * col("tf") * (lit(K1) + 1.0) /
          (col("tf") + lit(K1) * (lit(1.0) - lit(B) + lit(B) * col("len") / col("avglen"))))
    scored.groupBy("doc_id")
      .agg(count(lit(1)).as("n_terms"), round(sum("s"), 4).as("score"))
      .orderBy(col("score").desc, col("doc_id"))
      .limit(TopN)
  }

  /** Query vector for the dense half of [[hybridRrf]]: corpus vector 7
    * stands in for an encoded query (vec_id ↔ doc_id is the fixture
    * contract — documents and embeddings are parallel tables). */
  val QueryVecId = 7L
  /** Cormack/Clarke/Buettcher reciprocal-rank-fusion constant. */
  val RrfK = 60
  val FusedTopN = 10

  /** Hybrid retrieval: fuse the BM25 keyword ranking with a dense
    * cosine ranking by Reciprocal Rank Fusion — score(d) = Σ_lists
    * 1/(k + rank_list(d)) over the lists that retrieved d (Cormack et
    * al. SIGIR 2009; the fusion used by most production hybrid-search
    * stacks because it needs no score calibration between BM25 and
    * cosine scales).
    *
    * Scale shape: each leg is its own top-N — BM25 as in [[bm25]]
    * (postings ∝ query terms), dense as a scan + TakeOrdered global
    * top-N (per-partition heads merge on the driver, no global sort,
    * no window over the corpus). The rank stamps and the fusion then
    * run on two ≤TopN-row frames — driver-scale by construction, like
    * the re-rank tails of the ANN family. */
  def hybridRrf(spark: SparkSession, dir: String): DataFrame = {
    import graft.plans.VectorOps.dot
    val wTop = Window.orderBy(col("score").desc, col("id"))
    // sparse leg: bm25's top-20, rank-stamped (20 rows — the
    // single-partition window is a constant-size tail, not a corpus sort)
    val bmRank = bm25(spark, dir)
      .select(col("doc_id").as("id"), col("score"))
      .withColumn("r_bm", row_number().over(wTop))
      .select("id", "r_bm")
    val e = Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val qv = e.filter(col("vec_id") === QueryVecId).select(col("v").as("vq"))
    val dense = e.filter(col("vec_id") =!= QueryVecId)
      .crossJoin(broadcast(qv))
      .select(col("vec_id").as("id"), round(dot(col("v"), col("vq")), 6).as("score"))
      .orderBy(col("score").desc, col("id"))
      .limit(TopN)
    val denseRank = dense.withColumn("r_vec", row_number().over(wTop)).select("id", "r_vec")
    val rrf = coalesce(lit(1.0) / (lit(RrfK) + col("r_bm")), lit(0.0)) +
      coalesce(lit(1.0) / (lit(RrfK) + col("r_vec")), lit(0.0))
    bmRank.join(denseRank, Seq("id"), "full_outer")
      .withColumn("rrf", round(rrf, 6))
      .orderBy(col("rrf").desc, col("id"))
      .limit(FusedTopN)
      .select("id", "r_bm", "r_vec", "rrf")
      .orderBy(col("rrf").desc, col("id"))
  }

  /** Fixed demo phrase for [[phraseSearch]] — present at every fixture SF. */
  val Phrase: Seq[String] = Seq("big", "order", "scan")

  /** Exact phrase search over positional postings — the inverted-index
    * capability BM25's bag-of-words scoring can't express ("big order
    * scan" as consecutive tokens, not co-occurrence). Postings are
    * (term, doc, position); a phrase of length L is an L-way self-join
    * on (doc, position offset) — the standard positional-index query
    * plan (Manning/Raghavan/Schütze IR §2.4).
    *
    * Scale shape: like [[bm25]], the scan filters to the phrase's terms
    * BEFORE anything shuffles, and the adjacency test runs in ONE
    * doc_id-keyed aggregation: per-term position arrays (each shifted by
    * its phrase offset) are collected per document, and a phrase start
    * is a position present in EVERY array — a per-row array_intersect
    * fold, state bounded by the phrase terms' occurrences in one doc.
    * The textbook L-way positional-postings self-join re-keys every hop
    * on (doc, pos − i) — a DIFFERENT shuffle key per term, so each of
    * the L−1 joins re-exchanges both sides (Spark's co-partition rule
    * wants ALL join keys; the r9 review measured the claimed
    * "reuses one doc_id partitioning" was never true of that plan).
    * An ad-hoc phrase never pays for a full positional index; a
    * standing service runs the same aggregation against a pre-built
    * term-bucketed postings table. */
  def phraseSearch(spark: SparkSession, dir: String,
      phrase: Seq[String] = Phrase): DataFrame = {
    val postings = Tables.documents(spark, dir)
      .select(col("doc_id"), posexplode(split(col("text"), " ")).as(Seq("pos", "w")))
      .filter(col("w").isin(phrase.map(t => t: Any): _*))
    // collect_list skips the when()'s nulls: p_i = positions of term i,
    // shifted so a phrase occurrence contributes the SAME value to all L
    // arrays; repeated phrase terms just produce equal arrays
    val termArrays = phrase.zipWithIndex.map { case (t, i) =>
      collect_list(when(col("w") === t, col("pos") - i)).as(s"p$i")
    }
    postings.groupBy("doc_id")
      .agg(termArrays.head, termArrays.tail: _*)
      .select(col("doc_id"),
        explode(
          phrase.indices.tail.foldLeft(col("p0")) { case (acc, i) =>
            array_intersect(acc, col(s"p$i"))
          }).as("pos"))
      .select(col("doc_id"), col("pos").cast("int").as("pos"))
      .orderBy("doc_id", "pos")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "tx_bm25" -> ((s: SparkSession, d: String) => bm25(s, d)),
    "tx_hybrid_rrf" -> hybridRrf _,
    "tx_phrase" -> ((s: SparkSession, d: String) => phraseSearch(s, d)),
  )

  private val termList = QueryTerms.map(t => s"'$t'").mkString("(", ", ", ")")

  val oracleSql: Map[String, String] = Map(
    "tx_phrase" ->
      s"""WITH toks AS (SELECT doc_id, string_split(text, ' ') t FROM documents)
        |SELECT doc_id, CAST(i - 1 AS INTEGER) AS pos
        |FROM toks, LATERAL (SELECT unnest(generate_series(1, len(t) - 2)) i)
        |WHERE t[i] = '${Phrase(0)}' AND t[i+1] = '${Phrase(1)}' AND t[i+2] = '${Phrase(2)}'
        |ORDER BY doc_id, pos""".stripMargin.replaceAll("\n", " "),
    "tx_bm25" ->
      s"""WITH toks AS (SELECT doc_id, unnest(string_split(text,' ')) AS w FROM documents),
        |lens AS (SELECT doc_id, COUNT(*) AS len FROM toks GROUP BY 1),
        |stats AS (SELECT COUNT(*) AS n_docs, AVG(len) AS avglen FROM lens),
        |hits AS (SELECT doc_id, w FROM toks WHERE w IN $termList),
        |dfreq AS (SELECT w, COUNT(DISTINCT doc_id) AS df FROM hits GROUP BY 1),
        |tf AS (SELECT doc_id, w, COUNT(*) AS tf FROM hits GROUP BY 1, 2),
        |scored AS (SELECT tf.doc_id,
        |ln(1.0 + (stats.n_docs - dfreq.df + 0.5)/(dfreq.df + 0.5)) * tf.tf * ($K1 + 1.0) /
        |(tf.tf + $K1 * (1.0 - $B + $B * lens.len / stats.avglen)) AS s
        |FROM tf JOIN dfreq USING (w) JOIN lens USING (doc_id) CROSS JOIN stats)
        |SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_terms, ROUND(SUM(s), 4) AS score
        |FROM scored GROUP BY doc_id ORDER BY score DESC, doc_id LIMIT $TopN"""
        .stripMargin.replaceAll("\n", " "),
    "tx_hybrid_rrf" ->
      s"""WITH toks AS (SELECT doc_id, unnest(string_split(text,' ')) AS w FROM documents),
        |lens AS (SELECT doc_id, COUNT(*) AS len FROM toks GROUP BY 1),
        |stats AS (SELECT COUNT(*) AS n_docs, AVG(len) AS avglen FROM lens),
        |hits AS (SELECT doc_id, w FROM toks WHERE w IN $termList),
        |dfreq AS (SELECT w, COUNT(DISTINCT doc_id) AS df FROM hits GROUP BY 1),
        |tf AS (SELECT doc_id, w, COUNT(*) AS tf FROM hits GROUP BY 1, 2),
        |scored AS (SELECT tf.doc_id,
        |ln(1.0 + (stats.n_docs - dfreq.df + 0.5)/(dfreq.df + 0.5)) * tf.tf * ($K1 + 1.0) /
        |(tf.tf + $K1 * (1.0 - $B + $B * lens.len / stats.avglen)) AS s
        |FROM tf JOIN dfreq USING (w) JOIN lens USING (doc_id) CROSS JOIN stats),
        |bmtop AS (SELECT doc_id AS id, ROUND(SUM(s), 4) AS score
        |FROM scored GROUP BY doc_id ORDER BY score DESC, id LIMIT $TopN),
        |bmrank AS (SELECT id, row_number() OVER (ORDER BY score DESC, id) AS r_bm FROM bmtop),
        |qv AS (SELECT embedding AS vq FROM embeddings WHERE vec_id = $QueryVecId),
        |dtop AS (SELECT e.vec_id AS id,
        |ROUND(list_sum(list_transform(list_zip(e.embedding, qv.vq),
        |p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE))), 6) AS score
        |FROM embeddings e CROSS JOIN qv WHERE e.vec_id <> $QueryVecId
        |ORDER BY score DESC, id LIMIT $TopN),
        |drank AS (SELECT id, row_number() OVER (ORDER BY score DESC, id) AS r_vec FROM dtop)
        |SELECT id, r_bm, r_vec,
        |ROUND(COALESCE(1.0/($RrfK + r_bm), 0) + COALESCE(1.0/($RrfK + r_vec), 0), 6) AS rrf
        |FROM bmrank FULL OUTER JOIN drank USING (id)
        |ORDER BY rrf DESC, id LIMIT $FusedTopN"""
        .stripMargin.replaceAll("\n", " "),
  )
}

package graft.ml

import org.apache.spark.ml.classification.{LogisticRegression, LogisticRegressionModel}
import org.apache.spark.ml.feature.VectorAssembler
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.TextAnalysis
import graft.sources.Tables

/** Trainable document-quality classifier — the model-based counterpart to
  * [[graft.operators.TextAnalysis.quality]]'s heuristic thresholds (the
  * CCNet / GPT-3 data recipe: score every crawl document with a small
  * linear classifier and keep the high-quality tail).
  *
  * Features are the engine's own cheap quality signals (mean token
  * length, stopword ratio, alphabetic ratio, duplicate-token ratio, top
  * bigram/trigram share) — all pure Column math, so feature extraction is
  * scan-bound; the model is MLlib logistic regression (one treeAggregate
  * pass per iteration, coefficients live on the driver as a ~6-float
  * vector). Scoring the corpus is then a broadcast-free map: at 100 TB
  * the whole operator is one pass over the text.
  *
  * Training labels come from SELF-SUPERVISION, no hand labels: positives
  * are real corpus documents, negatives are deterministic corruptions of
  * the same documents (the first 3 tokens cycled to the original length —
  * degenerate repetition with realistic length/charset, so the classifier
  * must use distributional signals, not length). Split is doc_id-hash
  * based, so train/holdout are disjoint and the corruption of a holdout
  * doc is never seen in training.
  */
object QualityClassifier {

  /** The feature columns over a `text` column (shared with scoring). */
  def featureCols: Seq[(String, Column)] = {
    val t = split(col("text"), " ")
    val nt = size(t)
    def gramShare(n: Int): Column = {
      val grams = transform(sequence(lit(1), nt - lit(n - 1)),
        i => concat_ws(" ", (0 until n).map(k => element_at(t, i + lit(k))): _*))
      val top = coalesce(array_max(transform(array_distinct(grams),
        g => size(filter(grams, x => x === g)))), lit(0))
      when(nt < lit(n), lit(0.0))
        .otherwise(least(top * n, nt).cast("double") / nt)
    }
    Seq(
      "f_avg_tok_len" -> aggregate(transform(t, x => length(x).cast("double")),
        lit(0.0), _ + _) / nt,
      "f_stop_ratio" -> size(filter(t,
        x => x.isin(TextAnalysis.Stopwords.map(s => s: Any): _*))).cast("double") / nt,
      "f_alpha_ratio" -> length(regexp_replace(col("text"), "[^A-Za-z]", ""))
        .cast("double") / length(col("text")),
      "f_dup_tok" -> (lit(1.0) - size(array_distinct(t)).cast("double") / nt),
      "f_top_bigram" -> gramShare(2),
      "f_top_trigram" -> gramShare(3),
    )
  }

  /** Deterministic negative: first 3 tokens cycled to the doc's length. */
  private def corrupt: Column = {
    val t = split(col("text"), " ")
    concat_ws(" ", transform(sequence(lit(1), size(t)),
      i => element_at(t, (i - 1) % 3 + 1)))
  }

  /** Labeled frame: (doc_id, text, label) with positives + corrupted
    * negatives for every document. */
  def labeled(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir).select("doc_id", "text")
    docs.withColumn("label", lit(1.0))
      .unionByName(docs.withColumn("text", corrupt).withColumn("label", lit(0.0)))
  }

  private def withFeatures(df: DataFrame): DataFrame = {
    val feats = featureCols.foldLeft(df) { case (d, (name, c)) => d.withColumn(name, c) }
    new VectorAssembler()
      .setInputCols(featureCols.map(_._1).toArray)
      .setOutputCol("features")
      .transform(feats)
  }

  /** Train on the hash-split train half; returns (model, holdout frame). */
  def train(spark: SparkSession, dir: String): (LogisticRegressionModel, DataFrame) = {
    val all = withFeatures(labeled(spark, dir))
    val isTest = col("doc_id") % 5 === 0
    val model = new LogisticRegression()
      .setMaxIter(50).setRegParam(1e-4)
      .fit(all.filter(!isTest))
    (model, all.filter(isTest))
  }

  /** Score a corpus: P(quality) per document. */
  def score(model: LogisticRegressionModel, spark: SparkSession, dir: String): DataFrame = {
    val probOf = udf((v: org.apache.spark.ml.linalg.Vector) => v(1))
    model.transform(withFeatures(Tables.documents(spark, dir).select("doc_id", "text")))
      .select(col("doc_id"), probOf(col("probability")).as("p_quality"))
  }
}

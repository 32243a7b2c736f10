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

  /** Per-row feature columns over a `text` column. The two top-n-gram
    * features are NOT here: computed per row they are O(grams²)
    * interpreted HOFs (the tx_repetition lesson — 123 s of the sf0.01
    * Verify wall on this doubled corpus); [[withFeatures]] derives them
    * with explode + hash aggregates instead, linear and codegen'd. */
  private def simpleFeatureCols: Seq[(String, Column)] = {
    val t = split(col("text"), " ")
    val nt = size(t)
    Seq(
      "f_avg_tok_len" -> aggregate(transform(t, x => length(x).cast("double")),
        lit(0.0), _ + _) / nt,
      "f_stop_ratio" -> size(filter(t,
        x => x.isin(TextAnalysis.Stopwords.map(s => s: Any): _*))).cast("double") / nt,
      "f_alpha_ratio" -> length(regexp_replace(col("text"), "[^A-Za-z]", ""))
        .cast("double") / length(col("text")),
      "f_dup_tok" -> (lit(1.0) - size(array_distinct(t)).cast("double") / nt),
    )
  }

  /** Feature names in weight-index order (exports + assembler). */
  def featureNames: Seq[String] =
    simpleFeatureCols.map(_._1) ++ Seq("f_top_bigram", "f_top_trigram")

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

  /** Top n-gram coverage share per keyed row — explode + two hash
    * aggregates (same numbers as the old per-row HOF: max gram
    * multiplicity, occurrences-overlap cap at nt). Rows shorter than the
    * gram have no n-grams; the left join restores them at 0.0. Keys are
    * doc_id (scoring frames) or (doc_id, label) (the labeled frame,
    * where every doc appears once per class). */
  private def topShare(df: DataFrame, keys: Seq[String], n: Int, out: String): DataFrame = {
    val t = split(col("text"), " ")
    val grams = when(size(t) >= n,
      transform(sequence(lit(1), size(t) - lit(n - 1)),
        i => concat_ws(" ", (0 until n).map(k => element_at(t, i + lit(k))): _*)))
      .otherwise(array().cast("array<string>"))
    val kc = keys.map(col)
    df.select(kc :+ size(t).as("nt") :+ explode(grams).as("g"): _*)
      .groupBy(kc :+ col("nt") :+ col("g"): _*).agg(count(lit(1)).as("c"))
      .groupBy(kc :+ col("nt"): _*).agg(max(col("c")).as("top"))
      .select(kc :+
        (least(col("top") * n, col("nt").cast("long")).cast("double") / col("nt")).as(out): _*)
  }

  private def withFeatures(df: DataFrame): DataFrame = {
    val keys = if (df.columns.contains("label")) Seq("doc_id", "label") else Seq("doc_id")
    val simple = simpleFeatureCols.foldLeft(df) { case (d, (name, c)) => d.withColumn(name, c) }
    val feats = simple
      .join(topShare(df, keys, 2, "f_top_bigram"), keys, "left")
      .join(topShare(df, keys, 3, "f_top_trigram"), keys, "left")
      .na.fill(0.0, Seq("f_top_bigram", "f_top_trigram"))
    new VectorAssembler()
      .setInputCols(featureNames.toArray)
      .setOutputCol("features")
      .transform(feats)
  }

  private def isTest: Column = col("doc_id") % 5 === 0

  private def fitOn(all: DataFrame): LogisticRegressionModel =
    new LogisticRegression()
      .setMaxIter(50).setRegParam(1e-4)
      .fit(all.filter(!isTest))

  /** Train on the hash-split train half; returns (model, holdout frame). */
  def train(spark: SparkSession, dir: String): (LogisticRegressionModel, DataFrame) = {
    val all = withFeatures(labeled(spark, dir))
    (fitOn(all), all.filter(isTest))
  }

  val FeatsExportPath = "/tmp/graft_quality_feats.parquet"
  val WeightsExportPath = "/tmp/graft_quality_weights.parquet"

  /** Export the labeled feature matrix (long form, with an idx = −1
    * intercept pseudo-feature) and the fitted weights as parquet — the
    * inputs of the ml_quality_score oracle: both engines recompute every
    * document's sigmoid(w·x) score from the SAME bytes, making the serve
    * path of the trained filter a full per-row equality oracle (same
    * recipe as DielectricModel.exportGoldenParity). */
  def exportScored(spark: SparkSession, dir: String): Unit = {
    // persisted: the frame feeds the LR fit AND the long-form export —
    // unpersisted, every consumer re-runs the featurization joins
    val all = withFeatures(labeled(spark, dir)).persist()
    try {
      val model = fitOn(all)
      val names = featureNames
      all.select(col("doc_id"), col("label"),
          posexplode(array(names.map(col): _*)).as(Seq("idx", "x")))
        .unionByName(all.select(col("doc_id"), col("label"),
          lit(-1).as("idx"), lit(1.0).as("x")))
        .coalesce(1).write.mode("overwrite").parquet(FeatsExportPath)
      val w = model.coefficients.toArray.zipWithIndex.map { case (v, i) => (i, v) } :+
        (-1 -> model.intercept)
      spark.createDataFrame(w.toSeq).toDF("idx", "w")
        .coalesce(1).write.mode("overwrite").parquet(WeightsExportPath)
    } finally all.unpersist()
  }

  /** The model serve path, recomputed from the exported bytes: margin =
    * Σ wᵢxᵢ (the idx join brings intercept along), score = σ(margin).
    * Margins sit far from 0 for this corpus (the classes are separated),
    * so cross-engine float-summation order cannot flip pred_pos, and the
    * 4dp-rounded score flips only if a sum lands ~1e-14 from a rounding
    * boundary. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ml_quality_score" -> ((s: SparkSession, _: String) =>
      s.read.parquet(FeatsExportPath)
        .join(s.read.parquet(WeightsExportPath), Seq("idx"))
        .groupBy("doc_id", "label")
        .agg(sum(col("w") * col("x")).as("margin"))
        .select(col("doc_id"), col("label"),
          round(lit(1.0) / (lit(1.0) + exp(-col("margin"))), 4).as("score"),
          (col("margin") > 0).as("pred_pos"))
        .orderBy("doc_id", "label")),
  )

  val oracleSql: Map[String, String] = Map(
    "ml_quality_score" ->
      (s"""SELECT f.doc_id, f.label,
        |ROUND(1.0/(1.0 + exp(-SUM(w.w * f.x))), 4) AS score,
        |SUM(w.w * f.x) > 0 AS pred_pos
        |FROM '$FeatsExportPath/*.parquet' f
        |JOIN '$WeightsExportPath/*.parquet' w USING (idx)
        |GROUP BY f.doc_id, f.label ORDER BY f.doc_id, f.label""").stripMargin
        .replaceAll("\n", " "),
  )

  /** Score a corpus: P(quality) per document. */
  def score(model: LogisticRegressionModel, spark: SparkSession, dir: String): DataFrame = {
    val probOf = udf((v: org.apache.spark.ml.linalg.Vector) => v(1))
    model.transform(withFeatures(Tables.documents(spark, dir).select("doc_id", "text")))
      .select(col("doc_id"), probOf(col("probability")).as("p_quality"))
  }
}

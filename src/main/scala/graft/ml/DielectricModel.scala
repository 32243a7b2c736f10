package graft.ml

import org.apache.spark.ml.{Pipeline, PipelineModel}
import org.apache.spark.ml.feature.{StandardScaler, VectorAssembler}
import org.apache.spark.ml.regression.RandomForestRegressor
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.FormulaParser
import graft.materials.Materials

/** Dielectric-constant prediction models (SURVEY.md §2.E E1–E5).
  *
  * Mirrors the reference's `predict_log10_eps(target, dielectric_type,
  * model_type)` (ml_prediction.py:54-282) as an MLlib Pipeline:
  * VectorAssembler (E1) → StandardScaler withMean/withStd (E2, matching the
  * shipped scalers' config) → RandomForestRegressor on log10(ε) (E3/E4).
  * The reference's RF binaries are absent from its checkout
  * (.MISSING_LARGE_BLOBS), so models are trained in-engine on the
  * 1,266-record deduped training set (§2.F) and gated statistically against
  * the golden prediction files (MlSpec).
  *
  * Unlike the reference — which deserializes model+scaler on every call
  * (ml_prediction.py:277-280) — a trained PipelineModel is broadcast once
  * and serves any number of rows with a narrow transform: no shuffle, no
  * per-row I/O.
  */
object DielectricModel {

  sealed trait DielectricType { def key: String }
  case object Electronic extends DielectricType { val key = "el" }
  case object Ionic extends DielectricType { val key = "ion" }

  object DielectricType {
    /** Accept both the strict core spellings (el|ion) and the documented
      * CLI spellings (electronic|ionic) — the reference's CLI documents the
      * long forms but rejects them (main.py:10-12 vs ml_prediction.py:64-65);
      * we fix that (SURVEY.md §2.E caveat). */
    def parse(s: String): DielectricType = s.toLowerCase match {
      case "el" | "electronic" => Electronic
      case "ion" | "ionic" => Ionic
      case other => throw new IllegalArgumentException(
        s"dielectric type must be el|ion|electronic|ionic, got $other")
    }
  }

  /** The 1,266-row training frame: (mp_id, comp, label = log10 ε_avg). */
  def trainingFrame(spark: SparkSession, diel: DielectricType): DataFrame = {
    val target = diel match {
      case Electronic => col("dielectric.epsilon_electronic_avg")
      case Ionic => col("dielectric.epsilon_ionic_avg")
    }
    Materials.referenceTrainingSet(Materials.readJson(spark))
      .select(col("mp_id"), FormulaParser.parseFormula(col("formula")).as("comp"),
        log10(target).as("label"))
  }

  /** Featurized training table. */
  def featurizedTraining(spark: SparkSession, diel: DielectricType): DataFrame = {
    val base = trainingFrame(spark, diel)
    CompositionFeaturizer.featurize(spark, base, "mp_id", "comp")
      .join(base.select("mp_id", "label"), Seq("mp_id"))
  }

  /** Assemble → scale → RF pipeline (compositional model). */
  def pipeline(numTrees: Int = 200, maxDepth: Int = 12, seed: Long = 42L): Pipeline = {
    val assembler = new VectorAssembler()
      .setInputCols(CompositionFeaturizer.featureColumns.toArray)
      .setOutputCol("features_raw")
      .setHandleInvalid("keep")
    val scaler = new StandardScaler()
      .setInputCol("features_raw").setOutputCol("features")
      .setWithMean(true).setWithStd(true)
    val rf = new RandomForestRegressor()
      .setFeaturesCol("features").setLabelCol("label")
      .setNumTrees(numTrees).setMaxDepth(maxDepth).setSeed(seed)
      .setSubsamplingRate(0.9).setFeatureSubsetStrategy("onethird")
    new Pipeline().setStages(Array(assembler, scaler, rf))
  }

  /** Train the comp model for a dielectric type. */
  def train(spark: SparkSession, diel: DielectricType,
      numTrees: Int = 200, maxDepth: Int = 12): PipelineModel =
    pipeline(numTrees, maxDepth).fit(featurizedTraining(spark, diel))

  /** Score arbitrary formulas: returns (formula, pred_log10, pred). */
  def predictFormulas(spark: SparkSession, model: PipelineModel,
      formulas: Seq[String]): DataFrame = {
    import spark.implicits._
    val base = formulas.toDF("formula")
      .withColumn("comp", FormulaParser.parseFormula(col("formula")))
    val feats = CompositionFeaturizer.featurize(spark, base, "formula", "comp")
    model.transform(feats)
      .select(col("formula"), col("prediction").as("pred_log10"),
        pow(lit(10.0), col("prediction")).as("pred"))
  }

  /** In-sample predictions over the training set (golden-file comparable). */
  def predictTrainingSet(spark: SparkSession, model: PipelineModel,
      diel: DielectricType): DataFrame =
    model.transform(featurizedTraining(spark, diel))
      .select(col("mp_id"), col("label"), col("prediction").as("pred_log10"))

  /** Golden prediction file → (mp_id, golden) frame. The file is one flat
    * JSON dict, parsed driver-side (1,266 entries) and parallelized. */
  def goldenPredictions(spark: SparkSession, modelName: String): DataFrame = {
    import spark.implicits._
    val path = s"/root/reference/oxi_diel_db/prediction_model/prediction_result_$modelName.json"
    val text = new String(java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path)), "UTF-8")
    val entry = """"((?:mp|mvc)-[0-9a-zA-Z]+)"\s*:\s*(-?[0-9.eE+]+)""".r
    entry.findAllMatchIn(text).map(m => (m.group(1), m.group(2).toDouble))
      .toSeq.toDF("mp_id", "golden")
  }

  /** Rows-only query entry: train a light model and emit predictions. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ml_el_comp_pred" -> ((s: SparkSession, _: String) => {
      val m = train(s, Electronic, numTrees = 60, maxDepth = 10)
      predictTrainingSet(s, m, Electronic)
        .select(col("mp_id"), round(col("pred_log10"), 6).as("pred_log10"))
        .orderBy("mp_id")
    }),
  )
}

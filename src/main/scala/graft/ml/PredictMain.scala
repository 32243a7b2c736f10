package graft.ml

import org.apache.spark.sql.SparkSession

/** CLI entry point mirroring the reference's `main.py` (SURVEY.md §3.1):
  *
  *   runMain graft.ml.PredictMain -c SiO2 -diel el
  *   runMain graft.ml.PredictMain -c Ca2SnO4 -diel ionic
  *
  * Prints the log10 prediction and its linear value, like main.py:36-37.
  * Accepts both el|ion and electronic|ionic (fixing the reference's
  * documented-but-rejected CLI spellings, SURVEY.md §2.E).
  */
object PredictMain {
  def main(args: Array[String]): Unit = {
    val opts = args.sliding(2, 2).collect { case Array(k, v) => k -> v }.toMap
    val formula = opts.getOrElse("-c",
      throw new IllegalArgumentException("usage: -c <formula> -diel el|ion|electronic|ionic"))
    val diel = DielectricModel.DielectricType.parse(opts.getOrElse("-diel", "el"))

    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_MASTER", "local[8]"))
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val model = DielectricModel.train(spark, diel)
    val row = DielectricModel.predictFormulas(spark, model, Seq(formula)).head()
    println(f"Predicted log10(eps_${diel.key}) for $formula: ${row.getDouble(1)}%.4f")
    println(f"Predicted eps_${diel.key} for $formula: ${row.getDouble(2)}%.4f")
    spark.stop()
  }
}

package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Steady-state timing of the structural featurization alone. */
object FeatTime {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", false).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val mats = graft.materials.Materials.referenceTrainingSet(
      graft.materials.Materials.readJson(spark)).cache()
    mats.count()
    for (rep <- 1 to 3) {
      val t0 = System.nanoTime()
      val n = graft.ml.StructureFeaturizer.featurize(spark, mats).count()
      println(f"[feat] rep=$rep rows=$n sec=${(System.nanoTime() - t0) / 1e9}%.2f")
    }
    spark.stop()
  }
}

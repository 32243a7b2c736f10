package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Iteration loop for scaler-parity work: prints every drift-report row
  * outside the 5% gate (or unmapped), plus the summary count. Usage:
  *   sbt 'runMain graft.tools.DriftProbe'
  */
object DriftProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .appName("graft-drift-probe").master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", false)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val rep = graft.ml.ScalerDrift.report(spark).cache()
    val bad = rep.filter(col("mean_drift_rel").isNull ||
      col("mean_drift_rel") > 0.05 || col("scale_drift_rel") > 0.05)
    bad.orderBy("label").show(60, false)
    val total = rep.count(); val nBad = bad.count()
    println(s"DRIFT: ${total - nBad}/$total within 5%  ($nBad outside)")
    spark.stop()
  }
}

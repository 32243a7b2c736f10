package graft.tools

import org.apache.spark.sql.SparkSession

/** Ad-hoc single-query timer for plan iteration:
  *   runMain graft.tools.TimeQuery <queryName> [sfDir] [reps]
  * Prints per-rep wall time and the final executed plan. */
object TimeQuery {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val reps = if (args.length > 2) args(2).toInt else 2
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val fn = graft.SparkEntry.queries(name)
    (1 to reps).foreach { r =>
      val t0 = System.nanoTime()
      val n = fn(spark, sfDir).count()
      println(f"[time] $name rep=$r rows=$n sec=${(System.nanoTime() - t0) / 1e9}%.3f")
    }
    fn(spark, sfDir).explain()
    spark.stop()
  }
}

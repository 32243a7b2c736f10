package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: runs the headline queries on SPARK_GRAFT_SF_DIR and
  * prints ONE JSON line for the driver (BENCH_r{N}.json).
  *
  * Each query is forced with a count() (full pipeline, no driver collect of
  * payload). One cold pass + ≥3 warm passes, all reported:
  *   - cold: first execution in a fresh JVM — whole-stage-codegen
  *     compilation, artifact builds (minhash signatures, LSH buckets,
  *     IVF index) all included. The cost a new cluster pays once.
  *   - warm (the headline `value`): MEDIAN of ≥3 steady-state
  *     re-executions with persisted artifacts — the per-query cost of a
  *     long-lived cluster. Median + reported min/max spread keep ambient
  *     host load from deciding a 2× gate in either direction.
  * Reporting both keeps the artifact reuse honest: warm alone would hide
  * a ~16 s cold minhash build behind a 0.7 s number.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val names = SparkEntry.benchQueries.filter(SparkEntry.queries.contains)

    // a failing query must be VISIBLE, not recorded as a (tiny) elapsed
    // time: track per-query success, list failures, sum only successes,
    // and emit null (not the partial elapsed) in the per-query maps
    def pass(): Seq[(String, Double, Boolean)] = names.map { name =>
      val fn = SparkEntry.queries(name)
      val t0 = System.nanoTime()
      val ok = try { fn(spark, sfDir).count(); true }
        catch { case e: Throwable =>
          System.err.println(s"[bench] $name FAILED: ${e.getMessage}"); false }
      (name, (System.nanoTime() - t0) / 1e9, ok)
    }

    def fmt(results: Seq[(String, Double, Boolean)]): String =
      results.map { case (k, v, ok) => "\"" + k + "\":" + (if (ok) v.toString else "null") }
        .mkString("{", ",", "}")

    val coldResults = pass() // fresh JVM: codegen + artifact builds

    // ≥3 warm passes, median reported: one timed pass lets ambient load
    // masquerade as a 2× regression (BENCH_r03 recorded 16.8 s for code
    // independently measured at 8.9 s). Median per query + median total,
    // with the min/max total spread in the JSON so a noisy host is visible
    // in the artifact itself.
    val warmPassCount = sys.env.getOrElse("SPARK_GRAFT_WARM_PASSES", "3").toInt
    val warmPasses = Seq.fill(warmPassCount)(pass())
    def median(xs: Seq[Double]): Double = {
      val s = xs.sorted
      if (s.length % 2 == 1) s(s.length / 2) else (s(s.length / 2 - 1) + s(s.length / 2)) / 2
    }
    val warmResults = names.indices.map { i =>
      val runs = warmPasses.map(_(i))
      val ok = runs.forall(_._3)
      (names(i), if (ok) median(runs.map(_._2)) else 0.0, ok)
    }

    val failed = warmResults.collect { case (k, _, false) => "\"" + k + "\"" }
      .mkString("[", ",", "]")
    val warmTotals = warmPasses.map(_.collect { case (_, v, true) => v }.sum)
    val warmTotal = median(warmTotals)
    val coldTotal = coldResults.collect { case (_, v, true) => v }.sum
    println(s"""{"metric":"total","value":$warmTotal,"unit":"sec","cold":$coldTotal,"warm_passes":$warmPassCount,"warm_min":${warmTotals.min},"warm_max":${warmTotals.max},"queries":${fmt(warmResults)},"queries_cold":${fmt(coldResults)},"failed":$failed,"sf":"$sfDir"}""")
    spark.stop()
  }
}

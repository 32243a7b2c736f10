package graft.ml

import org.apache.spark.sql.SparkSession

import graft.materials.Materials

/** Calibration probe for the C9 AtomicPackingEfficiency dist features:
  * computes the 5 APE scaler rows over the 1,266-record corpus for each
  * (radius table, no-pack sentinel) variant and prints drift against the
  * shipped reference scaler stats. Fast (composition-only — no structure
  * math). Usage: sbt 'runMain graft.ml.ApeScan'
  */
object ApeScan {

  // (label, ref_mean, ref_scale) — ion_comp rows 37-41 of the shipped scaler
  private val refs = Seq(
    ("ape_mean", 0.015975996635006626, 0.029535273007438224),
    ("ape_absdev", 0.041306634644141256, 0.020130716571169056),
    ("ape_dist1", 0.03845981697036418, 0.03500254251203932),
    ("ape_dist3", 0.05850819987895678, 0.035734313934382714),
    ("ape_dist5", 0.07354825033229595, 0.043495427798651565))

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .appName("graft-ape-scan").master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", false)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import org.apache.spark.sql.functions._
    import spark.implicits._

    val comps = Materials.referenceTrainingSet(Materials.readJson(spark))
      .select(graft.functions.FormulaParser.parseFormula(col("formula")).as("comp"))
      .as[Map[String, Double]].collect()

    // the production table (ElementData.miracleRadius), O overridable per
    // variant for calibration sweeps
    val miracle = ElementData.miracleRadius

    def mvar(o: Double): (String, String => Double, Double) =
      (s"miracle O=$o", el => if (el == "O") o
        else miracle.getOrElse(el, ElementData.bySymbol(el).radius), -1.0)

    val variants: Seq[(String, String => Double, Double)] =
      if (args.nonEmpty) args.toSeq.map(a => mvar(a.toDouble))
      else Seq(
        ("atomic", el => ElementData.bySymbol(el).radius, -1.0),
        mvar(0.57), mvar(0.60), mvar(0.62), mvar(0.64), mvar(0.66), mvar(0.70))


    // scramble probe: query vector dims ordered by ELECTRONEGATIVITY while
    // cluster vectors stay alphabetical — the shape of matminer's
    // sorted(set(elements)) vs Composition-iteration-order query mismatch
    // hypothesis for the dist dispersion gap
    val scrambles = Seq(false, true)

    for ((name, radii, noPack) <- variants; scr <- scrambles) {
      val rows = spark.sparkContext.parallelize(comps.toIndexedSeq, 64).map { c =>
        val (m, a) = CompositionFeaturizer.apeDeviationsWith(c, radii)
        val qe = if (!scr) None
          else Some(c.keys.toSeq.filter(ElementData.bySymbol.contains)
            .sortBy(e => ElementData.bySymbol(e).en))
        val (d1, d3, d5) = CompositionFeaturizer.apeClusterDistances(c, radii, noPack, qe)
        (Array(m, a, d1, d3, d5), if (d1 == noPack) 1 else 0)
      }.collect()
      val noPackCount = rows.map(_._2).sum
      println(s"== $name scramble=$scr  (no-pack rows: $noPackCount) ==")
      refs.zipWithIndex.foreach { case ((label, rm, rs), i) =>
        val vs = rows.map(_._1(i))
        val mu = vs.sum / vs.length
        val sd = math.sqrt(vs.map(v => (v - mu) * (v - mu)).sum / vs.length)
        println(f"$label%-12s eng ($mu%.5f, $sd%.5f) ref ($rm%.5f, $rs%.5f) drift (${(mu - rm) / rm}%+.3f, ${(sd - rs) / rs}%+.3f)")
      }
    }
    spark.stop()
  }
}

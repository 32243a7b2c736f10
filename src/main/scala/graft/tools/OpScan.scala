package graft.tools

import org.apache.spark.sql.SparkSession

import graft.materials.{Geometry, Materials, OpFingerprint}

/** Calibration probe for the OPSiteFingerprint Gaussian widths: computes
  * ONLY the op-family features over the 1,266-record corpus (no Voronoi /
  * Ewald — an order of magnitude faster than the full drift report) and
  * prints the corpus stats of the 8 scaler-labeled components next to the
  * shipped reference values, for each width passed on the command line.
  * Usage: sbt 'runMain graft.tools.OpScan 12 15 18.33'
  */
object OpScan {

  final case class In(mp_id: String, matrix: Seq[Seq[Double]],
      abc: Seq[Seq[Double]], nsites: Int)

  // (label, ref_mean, ref_scale, motif extractor, site reducer)
  private val targets: Seq[(String, Double, Double,
      OpFingerprint.OpValues => Double, String)] = Seq(
    ("tet CN_4 max", 0.6039251579778832, 0.3617311665931603, _.tet, "max"),
    ("ssw CN_4 max", 0.3966838467614534, 0.30551518789301896, _.ssw, "max"),
    ("bent150 CN_2 mean", 0.12768242075781264, 0.14623398435436935, _.bent150, "mean"),
    ("lin CN_2 mean", 0.10160546014083008, 0.14701312321402601, _.lin, "mean"),
    ("tri CN_3 mean", 0.11858505659751908, 0.12296891312921367, _.tri, "mean"),
    ("pent CN_5 std", 0.06304677363736717, 0.05708507529597607, _.pent, "std"),
    ("oct CN_6 max", 0.6062112954186414, 0.31710436764423255, _.oct, "max"),
    ("oct CN_6 std", 0.20760702020111618, 0.1176442902397508, _.oct, "std"),
    ("q6 CN_12 mean", 0.05237807064359733, 0.04168883911767703, _.q6, "mean"))

  /** Build a variant parameter set from "name=value,name=value" overrides
    * on top of the frozen calibrated defaults — pure construction; the
    * production OpFingerprint.Calibrated is never touched. */
  private def paramsFor(spec: String): OpFingerprint.OpParams =
    spec.split(",").filter(_.nonEmpty).foldLeft(OpFingerprint.Calibrated) { (p, kv) =>
      val Array(k, v) = kv.split("=")
      val w = v.toDouble
      k match {
        case "bent" => p.copy(IgwBent150 = w)
        case "lin" => p.copy(IgwLin = w)
        case "tri" => p.copy(IgwTriPlan = w)
        case "tet" => p.copy(IgwTet = w)
        case "pent" => p.copy(IgwPentPlan = w)
        case "ep" => p.copy(IgwEp = w)
        case "spp" => p.copy(IgwSpp = w)
        case "aa" => p.copy(IgwAa = w)
        case "wspp" => p.copy(WSpp = w)
        case "sswep" => p.copy(IgwSswEp = w)
        case "sswmode" => p.copy(SswMode = w.toInt)
        case "tetexp" => p.copy(TetExpCos = w.toInt)
        case "tetmode" => p.copy(TetMode = w.toInt)
      }
    }

  def main(args: Array[String]): Unit = {
    val specs = if (args.nonEmpty) args.toSeq else Seq("")
    val spark = SparkSession.builder()
      .appName("graft-op-scan").master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", false)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    import org.apache.spark.sql.functions._

    val mats = Materials.referenceTrainingSet(Materials.readJson(spark))
    val in = mats.select(col("mp_id"),
      col("structure.lattice.matrix").as("matrix"),
      col("structure.sites.abc").as("abc"),
      col("nsites")).as[In]
      .repartition(spark.sparkContext.defaultParallelism)
      .cache()
    in.count()

    for (spec <- specs) {
      val params = paramsFor(spec) // serialized into the task closure
      val rows = in.mapPartitions { it =>
        it.map { m =>
          val lat = Geometry.Lattice(m.matrix.map(_.toArray).toArray)
          val ops = OpFingerprint.material(lat, m.abc.map(_.toArray).toArray, params)
          def red(f: OpFingerprint.OpValues => Double, how: String): Double = {
            val vs = ops.map(f)
            how match {
              case "mean" => vs.sum / vs.size
              case "max" => vs.max
              case "std" =>
                val mu = vs.sum / vs.size
                math.sqrt(vs.map(v => (v - mu) * (v - mu)).sum / vs.size)
            }
          }
          targets.map { case (_, _, _, f, how) => red(f, how) }
        }
      }.collect()
      println(s"== $spec ==")
      targets.zipWithIndex.foreach { case ((label, rm, rs, _, _), ti) =>
        val vs = rows.map(_(ti))
        val mu = vs.sum / vs.size
        val sd = math.sqrt(vs.map(v => (v - mu) * (v - mu)).sum / vs.size)
        println(f"$label%-18s eng ($mu%.5f, $sd%.5f) ref ($rm%.5f, $rs%.5f) drift (${(mu - rm) / rm}%+.3f, ${(sd - rs) / rs}%+.3f)")
      }
    }
    spark.stop()
  }
}

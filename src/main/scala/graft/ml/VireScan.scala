package graft.ml

import org.apache.spark.sql.SparkSession

import graft.materials.{Geometry, Materials}

/** Probe for the dist_btw_nn (MinimumRelativeDistances) drift rows: lists
  * the structures with the largest per-structure std of the per-site
  * minimum relative distance, with each species' resolved (oxi, CN,
  * radius) — outliers here are where the VIRE radius resolution diverges
  * from the reference. Usage: sbt 'runMain graft.ml.VireScan'
  */
object VireScan {

  final case class In(mp_id: String, formula: String, matrix: Seq[Seq[Double]],
      abc: Seq[Seq[Double]], elems: Seq[String])

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .appName("graft-vire-scan").master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", false)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import org.apache.spark.sql.functions._
    import spark.implicits._

    val in = Materials.referenceTrainingSet(Materials.readJson(spark))
      .select(col("mp_id"), col("formula"),
        col("structure.lattice.matrix").as("matrix"),
        col("structure.sites.abc").as("abc"),
        expr("transform(structure.sites.species, s -> s[0].element)").as("elems"))
      .as[In]

    val rows = in.repartition(64).map { m =>
      val lat = Geometry.Lattice(m.matrix.map(_.toArray).toArray)
      val frac = m.abc.map(_.toArray).toArray
      val n = frac.length
      val counts = m.elems.groupBy(identity).view.mapValues(_.size.toDouble).toMap
      val voro = graft.materials.Voronoi.cellsWithSites(lat, frac)
      // EXACT production path
      val ionRadii = StructureFeaturizer.vireIonRadii(
        m.elems, counts, voro.map(_._1.faces.size),
        voro.map { case (cell, siteMap) =>
          cell.faces.map(f => m.elems(siteMap(f.nbrIdx))) })
      val nl = Geometry.neighborVectors(lat, frac, StructureFeaturizer.NbrCutoff)
      val bySite = nl.groupBy(_.siteIdx)
      val minRels = (0 until n).map { i =>
        bySite.getOrElse(i, Seq.empty).foldLeft(Double.MaxValue) { (acc, nb) =>
          math.min(acc, nb.dist / (ionRadii(i) + ionRadii(nb.nbrIdx)))
        } match { case Double.MaxValue => 1.0; case v => v }
      }
      val mu = minRels.sum / n
      val sd = math.sqrt(minRels.map(v => (v - mu) * (v - mu)).sum / n)
      val path = if (OxidationStates.balanced(counts).isEmpty) "ATOMIC" else "shannon"
      val spec = m.elems.distinct.sorted.map { e =>
        val i = m.elems.indexOf(e)
        f"$e r=${ionRadii(i)}%.3f"
      }.mkString(", ")
      (m.mp_id, m.formula, sd, mu, minRels.min, minRels.max, s"$path | $spec")
    }.collect()

    val mus = rows.map(_._4)
    val sds = rows.map(_._3)
    def stats(xs: Array[Double]): (Double, Double) = {
      val mu = xs.sum / xs.length
      (mu, math.sqrt(xs.map(v => (v - mu) * (v - mu)).sum / xs.length))
    }
    val (mm, ms) = stats(mus)
    val (sm, ss) = stats(sds)
    println(f"[vire] mean-row eng ($mm%.5f, $ms%.5f) ref (0.87486, 0.04322)")
    println(f"[vire] std-row  eng ($sm%.5f, $ss%.5f) ref (0.03061, 0.02413)")
    println("[vire] top-15 per-structure std outliers:")
    rows.sortBy(-_._3).take(15).foreach { case (id, f, sd, mu, lo, hi, spec) =>
      println(f"[vire] $id%-12s $f%-14s std=$sd%.4f mean=$mu%.4f min=$lo%.4f max=$hi%.4f | $spec")
    }
    spark.stop()
  }
}

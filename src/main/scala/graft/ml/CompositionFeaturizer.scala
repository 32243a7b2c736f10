package graft.ml

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Compositional featurizers (SURVEY.md §2.C C1–C5, C10; §2.D calculus 1).
  *
  * Dataflow: composition map → explode to (id, element, fraction) →
  * broadcast-join the static element table → ONE groupBy(id) computing every
  * weighted statistic as partial+final aggregates — the scalable form of
  * matminer's per-record Python loops (reference ml_prediction.py:26-37).
  * Pairwise features (ionic character) run over a collect_list array with
  * higher-order functions: compositions have ≤6 species, so the array is
  * tiny and stays in the same single shuffle.
  *
  * Weighted std is population-style (√(Σf·x² − μ²)), matching matminer's
  * PropertyStats convention (§2.D: ddof=0).
  */
object CompositionFeaturizer {

  import ElementData.numericProps

  /** Stat suffixes emitted per elemental property. */
  val Stats = Seq("wmean", "wstd", "min", "max", "range")

  /** Oxidation-state (C7) and electronegativity-difference (C6) features.
    * (Declared before featureColumns — object val init order matters.) */
  val oxiColumns: Seq[String] = Seq(
    "f_oxi_min", "f_oxi_max", "f_oxi_range", "f_oxi_std",
    "f_endiff_mean", "f_endiff_std", "f_endiff_min", "f_endiff_max", "f_endiff_range",
    "f_ape_mean", "f_ape_absdev", "f_ape_dist1", "f_ape_dist3", "f_ape_dist5")

  /** Ideal center/neighbor radius ratios R*(N) for efficiently-packed
    * clusters of coordination N (Miracle's atomic-packing-efficiency
    * model, the published sphere-packing table matminer hardcodes) —
    * the C9 lookup. */
  private val idealRatio: Array[Double] = { // index = N, valid 3..24
    val m = Map(
      3 -> 0.154701, 4 -> 0.224745, 5 -> 0.361654, 6 -> 0.414214,
      7 -> 0.518145, 8 -> 0.616517, 9 -> 0.709914, 10 -> 0.798907,
      11 -> 0.884003, 12 -> 0.902113, 13 -> 0.976006, 14 -> 1.04733,
      15 -> 1.11632, 16 -> 1.18318, 17 -> 1.2481, 18 -> 1.31123,
      19 -> 1.37271, 20 -> 1.43267, 21 -> 1.49119, 22 -> 1.5484,
      23 -> 1.60436, 24 -> 1.65915)
    (0 to 24).map(n => m.getOrElse(n, 0.0)).toArray
  }

  /** matminer's `find_ideal_cluster_size`: walk N = 3..24, APE(N) =
    * 1 − R*(N)/ratio (decreasing in N), stop at the first sign flip;
    * returns (best N, SIGNED APE of that cluster). */
  private def findIdealClusterSize(ratio: Double): (Int, Double) = {
    var bestN = 3
    var best = Double.MaxValue
    var n = 3
    while (n <= 24) {
      val ape = 1.0 - idealRatio(n) / ratio
      if (math.abs(ape) < math.abs(best)) { best = ape; bestN = n }
      if (ape < 0) return (bestN, best)
      n += 1
    }
    (bestN, best)
  }

  /** C9: "mean (abs) simul. packing efficiency" — per-element RELATIVE
    * deviation 1 − R*(N_best)/(r/r̄) from the best ideal cluster when
    * every atom's shell has the alloy-average radius (matminer's
    * AtomicPackingEfficiency.compute_simultaneous_packing_efficiency;
    * signs cancel in the mean, which is why the reference's scaler mean
    * sits near zero). Returns (weighted mean, weighted mean |·|). */
  // matminer's AtomicPackingEfficiency reads the Magpie MiracleRadius
  // table; the deviation features are smooth in the radii, so the
  // literature Miracle set applies directly (see ElementData.miracleRadius
  // for why the cluster-DISTANCE features below keep the atomic set)
  private def apeDeviations(comp: Map[String, Double]): (Double, Double) =
    apeDeviationsWith(comp,
      el => ElementData.miracleRadius.getOrElse(el, ElementData.bySymbol(el).radius))

  private[ml] def apeDeviationsWith(comp: Map[String, Double],
      radiusOf: String => Double): (Double, Double) = {
    val present = comp.filter { case (el, _) => ElementData.bySymbol.contains(el) }
    if (present.isEmpty) return (0.0, 0.0)
    val total = present.values.sum
    val rAvg = present.map { case (el, n) => radiusOf(el) * n }.sum / total
    val devs = present.toSeq.map { case (el, n) =>
      (findIdealClusterSize(radiusOf(el) / rAvg)._2, n / total)
    }
    val mean = devs.map { case (d, w) => d * w }.sum
    val meanAbs = devs.map { case (d, w) => math.abs(d) * w }.sum
    (mean, meanAbs)
  }

  /** C9: "dist from N clusters |APE| < 0.010" — composition-space L2
    * distance to the nearest efficiently-packed clusters buildable from
    * the composition's own elements. A cluster is (center c, shell of
    * size n with an INTEGER mix of any of the composition's elements)
    * whose |1 − R*(n)/(r_c/r̄_shell)| < 0.010; its composition vector is
    * center 1/(n+1) + shell counts/(n+1), and the feature is the mean
    * distance of the nearest 1/3/5 clusters. Multi-element shells are
    * essential: a 2-element-shell-only set can never approach a ternary
    * oxide's composition, which is what drifted these stats 2-4× high.
    *
    * Enumerates integer shell compositions (C(n+k−1, k−1) per size) and
    * keeps a running 5-smallest distance heap — O(1) memory, no cluster
    * materialization, so a 100 TB featurization run can't blow the
    * executor heap on a 6-element composition (~2M enumerations). */
  /** Feature value when the composition's element set admits NO
    * efficiently-packed cluster at all (matminer's
    * compute_nearest_cluster_distance returns [-1]*n in that case —
    * a sentinel, not a distance; adopting it is what reproduces the
    * reference's heavy left tail on the dist stats). */
  private[ml] val NoPackValue = -1.0

  private[ml] def apeClusterDistances(comp: Map[String, Double],
      radiusOf: String => Double = el => ElementData.bySymbol(el).radius,
      noPack: Double = NoPackValue,
      queryEls: Option[Seq[String]] = None): (Double, Double, Double) = {
    val present = comp.filter { case (el, n) => n > 0 && ElementData.bySymbol.contains(el) }
    if (present.isEmpty) return (0.0, 0.0, 0.0)
    val els = present.keys.toSeq.sorted
    val total = present.values.sum
    // queryEls (probe-only): build the query vector's dims in a DIFFERENT
    // element order than the cluster vectors' — the shape of matminer's
    // sorted-elements-vs-composition-order mismatch
    val frac = queryEls.getOrElse(els).map(e => present(e) / total).toArray
    val r = els.map(radiusOf).toArray
    val k = els.length
    // bounds from the extreme center/shell radius ratios, widened by one
    // on each side: findIdealClusterSize stops at the first APE sign flip,
    // but a size just past the flip can still satisfy |APE| < 0.010 for
    // extreme-ratio pairs and must not be silently excluded
    val maxN = math.min(24, findIdealClusterSize(r.max / r.min)._1 + 1)
    val minN = math.max(3, findIdealClusterSize(r.min / r.max)._1 - 1)
    // running 5 smallest distances
    val best = Array.fill(5)(Double.MaxValue)
    def offer(d: Double): Unit = {
      if (d < best(4)) {
        best(4) = d
        var i = 4
        while (i > 0 && best(i) < best(i - 1)) {
          val t = best(i); best(i) = best(i - 1); best(i - 1) = t; i -= 1
        }
      }
    }
    val counts = new Array[Int](k)
    // enumerate integer count vectors summing to n over k slots
    def enumerate(slot: Int, remaining: Int, rSum: Double, n: Int): Unit = {
      if (slot == k - 1) {
        counts(slot) = remaining
        val shellR = (rSum + remaining * r(slot)) / n
        var ci = 0
        while (ci < k) {
          val ape = 1.0 - idealRatio(n) / (r(ci) / shellR)
          if (math.abs(ape) < 0.010) {
            var d2 = 0.0
            var j = 0
            while (j < k) {
              val v = (counts(j) + (if (j == ci) 1 else 0)).toDouble / (n + 1)
              d2 += (v - frac(j)) * (v - frac(j))
              j += 1
            }
            offer(math.sqrt(d2))
          }
          ci += 1
        }
      } else {
        var c = 0
        while (c <= remaining) {
          counts(slot) = c
          enumerate(slot + 1, remaining - c, rSum + c * r(slot), n)
          c += 1
        }
      }
    }
    var n = minN
    while (n <= maxN) { enumerate(0, n, 0.0, n); n += 1 }
    if (best(0) == Double.MaxValue) return (noPack, noPack, noPack) // nothing packable
    val found = best.filter(_ < Double.MaxValue)
    def meanOf(m: Int): Double = {
      val take = found.take(math.min(m, found.length))
      take.sum / take.length
    }
    (meanOf(1), meanOf(3), meanOf(5))
  }

  private val apeUdf = udf { (comp: Map[String, Double]) =>
    val (m, a) = apeDeviations(comp)
    val (d1, d3, d5) = apeClusterDistances(comp)
    Array(m, a, d1, d3, d5)
  }

  /** C8: rigid-band HOMO/LUMO energies + gap_AO (AtomicOrbitals). */
  private val bandEdgesUdf = udf { (comp: Map[String, Double]) =>
    AtomicOrbitals.bandEdges(comp)
      .map(be => Array(be.homoEnergy, be.lumoEnergy, be.gap))
      .getOrElse(Array(0.0, 0.0, 0.0))
  }

  /** Ordered feature column names produced by featurize(). */
  val featureColumns: Seq[String] = {
    val propStats = for {
      p <- numericProps.keys.toSeq.sorted
      s <- Stats
    } yield s"f_${p}_$s"
    propStats ++ Seq(
      "f_frac_tm", "f_band_center", "f_avg_ionic_char", "f_max_ionic_char",
      "f_norm2", "f_norm3", "f_norm5", "f_norm7", "f_nelements",
      "f_homo_energy", "f_lumo_energy", "f_gap_ao",
      // ValenceOrbital "frac ℓ valence electrons": avg ℓ-electrons over
      // avg total valence electrons
      "f_frac_val_s", "f_frac_val_p", "f_frac_val_d") ++ oxiColumns
  }

  /** Broadcast-able element property frame. `is_tm` follows matminer's
    * TMetalFraction element list, not the d-block predicate. */
  def elementFrame(spark: SparkSession): DataFrame = {
    import spark.implicits._
    ElementData.all.map { e =>
      (e.symbol, numericProps.keys.toSeq.sorted.map(k => numericProps(k)(e)),
        if (ElementData.tmFractionElements(e.symbol)) 1.0 else 0.0)
    }.toDF("element", "props", "is_tm")
  }

  /** Per-element row for the oxidation-state featurizers: the guesser
    * (C12) runs once per composition in a UDF; stats aggregate in Spark. */
  final case class OxiRow(element: String, cnt: Double, state: Double, endiff: Option[Double])

  private val oxiRows = udf { (comp: Map[String, Double]) =>
    val states = OxidationStates.guess(comp)
    val enO = ElementData.bySymbol("O").en
    comp.toSeq.map { case (el, cnt) =>
      OxiRow(el, cnt, states.getOrElse(el, 0.0),
        ElementData.bySymbol.get(el).filter(_ => el != "O").map(p => enO - p.en))
    }
  }

  /** C6/C7: weighted oxidation-state stats + cation-anion EN-difference
    * stats (anion = O in this corpus), one groupBy over the exploded
    * per-element rows. */
  def oxiFeatures(df: DataFrame, idCol: String, compCol: String): DataFrame = {
    val exploded = df
      .select(col(idCol), explode(oxiRows(col(compCol))).as("r"))
      .select(col(idCol), col("r.cnt").as("cnt"), col("r.state").as("state"),
        col("r.endiff").as("endiff"))
      .withColumn("w", col("cnt") / sum("cnt").over(
        org.apache.spark.sql.expressions.Window.partitionBy(idCol)))
    val wmeanSt = sum(col("w") * col("state")) / sum(col("w"))
    val cw = when(col("endiff").isNotNull, col("cnt")).otherwise(lit(0.0))
    val wmeanEd = sum(cw * col("endiff")) / sum(cw)
    // both stds use the unbiased reliability-weight denominator 1 − Σw²
    // (same matminer PropertyStats convention as the element stats)
    val w2St = sum(col("w") * col("w"))
    val w2Ed = sum(cw * cw) / (sum(cw) * sum(cw))
    def unb(variance: Column, w2: Column): Column =
      when(w2 > 0.999999, lit(0.0))
        .otherwise(sqrt(greatest(variance / (lit(1.0) - w2), lit(0.0))))
    exploded.groupBy(col(idCol)).agg(
      min("state").as("f_oxi_min"),
      max("state").as("f_oxi_max"),
      (max("state") - min("state")).as("f_oxi_range"),
      unb(sum(col("w") * col("state") * col("state")) - wmeanSt * wmeanSt, w2St)
        .as("f_oxi_std"),
      wmeanEd.as("f_endiff_mean"),
      unb(sum(cw * col("endiff") * col("endiff")) / sum(cw) - wmeanEd * wmeanEd, w2Ed)
        .as("f_endiff_std"),
      min("endiff").as("f_endiff_min"),
      max("endiff").as("f_endiff_max"),
      (max("endiff") - min("endiff")).as("f_endiff_range"))
  }

  /** Featurize a frame of (idCol, composition Map[String,Double] counts):
    * one row per id with `featureColumns`. */
  def featurize(spark: SparkSession, df: DataFrame, idCol: String, compCol: String): DataFrame = {
    val propNames = numericProps.keys.toSeq.sorted

    val exploded = df
      .select(col(idCol), explode(col(compCol)).as(Seq("element", "cnt")))
      .withColumn("total", sum("cnt").over(
        org.apache.spark.sql.expressions.Window.partitionBy(idCol)))
      .withColumn("f", col("cnt") / col("total"))
      .join(broadcast(elementFrame(spark)), Seq("element"))

    // per-property weighted aggregates, all in one groupBy pass.
    // Weighted std uses the UNBIASED reliability-weight denominator
    // 1 − Σw² (matminer PropertyStats std_dev convention — confirmed to
    // <1% against the reference's shipped scaler vectors; the population
    // form σ_pop = √(Σw·x² − μ²) sits a uniform ~25% low). Σw² = 1 for a
    // single-element composition → std defined as 0.
    val w2 = sum(col("f") * col("f"))
    def wstd(sumWx2: Column, wmean: Column): Column =
      when(w2 > 0.999999, lit(0.0))
        .otherwise(sqrt(greatest((sumWx2 - wmean * wmean) / (lit(1.0) - w2), lit(0.0))))
    val aggExprs: Seq[Column] = propNames.zipWithIndex.flatMap { case (p, i) =>
      val x = col("props").getItem(i)
      val wmean = sum(col("f") * x)
      Seq(
        wmean.as(s"f_${p}_wmean"),
        wstd(sum(col("f") * x * x), wmean).as(s"f_${p}_wstd"),
        min(x).as(s"f_${p}_min"),
        max(x).as(s"f_${p}_max"),
        (max(x) - min(x)).as(s"f_${p}_range"))
    } ++ Seq(
      sum(col("f") * col("is_tm")).as("f_frac_tm"),
      // matminer BandCenter: NEGATED geometric mean of electronegativity
      // (an absolute band-center position estimate — confirmed against
      // the shipped scaler mean, which is exactly −our geo-mean)
      (-exp(sum(col("f") * log(col("props").getItem(propNames.indexOf("en")))))).as("f_band_center"),
      collect_list(struct(col("f").as("f"),
        col("props").getItem(propNames.indexOf("en")).as("en"))).as("_pairs"),
      aggregate(collect_list(pow(col("f"), 2)), lit(0.0), _ + _).as("_s2"),
      aggregate(collect_list(pow(col("f"), 3)), lit(0.0), _ + _).as("_s3"),
      aggregate(collect_list(pow(col("f"), 5)), lit(0.0), _ + _).as("_s5"),
      aggregate(collect_list(pow(col("f"), 7)), lit(0.0), _ + _).as("_s7"),
      count(lit(1)).cast("double").as("f_nelements"))

    val ionicTerms = flatten(transform(col("_pairs"), a =>
      transform(col("_pairs"), b =>
        a.getField("f") * b.getField("f") *
          (lit(1.0) - exp(lit(-0.25) * pow(a.getField("en") - b.getField("en"), 2))))))

    val main = exploded.groupBy(col(idCol))
      .agg(aggExprs.head, aggExprs.tail: _*)
      // ÷2: matminer sums UNORDERED pairs i<j; ionicTerms enumerates both
      // orders (diagonal is 0) — confirmed exactly 2x the scaler mean
      .withColumn("f_avg_ionic_char", aggregate(ionicTerms, lit(0.0), _ + _) / 2)
      .withColumn("f_max_ionic_char", array_max(ionicTerms))
      .withColumn("f_norm2", pow(col("_s2"), 1.0 / 2))
      .withColumn("f_norm3", pow(col("_s3"), 1.0 / 3))
      .withColumn("f_norm5", pow(col("_s5"), 1.0 / 5))
      .withColumn("f_norm7", pow(col("_s7"), 1.0 / 7))
      .withColumn("_val_tot", col("f_val_s_wmean") + col("f_val_p_wmean") +
        col("f_val_d_wmean") + col("f_val_f_wmean"))
      .withColumn("f_frac_val_s", col("f_val_s_wmean") / col("_val_tot"))
      .withColumn("f_frac_val_p", col("f_val_p_wmean") / col("_val_tot"))
      .withColumn("f_frac_val_d", col("f_val_d_wmean") / col("_val_tot"))
      .drop("_pairs", "_s2", "_s3", "_s5", "_s7", "_val_tot")
    val ape = df.select(col(idCol), apeUdf(col(compCol)).as("_ape"),
        bandEdgesUdf(col(compCol)).as("_be"))
      .select(col(idCol), col("_ape").getItem(0).as("f_ape_mean"),
        col("_ape").getItem(1).as("f_ape_absdev"),
        col("_ape").getItem(2).as("f_ape_dist1"),
        col("_ape").getItem(3).as("f_ape_dist3"),
        col("_ape").getItem(4).as("f_ape_dist5"),
        col("_be").getItem(0).as("f_homo_energy"),
        col("_be").getItem(1).as("f_lumo_energy"),
        col("_be").getItem(2).as("f_gap_ao"))
    main.join(oxiFeatures(df, idCol, compCol), Seq(idCol)).join(ape, Seq(idCol))
  }
}

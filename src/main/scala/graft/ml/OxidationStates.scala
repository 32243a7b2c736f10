package graft.ml

/** Oxidation-state assignment for oxide compositions (SURVEY.md §2.C C12).
  *
  * The reference calls pymatgen's ICSD-prior guesser; this is the same
  * shape of algorithm scoped to oxides: O is fixed at −2, each cation
  * element takes one of its common states (ordered by prevalence), and a
  * small exhaustive search (≤6 elements, ≤5 states each) picks the
  * charge-neutral assignment that maximizes prevalence priority. Mixed
  * valence (no single-state-per-element neutral solution, e.g. Mn₃O₄)
  * falls back to the uniform average cation state — adequate for the Ewald
  * feature, which only needs physically-scaled charges.
  */
object OxidationStates {

  /** Common cation states per element, most prevalent first. */
  val CommonStates: Map[String, Seq[Int]] = Map(
    // As/Sb carry the ICSD anion states too (arsenide/antimonide oxides
    // like LaZnAsO = La³⁺Zn²⁺As³⁻O²⁻ balance only through them — the same
    // assignments BVAnalyzer's ICSD prior reaches)
    "Ag" -> Seq(1), "Al" -> Seq(3), "As" -> Seq(5, 3, -3), "Au" -> Seq(1, 3),
    "B" -> Seq(3), "Ba" -> Seq(2), "Be" -> Seq(2), "Bi" -> Seq(3, 5),
    "Ca" -> Seq(2), "Cd" -> Seq(2), "Co" -> Seq(2, 3), "Cr" -> Seq(3, 6, 2, 4),
    "Cs" -> Seq(1), "Cu" -> Seq(2, 1), "Ga" -> Seq(3), "Ge" -> Seq(4, 2),
    "Hf" -> Seq(4), "Hg" -> Seq(2, 1), "In" -> Seq(3, 1), "K" -> Seq(1),
    "La" -> Seq(3), "Li" -> Seq(1), "Mg" -> Seq(2), "Mn" -> Seq(2, 4, 3, 7),
    "Mo" -> Seq(6, 4), "Na" -> Seq(1), "Nb" -> Seq(5, 4), "Ni" -> Seq(2),
    "Os" -> Seq(4, 6, 8), "Pb" -> Seq(2, 4), "Pd" -> Seq(2, 4), "Pt" -> Seq(2, 4),
    "Rb" -> Seq(1), "Re" -> Seq(7, 6, 4), "Rh" -> Seq(3), "Sb" -> Seq(3, 5, -3),
    "Sc" -> Seq(3), "Si" -> Seq(4), "Sn" -> Seq(4, 2), "Sr" -> Seq(2),
    "Ta" -> Seq(5), "Tc" -> Seq(7, 4), "Th" -> Seq(4), "Ti" -> Seq(4, 3),
    "Tl" -> Seq(1, 3), "V" -> Seq(5, 4, 3), "W" -> Seq(6, 4), "Y" -> Seq(3),
    "Zn" -> Seq(2), "Zr" -> Seq(4))

  /** The charge-balanced one-state-per-element assignment, if one exists
    * over the common states (None = the same compositions where
    * pymatgen's BVAnalyzer raises — suboxides, oxypnictides — and
    * downstream consumers must take its failure branch). */
  def balanced(counts: Map[String, Double]): Option[Map[String, Double]] = {
    val oCount = counts.getOrElse("O", 0.0)
    val cations = counts.filter(_._1 != "O").toSeq.sortBy(_._1)
    if (cations.isEmpty) return Some(Map("O" -> -2.0))
    val needed = 2.0 * oCount

    // exhaustive search over one-state-per-element, minimize prevalence rank
    var best: Option[(Int, Seq[Int])] = None
    def rec(idx: Int, acc: List[Int], charge: Double, rankSum: Int): Unit = {
      if (idx == cations.length) {
        if (math.abs(charge - needed) < 1e-9 &&
          best.forall(_._1 > rankSum)) best = Some((rankSum, acc.reverse))
      } else {
        val (el, cnt) = cations(idx)
        CommonStates.getOrElse(el, Seq(3)).zipWithIndex.foreach { case (st, rank) =>
          rec(idx + 1, st :: acc, charge + st * cnt, rankSum + rank)
        }
      }
    }
    rec(0, Nil, 0.0, 0)
    best.map { case (_, states) =>
      cations.map(_._1).zip(states.map(_.toDouble)).toMap + ("O" -> -2.0)
    }
  }

  /** Per-element oxidation states for a composition (counts map).
    * Returns element → state (Double: fallback states can be fractional). */
  def guess(counts: Map[String, Double]): Map[String, Double] =
    balanced(counts).getOrElse {
      // mixed valence: uniform average cation state
      val oCount = counts.getOrElse("O", 0.0)
      val cations = counts.filter(_._1 != "O").toSeq.sortBy(_._1)
      val totalCations = cations.map(_._2).sum
      val avg = 2.0 * oCount / totalCations
      cations.map { case (el, _) => el -> avg }.toMap + ("O" -> -2.0)
    }
}

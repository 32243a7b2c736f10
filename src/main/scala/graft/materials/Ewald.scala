package graft.materials

import Geometry._

/** Ewald summation of the electrostatic energy of a periodic point-charge
  * array (SURVEY.md §2.C C17 kernel).
  *
  * Standard real + reciprocal split with Gaussian screening parameter η:
  *
  *   E = ½ Σ'_{ij,n} q_i q_j erfc(√η r)/r                      (real)
  *     + (2π/V) Σ_{k≠0} exp(−k²/4η)/k² |Σ_j q_j e^{ik·r_j}|²   (recip)
  *     − √(η/π) Σ_i q_i²                                       (self)
  *
  * in units of e²/(4πε₀Å) — multiply by 14.39964 to get eV, as pymatgen's
  * EwaldSummation does. Validated in GeometrySpec against the rock-salt
  * Madelung constant (1.747565) — the classic correctness oracle for any
  * Ewald implementation.
  */
object Ewald {

  val CoulombConstEvA = 14.399645351950543 // e^2/(4 pi eps0), in eV*Å

  /** Total electrostatic energy (eV) of charges at fractional positions. */
  def energy(lat: Lattice, frac: Array[Array[Double]], charges: Array[Double]): Double =
    siteEnergies(lat, frac, charges).sum

  /** Per-site energy partition E_i (eV), Σ_i E_i = E_total — the quantity
    * the reference reduces with np.max over sites (ml_prediction.py:205,248). */
  def siteEnergies(lat: Lattice, frac: Array[Array[Double]], charges: Array[Double]): Array[Double] = {
    val n = frac.length
    val v = lat.volume
    // screening parameter and cutoffs chosen for ~1e-8 absolute convergence
    val eta = math.Pi * math.pow(n / (v * v), 1.0 / 3)
    val sqrtEta = math.sqrt(eta)
    val rCut = 4.5 / sqrtEta
    val kCut = 2 * sqrtEta * 4.5

    val out = new Array[Double](n)

    // real-space: half of each pair term to both partners
    val nl = neighborList(lat, frac, rCut)
    nl.foreach { nb =>
      val e = 0.5 * charges(nb.siteIdx) * charges(nb.nbrIdx) * erfc(sqrtEta * nb.dist) / nb.dist
      out(nb.siteIdx) += e
    }

    // reciprocal-space over k = n1 g1 + n2 g2 + n3 g3, |k| <= kCut
    val g = lat.reciprocal
    val gLens = g.map(norm)
    val reach = gLens.map(gl => math.ceil(kCut / gl).toInt)
    val carts = frac.map(lat.cart)
    var n1 = -reach(0)
    while (n1 <= reach(0)) {
      var n2 = -reach(1)
      while (n2 <= reach(1)) {
        var n3 = -reach(2)
        while (n3 <= reach(2)) {
          if (!(n1 == 0 && n2 == 0 && n3 == 0)) {
            val kx = n1 * g(0)(0) + n2 * g(1)(0) + n3 * g(2)(0)
            val ky = n1 * g(0)(1) + n2 * g(1)(1) + n3 * g(2)(1)
            val kz = n1 * g(0)(2) + n2 * g(1)(2) + n3 * g(2)(2)
            val k2 = kx * kx + ky * ky + kz * kz
            if (k2 <= kCut * kCut) {
              var re = 0.0; var im = 0.0
              var j = 0
              while (j < n) {
                val ph = kx * carts(j)(0) + ky * carts(j)(1) + kz * carts(j)(2)
                re += charges(j) * math.cos(ph)
                im += charges(j) * math.sin(ph)
                j += 1
              }
              val pref = 2 * math.Pi / v * math.exp(-k2 / (4 * eta)) / k2
              // distribute the structure-factor energy back per site:
              // E_k,i = pref * q_i (cos φ_i re + sin φ_i im)
              var i = 0
              while (i < n) {
                val ph = kx * carts(i)(0) + ky * carts(i)(1) + kz * carts(i)(2)
                out(i) += pref * charges(i) * (math.cos(ph) * re + math.sin(ph) * im)
                i += 1
              }
            }
          }
          n3 += 1
        }
        n2 += 1
      }
      n1 += 1
    }

    // self-energy
    var i = 0
    while (i < n) {
      out(i) -= sqrtEta / math.sqrt(math.Pi) * charges(i) * charges(i)
      i += 1
    }

    out.map(_ * CoulombConstEvA)
  }

  /** Complementary error function (Abramowitz–Stegun 7.1.26, |err| ≤ 1.5e-7
    * — well under the Ewald truncation error). */
  def erfc(x: Double): Double = {
    val ax = math.abs(x)
    val t = 1.0 / (1.0 + 0.3275911 * ax)
    val y = t * (0.254829592 + t * (-0.284496736 + t * (1.421413741 +
      t * (-1.453152027 + t * 1.061405429)))) * math.exp(-ax * ax)
    if (x >= 0) y else 2.0 - y
  }
}

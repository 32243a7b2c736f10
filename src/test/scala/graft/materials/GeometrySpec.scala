package graft.materials

import org.scalatest.funsuite.AnyFunSuite

import graft.materials.Geometry._
import graft.ml.OxidationStates

/** Kernel correctness: neighbor list vs brute-force supercell enumeration
  * (incl. a skewed triclinic cell — SURVEY.md §7.4 risk #1), Ewald vs the
  * rock-salt Madelung constant, oxidation-state guesser. */
class GeometrySpec extends AnyFunSuite {

  private def bruteForce(lat: Lattice, frac: Array[Array[Double]], cutoff: Double,
      reach: Int): Seq[(Int, Int, Double)] = {
    val carts = frac.map(lat.cart)
    for {
      i <- carts.indices
      j <- carts.indices
      na <- -reach to reach; nb <- -reach to reach; nc <- -reach to reach
      t = Array(
        na * lat.m(0)(0) + nb * lat.m(1)(0) + nc * lat.m(2)(0),
        na * lat.m(0)(1) + nb * lat.m(1)(1) + nc * lat.m(2)(1),
        na * lat.m(0)(2) + nb * lat.m(1)(2) + nc * lat.m(2)(2))
      d = math.sqrt(
        math.pow(carts(j)(0) + t(0) - carts(i)(0), 2) +
        math.pow(carts(j)(1) + t(1) - carts(i)(1), 2) +
        math.pow(carts(j)(2) + t(2) - carts(i)(2), 2))
      if d > 1e-8 && d <= cutoff
    } yield (i, j, d)
  }

  test("neighbor list matches brute force on a skewed triclinic cell") {
    val lat = Lattice(Array(
      Array(4.1, 0.0, 0.0),
      Array(2.3, 3.6, 0.0),
      Array(1.1, 1.9, 3.2)))
    val frac = Array(
      Array(0.0, 0.0, 0.0), Array(0.31, 0.47, 0.11), Array(0.73, 0.12, 0.64))
    val cutoff = 5.0
    val nl = neighborList(lat, frac, cutoff).map(n => (n.siteIdx, n.nbrIdx, n.dist))
    val bf = bruteForce(lat, frac, cutoff, 4)
    assert(nl.size == bf.size, s"count ${nl.size} vs ${bf.size}")
    val sortKey = (t: (Int, Int, Double)) => (t._1, t._2, math.rint(t._3 * 1e9))
    nl.sortBy(sortKey).zip(bf.sortBy(sortKey)).foreach { case (a, b) =>
      assert(a._1 == b._1 && a._2 == b._2 && math.abs(a._3 - b._3) < 1e-9)
    }
  }

  test("ewald reproduces the rock-salt Madelung constant") {
    val a = 5.64
    val lat = Lattice(Array(Array(a, 0, 0), Array(0, a, 0), Array(0, 0, a)))
    val na = Array(Array(0.0, 0.0, 0.0), Array(0.5, 0.5, 0.0),
      Array(0.5, 0.0, 0.5), Array(0.0, 0.5, 0.5))
    val cl = Array(Array(0.5, 0.0, 0.0), Array(0.0, 0.5, 0.0),
      Array(0.0, 0.0, 0.5), Array(0.5, 0.5, 0.5))
    val frac = na ++ cl
    val charges = Array(1.0, 1.0, 1.0, 1.0, -1.0, -1.0, -1.0, -1.0)
    val total = Ewald.energy(lat, frac, charges)
    // E per formula unit = -M * k / r0, M = 1.747565, r0 = a/2
    val expected = 4 * (-1.7475645946 * Ewald.CoulombConstEvA / (a / 2))
    assert(math.abs(total - expected) / math.abs(expected) < 1e-4,
      s"ewald=$total expected=$expected")
    // energy partition must sum to the total and be symmetric by species
    val per = Ewald.siteEnergies(lat, frac, charges)
    assert(math.abs(per.sum - total) < 1e-9)
    assert(math.abs(per(0) - per(1)) < 1e-9 && math.abs(per(4) - per(7)) < 1e-9)
  }

  test("erfc accuracy against known values") {
    assert(math.abs(Ewald.erfc(0.0) - 1.0) < 1e-7)
    assert(math.abs(Ewald.erfc(1.0) - 0.15729920705) < 2e-7)
    assert(math.abs(Ewald.erfc(-1.0) - 1.84270079295) < 2e-7)
    assert(math.abs(Ewald.erfc(2.0) - 0.00467773498) < 2e-7)
  }

  test("oxidation guesser: textbook oxides and mixed valence fallback") {
    assert(OxidationStates.guess(Map("Si" -> 1.0, "O" -> 2.0)) ==
      Map("Si" -> 4.0, "O" -> -2.0))
    assert(OxidationStates.guess(Map("Ca" -> 2.0, "Sn" -> 1.0, "O" -> 4.0)) ==
      Map("Ca" -> 2.0, "Sn" -> 4.0, "O" -> -2.0))
    assert(OxidationStates.guess(Map("Ba" -> 1.0, "Ti" -> 1.0, "O" -> 3.0)) ==
      Map("Ba" -> 2.0, "Ti" -> 4.0, "O" -> -2.0))
    // Mn3O4 (mixed valence 2x +3 + 1x +2): falls back to uniform 8/3
    val mn = OxidationStates.guess(Map("Mn" -> 3.0, "O" -> 4.0))
    assert(math.abs(mn("Mn") - 8.0 / 3) < 1e-9)
    // charge neutrality always holds
    Seq(Map("Al" -> 2.0, "O" -> 3.0), Map("Li" -> 1.0, "Nb" -> 1.0, "O" -> 3.0))
      .foreach { c =>
        val st = OxidationStates.guess(c)
        val q = c.map { case (el, n) => st(el) * n }.sum
        assert(math.abs(q) < 1e-9, s"$c -> $st")
      }
  }

  test("order parameters: perfect motifs score 1, distorted score lower") {
    val s3 = 1.0 / math.sqrt(3)
    val tet = Seq(
      Array(s3, s3, s3), Array(s3, -s3, -s3), Array(-s3, s3, -s3), Array(-s3, -s3, s3))
    assert(math.abs(tetrahedralOrder(tet) - 1.0) < 1e-12)
    val oct = Seq(
      Array(1.0, 0, 0), Array(-1.0, 0, 0), Array(0, 1.0, 0),
      Array(0, -1.0, 0), Array(0, 0, 1.0), Array(0, 0, -1.0))
    assert(math.abs(octahedralOrder(oct) - 1.0) < 1e-12)
    // octahedral environment is NOT tetrahedral and vice versa
    assert(tetrahedralOrder(oct.take(4)) < 0.8)
    assert(octahedralOrder(tet ++ tet.take(2)) < 0.8)
    // distortion lowers the score
    val distorted = tet.map(v => Array(v(0) + 0.3, v(1), v(2)))
    assert(tetrahedralOrder(distorted) < 0.97)
    // trigonal planar: three 120°-spaced vectors in a plane
    val tri = Seq(0, 1, 2).map(i => Array(
      math.cos(2 * math.Pi * i / 3), math.sin(2 * math.Pi * i / 3), 0.0))
    assert(math.abs(trigonalPlanarOrder(tri) - 1.0) < 1e-12)
    assert(trigonalPlanarOrder(tet.take(3)) < 0.9)
    // square planar: ±x, ±y
    val sqp = Seq(Array(1.0, 0, 0), Array(-1.0, 0, 0), Array(0, 1.0, 0), Array(0, -1.0, 0))
    assert(math.abs(squarePlanarOrder(sqp) - 1.0) < 1e-12)
    assert(squarePlanarOrder(tet) < 0.8)
    // pentagonal planar: five 72°-spaced vectors in a plane
    val pent = (0 until 5).map(i => Array(
      math.cos(2 * math.Pi * i / 5), math.sin(2 * math.Pi * i / 5), 0.0)).toSeq
    assert(math.abs(pentagonalPlanarOrder(pent) - 1.0) < 1e-12)
    assert(pentagonalPlanarOrder(oct.take(5)) < 0.9)
    // bent 150°: exact at the ideal angle, lower at 90°
    val c150 = math.toRadians(150)
    val bent = Seq(Array(1.0, 0, 0), Array(math.cos(c150), math.sin(c150), 0))
    assert(math.abs(bentOrder(bent, 150.0) - 1.0) < 1e-12)
    assert(bentOrder(sqp.take(2), 150.0) < bentOrder(bent, 150.0))
    // see-saw: axial ±z + equatorial x, y scores 1; square planar pays
    // the second-axial-pair penalty and drops to 1/3
    val ssw = Seq(Array(0.0, 0, 1), Array(0.0, 0, -1), Array(1.0, 0, 0), Array(0.0, 1, 0))
    assert(math.abs(seeSawOrder(ssw) - 1.0) < 1e-12)
    assert(seeSawOrder(sqp) < 0.5)
    assert(seeSawOrder(tet) < seeSawOrder(ssw))
    // single bond: dominant nearest neighbor → 1, equidistant pair → 0
    assert(singleBondOrder(Seq(2.0)) == 1.0)
    assert(math.abs(singleBondOrder(Seq(1.0, 4.0)) - 0.75) < 1e-12)
    assert(singleBondOrder(Seq(2.0, 2.0)) == 0.0)
    // finite cutoff (the featurizer form): lone neighbor scores the gap
    // to the cutoff, not a flat 1
    assert(math.abs(singleBondOrder(Seq(2.0), 6.5) - 4.5 / 6.5) < 1e-12)
  }

  test("q6: fcc CN-12 shell matches the published Steinhardt value") {
    // 12 fcc nearest neighbors: permutations of (±1, ±1, 0)/√2
    val fcc12 = (for {
      (i, j) <- Seq((0, 1), (0, 2), (1, 2))
      si <- Seq(1.0, -1.0); sj <- Seq(1.0, -1.0)
    } yield {
      val v = Array(0.0, 0.0, 0.0); v(i) = si / math.sqrt(2); v(j) = sj / math.sqrt(2); v
    }).toSeq
    assert(fcc12.size == 12)
    // published Steinhardt reference value: q6(fcc) ≈ 0.57452
    assert(math.abs(q6Order(fcc12) - 0.57452) < 5e-4, s"q6=${q6Order(fcc12)}")
    // simple-cubic octahedral shell: q6(sc) ≈ 0.35355 (published)
    val oct = Seq(
      Array(1.0, 0, 0), Array(-1.0, 0, 0), Array(0, 1.0, 0),
      Array(0, -1.0, 0), Array(0, 0, 1.0), Array(0, 0, -1.0))
    assert(math.abs(q6Order(oct, 6) - 0.35355) < 5e-3, s"q6=${q6Order(oct, 6)}")
  }

  test("lattice plane spacings bound the cutoff sphere correctly") {
    // cubic: spacing = a on every axis
    val lat = Lattice(Array(Array(3.0, 0, 0), Array(0, 3.0, 0), Array(0, 0, 3.0)))
    assert(lat.planeSpacings.forall(s => math.abs(s - 3.0) < 1e-12))
    assert(math.abs(lat.volume - 27.0) < 1e-12)
  }
}

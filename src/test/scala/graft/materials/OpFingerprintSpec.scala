package graft.materials

import org.scalatest.funsuite.AnyFunSuite

/** Closed-form gates for the exact OPSiteFingerprint machinery: ideal
  * motifs must score ~1 in their own frame family and low in others, and
  * the shell/vote plumbing must behave like the published algorithm. */
class OpFingerprintSpec extends AnyFunSuite {

  import OpFingerprint._

  private def v(x: Double, y: Double, z: Double) = Array(x, y, z)
  private val octDirs = Array(
    v(1, 0, 0), v(-1, 0, 0), v(0, 1, 0), v(0, -1, 0), v(0, 0, 1), v(0, 0, -1))
  private val tetDirs = Array(
    v(1, 1, 1), v(1, -1, -1), v(-1, 1, -1), v(-1, -1, 1)).map { a =>
    val n = math.sqrt(3.0); Array(a(0) / n, a(1) / n, a(2) / n)
  }

  test("ideal motifs score ~1 in their own frames") {
    assert(math.abs(geomOp(Oct, octDirs) - 1.0) < 1e-9)
    assert(math.abs(geomOp(Tet, tetDirs) - 1.0) < 1e-9)
    // linear pair
    assert(math.abs(geomOp(Lin, Array(v(1, 0, 0), v(-1, 0, 0))) - 1.0) < 1e-9)
    // 150-degree bent pair
    val c = math.cos(math.toRadians(150)); val s = math.sin(math.toRadians(150))
    assert(math.abs(geomOp(Bent150, Array(v(1, 0, 0), v(c, s, 0))) - 1.0) < 1e-9)
    // trigonal planar
    val tri = Array(0, 1, 2).map(i =>
      v(math.cos(2 * math.Pi * i / 3), math.sin(2 * math.Pi * i / 3), 0))
    assert(math.abs(geomOp(TriPlan, tri) - 1.0) < 1e-9)
    // pentagonal planar (pole at a vertex: neighbors at 72/144 degrees)
    val pent = Array(0, 1, 2, 3, 4).map(i =>
      v(math.cos(2 * math.Pi * i / 5), math.sin(2 * math.Pi * i / 5), 0))
    assert(geomOp(PentPlan, pent) > 0.95)
    // rectangular see-saw: two axial, two equatorial 90 degrees apart
    val ssw = Array(v(0, 0, 1), v(0, 0, -1), v(1, 0, 0), v(0, 1, 0))
    assert(math.abs(geomOp(SeeSaw, ssw) - 1.0) < 1e-9)
  }

  test("motifs discriminate: wrong geometry scores low") {
    // a tetrahedron is NOT an octahedral fragment, a see-saw, or planar
    assert(geomOp(Oct, tetDirs) < 0.35)
    assert(geomOp(SeeSaw, tetDirs) < 0.35)
    assert(geomOp(Tet, octDirs.take(4)) < 0.5) // square-planar-ish subset
    // square planar and the rectangular see-saw are both octahedron
    // fragments — the cos^2(2*phi) family scores both at 1 (what the
    // shipped scaler stats calibrate to); only non-fragment geometries
    // (like the tetrahedron above) are pushed down
    val sqp = Array(v(1, 0, 0), v(-1, 0, 0), v(0, 1, 0), v(0, -1, 0))
    assert(geomOp(SeeSaw, sqp) > 0.95)
  }

  test("site(): a perfect octahedral shell votes to ~oct=1 with unit distance factor") {
    val dists = Array.fill(6)(2.0) ++ Array.fill(8)(3.9)
    val vecs = octDirs.map(u => v(2.0 * u(0), 2.0 * u(1), 2.0 * u(2))) ++
      tetDirs.flatMap(u => Seq(
        v(3.9 * u(0), 3.9 * u(1), 3.9 * u(2)),
        v(-3.9 * u(0), -3.9 * u(1), -3.9 * u(2))))
    val ops = site(dists, vecs)
    // first shell: 6 equidistant neighbors, d_rel = 1 → d_fac = 1, oct = 1
    // (the histogram vote bin-centers within dop/2)
    assert(math.abs(ops.oct - 1.0) < 0.002, s"oct=${ops.oct}")
    assert(ops.tet < 0.01) // no CN-4 shell exists → zero_ops
    assert(ops.lin < 0.01) // no CN-2 shell either
    assert(ops.sgl < 0.01) // six equidistant nearest: no single bond
  }

  test("histogram vote: two agreeing widths beat one, ties take the lowest bin") {
    // motif column 0; three width values per row
    def voteOf(a: Double, b: Double, c: Double): Double =
      vote(Array(Array(a), Array(b), Array(c)), 0)
    // two values agree within a bin → their bin center wins
    assert(math.abs(voteOf(0.8, 0.8003, 0.2) - 0.8005) < 0.002)
    // three-way disagreement → lowest-valued bin center
    assert(voteOf(0.9, 0.5, 0.1) < 0.11)
    // identical values → bin-centered value
    assert(math.abs(voteOf(0.5, 0.5, 0.5) - 0.5005) < 0.002)
  }
}

package graft.materials

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.Eig3x3

/** Ingest-invariant verification over the full 1,278-record reference
  * corpus (SURVEY.md §2.B / §5.2.1) plus property tests for the
  * eigensolver. */
class MaterialsSpec extends SparkSpec {

  lazy val mats = Materials.readJson(spark).cache()

  test("ingest: full corpus loads with the fixed schema") {
    assert(mats.count() == 1278)
    assert(mats.filter(col("mp_id").isNull).count() == 0)
    // uniform structural invariants
    assert(mats.filter(size(col("structure.sites")) =!= col("nsites")).count() == 0)
    assert(mats.filter(size(col("phonon.frequency")) =!= col("nsites") * 3).count() == 0)
    assert(mats.filter(size(col("born_effective_charge.tensors")) =!= col("nsites")).count() == 0)
    assert(mats.filter(!array_contains(col("elements"), "O")).count() == 0)
  }

  test("sites: single species, occu=1, elements sorted") {
    assert(mats.filter(exists(col("structure.sites"), s =>
      size(s.getField("species")) =!= 1).cast("boolean")).count() == 0)
    assert(mats.filter(exists(col("structure.sites"), s =>
      abs(s.getField("species").getItem(0).getField("occu") - 1.0) > 1e-12)).count() == 0)
    assert(mats.filter(to_json(col("elements")) =!= to_json(array_sort(col("elements")))).count() == 0)
  }

  test("derived: recomputed B1-B4 match stored values on every record") {
    val d = Materials.withDerived(mats).select(
      max("eig_el_err").as("e1"), max("eig_ion_err").as("e2"),
      max("avg_el_err").as("e3"), max("avg_ion_err").as("e4"),
      max("lowest_freq_err").as("e5"), max("abs_trace_err").as("e6")).head()
    assert(d.getDouble(0) <= 1e-4, s"eig_el max err ${d.getDouble(0)}")
    assert(d.getDouble(1) <= 1e-4, s"eig_ion max err ${d.getDouble(1)}")
    assert(d.getDouble(2) <= 1e-6, s"avg_el max err ${d.getDouble(2)}")
    assert(d.getDouble(3) <= 1e-6, s"avg_ion max err ${d.getDouble(3)}")
    assert(d.getDouble(4) == 0.0, "lowest_freq must match exactly")
    assert(d.getDouble(5) <= 1e-6, s"abs_trace max err ${d.getDouble(5)}")
  }

  test("dedup: exactly 12 duplicate-formula pairs; reference exclusions are one per pair") {
    val dups = Materials.duplicateFormulas(mats).collect()
    assert(dups.length == 12)
    assert(dups.forall(_.getLong(1) == 2)) // all pairs, no triples
    val pairIds = dups.flatMap(_.getSeq[String](3)).toSet
    assert(Materials.ReferenceExcludedIds.subsetOf(pairIds))
    // one excluded id per pair
    dups.foreach { r =>
      val ids = r.getSeq[String](3).toSet
      assert((ids & Materials.ReferenceExcludedIds).size == 1, s"pair $ids")
    }
    assert(Materials.referenceTrainingSet(mats).count() == 1266)
    assert(Materials.dedupByFormula(mats).count() == 1266)
  }

  test("eig3x3: property — reconstructs trace and determinant") {
    val rnd = new scala.util.Random(42)
    for (_ <- 1 to 200) {
      val m = Array.fill(3, 3)(rnd.nextDouble() * 10 - 5)
      // symmetrize to build the ground truth the solver targets
      val s = Array.tabulate(3, 3)((i, j) => (m(i)(j) + m(j)(i)) / 2)
      val eig = Eig3x3.eigenvalues(s)
      val tr = s(0)(0) + s(1)(1) + s(2)(2)
      val det = s(0)(0) * (s(1)(1) * s(2)(2) - s(1)(2) * s(2)(1)) -
        s(0)(1) * (s(1)(0) * s(2)(2) - s(1)(2) * s(2)(0)) +
        s(0)(2) * (s(1)(0) * s(2)(1) - s(1)(1) * s(2)(0))
      assert(math.abs(eig.sum - tr) < 1e-9 * math.max(1, math.abs(tr)))
      assert(math.abs(eig.product - det) < 1e-7 * math.max(1, math.abs(det)))
      assert(eig(0) <= eig(1) && eig(1) <= eig(2))
    }
  }

  test("eig3x3: diagonal matrix returns sorted diagonal") {
    val eig = Eig3x3.eigenvalues(Array(
      Array(3.0, 0.0, 0.0), Array(0.0, 1.0, 0.0), Array(0.0, 0.0, 2.0)))
    assert(eig.zip(Seq(1.0, 2.0, 3.0)).forall { case (a, b) => math.abs(a - b) < 1e-12 })
  }

  test("flagship: top ionic stable wide-gap oxides is non-empty and ordered") {
    val top = Materials.topIonicStableWideGap(spark).collect()
    assert(top.length == 10)
    val vals = top.map(_.getDouble(3))
    assert(vals.sameElements(vals.sorted.reverse))
    assert(top.forall(_.getDouble(2) > 3.0))
  }
}

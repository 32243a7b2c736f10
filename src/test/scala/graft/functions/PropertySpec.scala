package graft.functions

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Property-based tests (ScalaCheck generators driven directly — the
  * scalatest/scalacheck bridge isn't on the offline classpath) for the
  * scalar kernels: formula-parser round trips and eigensolver algebraic
  * invariants over randomized inputs — the §5.2.1 property-test plan. */
class PropertySpec extends AnyFunSuite {

  /** Deterministic forAll: 100 samples from fixed seeds. */
  private def forAll[A](gen: Gen[A])(f: A => Unit): Unit =
    (0 until 100).foreach { i =>
      f(gen.pureApply(Gen.Parameters.default, Seed(42L + i)))
    }

  private def forAll[A, B](ga: Gen[A], gb: Gen[B])(f: (A, B) => Unit): Unit =
    (0 until 100).foreach { i =>
      f(ga.pureApply(Gen.Parameters.default, Seed(42L + i)),
        gb.pureApply(Gen.Parameters.default, Seed(4242L + i)))
    }

  private def whenever(cond: Boolean)(body: => Unit): Unit = if (cond) body

  private val elements = Gen.oneOf(graft.ml.ElementData.all.map(_.symbol))
  private val compGen: Gen[Map[String, Int]] = for {
    n <- Gen.choose(1, 5)
    els <- Gen.listOfN(n, elements).map(_.distinct)
    counts <- Gen.listOfN(els.size, Gen.choose(1, 12))
  } yield els.zip(counts).toMap

  test("formula parser round trip: render(parse(f)) == counts") {
    forAll(compGen) { comp =>
      whenever(comp.nonEmpty) {
        val formula = comp.toSeq.sortBy(_._1)
          .map { case (e, n) => if (n == 1) e else s"$e$n" }.mkString
        val parsed = FormulaParser.parse(formula)
        assert(parsed == comp.map { case (k, v) => k -> v.toDouble })
      }
    }
  }

  test("formula parser: parenthesized groups multiply out") {
    forAll(compGen, Gen.choose(2, 4)) { (comp, mult) =>
      whenever(comp.nonEmpty) {
        val inner = comp.toSeq.sortBy(_._1)
          .map { case (e, n) => if (n == 1) e else s"$e$n" }.mkString
        val parsed = FormulaParser.parse(s"($inner)$mult")
        assert(parsed == comp.map { case (k, v) => k -> (v * mult).toDouble })
      }
    }
  }

  private val matGen: Gen[Array[Array[Double]]] = for {
    vals <- Gen.listOfN(9, Gen.choose(-50.0, 50.0))
  } yield vals.toArray.grouped(3).toArray

  test("eig3x3 on symmetric matrices: trace, det, ordering, shift-invariance") {
    forAll(matGen) { m =>
      val s = Array.tabulate(3, 3)((i, j) => (m(i)(j) + m(j)(i)) / 2)
      val eig = Eig3x3.eigenvalues(s)
      val tr = s(0)(0) + s(1)(1) + s(2)(2)
      assert(math.abs(eig.sum - tr) < 1e-8 * math.max(1, math.abs(tr)))
      assert(eig(0) <= eig(1) && eig(1) <= eig(2))
      // spectral shift: eig(A + cI) = eig(A) + c
      val c = 7.25
      val shifted = Array.tabulate(3, 3)((i, j) => s(i)(j) + (if (i == j) c else 0.0))
      val eigS = Eig3x3.eigenvalues(shifted)
      eig.zip(eigS).foreach { case (a, b) =>
        assert(math.abs(a + c - b) < 1e-7 * math.max(1, math.abs(b)))
      }
    }
  }

  test("weighted stats aggregator invariants vs brute force") {
    val pairGen = Gen.nonEmptyListOf(Gen.zip(Gen.choose(-100.0, 100.0), Gen.choose(0.1, 5.0)))
    forAll(pairGen) { pairs =>
      val agg = WeightedStats.aggregator
      val buf = pairs.foldLeft(agg.zero)((b, p) => agg.reduce(b, WeightedStats.In(p._1, p._2)))
      val out = agg.finish(buf)
      val wSum = pairs.map(_._2).sum
      val mean = pairs.map(p => p._1 * p._2).sum / wSum
      assert(math.abs(out.mean - mean) < 1e-9 * math.max(1, math.abs(mean)))
      assert(out.min == pairs.map(_._1).min && out.max == pairs.map(_._1).max)
      // merge associativity: split at any point gives the same result
      val (l, r) = pairs.splitAt(pairs.size / 2)
      val bl = l.foldLeft(agg.zero)((b, p) => agg.reduce(b, WeightedStats.In(p._1, p._2)))
      val br = r.foldLeft(agg.zero)((b, p) => agg.reduce(b, WeightedStats.In(p._1, p._2)))
      val merged = agg.finish(agg.merge(bl, br))
      assert(math.abs(merged.mean - out.mean) < 1e-9)
      assert(math.abs(merged.std - out.std) < 1e-9)
    }
  }
}

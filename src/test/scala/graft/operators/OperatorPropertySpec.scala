package graft.operators

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Property-based tests for the driver-side operator kernels (no
  * SparkSession): byte-CDC chunking invariants over randomized content
  * and the constant-occupancy clustering law. */
class OperatorPropertySpec extends AnyFunSuite {

  private def forAll[A](gen: Gen[A])(f: A => Unit): Unit =
    (0 until 100).foreach { i =>
      f(gen.pureApply(Gen.Parameters.default, Seed(97L + i)))
    }

  private val bytesGen: Gen[Array[Byte]] = for {
    n <- Gen.frequency(1 -> Gen.const(0), 1 -> Gen.choose(1, 20), 4 -> Gen.choose(100, 3000))
    bs <- Gen.listOfN(n, Gen.choose(Byte.MinValue, Byte.MaxValue))
  } yield bs.toArray

  test("cdc chunks tile any content exactly, within clamps, deterministically") {
    forAll(bytesGen) { b =>
      val cs = Multimodal.cdcChunks(1L, b)
      assert(cs.map(_.len).sum == b.length)
      // contiguous, in order, indexed
      cs.zipWithIndex.foreach { case (c, i) => assert(c.chunk_idx == i && c.len >= 1) }
      cs.sliding(2).foreach {
        case Seq(x, y) => assert(y.offset == x.offset + x.len)
        case _         =>
      }
      cs.foreach(c => assert(c.len <= Multimodal.CdcMaxChunk))
      // fingerprints are content-addressed: recompute from slices
      cs.foreach(c => assert(c.fp == Multimodal.fnv64(b, c.offset, c.offset + c.len)))
      assert(Multimodal.cdcChunks(1L, b.clone()) == cs)
    }
  }

  test("cdc boundaries are content-defined: appending a suffix preserves all closed chunks") {
    val pair = for {
      b <- bytesGen.suchThat(_.length >= 100)
      s <- Gen.listOfN(64, Gen.choose(Byte.MinValue, Byte.MaxValue)).map(_.toArray)
    } yield (b, s)
    forAll(pair) { case (b, s) =>
      val before = Multimodal.cdcChunks(1L, b)
      val after = Multimodal.cdcChunks(1L, b ++ s)
      // every chunk of b except (possibly) the reopened final one
      // survives the append byte-identically — the no-cascade property
      // fixed-width blocking does not have
      val closed = before.dropRight(1)
      assert(after.take(closed.size) == closed,
        s"append disturbed closed chunks (|b|=${b.length})")
    }
  }

  test("semdedup cluster count keeps occupancy ~CellTarget and is monotone") {
    forAll(Gen.choose(1L, 10000000000L)) { n =>
      val k = SemDedup.semClusters(n)
      assert(k >= 8)
      if (n >= 8L * SemDedup.CellTarget) {
        val occ = n.toDouble / k
        assert(occ <= SemDedup.CellTarget + 1, s"n=$n occupancy $occ")
        assert(occ >= SemDedup.CellTarget / 2.0, s"n=$n occupancy $occ too sparse")
      }
      assert(SemDedup.semClusters(n * 2) >= k)
    }
  }
}

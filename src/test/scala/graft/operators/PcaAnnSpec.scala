package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** PCA dim-reduction shortlist ANN: transform correctness (orthonormal,
  * variance-ordered), the deep-slice equality contract the oracle also
  * gates, and the normal operating point's recall. */
class PcaAnnSpec extends SparkSpec {

  test("pca: rotation rows are orthonormal and variance-ordered") {
    val r = Similarity.pcaRotation(spark, sf, Similarity.PcaDims)
    assert(r.length == Similarity.PcaDims && r.head.length == Similarity.Dim)
    for (i <- r.indices; j <- i until r.length) {
      val d = r(i).zip(r(j)).map { case (a, b) => a * b }.sum
      val expect = if (i == j) 1.0 else 0.0
      assert(math.abs(d - expect) < 1e-9, s"<r$i,r$j> = $d")
    }
    // projected-coordinate energy decreases with eigen rank (top
    // eigenvector first): measured over the corpus itself
    val proj = Similarity.pcaTopK(spark, sf) // force cache fill
    proj.count()
    val vecs = graft.sources.Tables.embeddings(spark, sf)
      .select(transform(col("embedding"), x => x.cast("double")).as("v"))
      .collect().map(_.getSeq[Double](0).toArray)
    val energy = r.map(row => vecs.map { v =>
      val s = row.zip(v).map { case (a, b) => a * b }.sum; s * s
    }.sum)
    // non-strict with slack: sampled fit vs full-corpus measurement can
    // swap near-equal eigenvalues, never large ones
    energy.zip(energy.tail).foreach { case (a, b) =>
      assert(b <= a * 1.25 + 1e-9, s"energy must not increase materially: $a -> $b")
    }
  }

  test("pca: deep shortlist top-1 equals the exact nearest neighbor") {
    val exact = Similarity.bruteForceTopK(spark, sf)
      .filter(col("rank") === 1).select("q_id", "nbr_id")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val pca = Similarity.pcaTopK(spark, sf, deepShortlist = true)
      .filter(col("rank") === 1).select("q_id", "nbr_id")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(pca == exact)
  }

  test("pca: normal shortlist achieves usable top-k recall vs brute force") {
    val exact = Similarity.bruteForceTopK(spark, sf)
      .select("q_id", "nbr_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val pca = Similarity.pcaTopK(spark, sf)
      .select("q_id", "nbr_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (pca & exact).size.toDouble / exact.size
    assert(recall >= 0.7, s"pca top-k recall $recall below floor")
  }
}

package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Bloom decontamination: one-sided-error law vs the exact join, and
  * bounded false-positive rate. */
class DecontamSpec extends SparkSpec {

  test("no false negatives: bloom flags a superset of exact contamination per doc") {
    val exact = TextAnalysis.contamination(spark, sf)
      .select(col("doc_id"), col("n_grams"), col("n_contaminated"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val bloom = Decontam.bloomDecontam(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(bloom.nonEmpty)
    assert(bloom.map(_._1).toSet == exact.keySet) // same test split
    var fp = 0L; var negatives = 0L
    bloom.foreach { case (id, nGrams, nFlagged) =>
      val (exGrams, exHits) = exact(id)
      assert(nGrams == exGrams)
      assert(nFlagged >= exHits, s"doc $id: bloom $nFlagged < exact $exHits")
      fp += nFlagged - exHits
      negatives += nGrams - exHits
    }
    // fp rate over true-negative probes bounded by ~fpp (1%), slack 5x
    assert(negatives == 0 || fp.toDouble / negatives <= 0.05,
      s"false-positive rate ${fp.toDouble / negatives}")
  }

  test("exact verdict frame: every exact-dropped doc is also bloom-dropped (one-sided)") {
    val exact = Decontam.decontamVerdicts(spark, sf)
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Boolean]("keep")).toMap
    val bloomDrop = Decontam.bloomDecontam(spark, sf)
      .filter(col("ratio") > Decontam.MaxRatio)
      .collect().map(_.getAs[Long]("doc_id")).toSet
    assert(exact.nonEmpty && exact.values.exists(_ == true) && exact.values.exists(_ == false),
      "threshold split is trivial on the fixture")
    val exactDrop = exact.collect { case (id, false) => id }.toSet
    assert(exactDrop.subsetOf(bloomDrop),
      s"bloom missed exact-dropped docs: ${exactDrop -- bloomDrop}")
  }

  test("deterministic across invocations (fixed murmur3 seed)") {
    val a = Decontam.bloomDecontam(spark, sf).collect().toSeq
    val b = Decontam.bloomDecontam(spark, sf).collect().toSeq
    assert(a == b)
  }
}

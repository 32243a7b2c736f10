package graft.ml

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Self-supervised quality classifier: holdout separation + sane scores. */
class QualityClassifierSpec extends SparkSpec {

  test("holdout accuracy ≥ 0.95 on unseen docs and their corruptions") {
    val (model, holdout) = QualityClassifier.train(spark, sf)
    val scored = model.transform(holdout)
    val n = scored.count()
    assert(n > 0)
    val correct = scored.filter(col("prediction") === col("label")).count()
    val acc = correct.toDouble / n
    assert(acc >= 0.95, s"holdout accuracy $acc ($correct/$n)")
  }

  test("corpus scoring: real docs score high, deterministic across runs") {
    val (model, _) = QualityClassifier.train(spark, sf)
    val s1 = QualityClassifier.score(model, spark, sf).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // the corpus itself is the positive class: median score must be high
    val med = s1.values.toSeq.sorted.apply(s1.size / 2)
    assert(med > 0.8, s"median corpus quality $med")
    val s2 = QualityClassifier.score(model, spark, sf).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(s1 == s2)
  }
}

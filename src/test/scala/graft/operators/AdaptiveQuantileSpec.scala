package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sources.Tables

/** Oracle-SF equivalence guard for the exact-vs-approx quantile paths:
  * the ORACLE rows (tx_quality_adaptive, report_corpus) keep exact
  * `percentile`; the 100 TB plans swap in `approx_percentile`. This spec
  * pins the swap's error on the fixture: with accuracy 10000 the sketch's
  * rank error is ≤ n/10000 < 1 at fixture sizes, so the approx value must
  * be one of the two order statistics adjacent to the exact interpolated
  * rank — and the keep-verdicts must be near-identical. */
class AdaptiveQuantileSpec extends SparkSpec {

  /** Adjacent order statistics around rank (n-1)·q of a sorted sample. */
  private def bracket(sorted: Array[Double], q: Double): (Double, Double) = {
    val rank = (sorted.length - 1) * q
    (sorted(math.floor(rank).toInt), sorted(math.ceil(rank).toInt))
  }

  test("adaptiveQuality: approx threshold lands on an order statistic adjacent to the exact rank") {
    val exact = TextAnalysis.adaptiveQuality(spark, sf).collect()
    val approx = TextAnalysis.adaptiveQuality(spark, sf, exactQuantiles = false).collect()
    assert(exact.nonEmpty && exact.length == approx.length)

    val scores = Tables.documents(spark, sf)
      .select(col("lang"), round(
        length(regexp_replace(col("text"), "[^A-Za-z]", "")).cast("double") / length(col("text")),
        6).as("score"))
      .collect().map(r => r.getString(0) -> r.getDouble(1))
      .groupBy(_._1).map { case (l, xs) => l -> xs.map(_._2).sorted.toArray }

    val exThr = exact.map(r => r.getAs[String]("lang") -> r.getAs[Double]("thr")).toMap
    val apThr = approx.map(r => r.getAs[String]("lang") -> r.getAs[Double]("thr")).toMap
    exThr.keys.foreach { lang =>
      val (lo, hi) = bracket(scores(lang), 0.10)
      val (loR, hiR) = (math.rint(lo * 1e6) / 1e6, math.rint(hi * 1e6) / 1e6)
      assert(exThr(lang) >= loR && exThr(lang) <= hiR,
        s"$lang: exact thr ${exThr(lang)} outside [$loR, $hiR]")
      assert(apThr(lang) == loR || apThr(lang) == hiR,
        s"$lang: approx thr ${apThr(lang)} not an adjacent order statistic of [$loR, $hiR]")
    }

    // verdict agreement: the only docs allowed to flip are those whose
    // score sits strictly inside the (lo, hi) bracket
    val exKeep = exact.map(r => r.getAs[Long]("doc_id") -> r.getAs[Boolean]("keep")).toMap
    val flips = approx.count(r => exKeep(r.getAs[Long]("doc_id")) != r.getAs[Boolean]("keep"))
    assert(flips <= exact.length / 50, s"$flips/${exact.length} verdicts flipped")
  }

  test("corpusReport: approx p50/p90 adjacent to the exact interpolated rank per language") {
    val exact = Chunking.corpusReport(spark, sf).collect()
      .map(r => r.getAs[String]("lang") -> (r.getAs[Double]("p50_tokens"), r.getAs[Double]("p90_tokens"))).toMap
    val approx = Chunking.corpusReport(spark, sf, exactQuantiles = false).collect()
      .map(r => r.getAs[String]("lang") -> (r.getAs[Double]("p50_tokens"), r.getAs[Double]("p90_tokens"))).toMap
    assert(exact.keySet == approx.keySet && exact.nonEmpty)

    val nts = Tables.documents(spark, sf)
      .select(col("lang"), size(split(col("text"), " ")).cast("double").as("nt"))
      .collect().map(r => r.getString(0) -> r.getDouble(1))
      .groupBy(_._1).map { case (l, xs) => l -> xs.map(_._2).sorted.toArray }

    exact.keys.foreach { lang =>
      Seq(0.5 -> (exact(lang)._1, approx(lang)._1), 0.9 -> (exact(lang)._2, approx(lang)._2))
        .foreach { case (q, (ex, ap)) =>
          val (lo, hi) = bracket(nts(lang), q)
          assert(ex >= lo && ex <= hi, s"$lang p$q: exact $ex outside [$lo, $hi]")
          assert(ap == lo || ap == hi, s"$lang p$q: approx $ap not adjacent ([$lo, $hi])")
        }
    }
  }
}

package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sources.Tables

/** BM25 retrieval: exact formula parity vs an independent driver-side
  * computation, and the idf behavior that makes BM25 BM25. */
class RetrievalSpec extends SparkSpec {

  private lazy val docs: Seq[(Long, Array[String])] =
    Tables.documents(spark, sf).select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1).split(" "))).toSeq

  test("bm25 ≡ brute-force scoring over the collected corpus") {
    val terms = Retrieval.QueryTerms
    val n = docs.size.toDouble
    val avglen = docs.map(_._2.length).sum.toDouble / n
    val dfm = terms.map(t => t -> docs.count(_._2.contains(t)).toDouble).toMap
    val expected = docs.flatMap { case (id, toks) =>
      val s = terms.map { t =>
        val tf = toks.count(_ == t).toDouble
        if (tf == 0 || dfm(t) == 0) 0.0
        else {
          val idf = math.log(1.0 + (n - dfm(t) + 0.5) / (dfm(t) + 0.5))
          idf * tf * (Retrieval.K1 + 1.0) /
            (tf + Retrieval.K1 * (1.0 - Retrieval.B + Retrieval.B * toks.length / avglen))
        }
      }.sum
      if (s > 0) Some(id -> s) else None
    }.sortBy { case (id, s) => (-math.round(s * 1e4), id) }
      .take(Retrieval.TopN)
    val got = Retrieval.bm25(spark, sf).collect()
      .map(r => (r.getLong(0), r.getDouble(2)))
    assert(got.length == expected.length)
    got.zip(expected).foreach { case ((gid, gs), (eid, es)) =>
      assert(gid == eid, s"rank order: got $gid expected $eid")
      assert(math.abs(gs - math.round(es * 1e4) / 1e4) < 1e-9, s"doc $gid score")
    }
  }

  test("adaptive quality: every language keeps ~90% regardless of its score distribution") {
    val rows = TextAnalysis.adaptiveQuality(spark, sf).collect()
      .map(r => (r.getString(1), r.getBoolean(4)))
    val byLang = rows.groupBy(_._1).map { case (l, xs) =>
      l -> xs.count(_._2).toDouble / xs.size
    }
    assert(byLang.size >= 3)
    byLang.foreach { case (l, rate) =>
      // per-lang calibration: the keep rate tracks 1-q for EVERY language
      // (a fixed global threshold would instead crater whichever language
      // scores lowest); band is wide for small-n quantile discreteness
      assert(rate >= 0.85 && rate <= 0.97, s"lang $l keep rate $rate")
    }
    // and the thresholds genuinely differ across languages (they adapt)
    val thrs = TextAnalysis.adaptiveQuality(spark, sf).select("lang", "thr")
      .distinct().collect().map(_.getDouble(1)).toSet
    assert(thrs.size > 1, "all languages got one threshold — nothing adaptive")
  }

  test("bm25: the rare term dominates the ranking (idf discrimination)") {
    val rare = "dup"
    val topIds = Retrieval.bm25(spark, sf).limit(5).collect().map(_.getLong(0)).toSet
    val withRare = docs.filter(_._2.contains(rare)).map(_._1).toSet
    assert(withRare.nonEmpty, "fixture must contain the rare term")
    // every top-5 doc contains the rare term: two common terms cannot
    // outscore one rare-term hit at this idf gap
    assert(topIds.subsetOf(withRare),
      s"top-5 $topIds not dominated by rare-term docs")
  }
}

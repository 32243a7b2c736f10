package graft.operators

import graft.SparkSpec

/** The export-gate quality contracts must hold on the fixture: every
  * gate's booleans are true when Spark replays its own export (the
  * driver's DuckDB side re-derives the same integers/booleans from the
  * same bytes — cross-engine determinism of the exact references is
  * carried by their own long-green equality rows). */
class RecallGatesSpec extends SparkSpec {

  test("ann recall gates: recall@k clears the bound on all four families") {
    Seq("ann_lsh_topk", "ann_ivf_topk", "ann_ivfpq_topk", "ann_pca_topk").foreach { q =>
      val r = graft.SparkEntry.queries(q)(spark, sf).collect()
      assert(r.length == 1, s"$q: expected one summary row")
      assert(r(0).getAs[Long]("n_q") > 0 && r(0).getAs[Long]("exact_rows") > 0)
      assert(r(0).getAs[Boolean]("recall_ok"), s"$q recall below bound")
    }
  }

  test("bitext ANN gate: recall and extra-ratio bounds hold") {
    val r = graft.SparkEntry.queries("mine_bitext_ann")(spark, sf).collect()
    assert(r.length == 1 && r(0).getAs[Long]("exact_pairs") > 0)
    assert(r(0).getAs[Boolean]("recall_ok") && r(0).getAs[Boolean]("extra_ok"))
  }

  test("bucketed embedding gate: subset (precision 1) and recall hold") {
    val r = graft.SparkEntry.queries("dd_embed_cos_lsh")(spark, sf).collect()
    assert(r.length == 1 && r(0).getAs[Long]("exact_pairs") > 0)
    assert(r(0).getAs[Boolean]("subset_ok"), "bucketed path emitted a non-exact pair")
    assert(r(0).getAs[Boolean]("recall_ok"))
  }

  test("live recall clears every per-family floor with ≥3 flips of headroom") {
    // the mechanical-tightening contract (VERDICT r7 #2): recompute each
    // gate's measured recall from its own summary integers and assert it
    // sits ≥3 flip granularities (1/exact_rows — one tie-break moving
    // one row) ABOVE the floor, so the floor both catches a real index
    // regression (it is close to measured) and cannot flip on a tie.
    // Printed margins are the next round's tightening input.
    val annRecall = Seq("ann_lsh_topk", "ann_ivf_topk", "ann_ivfpq_topk",
        "ann_pca_topk").map { q =>
      val r = graft.SparkEntry.queries(q)(spark, sf).collect()(0)
      val exact = r.getAs[Long]("exact_rows")
      // hits back-derivable: recall_ok carries no magnitude, so re-join
      val ann = spark.read.parquet(RecallGates.exportPath(
        Map("ann_lsh_topk" -> "annlsh", "ann_ivf_topk" -> "annivf",
          "ann_ivfpq_topk" -> "annpq", "ann_pca_topk" -> "annpca")(q), sf))
      val ex = graft.operators.Similarity.bruteForceTopK(spark, sf)
        .select("q_id", "nbr_id")
      val hits = ann.join(ex, Seq("q_id", "nbr_id")).count()
      (q, hits.toDouble / exact, RecallGates.AnnRecallBounds(q), 1.0 / exact)
    }
    val bt = graft.SparkEntry.queries("mine_bitext_ann")(spark, sf).collect()(0)
    val btExact = bt.getAs[Long]("exact_pairs")
    val btAnn = spark.read.parquet(RecallGates.exportPath("bitextann", sf))
    val btEx = graft.operators.Mining.mineBitext(spark, sf).select("x_id", "y_id")
    val btHits = btAnn.join(btEx, Seq("x_id", "y_id")).count()
    val el = graft.SparkEntry.queries("dd_embed_cos_lsh")(spark, sf).collect()(0)
    val elExact = el.getAs[Long]("exact_pairs")
    val elLsh = spark.read.parquet(RecallGates.exportPath("embedlsh", sf))
    val elEx = graft.operators.Dedup.embeddingCosine(spark, sf).select("a_id", "b_id")
    val elHits = elLsh.join(elEx, Seq("a_id", "b_id")).count()
    val rows = annRecall ++ Seq(
      ("mine_bitext_ann", btHits.toDouble / btExact,
        RecallGates.BitextRecallBound, 1.0 / btExact),
      ("dd_embed_cos_lsh", elHits.toDouble / elExact,
        RecallGates.EmbedLshRecallBound, 1.0 / elExact))
    val thin = rows.flatMap { case (q, recall, bound, flip) =>
      info(f"$q%-18s recall=$recall%.4f floor=$bound%.2f margin=${recall - bound}%.4f flip=$flip%.4f")
      // perfect recall escapes the flip-count rule: with a tiny exact
      // set (7 pairs at sf0.001) one flip is 0.14 and no floor except 0
      // could carry 3 of them — recall 1.0 is already the maximum the
      // gate can observe
      if (recall >= 1.0 || recall >= bound + 3 * flip) None
      else Some(f"$q: recall $recall%.4f leaves <3 flips ($flip%.4f) over floor $bound")
    }
    assert(thin.isEmpty, thin.mkString("; "))
  }

  test("bloom gate: one-sided error law holds per document") {
    val rows = graft.SparkEntry.queries("tx_decontam_bloom")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Boolean]("grams_ok"), s"doc ${r.getLong(0)}: gram totals differ")
      assert(r.getAs[Boolean]("fn_free"), s"doc ${r.getLong(0)}: bloom false negative")
    }
  }
}

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

  test("bloom gate: one-sided error law holds per document") {
    val rows = graft.SparkEntry.queries("tx_decontam_bloom")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Boolean]("grams_ok"), s"doc ${r.getLong(0)}: gram totals differ")
      assert(r.getAs[Boolean]("fn_free"), s"doc ${r.getLong(0)}: bloom false negative")
    }
  }
}

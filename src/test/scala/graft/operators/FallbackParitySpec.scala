package graft.operators

import org.apache.spark.sql.{DataFrame, Row}

import graft.SparkSpec

/** End-to-end parity of the PAST-BUDGET degrade paths (r9 follow-up to
  * the JoinBacks boundary specs): the broadcast/shuffle branch is
  * boundary-tested, but the oracle SFs always take the broadcast side —
  * so the shuffle form (the path a memory-tight cluster actually runs)
  * was believed-correct, never executed. The r8/r9 lesson is exactly
  * that un-executed paths hide defects ("probe every row at least
  * once"); these cases run each consumer with the join-back budget
  * floored AND Spark's own auto-broadcast disabled — the true 100 TB
  * fallback physical shape — and assert the emitted rows are identical
  * to the broadcast form (ids exact; the one float column within 1e-6,
  * because the fallback legally reorders float partial sums and an
  * exact-equality gate would pin the ADDITION ORDER, not the result).
  *
  * Each case also asserts the branch actually FLIPPED (the mechanism
  * marker is absent from the fallback plan) so a future regression that
  * ignores the budget cannot pass by running broadcast twice. */
class FallbackParitySpec extends SparkSpec {

  /** Construct + inspect + collect under the fallback regime. */
  private def inFallback[A](body: => A): A = {
    spark.conf.set("graft.broadcast.budget", "1")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    try body
    finally {
      spark.conf.unset("graft.broadcast.budget")
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")
    }
  }

  /** Ids exact, the float column (index 2 in all three outputs) within
    * 1e-6 — each query ends in a total ORDER BY over unique id pairs, so
    * positional comparison is well-defined. */
  private def assertParity(broad: Array[Row], fb: Array[Row]): Unit = {
    assert(fb.length == broad.length,
      s"fallback emitted ${fb.length} rows, broadcast ${broad.length}")
    assert(broad.nonEmpty, "parity over an empty result proves nothing")
    broad.zip(fb).foreach { case (b, f) =>
      assert((0 until b.length).filter(_ != 2).forall(i => b.get(i) == f.get(i)),
        s"id mismatch: $b vs $f")
      assert(math.abs(b.getDouble(2) - f.getDouble(2)) < 1e-6,
        s"value drift past 1e-6: $b vs $f")
    }
  }

  private def analyzed(df: DataFrame): String = df.queryExecution.analyzed.toString

  test("dd_ppjoin: the per-shingle fan-out verify (past-budget) emits the identical exact pair set") {
    val broadDf = SimilarityJoin.ppjoinPairs(spark, sf)
    assert(analyzed(broadDf).contains("graft_sorted_intersect_count"),
      "default branch did not take the packed broadcast verify")
    val broad = broadDf.collect()
    inFallback {
      val fbDf = SimilarityJoin.ppjoinPairs(spark, sf)
      assert(!analyzed(fbDf).contains("graft_sorted_intersect_count"),
        "budget=1 did not flip ppjoin to the fan-out verify")
      assertParity(broad, fbDf.collect())
    }
  }

  test("dd_embed_cos_lsh: the shuffle join-backs (past-budget) emit the identical pair set") {
    val broadDf = Dedup.embeddingCosineBucketed(spark, sf)
    assert(analyzed(broadDf).contains("ResolvedHint"),
      "default branch did not broadcast the vector join-backs")
    val broad = broadDf.collect()
    inFallback {
      val fbDf = Dedup.embeddingCosineBucketed(spark, sf)
      assert(!analyzed(fbDf).contains("ResolvedHint"),
        "budget=1 did not flip the join-backs to the shuffle form")
      assertParity(broad, fbDf.collect())
    }
  }

  test("dd_minhash_lsh_fast: the fan-out verify (past-budget) emits the identical exact pair set") {
    // r9: the banded verify moved to the shared packed-broadcast /
    // fan-out branch (Dedup.verifyJaccard) — same contract as ppjoin
    val broadDf = graft.SparkEntry.queries("dd_minhash_lsh_fast")(spark, sf)
    assert(analyzed(broadDf).contains("graft_sorted_intersect_count"),
      "default branch did not take the packed broadcast verify")
    val broad = broadDf.collect()
    inFallback {
      val fbDf = graft.SparkEntry.queries("dd_minhash_lsh_fast")(spark, sf)
      assert(!analyzed(fbDf).contains("graft_sorted_intersect_count"),
        "budget=1 did not flip the banded verify to the fan-out form")
      assertParity(broad, fbDf.collect())
    }
  }

  test("dd_incremental: the fan-out verify (past-budget) emits the identical cross-batch pair set") {
    val broadDf = graft.SparkEntry.queries("dd_incremental")(spark, sf)
    assert(analyzed(broadDf).contains("graft_sorted_intersect_count"),
      "default branch did not take the packed broadcast verify")
    val broad = broadDf.collect()
    inFallback {
      val fbDf = graft.SparkEntry.queries("dd_incremental")(spark, sf)
      assert(!analyzed(fbDf).contains("graft_sorted_intersect_count"),
        "budget=1 did not flip the banded verify to the fan-out form")
      assertParity(broad, fbDf.collect())
    }
  }

  test("mine_bitext_ann: the shuffle join-backs (past-budget) mine the identical pairs") {
    val broadDf = Mining.mineBitextAnn(spark, sf)
    assert(analyzed(broadDf).contains("ResolvedHint"),
      "default branch did not broadcast the vector join-backs")
    // r10: in-budget the candidate pre-dedup is gone (TopKMarginAgg
    // dedups by id); past-budget it must come back to minimize the
    // shuffle join-backs' re-exchanged volume
    assert(!analyzed(broadDf).contains("Deduplicate"),
      "broadcast branch still pre-dedups the candidate stream")
    val broad = broadDf.collect()
    inFallback {
      val fbDf = Mining.mineBitextAnn(spark, sf)
      assert(!analyzed(fbDf).contains("ResolvedHint"),
        "budget=1 did not flip the join-backs to the shuffle form")
      assert(analyzed(fbDf).contains("Deduplicate"),
        "fallback branch dropped the candidate pre-dedup")
      assertParity(broad, fbDf.collect())
    }
  }

  test("q33_triangles: the distributed wedge pipeline (past-budget) matches the in-core count exactly") {
    // integer counts: the two branches must agree EXACTLY, row for row
    val memDf = Graphs.triangles(spark, sf)
    assert(analyzed(memDf).contains("graft_triangle_count"),
      "default branch did not take the in-core adjacency count")
    val mem = memDf.collect().map(r => (r.getLong(0), r.getLong(1)))
    inFallback {
      ArtifactCaches.clear()
      spark.catalog.clearCache()
      val fbDf = Graphs.triangles(spark, sf)
      assert(!analyzed(fbDf).contains("graft_triangle_count"),
        "budget=1 did not flip triangles to the distributed wedge pipeline")
      val fb = fbDf.collect().map(r => (r.getLong(0), r.getLong(1)))
      assert(mem.nonEmpty && (mem sameElements fb),
        s"branch outputs differ: in-core ${mem.length} rows vs distributed ${fb.length}")
    }
    ArtifactCaches.clear()
    spark.catalog.clearCache()
  }

  test("q32_pagerank: the distributed edge-join recurrence (past-budget) matches the in-memory branch") {
    // r10: in budget the 5-round recurrence is array math over the
    // pr-adj slot (graft_pagerank_iter); past it the per-round edge
    // join+agg runs. Same recurrence, different per-dst summation order
    // — ranks must agree far inside the 1e-9 export-gate tolerance.
    val memDf = Graphs.pagerankRaw(spark, sf)
    assert(analyzed(memDf).contains("graft_pagerank_iter"),
      "default branch did not take the in-memory recurrence")
    val mem = memDf.collect()
    inFallback {
      // the adj slot would satisfy the gate from cache; budget=1 must
      // re-derive the branch decision, not the artifact
      ArtifactCaches.clear()
      spark.catalog.clearCache()
      val fbDf = Graphs.pagerankRaw(spark, sf)
      assert(!analyzed(fbDf).contains("graft_pagerank_iter"),
        "budget=1 did not flip pagerank to the edge-join recurrence")
      val fb = fbDf.collect()
      assert(fb.length == mem.length && mem.nonEmpty)
      mem.zip(fb).foreach { case (a, b) =>
        assert(a.getLong(0) == b.getLong(0), s"node order drift: $a vs $b")
        assert(math.abs(a.getDouble(1) - b.getDouble(1)) < 1e-12,
          s"rank drift past 1e-12: $a vs $b")
      }
    }
    ArtifactCaches.clear()
    spark.catalog.clearCache()
  }
}

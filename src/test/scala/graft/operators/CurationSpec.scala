package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sources.Tables

/** Specs for the round-6 curation/retrieval batch: per-source caps,
  * lexicon toxicity, cluster canonicalization, hybrid RRF retrieval and
  * filtered ANN. The DuckDB oracle covers value parity; these cover the
  * invariants and the non-oracled branches (the post-filter index path,
  * policy laws, rank-arithmetic consistency). */
class CurationSpec extends SparkSpec {

  test("ds_domain_cap: keeps exactly min(cap, |source|) best-by-n_chars docs") {
    val cap = 5
    val rows = Curation.domainCap(spark, sf, cap = cap).collect()
    val bySrc = rows.groupBy(_.getAs[String]("source"))
    bySrc.foreach { case (src, rs) =>
      val kept = rs.filter(_.getAs[Boolean]("keep"))
      assert(kept.length == math.min(cap, rs.length), s"source $src")
      // the kept set IS the top of the (n_chars desc, doc_id) order
      val sorted = rs.sortBy(r => (-r.getAs[Long]("n_chars"), r.getAs[Long]("doc_id")))
      assert(sorted.take(kept.length).map(_.getAs[Long]("doc_id")).toSet ==
        kept.map(_.getAs[Long]("doc_id")).toSet, s"source $src keeps non-top docs")
    }
    // rn is a permutation 1..|source| within each source
    bySrc.foreach { case (src, rs) =>
      assert(rs.map(_.getAs[Int]("rn")).sorted.toSeq == (1 to rs.length),
        s"source $src rn not a permutation")
    }
  }

  test("tx_blocklist: hits match a driver-side recount on every fixture doc") {
    val lex = Curation.Blocklist.toSet
    val expected = Tables.documents(spark, sf).select("doc_id", "text").collect()
      .map { r =>
        val toks = r.getAs[String]("text").toLowerCase.split(" ", -1)
        r.getAs[Long]("doc_id") -> (toks.count(lex), toks.length)
      }.toMap
    var flaggedSome = false
    var zeroSome = false
    Curation.blocklistGate(spark, sf).collect().foreach { r =>
      val (hits, nt) = expected(r.getAs[Long]("doc_id"))
      assert(r.getAs[Long]("block_hits") == hits.toLong)
      val rate = r.getAs[Double]("block_rate")
      assert(math.abs(rate - math.round(hits.toDouble / nt * 1e4) / 1e4) < 1e-9)
      assert(r.getAs[Boolean]("flagged") == rate > Curation.BlockThreshold)
      flaggedSome ||= r.getAs[Boolean]("flagged")
      zeroSome ||= hits == 0
    }
    // the gate must split the fixture — an all-true or all-false verdict
    // column would make the oracle vacuous
    assert(flaggedSome && zeroSome)
  }

  test("dd_canonical: one survivor per cluster, and it is the longest member") {
    val canon = Dedup.canonical(spark, sf).collect()
    assert(canon.nonEmpty)
    canon.groupBy(_.getAs[Long]("cluster")).foreach { case (c, rs) =>
      val keeps = rs.filter(_.getAs[Boolean]("keep"))
      assert(keeps.length == 1, s"cluster $c has ${keeps.length} survivors")
      val best = rs.minBy(r => (-r.getAs[Long]("n_chars"), r.getAs[Long]("doc_id")))
      assert(keeps.head.getAs[Long]("doc_id") == best.getAs[Long]("doc_id"),
        s"cluster $c survivor is not the longest member")
      // every member agrees on who the canonical is
      assert(rs.map(_.getAs[Long]("canonical")).toSet ==
        Set(best.getAs[Long]("doc_id")))
    }
    // same partition of the corpus as dd_cluster (policy changes the
    // survivor, never the clustering)
    val clusters = Dedup.cluster(spark, sf).select("doc_id", "cluster").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    canon.foreach { r =>
      assert(clusters(r.getAs[Long]("doc_id")) == r.getAs[Long]("cluster"))
    }
  }

  test("tx_hybrid_rrf: fusion scores are exactly the rank arithmetic") {
    val rows = Retrieval.hybridRrf(spark, sf).collect()
    assert(rows.nonEmpty && rows.length <= Retrieval.FusedTopN)
    rows.foreach { r =>
      val rb = Option(r.getAs[Integer]("r_bm")).map(_.toInt)
      val rv = Option(r.getAs[Integer]("r_vec")).map(_.toInt)
      assert(rb.nonEmpty || rv.nonEmpty)
      val exp = rb.map(x => 1.0 / (Retrieval.RrfK + x)).getOrElse(0.0) +
        rv.map(x => 1.0 / (Retrieval.RrfK + x)).getOrElse(0.0)
      assert(math.abs(r.getAs[Double]("rrf") - math.round(exp * 1e6) / 1e6) < 1e-9)
      rb.foreach(x => assert(x >= 1 && x <= Retrieval.TopN))
      rv.foreach(x => assert(x >= 1 && x <= Retrieval.TopN))
    }
    // fused order is (rrf desc, id) — a doc in both lists outranks
    // single-list docs with comparable ranks by construction of the sum
    val rrfs = rows.map(_.getAs[Double]("rrf")).toSeq
    assert(rrfs == rrfs.sorted.reverse)
  }

  test("ann_filtered_top1 pre-filter branch equals the exact within-label scan") {
    import graft.plans.VectorOps.dot
    val raw = Tables.embeddings(spark, sf)
      .select(col("vec_id"), transform(col("embedding"), x => x.cast("double")).as("v"),
        col("label"))
    val q = raw.filter(col("vec_id") < Similarity.QuerySetSize)
      .select(col("vec_id").as("q_id"), col("v").as("vq"), col("label"))
    val w = org.apache.spark.sql.expressions.Window.partitionBy("q_id")
      .orderBy(round(col("cs"), 6).desc, col("nbr_id"))
    val exact = q.join(raw.select(col("vec_id").as("nbr_id"), col("v").as("vn"),
        col("label")), Seq("label"))
      .filter(col("q_id") =!= col("nbr_id"))
      .withColumn("cs", dot(col("vq"), col("vn")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") === 1)
      .select(col("q_id"), col("nbr_id"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val got = Similarity.filteredSearch(spark, sf).collect()
      .map(r => r.getAs[Long]("q_id") -> r.getAs[Long]("nbr_id")).toMap
    assert(got == exact)
  }

  test("dd_containment catches quote-inclusion that Jaccard structurally misses") {
    import spark.implicits._
    // construct the asymmetric case absent from the driver fixtures: a
    // short doc quoted whole inside a much longer one
    val small = (1 to 30).map(i => s"tok$i").mkString(" ")
    val large = small + " " + (100 to 300).map(i => s"pad$i").mkString(" ")
    val dir = "/tmp/graft_containment_fixture"
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(dir), true)
    Seq((1L, small, "en", "src0", small.length.toLong),
        (2L, large, "en", "src0", large.length.toLong))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    PersistSlots.clear()
    val cont = Dedup.containment(spark, dir).collect()
    assert(cont.map(r => (r.getLong(0), r.getLong(1))).toSeq == Seq((1L, 2L)))
    assert(cont.head.getAs[Double]("cont") == 1.0)
    // the symmetric measure misses it: j = |A|/|B| ≈ 0.12 < 0.5
    assert(Dedup.ngramJaccard(spark, dir).count() == 0)
    PersistSlots.clear() // don't leak the fixture's shingle slot to other suites
  }

  test("ann_filtered_top1 post-filter branch: label-correct with high recall") {
    val labels = Tables.embeddings(spark, sf).select("vec_id", "label").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    // selThreshold=0 forces the IVF post-filter branch regardless of the
    // fixture's selectivity
    val rows = Similarity.filteredSearch(spark, sf, selThreshold = 0.0).collect()
    rows.foreach { r =>
      assert(labels(r.getAs[Long]("nbr_id")) == r.getAs[Int]("label"))
      assert(labels(r.getAs[Long]("q_id")) == r.getAs[Int]("label"))
    }
    // deep probes cover 12/16 of cells: the filtered NN must be found for
    // most queries (index recall, not exactness — that's the other branch)
    val exact = Similarity.filteredSearch(spark, sf).collect()
      .map(r => r.getAs[Long]("q_id") -> r.getAs[Long]("nbr_id")).toMap
    val hit = rows.count(r => exact.get(r.getAs[Long]("q_id"))
      .contains(r.getAs[Long]("nbr_id")))
    assert(hit >= math.ceil(exact.size * 0.7).toInt,
      s"filtered-ANN recall $hit/${exact.size}")
  }
}

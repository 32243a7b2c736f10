package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sources.Tables

/** SemDeDup (cluster-then-prune semantic dedup), DSIR importance
  * resampling, and the incremental store-dedup path. The oracle gate
  * covers the deterministic math; these specs cover the parts an oracle
  * can't — the end-to-end fitted pipeline, method efficacy, and the
  * store save/load contract. */
class SemDedupDsirSpec extends SparkSpec {
  import spark.implicits._

  private def emb = Tables.embeddings(spark, sf)
    .select(col("vec_id"), transform(col("embedding"), x => x.cast("double")).as("v"))

  private def globalPairs(tau: Double) = {
    val a = emb.select(col("vec_id").as("a_id"), col("v").as("va"))
    val b = emb.select(col("vec_id").as("b_id"), col("v").as("vb"))
    a.crossJoin(b).filter(col("a_id") < col("b_id"))
      .withColumn("cs", graft.plans.VectorOps.dot(col("va"), col("vb")))
      .filter(col("cs") >= tau)
      .select("a_id", "b_id")
  }

  test("semdedup: end-to-end prune is sound — every dropped vector has a smaller-id cell-mate at cos >= tau") {
    val n = emb.count()
    val idx = Similarity.buildIvfIndex(spark, sf, nClusters = SemDedup.semClusters(n))
    val cells = idx.assignments.select("vec_id", "cell")
    val out = SemDedup.pruneCells(spark, sf, cells).cache()
    assert(out.count() == n)
    // recompute within-cell tau-pairs independently and check the flag
    val v = cells.join(emb, Seq("vec_id"))
    val pairs = v.select(col("vec_id").as("a_id"), col("cell"), col("v").as("va"))
      .join(v.select(col("vec_id").as("b_id"), col("cell"), col("v").as("vb")), Seq("cell"))
      .filter(col("a_id") < col("b_id"))
      .filter(graft.plans.VectorOps.dot(col("va"), col("vb")) >= SemDedup.Tau)
    val dominated = pairs.select(col("b_id")).distinct().as[Long].collect().toSet
    val dropped = out.filter(!col("keep")).select("vec_id").as[Long].collect().toSet
    assert(dropped == dominated, "keep flag must be exactly non-domination")
    // and survivors cover the corpus: every dropped vec's smaller-id
    // witness is present in the output (trivially — output is total)
    assert(out.filter(col("keep")).count() == n - dropped.size)
  }

  test("semdedup: constant-occupancy clustering catches most global near-dup pairs") {
    val n = emb.count()
    val idx = Similarity.buildIvfIndex(spark, sf, nClusters = SemDedup.semClusters(n))
    val cells = idx.assignments.select("vec_id", "cell")
    val within = globalPairs(SemDedup.Tau)
      .join(cells.select(col("vec_id").as("a_id"), col("cell").as("ca")), Seq("a_id"))
      .join(cells.select(col("vec_id").as("b_id"), col("cell").as("cb")), Seq("b_id"))
      .filter(col("ca") === col("cb")).count()
    val total = globalPairs(SemDedup.Tau).count()
    assert(total > 0, "fixture must contain near-dup pairs at tau")
    // SemDeDup's premise: semantic duplicates co-cluster. On the small
    // fixture the KMeans cells are coarse (8 cells) so recall is high;
    // the paper's knife is cluster count vs recall — documented, not
    // asserted tighter than the premise needs.
    assert(within.toDouble / total >= 0.5,
      s"within-cell pair recall $within/$total below 0.5")
  }

  test("semdedup: cluster count scales to constant cell occupancy") {
    assert(SemDedup.semClusters(500) == 8 || SemDedup.semClusters(500) == 2)
    assert(SemDedup.semClusters(1000000) == math.ceil(1000000.0 / SemDedup.CellTarget).toInt)
    // occupancy stays ~CellTarget as N grows 1000x
    val occ1 = 1e6 / SemDedup.semClusters(1000000L)
    val occ2 = 1e9 / SemDedup.semClusters(1000000000L)
    assert(math.abs(occ1 - occ2) < 1.0)
  }

  test("dsir: target-domain documents score higher than the rest") {
    val w = Dsir.weights(spark, sf)
      .join(Tables.documents(spark, sf).select("doc_id", "lang"), Seq("doc_id"))
      .cache()
    val Array(enAvg) = w.filter(col("lang") === "en").agg(avg("w")).as[Double].collect()
    val Array(restAvg) = w.filter(col("lang") =!= "en").agg(avg("w")).as[Double].collect()
    assert(enAvg > restAvg,
      s"importance weights must rank the target domain up (en $enAvg vs rest $restAvg)")
    // and the top selection is dominated by the target domain
    val top = Dsir.select(spark, sf)
      .join(Tables.documents(spark, sf).select("doc_id", "lang"), Seq("doc_id"))
    val enShare = top.filter(col("lang") === "en").count().toDouble / top.count()
    val enBase = w.filter(col("lang") === "en").count().toDouble / w.count()
    assert(enShare > enBase, s"top-k en share $enShare must beat base rate $enBase")
  }

  test("dsir: per-doc gram count is unigrams + bigrams and selection is a prefix of the ranking") {
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"), size(split(col("text"), " ")).as("nt"))
    val w = Dsir.weights(spark, sf).join(docs, Seq("doc_id"))
    assert(w.filter(col("n_grams") =!= (col("nt") * 2 - 1)).count() == 0,
      "every doc contributes nt unigrams + (nt-1) bigrams")
    val sel = Dsir.select(spark, sf).collect()
    assert(sel.length == math.min(Dsir.TopK, w.count()).toInt)
    val ws = sel.map(_.getAs[Double]("w"))
    assert(ws.zip(ws.tail).forall { case (a, b) => a >= b }, "selection sorted by weight desc")
  }

  test("dsir: per-source KL is non-negative-ish and flags an injected drifted source") {
    // real sources come from one generator — their drift must be small
    val real = Dsir.sourceKl(spark, sf).collect()
      .map(r => r.getString(0) -> r.getDouble(2)).toMap
    assert(real.nonEmpty)
    real.foreach { case (s, kl) =>
      assert(kl > -1e-6 && kl < 0.5, s"source $s kl $kl out of sane band")
    }
    // synthetic drift: the corpus is DOMINATED by the uniform source (so
    // q ≈ uniform) and Z dumps every gram into one bucket — Z's KL must
    // dwarf A's (and every real source's). A 50/50 mix would put BOTH
    // sources equidistant from the blended q and detect nothing.
    val a = (0 until 4096).flatMap(i => Seq.fill(20)(("srcA", f"$i%03x")))
    val z = Seq.fill(512)(("srcZ", "0aa"))
    val gb = spark.createDataFrame(a ++ z).toDF("source", "b")
    val drift = Dsir.sourceKlOf(gb).collect()
      .map(r => r.getString(0) -> r.getDouble(2)).toMap
    assert(drift("srcZ") > drift("srcA") * 10,
      s"concentrated source not flagged: $drift")
    assert(drift("srcZ") > real.values.max,
      "injected drift must exceed every real source")
  }

  test("incremental: new-vs-store pairs equal the cross-batch slice of the full pair set") {
    val full = Dedup.minhashLshFast(spark, sf)
      .select(col("a_id"), col("b_id"), col("j")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    def isNew(id: Long): Boolean = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes("UTF-8"))
      "%02x".format(d(0)).charAt(0) == '0'
    }
    val expect = full.flatMap { case (a, b, j) =>
      (isNew(a), isNew(b)) match {
        case (true, false) => Some((a, b, j))
        case (false, true) => Some((b, a, j))
        case _             => None
      }
    }.toSet
    val got = Dedup.incrementalPairs(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(got == expect, s"incremental pairs $got != cross-batch slice $expect")
  }

  test("incremental: band store save/load roundtrip yields identical pairs") {
    val dir = java.nio.file.Files.createTempDirectory("bandstore").toString
    Dedup.saveBandStore(Dedup.buildBandStore(spark, sf), dir)
    // crash-safe flip: a second save must land cleanly over the live
    // store, and an interrupted flip (only _staged present) must recover
    Dedup.saveBandStore(Dedup.buildBandStore(spark, sf), dir)
    val fsS = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fsS.rename(new org.apache.hadoop.fs.Path(dir),
      new org.apache.hadoop.fs.Path(s"${dir}_staged"))
    assert(Dedup.loadBandStore(spark, dir).count() > 0,
      "load did not recover from an interrupted band-store flip")
    val viaDisk = Dedup.incrementalPairs(spark, sf,
      Some(Dedup.loadBandStore(spark, dir))).collect().toSeq
    val inMem = Dedup.incrementalPairs(spark, sf).collect().toSeq
    assert(viaDisk == inMem)
    // the store is id+hash only — the artifact a 100 TB nightly job ships
    val cols = Dedup.loadBandStore(spark, dir).columns.toSet
    assert(cols == Set("doc_id", "band_idx", "band_hash"))
  }
}

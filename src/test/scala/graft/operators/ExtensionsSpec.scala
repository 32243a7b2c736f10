package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Specs for the extension operators whose semantics the DuckDB oracle
  * can't express: LSH recall, langid accuracy on curated samples,
  * multimodal stub decode, approx distinct. */
class ExtensionsSpec extends SparkSpec {

  test("ann: LSH top-k achieves usable recall vs brute force") {
    val exact = Similarity.bruteForceTopK(spark, sf)
      .select("q_id", "nbr_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val approx = Similarity.lshTopK(spark, sf)
      .select("q_id", "nbr_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (exact & approx).size.toDouble / exact.size
    assert(exact.nonEmpty)
    // sign-LSH with Similarity.LshTables tables x LshBits bits (8 x 6) on
    // 64-dim unit vectors, multi-probe over 1-bit-flip neighbor buckets
    // (measured 0.90 at sf0.1 by AnnEval; single-probe was 0.38) —
    // demand a solid floor with margin for corpus-draw variance
    assert(recall >= 0.6, s"recall=$recall")
  }

  test("ann: IVF index save/load roundtrip yields identical top-k") {
    val dir = java.nio.file.Files.createTempDirectory("ivf").toString
    val idx = Similarity.buildIvfIndex(spark, sf)
    Similarity.saveIvfIndex(idx, dir)
    val loaded = Similarity.loadIvfIndex(spark, dir)
    assert(loaded.centroids.length == idx.centroids.length)
    assert(loaded.centroids.zip(idx.centroids).forall { case (a, b) => a.sameElements(b) })
    val direct = Similarity.ivfTopK(spark, sf, index = Some(idx)).collect().toSeq
    val viaDisk = Similarity.ivfTopK(spark, sf, index = Some(loaded)).collect().toSeq
    assert(direct == viaDisk)
    assert(direct.nonEmpty)
  }

  test("ann: LSH index save/load roundtrip yields identical top-k") {
    val dir = java.nio.file.Files.createTempDirectory("lshidx").toString
    val idx = Similarity.buildLshIndex(spark, sf)
    Similarity.saveLshIndex(idx, dir)
    val loaded = Similarity.loadLshIndex(spark, dir)
    assert(loaded.nBits == idx.nBits)
    val direct = Similarity.lshTopK(spark, sf, index = Some(idx)).collect().toSeq
    val viaDisk = Similarity.lshTopK(spark, sf, index = Some(loaded)).collect().toSeq
    assert(direct.nonEmpty)
    assert(direct == viaDisk)
  }

  test("ann: every LSH hit is a true cosine score (no fabricated scores)") {
    val approx = Similarity.lshTopK(spark, sf).collect()
    assert(approx.nonEmpty)
    approx.foreach { r => assert(r.getDouble(3) <= 1.0001 && r.getDouble(3) >= -1.0001) }
  }

  test("ann: IVF top-k achieves usable recall vs brute force") {
    val exact = Similarity.bruteForceTopK(spark, sf)
      .select("q_id", "nbr_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val ivf = Similarity.ivfTopK(spark, sf)
      .select("q_id", "nbr_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (exact & ivf).size.toDouble / exact.size
    info(s"ivf recall=$recall")
    // measured 0.867 with the sqrt-N defaults — a loose floor would let a
    // probe/default regression pass silently
    assert(recall >= 0.6, s"recall=$recall")
  }

  test("ann: two-level IVF deep-probe top-1 equals the exact nearest neighbor") {
    val exact = Similarity.bruteForceTopK(spark, sf).filter(col("rank") === 1)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val h = Similarity.ivf2TopK(spark, sf, deepProbes = true).filter(col("rank") === 1)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact.nonEmpty)
    assert(h == exact, s"missed=${exact -- h} extra=${h -- exact}")
  }

  test("ann: two-level IVF top-k achieves usable recall vs brute force") {
    val exact = Similarity.bruteForceTopK(spark, sf)
      .select("q_id", "nbr_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val h = Similarity.ivf2TopK(spark, sf)
      .select("q_id", "nbr_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (exact & h).size.toDouble / exact.size
    info(s"ivf2 recall=$recall")
    // measured 0.8 — slightly under flat IVF's 0.867 (a near-boundary
    // cell whose super is not probed), the documented hierarchy tradeoff
    assert(recall >= 0.6, s"recall=$recall")
  }

  test("ann: hierarchy assigns every cell to its nearest super-centroid") {
    val ivf = Similarity.buildIvfIndex(spark, sf)
    val h = Similarity.buildHierarchy(ivf.centroids)
    assert(h.superCentroids.length >= 2)
    assert(h.cellSuper.length == ivf.centroids.length)
    // Lloyd's fixed point: each cell's recorded super IS its nearest
    ivf.centroids.zipWithIndex.foreach { case (c, i) =>
      val d = h.superCentroids.map(s =>
        s.zip(c).map { case (a, b) => (a - b) * (a - b) }.sum)
      assert(d(h.cellSuper(i)) == d.min)
    }
  }

  test("ann: IVF-PQ deep-probe top-1 equals the exact nearest neighbor") {
    // the equality contract behind the ann_ivfpq_top1 oracle: deep probes
    // + doubled re-rank window must recover the true NN from 8-byte codes
    val exact = Similarity.bruteForceTopK(spark, sf).filter(col("rank") === 1)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val pq = Similarity.ivfPqTopK(spark, sf, deepProbes = true).filter(col("rank") === 1)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact.nonEmpty)
    assert(pq == exact, s"missed=${exact -- pq} extra=${pq -- exact}")
  }

  test("ann: IVF-PQ top-k achieves usable recall vs brute force") {
    val exact = Similarity.bruteForceTopK(spark, sf)
      .select("q_id", "nbr_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val pq = Similarity.ivfPqTopK(spark, sf)
      .select("q_id", "nbr_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (exact & pq).size.toDouble / exact.size
    info(s"ivf-pq recall=$recall")
    // measured 0.867 here — identical to plain ivfTopK's recall (the
    // 192-row re-rank window fully absorbs quantization noise at this
    // corpus size, so any loss below plain IVF is a PQ regression)
    assert(recall >= 0.6, s"recall=$recall")
  }

  test("ann: PQ index save/load roundtrip yields identical top-k") {
    val dir = java.nio.file.Files.createTempDirectory("pq").toString
    val ivf = Similarity.buildIvfIndex(spark, sf)
    val pq = Similarity.buildPqIndex(spark, sf, ivf)
    Similarity.savePqIndex(pq, dir)
    val loaded = Similarity.loadPqIndex(spark, dir)
    assert(loaded.codebook.dsub == pq.codebook.dsub)
    assert(loaded.codebook.centroids.length == pq.codebook.centroids.length)
    loaded.codebook.centroids.zip(pq.codebook.centroids).foreach { case (a, b) =>
      assert(a.length == b.length)
      a.zip(b).foreach { case (ca, cb) => assert(ca.sameElements(cb)) }
    }
    val direct = Similarity.ivfPqTopK(spark, sf, index = Some(ivf), pq = Some(pq))
      .collect().toSeq
    val viaDisk = Similarity.ivfPqTopK(spark, sf, index = Some(ivf), pq = Some(loaded))
      .collect().toSeq
    assert(direct.nonEmpty)
    assert(direct == viaDisk)
  }

  test("ann: IVFADC (residual PQ) deep-probe top-1 equals the exact nearest neighbor") {
    // the equality contract behind the ann_ivfadc_top1 oracle
    val exact = Similarity.bruteForceTopK(spark, sf).filter(col("rank") === 1)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val adc = Similarity.ivfPqTopK(spark, sf, deepProbes = true, residual = true)
      .filter(col("rank") === 1)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact.nonEmpty)
    assert(adc == exact, s"missed=${exact -- adc} extra=${adc -- exact}")
  }

  test("ann: residual encoding cuts PQ quantization error vs raw encoding") {
    // IVFADC's reason to exist: residuals v - centroid[cell] have a
    // fraction of the raw norm, so the same 8-byte budget quantizes a
    // smaller ball — reconstruction MSE must drop
    val ivf = Similarity.buildIvfIndex(spark, sf)
    val raw = Similarity.buildPqIndex(spark, sf, ivf)
    val res = Similarity.buildPqIndex(spark, sf, ivf, residual = true)
    assert(!raw.codebook.residual && res.codebook.residual)
    val vecs = ivf.assignments.select("vec_id", "v", "cell").collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toArray, r.getInt(2))).toSeq
    def codesOf(pq: Similarity.PqIndex) = pq.codes.select("vec_id", "code").collect()
      .map(r => r.getLong(0) -> r.getAs[Array[Byte]](1)).toMap
    val rawCodes = codesOf(raw); val resCodes = codesOf(res)
    def decode(cb: Similarity.PqCodebook, code: Array[Byte]): Array[Double] =
      code.zipWithIndex.flatMap { case (c, m) => cb.centroids(m)(c & 0xFF) }
    def mse(rec: Seq[(Array[Double], Array[Double])]): Double =
      rec.map { case (a, b) => a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum }
        .sum / rec.size
    val rawMse = mse(vecs.map { case (id, v, _) => (v, decode(raw.codebook, rawCodes(id))) })
    val resMse = mse(vecs.map { case (id, v, cell) =>
      val base = ivf.centroids(cell)
      val r = decode(res.codebook, resCodes(id))
      (v, base.indices.map(j => base(j) + r(j)).toArray)
    })
    info(s"raw MSE=$rawMse residual MSE=$resMse")
    assert(resMse < rawMse, s"residual MSE $resMse !< raw MSE $rawMse")
  }

  test("ann: OPQ deep-probe top-1 equals the exact nearest neighbor") {
    // the equality contract behind the ann_opq_top1 oracle: rotating the
    // space (codes quantize Rx, LUTs built from Rq) must lose nothing
    val exact = Similarity.bruteForceTopK(spark, sf).filter(col("rank") === 1)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val opq = Similarity.ivfPqTopK(spark, sf, deepProbes = true, opq = true)
      .filter(col("rank") === 1)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact.nonEmpty)
    assert(opq == exact, s"missed=${exact -- opq} extra=${opq -- exact}")
  }

  test("ann: OPQ rotation is orthonormal, preserves dot products, and balances variance") {
    val ivf = Similarity.buildIvfIndex(spark, sf)
    val pq = Similarity.buildPqIndex(spark, sf, ivf, opq = true)
    val r = pq.codebook.rotation.get
    val d = r.length
    // R Rᵀ = I (rows orthonormal)
    for (i <- 0 until d; j <- i until d) {
      val dot = (0 until d).map(k => r(i)(k) * r(j)(k)).sum
      assert(math.abs(dot - (if (i == j) 1.0 else 0.0)) < 1e-8, s"RRt($i,$j)=$dot")
    }
    // eigenvalue allocation balances variance across subspaces: feed a
    // strongly anisotropic diagonal moment matrix and check the spread of
    // per-subspace variance sums collapses vs the natural-order split
    val evals = Array.tabulate(d)(i => math.pow(2.0, -i / 4.0))
    val sm = Array.tabulate(d, d)((i, j) => if (i == j) evals(i) else 0.0)
    val rot = Similarity.opqRotation(sm, 8)
    val dsub = d / 8
    def subVar(assign: Int => Double): Seq[Double] =
      (0 until 8).map(m => (0 until dsub).map(s => assign(m * dsub + s)).sum)
    // rotated: each row of rot is ±e_i for some i (diagonal input), so the
    // variance landing in slot k is evals(argmax |rot(k)|)
    val allocated = subVar(k => evals(rot(k).indexWhere(x => math.abs(x) > 0.5)))
    val natural = subVar(k => evals(k))
    def spread(v: Seq[Double]) = v.max / v.min
    info(s"variance spread natural=${spread(natural)} allocated=${spread(allocated)}")
    assert(spread(allocated) < spread(natural) / 4,
      s"allocation did not balance: ${spread(allocated)} vs ${spread(natural)}")
  }

  test("ann: OPQ index save/load roundtrip preserves the rotation and top-k") {
    val dir = java.nio.file.Files.createTempDirectory("opq").toString
    val ivf = Similarity.buildIvfIndex(spark, sf)
    val pq = Similarity.buildPqIndex(spark, sf, ivf, opq = true)
    Similarity.savePqIndex(pq, dir)
    val loaded = Similarity.loadPqIndex(spark, dir)
    assert(loaded.codebook.rotation.isDefined)
    loaded.codebook.rotation.get.zip(pq.codebook.rotation.get).foreach {
      case (a, b) => assert(a.sameElements(b))
    }
    val direct = Similarity.ivfPqTopK(spark, sf, index = Some(ivf), pq = Some(pq))
      .collect().toSeq
    val viaDisk = Similarity.ivfPqTopK(spark, sf, index = Some(ivf), pq = Some(loaded))
      .collect().toSeq
    assert(direct.nonEmpty)
    assert(direct == viaDisk)
  }

  test("eig: Jacobi decomposition reconstructs a random symmetric matrix") {
    val rnd = new scala.util.Random(7)
    val d = 16
    val a = Array.ofDim[Double](d, d)
    for (i <- 0 until d; j <- i until d) {
      val x = rnd.nextGaussian(); a(i)(j) = x; a(j)(i) = x
    }
    val (evals, evecs) = graft.functions.JacobiEig.decompose(a)
    // A v = λ v for every pair
    for (k <- 0 until d) {
      val v = evecs(k)
      val av = Array.tabulate(d)(i => (0 until d).map(j => a(i)(j) * v(j)).sum)
      for (i <- 0 until d)
        assert(math.abs(av(i) - evals(k) * v(i)) < 1e-8, s"eigpair $k row $i")
    }
    // eigenvectors orthonormal
    for (p <- 0 until d; q <- p until d) {
      val dot = (0 until d).map(i => evecs(p)(i) * evecs(q)(i)).sum
      assert(math.abs(dot - (if (p == q) 1.0 else 0.0)) < 1e-8)
    }
    // trace preserved
    val traceA = (0 until d).map(i => a(i)(i)).sum
    assert(math.abs(evals.sum - traceA) < 1e-8)
  }

  test("ann: residual PQ index save/load roundtrip preserves the flag and top-k") {
    val dir = java.nio.file.Files.createTempDirectory("ivfadc").toString
    val ivf = Similarity.buildIvfIndex(spark, sf)
    val pq = Similarity.buildPqIndex(spark, sf, ivf, residual = true)
    Similarity.savePqIndex(pq, dir)
    val loaded = Similarity.loadPqIndex(spark, dir)
    assert(loaded.codebook.residual)
    val direct = Similarity.ivfPqTopK(spark, sf, index = Some(ivf), pq = Some(pq))
      .collect().toSeq
    val viaDisk = Similarity.ivfPqTopK(spark, sf, index = Some(ivf), pq = Some(loaded))
      .collect().toSeq
    assert(direct.nonEmpty)
    assert(direct == viaDisk)
  }

  test("ann: append + compact keeps the code set identical and one file per cell") {
    val dir = java.nio.file.Files.createTempDirectory("pqcompact").toString
    val ivf = Similarity.buildIvfIndex(spark, sf)
    val pq = Similarity.buildPqIndex(spark, sf, ivf, residual = true)
    Similarity.savePqIndex(pq, dir)
    // fresh ids so appended rows are distinguishable from the base corpus
    val newVecs = graft.sources.Tables.embeddings(spark, sf)
      .filter(col("vec_id") < 50)
      .select((col("vec_id") + 1000000L).as("vec_id"), col("embedding"))
    val appended = Similarity.encodeForAppend(spark, newVecs, ivf, pq)
    Similarity.appendToPqIndex(dir, appended)
    def rowSet(df: org.apache.spark.sql.DataFrame) =
      df.select("vec_id", "cell", "code").collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getAs[Array[Byte]](2).toSeq)).toSet
    val expected = rowSet(pq.codes) ++ rowSet(appended)
    val afterAppend = rowSet(Similarity.loadPqIndex(spark, dir).codes)
    assert(afterAppend == expected, "append lost or altered rows")
    // retried append (r9 review find): must be a no-op, or the cell join
    // serves the same neighbor at two ranks
    Similarity.appendToPqIndex(dir, appended)
    assert(rowSet(Similarity.loadPqIndex(spark, dir).codes) == expected,
      "retried PQ append duplicated code rows")
    // a reader loaded BEFORE the compaction must stay readable after it
    // (its version dir gets one compaction cycle of grace)
    val preCompact = Similarity.loadPqIndex(spark, dir)
    Similarity.compactPqIndex(spark, dir)
    val afterCompact = Similarity.loadPqIndex(spark, dir)
    assert(rowSet(afterCompact.codes) == expected, "compaction lost or altered rows")
    assert(rowSet(preCompact.codes) == expected, "pre-compaction reader broke mid-swap")
    // the manifest points new loads at the compacted version dir
    val live = Similarity.pqCodesLocation(spark, dir)
    assert(live.endsWith("codes_v1"), s"manifest should commit codes_v1, got $live")
    assert(new java.io.File(s"$dir/codes_v0").exists(), "previous version must survive one cycle")
    // one data file per cell directory after compaction
    val cellDirs = new java.io.File(live).listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("cell="))
    assert(cellDirs.nonEmpty)
    cellDirs.foreach { d =>
      val files = d.listFiles().filter(_.getName.endsWith(".parquet"))
      assert(files.length == 1, s"${d.getName} has ${files.length} files after compaction")
    }
    // second compaction retires the v0 grace copy
    Similarity.compactPqIndex(spark, dir)
    assert(!new java.io.File(s"$dir/codes_v0").exists(), "older versions must be retired")
    assert(rowSet(Similarity.loadPqIndex(spark, dir).codes) == expected)
    // crash recovery: a torn/missing manifest resolves to the highest
    // complete version dir
    assert(new java.io.File(s"$dir/codes_manifest").delete())
    assert(Similarity.pqCodesLocation(spark, dir).endsWith("codes_v2"))
    assert(rowSet(Similarity.loadPqIndex(spark, dir).codes) == expected)
  }

  test("ann: IVF and LSH artifacts append without refit and compact atomically") {
    val emb = graft.sources.Tables.embeddings(spark, sf)
    // --- IVF: frozen-centroid assignment parity (append ≡ rebuild
    // against the same quantizer), then append + compact lifecycle
    val ivfDir = java.nio.file.Files.createTempDirectory("ivfmaint").toString
    val ivf = Similarity.buildIvfIndex(spark, sf)
    Similarity.saveIvfIndex(ivf, ivfDir)
    val own = ivf.assignments.select("vec_id", "cell").collect()
      .map(r => (r.getLong(0), r.getInt(1))).toSet
    val reassigned = Similarity.assignForAppend(spark, emb, ivf)
      .select("vec_id", "cell").collect().map(r => (r.getLong(0), r.getInt(1))).toSet
    assert(reassigned == own, "frozen-centroid assignment must equal the fitted assignments")
    val newVecs = emb.filter(col("vec_id") < 40)
      .select((col("vec_id") + 2000000L).as("vec_id"), col("embedding"))
    val newAssigned = Similarity.assignForAppend(spark, newVecs, ivf)
    val newRows = newAssigned.select("vec_id", "cell").collect()
      .map(r => (r.getLong(0), r.getInt(1))).toSet
    Similarity.appendToIvfIndex(ivfDir, newAssigned)
    def ivfRows() = Similarity.loadIvfIndex(spark, ivfDir).assignments
      .select("vec_id", "cell").collect().map(r => (r.getLong(0), r.getInt(1))).toSet
    assert(ivfRows() == own ++ newRows, "IVF append lost or altered rows")
    // retried append must be a no-op (r9 review find)
    Similarity.appendToIvfIndex(ivfDir, newAssigned)
    assert(ivfRows() == own ++ newRows, "retried IVF append duplicated rows")
    Similarity.compactIvfIndex(spark, ivfDir)
    assert(ivfRows() == own ++ newRows, "IVF compaction lost or altered rows")
    assert(Similarity.dataLocation(spark, ivfDir, "assignments").endsWith("assignments_v1"))
    // --- LSH: deterministic-hyperplane parity, then append + compact
    val lshDir = java.nio.file.Files.createTempDirectory("lshmaint").toString
    val lsh = Similarity.buildLshIndex(spark, sf)
    Similarity.saveLshIndex(lsh, lshDir)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select("vec_id", "tbl", "bucket").collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getString(2))).toSet
    val ownB = rows(lsh.buckets)
    assert(rows(Similarity.bucketsForAppend(spark, emb, lsh)) == ownB,
      "re-hashing the corpus at the pinned width must reproduce the index exactly")
    val newBuckets = Similarity.bucketsForAppend(spark, newVecs, lsh)
    val newB = rows(newBuckets)
    Similarity.appendToLshIndex(lshDir, newBuckets)
    def lshRows() = rows(Similarity.loadLshIndex(spark, lshDir).buckets)
    assert(lshRows() == ownB ++ newB, "LSH append lost or altered rows")
    // the corpus count must advance by exactly the appended distinct ids —
    // the JoinBacks sizing input rides this meta field
    val nAfter = Similarity.loadLshIndex(spark, lshDir).nVectors
    assert(nAfter == lsh.nVectors + newVecs.count(),
      s"n_vectors $nAfter != ${lsh.nVectors} + appended batch")
    // RETRIED append (r9 review find): re-appending the same batch must be
    // a no-op — no duplicate bucket rows, no n_vectors drift
    Similarity.appendToLshIndex(lshDir, newBuckets)
    assert(lshRows() == ownB ++ newB, "retried append duplicated bucket rows")
    assert(Similarity.loadLshIndex(spark, lshDir).nVectors == nAfter,
      "retried append drifted n_vectors")
    Similarity.compactLshIndex(spark, lshDir)
    assert(lshRows() == ownB ++ newB, "LSH compaction lost or altered rows")
    assert(Similarity.dataLocation(spark, lshDir, "buckets").endsWith("buckets_v1"))
    // interrupted meta flip: only meta_next present → load completes the
    // rename instead of bricking the artifact
    val fsp = org.apache.hadoop.fs.FileSystem.getLocal(spark.sparkContext.hadoopConfiguration)
    val metaP = new org.apache.hadoop.fs.Path(s"$lshDir/meta")
    val nextP = new org.apache.hadoop.fs.Path(s"$lshDir/meta_next")
    fsp.rename(metaP, nextP) // simulate a crash between delete and rename
    assert(Similarity.loadLshIndex(spark, lshDir).nVectors == nAfter,
      "load did not recover from an interrupted meta flip")
    assert(fsp.exists(metaP) && !fsp.exists(nextP), "recovery left the flip incomplete")
  }

  test("dedup clustering equals union-find over the pair graph, one survivor each") {
    val pairs = Dedup.ngramJaccard(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val rows = Dedup.cluster(spark, sf).collect()
    val cl = rows.map(r => r.getLong(0) -> r.getLong(1)).toMap
    // independent reference: union-find to the min root
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElse(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    pairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    assert(cl.keySet == pairs.flatMap(p => Seq(p._1, p._2)).toSet)
    rows.foreach(r => assert(find(r.getLong(0)) == r.getLong(1),
      s"doc ${r.getLong(0)}: cluster ${r.getLong(1)} != union-find ${find(r.getLong(0))}"))
    // label = min member; exactly one survivor; size column consistent
    rows.groupBy(_.getLong(1)).foreach { case (label, members) =>
      assert(members.map(_.getLong(0)).min == label)
      assert(members.count(_.getBoolean(3)) == 1)
      assert(members.forall(_.getLong(2) == members.length))
    }
  }

  test("label propagation converges on a chain and FAILS LOUDLY past the round cap") {
    import spark.implicits._
    // a 30-node path: worst case for Hash-Min (min label travels one hop
    // per round), so convergence needs ~29 rounds — well past any small cap
    val chain = (0L until 29L).map(i => (i, i + 1)).toDF("a_id", "b_id")
    val labels = Dedup.propagateLabels(chain).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(labels.size == 30 && labels.values.forall(_ == 0L),
      s"chain did not collapse to one component: ${labels.values.toSet}")
    // the silent-exit bug this guards: a capped run returns labels that
    // LOOK valid (every doc labeled) but split the chain — it must throw
    val ex = intercept[IllegalStateException] {
      Dedup.propagateLabels(chain, maxRounds = 5).collect()
    }
    assert(ex.getMessage.contains("did not converge"),
      s"wrong failure mode: ${ex.getMessage}")
  }

  test("text: tfidf ranks distinctive terms; contamination finds planted overlap") {
    import spark.implicits._
    val docs = Seq(
      (0L, "alpha beta gamma delta epsilon zeta eta theta", "en", 46L), // test; copied in train
      (1L, "alpha beta gamma delta epsilon zeta eta theta", "en", 46L), // train copy
      (2L, "unique words only here nothing shared at all", "en", 44L),  // train, disjoint
      (10L, "totally fresh content never seen before anywhere", "en", 48L)) // test, clean
      .toDF("doc_id", "text", "lang", "n_chars")
    val dir = java.nio.file.Files.createTempDirectory("txnew").toString
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val cont = TextAnalysis.contamination(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    // doc 0's every shingle appears in train doc 1 → ratio 1.0; doc 10
    // shares nothing with train → 0.0; train docs are absent from output
    assert(cont.keySet == Set(0L, 10L))
    assert(cont(0L)._3 == 1.0 && cont(0L)._1 == cont(0L)._2)
    assert(cont(10L)._3 == 0.0 && cont(10L)._2 == 0L)
    val tf = TextAnalysis.tfidf(spark, dir).collect()
      .groupBy(_.getLong(0)).view
      .mapValues(_.sortBy(_.getInt(2)).map(_.getString(1)).toSeq).toMap
    // doc 2: all terms df=1 and tf equal → rank ties break alphabetically
    assert(tf(2L) == Seq("all", "at", "here"))
    // doc 0 and 1 share every term (df=2, equal tf) → same alphabetical top-3
    assert(tf(0L) == Seq("alpha", "beta", "delta") && tf(1L) == tf(0L))
    // shared terms (df=2) must score BELOW unique terms for a doc holding both
    val mixed = Seq((20L, "alpha beta gamma rare", "en", 21L),
      (21L, "alpha beta gamma common words", "en", 28L))
      .toDF("doc_id", "text", "lang", "n_chars")
    val dir2 = java.nio.file.Files.createTempDirectory("txnew2").toString
    mixed.write.mode("overwrite").parquet(s"$dir2/documents.parquet")
    val top20 = TextAnalysis.tfidf(spark, dir2).collect()
      .filter(_.getLong(0) == 20L).sortBy(_.getInt(2)).map(_.getString(1))
    assert(top20.head == "rare", s"df=1 term must outrank df=2 terms, got ${top20.toSeq}")
  }

  test("sampling: bernoulli gate is deterministic and near the nominal rate") {
    val total = graft.sources.Tables.documents(spark, sf).count()
    val a = Sampling.bernoulliSample(spark, sf).collect().map(_.getLong(0)).toSeq
    val b = Sampling.bernoulliSample(spark, sf).collect().map(_.getLong(0)).toSeq
    assert(a == b, "hash-gated sample must be identical across runs")
    // threshold '1a' keeps 26/256 ≈ 10.2%; allow ±4 binomial sd
    val p = 26.0 / 256
    val sd = math.sqrt(total * p * (1 - p))
    assert(math.abs(a.size - total * p) <= 4 * sd,
      s"kept ${a.size} of $total, expected ~${(total * p).toInt}")
  }

  test("sampling: bernoulli decisions are stable under corpus growth") {
    // the append-stability property RNG/reservoir sampling lacks: a row's
    // keep decision never changes when other rows arrive — here checked
    // by gating a half-corpus and the full corpus and intersecting
    val full = Sampling.bernoulliSample(spark, sf).collect().map(_.getLong(0)).toSet
    val half = graft.sources.Tables.documents(spark, sf)
      .filter(col("doc_id") < 250)
      .filter(md5(col("doc_id").cast("string")) < "1a")
      .collect().map(_.getLong(0)).toSet
    assert(half == full.filter(_ < 250))
  }

  test("sampling: stratified quota takes exactly min(k, |stratum|) per lang") {
    val docs = graft.sources.Tables.documents(spark, sf)
    val sizes = docs.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val got = Sampling.stratifiedSample(spark, sf).groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got.keySet == sizes.keySet)
    got.foreach { case (lang, n) =>
      assert(n == math.min(20L, sizes(lang)), s"$lang: got $n of ${sizes(lang)}")
    }
    // determinism
    val again = Sampling.stratifiedSample(spark, sf).collect().toSeq
    assert(again == Sampling.stratifiedSample(spark, sf).collect().toSeq)
  }

  test("text: repetition signals detect synthetic repeated content") {
    import spark.implicits._
    val docs = Seq(
      (0L, "spam spam spam spam spam spam", "en", 29L),
      (1L, "one two three four five six", "en", 27L),
      (2L, "ab cd ab cd ab cd ab cd", "en", 23L),
      (3L, "solo", "en", 4L),
      (4L, "just two", "en", 8L)).toDF("doc_id", "text", "lang", "n_chars")
    val dir = java.nio.file.Files.createTempDirectory("repdocs").toString
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val r = TextAnalysis.repetition(spark, dir).collect()
      .map(x => x.getLong(0) -> (x.getDouble(1), x.getDouble(2), x.getDouble(3))).toMap
    // all-same-token doc: zero distinct variety, bigram covers everything
    assert(r(0L)._1 > 0.8 && r(0L)._2 == 1.0)
    // all-distinct doc: no repetition anywhere
    assert(r(1L)._1 == 0.0 && r(1L)._2 < 0.5)
    // alternating pair: half the tokens are dups, "ab cd" bigram dominates
    assert(r(2L)._1 > 0.5 && r(2L)._2 > 0.8)
    // docs shorter than the gram must not crash (sequence(1, 0) steps
    // downward) and must score 0.0, matching the oracle's empty range()
    assert(r(3L) == ((0.0, 0.0, 0.0)))
    // a 2-token doc has exactly one bigram (full coverage) and no trigram
    assert(r(4L)._2 == 1.0 && r(4L)._3 == 0.0)
  }

  test("pq: 8-byte codes reconstruct unit vectors with high cosine fidelity") {
    val ivf = Similarity.buildIvfIndex(spark, sf)
    val pq = Similarity.buildPqIndex(spark, sf, ivf)
    val cb = pq.codebook
    val codes = pq.codes.select("vec_id", "code").collect()
      .map(r => r.getLong(0) -> r.getAs[Array[Byte]](1)).toMap
    val vecs = graft.sources.Tables.embeddings(spark, sf)
      .selectExpr("vec_id", "transform(embedding, x -> cast(x as double)) as v")
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    assert(codes.keySet == vecs.keySet)
    val cosines = vecs.toSeq.map { case (id, v) =>
      val rec = codes(id).zipWithIndex.flatMap { case (c, m) => cb.centroids(m)(c & 0xFF) }
      val dot = v.zip(rec).map { case (a, b) => a * b }.sum
      dot / math.sqrt(rec.map(x => x * x).sum) // v is unit-norm already
    }
    val mean = cosines.sum / cosines.size
    info(s"mean reconstruction cosine=$mean")
    // 8 subspaces x defaultPqK centroids on 64-dim unit vectors: the
    // quantized vector must stay decisively aligned with the original
    // (ADC ranking quality rests on this)
    assert(mean >= 0.7, s"mean reconstruction cosine=$mean")
    assert(cosines.min >= 0.3, s"worst reconstruction cosine=${cosines.min}")
  }

  test("xxhash64 minhash family finds the same near-dups as the md5 family") {
    def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.select("a_id", "b_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val md5Pairs = pairs(Dedup.minhashLsh(spark, sf))
    val fastPairs = pairs(Dedup.minhashLshFast(spark, sf))
    assert(md5Pairs.nonEmpty)
    // two 16-function minhash estimators of the same Jaccard: pair sets
    // agree up to threshold noise on borderline pairs
    val overlap = (md5Pairs & fastPairs).size.toDouble / (md5Pairs | fastPairs).size
    assert(overlap >= 0.8, s"overlap=$overlap md5=${md5Pairs.size} fast=${fastPairs.size}")
  }

  test("64-bit simhash pairs are high-precision true near-dups via an equi-join plan") {
    // at 64 bits, hd ≤ 1 only fires on near-identical token multisets:
    // every emitted pair must be a TRUE j ≥ 0.5 near-dup (perfect
    // precision), and the detector must find a usable share of them
    val trueDups = Dedup.ngramJaccard(spark, sf).select("a_id", "b_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val df = Dedup.simhash64Pairs(spark, sf)
    val pairs64 = df.select("a_id", "b_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs64.nonEmpty)
    assert(pairs64.subsetOf(trueDups),
      s"false positives: ${(pairs64 -- trueDups).take(5)}")
    assert(pairs64.size.toDouble / trueDups.size >= 0.15,
      s"recall ${pairs64.size}/${trueDups.size}")
    // scale shape: candidate generation is a pigeonhole equi join — no
    // nested-loop / cartesian anywhere in the executed plan
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      "simhash64 pair plan must not contain a nested-loop join")
  }

  test("bucketed embedding near-dup recovers the exact pairs with a precise verify") {
    def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.select("a_id", "b_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = pairs(Dedup.embeddingCosine(spark, sf))
    val bucketed = pairs(Dedup.embeddingCosineBucketed(spark, sf))
    assert(exact.nonEmpty)
    // candidates are exact-verified, so no false positives ever
    assert(bucketed.subsetOf(exact), s"false positives: ${bucketed -- exact}")
    val recall = (exact & bucketed).size.toDouble / exact.size
    assert(recall >= 0.7, s"recall=$recall (${bucketed.size}/${exact.size})")
  }

  test("weighted stats aggregator matches the expression form") {
    import spark.implicits._
    import graft.functions.WeightedStats
    val df = Seq((1, 2.0, 0.5), (1, 4.0, 1.5), (1, 1.0, 1.0), (2, 10.0, 2.0))
      .toDF("k", "x", "w")
    val out = df.groupBy("k").agg(WeightedStats(col("x"), col("w")).as("s"))
      .select(col("k"), col("s.mean"), col("s.std"), col("s.min"), col("s.max"))
      .collect().map(r => r.getInt(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    // group 1: mean = (2*.5 + 4*1.5 + 1*1)/3 = 8/3
    assert(math.abs(out(1)._1 - 8.0 / 3) < 1e-12)
    val varExp = (0.5 * 4 + 1.5 * 16 + 1.0 * 1) / 3 - math.pow(8.0 / 3, 2)
    assert(math.abs(out(1)._2 - math.sqrt(varExp)) < 1e-12)
    assert(out(2)._2 == 0.0)
  }

  test("langid: heuristic identifies curated real-language samples") {
    import spark.implicits._
    val samples = Seq(
      (1L, "the cat sat on the mat and it was happy that day", "en"),
      (2L, "der hund und die katze sind nicht im haus ich bin hier", "de"),
      (3L, "el perro y los gatos que viven en una casa es bonita para todos", "es"),
      (4L, "le chien est dans les champs et des oiseaux pour vous une chanson", "fr"),
      (5L, "你好世界这是一个测试", "zh"),
    ).toDF("doc_id", "text", "lang")
    samples.createOrReplaceTempView("langid_samples")
    // run the same scoring used by TextAnalysis.langId against the samples
    val dir = java.nio.file.Files.createTempDirectory("langid").toString
    samples.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val preds = TextAnalysis.langId(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val truth = Map(1L -> "en", 2L -> "de", 3L -> "es", 4L -> "fr", 5L -> "zh")
    assert(preds == truth, s"preds=$preds")
  }

  test("multimodal: byte-stat decode is deterministic and schema-complete") {
    val f = Multimodal.decodeFeatures(spark, sf).collect()
    assert(f.length == 500)
    val again = Multimodal.decodeFeatures(spark, sf).collect()
    assert(f.map(_.byte_entropy).sum == again.map(_.byte_entropy).sum)
    f.foreach { a =>
      assert(a.n_bytes > 0)
      assert(a.byte_entropy > 0 && a.byte_entropy <= 8.0) // bits per byte
      assert(a.width == 0 && a.height == 0) // text corpus: no image container
      assert(a.sample_rate == 0 && a.channels == 0 && a.duration_ms == 0L) // nor media
    }
  }

  test("multimodal: WAV and MP4 container metadata parse from bytes") {
    def le16(v: Int) = Array(v.toByte, (v >> 8).toByte)
    def le32(v: Int) = Array(v.toByte, (v >> 8).toByte, (v >> 16).toByte, (v >> 24).toByte)
    def be32(v: Int) = Array((v >> 24).toByte, (v >> 16).toByte, (v >> 8).toByte, v.toByte)
    // WAV: 44.1 kHz stereo, byte rate 176400, data chunk 176400 bytes = 1 s
    val wav = "RIFF".getBytes ++ le32(36 + 176400) ++ "WAVE".getBytes ++
      "fmt ".getBytes ++ le32(16) ++ le16(1) ++ le16(2) ++ le32(44100) ++
      le32(176400) ++ le16(4) ++ le16(16) ++
      "data".getBytes ++ le32(176400) // declared size; payload absent (header-only)
    assert(Multimodal.mediaMeta(wav).contains(Multimodal.MediaMeta(44100, 2, 1000L)))
    // MP4: ftyp + moov/mvhd v0, timescale 600, duration 1200 units = 2 s
    val mvhd = be32(108) ++ "mvhd".getBytes ++ Array.fill(4)(0.toByte) ++
      be32(0) ++ be32(0) ++ be32(600) ++ be32(1200) ++ Array.fill(76)(0.toByte)
    val mp4 = (be32(16) ++ "ftyp".getBytes ++ "isom".getBytes ++ be32(0)) ++
      (be32(8 + mvhd.length) ++ "moov".getBytes ++ mvhd)
    assert(Multimodal.mediaMeta(mp4).contains(Multimodal.MediaMeta(0, 0, 2000L)))
    assert(Multimodal.mediaMeta("plain text bytes".getBytes).isEmpty)
    assert(Multimodal.mediaMeta(Array.empty[Byte]).isEmpty)
  }

  test("multimodal: corrupt container sizes terminate, never hang or throw") {
    def le16(v: Int) = Array(v.toByte, (v >> 8).toByte)
    def le32(v: Int) = Array(v.toByte, (v >> 8).toByte, (v >> 16).toByte, (v >> 24).toByte)
    def be32(v: Int) = Array((v >> 24).toByte, (v >> 16).toByte, (v >> 8).toByte, v.toByte)
    // WAV with a chunk size in (2^31, 2^32): the Int truncation went
    // NEGATIVE, so the cursor walked BACKWARD and the chunk loop never
    // terminated — one corrupt asset hung its executor task forever
    val evilWav = "RIFF".getBytes ++ le32(0x7fffffff) ++ "WAVE".getBytes ++
      "junk".getBytes ++ le32(0xffffff9c) ++ // size 4294967196 → toInt = -100
      Array.fill(24)(0.toByte)
    val t0 = System.nanoTime()
    assert(Multimodal.mediaMeta(evilWav).isEmpty)
    assert(System.nanoTime() - t0 < 5000000000L, "WAV chunk walk did not terminate promptly")
    // BMFF with a box size near 2^31: i + size overflowed Int to a
    // NEGATIVE cursor, which passed the loop bound and indexed the array
    // at a negative offset — AIOOBE where the contract is "malformed
    // contributes nothing"
    val evilMp4 = (be32(16) ++ "ftyp".getBytes ++ "isom".getBytes ++ be32(0)) ++
      (be32(0x7ffffff0) ++ "free".getBytes) ++ Array.fill(32)(0.toByte)
    assert(Multimodal.mediaMeta(evilMp4).isEmpty) // must not throw
    assert(Multimodal.frameSamples(evilMp4, 8).isEmpty)
    // same overflow class inside a valid-looking moov: the INNER box walk
    val evilMoov = (be32(16) ++ "ftyp".getBytes ++ "isom".getBytes ++ be32(0)) ++
      (be32(24) ++ "moov".getBytes ++ be32(0x7ffffff0) ++ "trak".getBytes ++
        Array.fill(8)(0.toByte))
    assert(Multimodal.mediaMeta(evilMoov).isEmpty)
    assert(Multimodal.frameSamples(evilMoov, 8).isEmpty)
  }

  test("multimodal: TIFF and WebP dims parse from bytes") {
    def le16(v: Int) = Array(v.toByte, (v >> 8).toByte)
    def le32(v: Int) = Array(v.toByte, (v >> 8).toByte, (v >> 16).toByte, (v >> 24).toByte)
    def be16(v: Int) = Array((v >> 8).toByte, v.toByte)
    def be32(v: Int) = Array((v >> 24).toByte, (v >> 16).toByte, (v >> 8).toByte, v.toByte)
    // TIFF little-endian: IFD at 8, two entries (256 SHORT 640, 257 LONG 480)
    val tiffLe = "II".getBytes ++ Array(0x2a.toByte, 0.toByte) ++ le32(8) ++
      le16(2) ++
      (le16(256) ++ le16(3) ++ le32(1) ++ le16(640) ++ le16(0)) ++
      (le16(257) ++ le16(4) ++ le32(1) ++ le32(480)) ++ le32(0)
    assert(Multimodal.imageDims(tiffLe).contains((640, 480)))
    // TIFF big-endian, LONG values
    val tiffBe = "MM".getBytes ++ Array(0.toByte, 0x2a.toByte) ++ be32(8) ++
      be16(2) ++
      (be16(256) ++ be16(4) ++ be32(1) ++ be32(1024)) ++
      (be16(257) ++ be16(4) ++ be32(1) ++ be32(768)) ++ be32(0)
    assert(Multimodal.imageDims(tiffBe).contains((1024, 768)))
    // WebP VP8 (lossy): frame tag + 9D 01 2A start code + 14-bit dims
    val vp8 = "RIFF".getBytes ++ le32(22) ++ "WEBP".getBytes ++
      "VP8 ".getBytes ++ le32(10) ++ Array.fill(3)(0.toByte) ++
      Array(0x9d.toByte, 0x01.toByte, 0x2a.toByte) ++ le16(320) ++ le16(240)
    assert(Multimodal.imageDims(vp8).contains((320, 240)))
    // WebP VP8L (lossless): 0x2F then packed 14-bit (w-1, h-1)
    val bits = (200 - 1) | ((100 - 1) << 14)
    val vp8l = "RIFF".getBytes ++ le32(17) ++ "WEBP".getBytes ++
      "VP8L".getBytes ++ le32(5) ++ Array(0x2f.toByte) ++ le32(bits)
    assert(Multimodal.imageDims(vp8l).contains((200, 100)))
    // WebP VP8X (extended): 24-bit LE canvas dims minus one
    def u24(v: Int) = Array(v.toByte, (v >> 8).toByte, (v >> 16).toByte)
    val vp8x = "RIFF".getBytes ++ le32(18) ++ "WEBP".getBytes ++
      "VP8X".getBytes ++ le32(10) ++ Array.fill(4)(0.toByte) ++
      u24(1920 - 1) ++ u24(1080 - 1)
    assert(Multimodal.imageDims(vp8x).contains((1920, 1080)))
  }

  test("multimodal: MP4 stsd audio metadata parses sample rate and channels") {
    def be16(v: Int) = Array((v >> 8).toByte, v.toByte)
    def be32(v: Int) = Array((v >> 24).toByte, (v >> 16).toByte, (v >> 8).toByte, v.toByte)
    def box(name: String, p: Array[Byte]) = be32(8 + p.length) ++ name.getBytes ++ p
    val mvhd = box("mvhd", Array.fill(4)(0.toByte) ++ be32(0) ++ be32(0) ++
      be32(600) ++ be32(1200) ++ Array.fill(76)(0.toByte))
    // AudioSampleEntry 'mp4a': 8 reserved+dref, 8 reserved, ch u16,
    // samplesize u16, predefined+reserved 4, samplerate 16.16
    val mp4a = box("mp4a", Array.fill(6)(0.toByte) ++ be16(1) ++
      Array.fill(8)(0.toByte) ++ be16(2) ++ be16(16) ++ be32(0) ++
      be16(44100) ++ be16(0))
    val stsd = box("stsd", Array.fill(4)(0.toByte) ++ be32(1) ++ mp4a)
    val hdlr = box("hdlr", Array.fill(4)(0.toByte) ++ be32(0) ++
      "soun".getBytes ++ Array.fill(13)(0.toByte))
    val trak = box("trak", box("mdia",
      hdlr ++ box("minf", box("stbl", stsd))))
    val mp4 = box("ftyp", "isom".getBytes ++ be32(0)) ++ box("moov", mvhd ++ trak)
    assert(Multimodal.mediaMeta(mp4).contains(Multimodal.MediaMeta(44100, 2, 2000L)))
  }

  test("multimodal: frame sampler resolves stbl tables to exact byte ranges") {
    // id=0: nFrames=4, delta=100, sizes=(50,60,70,80), one chunk of 4
    val b = Multimodal.syntheticMp4(0L)
    val frames = Multimodal.frameSamples(b, 8)
    assert(frames.size == 4)
    assert(frames.map(_.frame_idx) == Seq(0, 1, 2, 3))
    // timescale 600: dts 0,100,200,300 units -> 0,166,333,500 ms
    assert(frames.map(_.ts_ms) == Seq(0L, 166L, 333L, 500L))
    assert(frames.map(_.n_bytes) == Seq(50L, 60L, 70L, 80L))
    // offsets: consecutive within the chunk, starting at the mdat payload
    assert(frames(1).offset == frames(0).offset + 50)
    assert(frames(2).offset == frames(1).offset + 60)
    assert(frames(3).offset == frames(2).offset + 70)
    // every byte range lies inside the container
    frames.foreach(f => assert(f.offset + f.n_bytes <= b.length))
    // the declared ranges address the mdat payload exactly: fixture bytes
    // are (id + i) % 251 from the payload start
    val payloadStart = frames(0).offset
    frames.foreach { f =>
      (0 until f.n_bytes.toInt).foreach { j =>
        val pos = (f.offset + j).toInt
        assert(b(pos) == ((pos - payloadStart) % 251).toByte)
      }
    }
    // id=1: 7 frames in chunks of 4+3 (two stsc runs); stride to 5 keeps
    // even coverage with the first frame included
    val f7 = Multimodal.frameSamples(Multimodal.syntheticMp4(1L), 5)
    assert(f7.size == 5)
    assert(f7.map(_.frame_idx) == Seq(0, 1, 2, 4, 5))
    // non-BMFF input yields nothing
    assert(Multimodal.frameSamples("not a video".getBytes, 8).isEmpty)
  }

  test("multimodal: fragmented-MP4 sampler resolves moof/trun runs to byte ranges") {
    // id=25: 4 frames/fragment x 2 fragments, delta=100, timescale 600
    val id = 25L
    val b = Multimodal.syntheticFragMp4(id)
    val frames = Multimodal.frameSamples(b, 8)
    assert(frames.size == 8)
    assert(frames.map(_.frame_idx) == (0 until 8))
    // sizes: frag0 k=0..3 -> (25+k)%7*10+40; frag1 -> (35+k)%7*10+40
    assert(frames.map(_.n_bytes) == Seq(80L, 90L, 100L, 40L, 40L, 50L, 60L, 70L))
    // dts: frag0 from 0 by 100; frag1 tfdt base 400 -> ms via timescale 600
    assert(frames.map(_.ts_ms) == Seq(0L, 166L, 333L, 500L, 666L, 833L, 1000L, 1166L))
    // offsets are consecutive within a fragment and in-bounds; payload
    // bytes follow the generator rule (id + frag*7 + i) % 251
    assert(frames(1).offset == frames(0).offset + 80)
    assert(frames(5).offset == frames(4).offset + 40)
    frames.foreach(f => assert(f.offset + f.n_bytes <= b.length))
    for ((f, k) <- frames.zipWithIndex) {
      val frag = k / 4
      val fragStart = frames(frag * 4).offset
      val within = (f.offset - fragStart).toInt
      (0 until f.n_bytes.toInt).foreach { j =>
        assert(b((f.offset + j).toInt) == ((id + frag * 7 + within + j) % 251).toByte)
      }
    }
  }

  test("multimodal: mdhd v1 timescale is read at the 64-bit-time offset") {
    def be32(v: Int) = Array((v >> 24).toByte, (v >> 16).toByte, (v >> 8).toByte, v.toByte)
    def box(name: String, payload: Array[Byte]): Array[Byte] =
      be32(8 + payload.length) ++ name.getBytes ++ payload
    // v1 mdhd: version 1, u64 ctime/mtime, timescale u32 at +28
    val mdhdV1 = box("mdhd", Array(1.toByte) ++ Array.fill(3)(0.toByte) ++
      Array.fill(16)(0.toByte) ++ be32(1200) ++ Array.fill(8)(0.toByte))
    val stts = box("stts", Array.fill(4)(0.toByte) ++ be32(1) ++ be32(2) ++ be32(600))
    val stsc = box("stsc", Array.fill(4)(0.toByte) ++ be32(1) ++ be32(1) ++ be32(2) ++ be32(1))
    val stsz = box("stsz", Array.fill(4)(0.toByte) ++ be32(0) ++ be32(2) ++ be32(10) ++ be32(12))
    val mkFile = { (stcoOff: Int) =>
      val stco = box("stco", Array.fill(4)(0.toByte) ++ be32(1) ++ be32(stcoOff))
      val stbl = box("stbl", stts ++ stsc ++ stsz ++ stco)
      val moov = box("moov", box("trak", box("mdia", mdhdV1 ++ box("minf", stbl))))
      val ftyp = box("ftyp", "isom".getBytes ++ be32(0))
      ftyp ++ moov ++ box("mdat", Array.fill(22)(7.toByte))
    }
    val probe = mkFile(0)
    val dataStart = probe.length - 22
    val frames = Multimodal.frameSamples(mkFile(dataStart), 8)
    assert(frames.size == 2)
    // timescale 1200 (not the creation-time bytes a v0 read would see):
    // dts 0,600 units -> 0,500 ms
    assert(frames.map(_.ts_ms) == Seq(0L, 500L))
    assert(frames.map(_.n_bytes) == Seq(10L, 12L))
  }

  test("multimodal: corrupt or truncated containers yield empty, never throw") {
    val good = Multimodal.syntheticMp4(3L)
    // find the stsz sample count and declare a huge n (allocation guard)
    val stszAt = (0 until good.length - 4).find(i =>
      good(i) == 's' && good(i + 1) == 't' && good(i + 2) == 's' && good(i + 3) == 'z').get - 4
    val huge = good.clone()
    huge(stszAt + 16) = 0x7f.toByte // n = 0x7fxxxxxx >> MaxSamples
    assert(Multimodal.frameSamples(huge, 8).isEmpty)
    // truncation at every quarter: parse must stay total
    Seq(good.length / 4, good.length / 2, 3 * good.length / 4).foreach { cut =>
      Multimodal.frameSamples(good.take(cut), 8) // must not throw
    }
    // fragmented: corrupt the trun sample count the same way
    val frag = Multimodal.syntheticFragMp4(26L)
    val trunAt = (0 until frag.length - 4).find(i =>
      frag(i) == 't' && frag(i + 1) == 'r' && frag(i + 2) == 'u' && frag(i + 3) == 'n').get - 4
    val fragBad = frag.clone()
    fragBad(trunAt + 12) = 0x7f.toByte
    Multimodal.frameSamples(fragBad, 8) // the bad trun contributes nothing
    // zero-length and garbage inputs
    assert(Multimodal.frameSamples(Array.emptyByteArray, 8).isEmpty)
    assert(Multimodal.tiffStrips("not a tiff at all".getBytes, 8).isEmpty)
  }

  test("multimodal: TIFF strip ranges follow offset-typed IFD arrays") {
    val id = 35L
    val b = Multimodal.syntheticTiff(id)
    // dims parse from the same IFD (inline LONG entries)
    assert(Multimodal.imageDims(b).contains((112, 128)))
    val strips = Multimodal.tiffStrips(b, 8)
    // nStrips = 3 + 35%4 = 6; sizes 40+((35+k)%5)*8
    assert(strips.size == 6)
    assert(strips.map(_.n_bytes) == Seq(40L, 48L, 56L, 64L, 72L, 40L))
    // offsets are consecutive (strips abut in the fixture) and in-bounds
    strips.sliding(2).foreach { case Seq(a, c) =>
      assert(c.offset == a.offset + a.n_bytes)
    }
    strips.foreach(f => assert(f.offset + f.n_bytes <= b.length))
    // strip content matches the generator rule (id*3 + i) % 251 measured
    // from the data start — the whole-file recomputation
    val dataStart = strips.head.offset
    strips.foreach { f =>
      (0 until f.n_bytes.toInt).foreach { j =>
        assert(b((f.offset + j).toInt) == ((id * 3 + (f.offset - dataStart) + j) % 251).toByte)
      }
    }
  }

  test("multimodal: frame-bytes query checksums equal whole-file recomputation") {
    val rows = Multimodal.frameBytes(spark, sf).collect()
    val byAsset = rows.groupBy(_.getLong(0))
    assert(byAsset.keySet == (0L until 45L).toSet)
    assert(rows.forall(_.getBoolean(4)), "every slice must be in bounds")
    // independent recomputation: regenerate each asset's bytes, slice by
    // the parser's ranges, CRC — the query's distributed path must agree
    def gen(id: Long): Array[Byte] =
      if (id < 25) Multimodal.syntheticMp4(id)
      else if (id < 35) Multimodal.syntheticFragMp4(id)
      else Multimodal.syntheticTiff(id)
    byAsset.foreach { case (id, frames) =>
      val bytes = gen(id)
      val refs = Multimodal.byteRanges(bytes, 8)
      assert(frames.length == refs.size)
      frames.sortBy(_.getInt(1)).zip(refs).foreach { case (row, ref) =>
        val c = new java.util.zip.CRC32()
        c.update(bytes, ref.offset.toInt, ref.n_bytes.toInt)
        assert(row.getLong(3) == c.getValue, s"asset $id frame ${ref.frame_idx}")
        assert(row.getLong(2) == ref.n_bytes)
      }
    }
  }

  test("multimodal: frame index query emits ranges for every synthetic asset") {
    val df = Multimodal.frameIndex(spark, sf).collect()
    val byAsset = df.groupBy(_.getLong(0))
    assert(byAsset.keySet == (0L until 25L).toSet)
    byAsset.foreach { case (_, rows) =>
      assert(rows.length >= 4 && rows.length <= 8)
      // frame indices strictly increase; offsets are positive and in-range
      val idxs = rows.map(_.getInt(1)).toSeq
      assert(idxs == idxs.sorted && idxs.distinct == idxs)
      rows.foreach(r => assert(r.getLong(3) > 0 && r.getLong(4) > 0))
    }
  }

  test("multimodal: container-header dims parse for PNG/JPEG/GIF/BMP bytes") {
    def be32(v: Int) = Array((v >> 24).toByte, (v >> 16).toByte, (v >> 8).toByte, v.toByte)
    def be16(v: Int) = Array((v >> 8).toByte, v.toByte)
    def le16(v: Int) = Array(v.toByte, (v >> 8).toByte)
    def le32(v: Int) = Array(v.toByte, (v >> 8).toByte, (v >> 16).toByte, (v >> 24).toByte)
    val png = Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte) ++
      be32(13) ++ "IHDR".getBytes ++ be32(640) ++ be32(480) ++ Array.fill(5)(0.toByte)
    assert(Multimodal.imageDims(png).contains((640, 480)))
    // JPEG: SOI, APP0 (len 16), DHT (must be skipped, not read as SOF), SOF0
    val jpg = Array(0xff, 0xd8).map(_.toByte) ++
      (Array(0xff, 0xe0).map(_.toByte) ++ be16(16) ++ Array.fill(14)(0.toByte)) ++
      (Array(0xff, 0xc4).map(_.toByte) ++ be16(4) ++ Array.fill(2)(0.toByte)) ++
      (Array(0xff, 0xc0).map(_.toByte) ++ be16(17) ++ Array(8.toByte) ++
        be16(1080) ++ be16(1920) ++ Array.fill(10)(0.toByte))
    assert(Multimodal.imageDims(jpg).contains((1920, 1080)))
    val gif = "GIF89a".getBytes ++ le16(320) ++ le16(200) ++ Array.fill(3)(0.toByte)
    assert(Multimodal.imageDims(gif).contains((320, 200)))
    val bmp = "BM".getBytes ++ Array.fill(16)(0.toByte) ++ le32(800) ++ le32(-600) ++
      Array.fill(4)(0.toByte)
    assert(Multimodal.imageDims(bmp).contains((800, 600))) // top-down height: magnitude
    assert(Multimodal.imageDims("plain text".getBytes).isEmpty)
    assert(Multimodal.imageDims(Array.empty[Byte]).isEmpty)
  }

  test("approx_count_distinct tracks exact distinct within rsd") {
    val orders = graft.sources.Tables.orders(spark, sf)
    val exact = orders.select(countDistinct("o_custkey")).head().getLong(0)
    val approx = orders.select(approx_count_distinct("o_custkey", 0.05)).head().getLong(0)
    assert(math.abs(approx - exact).toDouble / exact < 0.15, s"exact=$exact approx=$approx")
  }

  test("stop-shingle cap keeps true near-dups while bounding join groups") {
    val exact = Dedup.ngramJaccard(spark, sf).collect()
      .map(r => (r.getLong(1), r.getLong(0))).toSet
    // cap well above any true near-dup pair's shingle doc-frequency
    val capped = Dedup.ngramJaccardImpl(spark, sf, maxShingleDocFreq = 10).collect()
      .map(r => (r.getLong(1), r.getLong(0))).toSet
    assert(exact.nonEmpty)
    // dropping super-common shingles can only remove boilerplate-driven
    // pairs; the planted near-dups share many rare shingles and survive
    assert(exact.subsetOf(capped) || capped.subsetOf(exact))
    assert((exact & capped).size.toDouble / exact.size >= 0.9,
      s"lost ${(exact -- capped).size} of ${exact.size}")
  }

  test("pii: redaction handles fixtures, clean text, and multiple matches") {
    import spark.implicits._
    val rows = Seq(
      ("mail me at jo.doe+x@sub.example.com today", "mail me at <EMAIL> today"),
      ("ssn 123-45-6789 then phone 555-123-4567", "ssn <ID> then phone <PHONE>"),
      ("server 192.168.0.1 and 10.0.0.255", "server <IP> and <IP>"),
      ("two mails a@b.co c@d.org", "two mails <EMAIL> <EMAIL>"),
      ("no pii here at all", "no pii here at all"),
      // boundaries: longer digit runs must NOT be clipped into matches
      ("serial 1234-56-7890 stays", "serial 1234-56-7890 stays"),
      ("ends with x@y.io", "ends with <EMAIL>"))
      .toDF("t", "expected")
    val out = rows.withColumn("got", TextAnalysis.redactPii(col("t"))).collect()
    out.foreach(r => assert(r.getString(2) == r.getString(1),
      s"input '${r.getString(0)}'"))
    // corpus query: clean docs (no injected residue) come through unchanged
    val pii = TextAnalysis.piiScrub(spark, sf)
    val docs = graft.sources.Tables.documents(spark, sf).select("doc_id", "text")
    val joined = pii.join(docs, "doc_id")
      .filter(col("doc_id") % 3 =!= 0 && col("doc_id") % 4 =!= 0 &&
        col("doc_id") % 5 =!= 0 && col("doc_id") % 7 =!= 0)
      .collect()
    assert(joined.nonEmpty)
    joined.foreach { r =>
      assert(r.getAs[String]("scrubbed") == r.getAs[String]("text"))
      Seq("n_email", "n_ssn", "n_phone", "n_ip").foreach(c =>
        assert(r.getAs[Long](c) == 0L))
    }
  }

  test("pipeline: composite clean agrees with its component operators") {
    val out = Pipeline.clean(spark, sf).collect()
      .map(r => r.getLong(0) -> ((r.getBoolean(1), r.getString(2)))).toMap
    assert(out.nonEmpty)
    // keep is exactly reason == ok
    out.values.foreach { case (k, r) => assert(k == (r == "ok")) }
    // rule 1 agrees with tx_langid: every doc predicted non-en reads
    // non_english, every en doc reads something else
    val langs = TextAnalysis.langId(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    out.foreach { case (id, (_, reason)) =>
      assert((reason == "non_english") == (langs(id) != "en"), s"doc $id")
    }
    // the corpus exercises more than one drop reason plus survivors
    val reasons = out.values.map(_._2).toSet
    assert(reasons.contains("ok"))
    assert((reasons - "ok").size >= 2, s"reasons=$reasons")
  }

  test("span dedup matches a driver-side first-occurrence sweep") {
    val docs = graft.sources.Tables.documents(spark, sf)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).sortBy(_._1)
    // reference: one linear sweep in (doc_id, span_idx) order
    val seen = scala.collection.mutable.HashSet[String]()
    val expected = docs.map { case (id, text) =>
      val spans = text.split(" ").grouped(Dedup.SpanTokens).map(_.mkString(" ")).toSeq
      val keptFlags = spans.map(s => seen.add(s))
      val kept = spans.zip(keptFlags).collect { case (s, true) => s }
      id -> ((spans.size.toLong, keptFlags.count(!_).toLong,
        if (kept.isEmpty) null else kept.mkString(" ")))
    }.toMap
    val out = Dedup.spanDedup(spark, sf).collect()
    assert(out.map(_.getLong(0)).toSet == expected.keySet)
    out.foreach { r =>
      val (nSpans, nDup, textDedup) = expected(r.getLong(0))
      assert(r.getLong(1) == nSpans, s"doc ${r.getLong(0)} n_spans")
      assert(r.getLong(2) == nDup, s"doc ${r.getLong(0)} n_dup_spans")
      assert(r.getString(3) == textDedup, s"doc ${r.getLong(0)} text_dedup")
    }
    // the operator must actually remove something on this corpus
    assert(out.map(_.getLong(2)).sum > 0)
  }

  test("minhash estimate correlates with exact jaccard on near-dup pairs") {
    val exact = Dedup.ngramJaccard(spark, sf).collect()
      .map(r => (r.getLong(1), r.getLong(0)) -> r.getDouble(2)).toMap
    val est = Dedup.minhashLsh(spark, sf).collect()
      .map(r => (r.getLong(1), r.getLong(0)) -> r.getDouble(2)).toMap
    assert(est.nonEmpty)
    // every very-strong true pair (j >= 0.9) must be found by LSH
    val strong = exact.filter(_._2 >= 0.9).keySet
    assert(strong.subsetOf(est.keySet), s"missed=${strong -- est.keySet}")
  }
}

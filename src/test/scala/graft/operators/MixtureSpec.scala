package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Properties of [[Doremi]] (domain-mixture reweighting),
  * [[NgramLm.collocations]] (PMI phrase mining) and
  * [[TextAnalysis.winnowing]] (local fingerprints) that the hash oracles
  * can't see: the MWU invariants (simplex, direction of movement,
  * hand-computed recurrence on a constructed loss table), exact lift
  * arithmetic on a corpus with a known collocation, and the winnowing
  * guarantee/density laws plus sequential-reference parity.
  */
class MixtureSpec extends SparkSpec {

  test("doremi: weights stay on the simplex and move toward high-loss domains") {
    val w = Doremi.domainWeights(spark, sf).collect()
    assert(w.length > 1)
    // the gate booleans must all hold (Spark's replay vs its own export)
    assert(w.forall(r => r.getAs[Boolean]("loss_ok") && r.getAs[Boolean]("w_ok")),
      "gate failed on self-replay")
    val total = w.map(_.getAs[Double]("w")).sum
    assert(math.abs(total - 1.0) < 1e-9, s"weights sum to $total")
    // direction: the max-loss domain ends above uniform, the min-loss below
    val uniform = 1.0 / w.length
    val byLoss = w.sortBy(_.getAs[Double]("loss"))
    assert(byLoss.last.getAs[Double]("w") > uniform,
      "max-loss domain did not gain mass")
    assert(byLoss.head.getAs[Double]("w") < uniform,
      "min-loss domain did not lose mass")
  }

  test("doremi gate margin: ulp-scale loss perturbation moves weights ≥3 decades inside GateTol") {
    // the cross-engine situation the export-gate defends: the other
    // engine's losses/partial sums differ in the last ulp. Perturb every
    // loss by ±1e-13 (≫ the real cross-engine drift on integer-sum
    // losses) and bound the recurrence's condition number: the weight
    // movement must stay ≥3 orders of magnitude under the gate bound.
    val losses = Seq("a" -> 0.11, "b" -> 0.23, "c" -> 0.37, "d" -> 0.05, "e" -> 0.29)
    val base = Doremi.mwu(losses)
    val eps = 1e-13
    val drifts = Seq(1, -1).map { sign =>
      val pert = losses.zipWithIndex.map { case ((s, l), i) =>
        s -> (l + sign * (if (i % 2 == 0) eps else -eps)) }
      val w2 = Doremi.mwu(pert)
      losses.map { case (s, _) => math.abs(w2(s) - base(s)) }.max
    }
    assert(drifts.max < Doremi.GateTol / 1e3,
      s"perturbation drift ${drifts.max} leaves <3 decades under ${Doremi.GateTol}")
  }

  test("doremi: kernel matches a hand-rolled reference; clamp keeps adversarial spreads positive") {
    // three domains with known losses; replay the update rule independently
    val losses = Seq("a" -> 0.10, "b" -> 0.20, "c" -> 0.40)
    var ref = losses.map { case (d, _) => d -> 1.0 / 3 }.toMap
    for (_ <- 1 to Doremi.Rounds) {
      val mix = losses.map { case (d, l) => ref(d) * l }.sum
      val upd = losses.map { case (d, l) =>
        d -> ref(d) * math.max(1e-9, 1.0 + Doremi.Eta * (l - mix)) }
      val z = upd.map(_._2).sum
      ref = upd.map { case (d, wv) => d -> wv / z }.toMap
    }
    val got = Doremi.mwu(losses)
    losses.foreach { case (d, _) =>
      assert(math.abs(got(d) - ref(d)) < 1e-15, s"$d: ${got(d)} vs ${ref(d)}")
    }
    // the hard domain ends up dominant with η=10 on this spread
    assert(got("c") > got("b") && got("b") > got("a"))
    assert(math.abs(got.values.sum - 1.0) < 1e-12)
    // adversarial spread: η·excess < −1 for the easy domain — the clamp
    // floors its factor at 1e-9 instead of flipping the weight negative
    val wild = Doremi.mwu(Seq("easy" -> 0.0, "hard" -> 1.0))
    assert(wild.values.forall(v => v > 0.0 && v <= 1.0))
    assert(math.abs(wild.values.sum - 1.0) < 1e-12)
    assert(wild("hard") > 0.99, s"hard domain should absorb the mass: $wild")
  }

  test("winnowing matches a sequential reference; guarantee and density laws hold") {
    import graft.sources.Tables
    val k = TextAnalysis.WinK; val w = TextAnalysis.WinW
    // sequential reference: the paper's algorithm, verbatim
    def reference(text: String): Set[(Int, String)] = {
      val t = text.split(" ", -1)
      val grams = (0 to t.length - k).map(i => t.slice(i, i + k).mkString(" "))
      val hs = grams.map { g =>
        java.security.MessageDigest.getInstance("MD5").digest(g.getBytes("UTF-8"))
          .map("%02x".format(_)).mkString }
      if (hs.isEmpty) Set.empty
      else {
        val m = hs.length
        val starts = 1 to math.max(1, m - w + 1)
        starts.flatMap { j =>
          val width = math.min(w, m - j + 1)
          val win = (j until j + width).map(p => p -> hs(p - 1))
          val mn = win.map(_._2).min
          val pos = win.filter(_._2 == mn).map(_._1).max // rightmost tie
          Some(pos -> mn)
        }.toSet
      }
    }
    val docs = Tables.documents(spark, sf).select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val got = TextAnalysis.winnowing(spark, sf).collect()
      .groupBy(_.getLong(0))
      .map { case (id, rs) => id -> rs.map(r => (r.getInt(1), r.getString(2))).toSet }
    docs.foreach { case (id, text) =>
      val ref = reference(text)
      val g = got.getOrElse(id, Set.empty)
      assert(g == ref, s"doc $id: engine ${g.size} fps vs reference ${ref.size}")
    }
    // density: expected ~2/(w+1) of gram positions selected; allow wide slack
    val totalGrams = docs.values.map(t => math.max(0, t.split(" ", -1).length - k + 1)).sum
    val totalFps = got.values.map(_.size).sum
    assert(totalFps.toDouble / totalGrams < 2.5 / (w + 1),
      s"density ${totalFps.toDouble / totalGrams} too high")
    // guarantee: two docs sharing a (w+k-1)-token run share a fingerprint
    import spark.implicits._
    val shared = "alpha bravo charlie delta echo foxtrot" // w+k-1 = 6 tokens
    val dir = java.nio.file.Files.createTempDirectory("winnow").toString
    Seq((1L, s"one two $shared three four five six", "en", "s", 0L),
        (2L, s"$shared nine ten eleven twelve", "en", "s", 0L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val fps = TextAnalysis.winnowing(spark, dir).collect()
      .groupBy(_.getLong(0)).map { case (id, rs) => id -> rs.map(_.getString(2)).toSet }
    assert((fps(1L) intersect fps(2L)).nonEmpty,
      "shared 6-token run produced no shared fingerprint")
  }

  test("kneser-ney: conditionals sum to 1 over the vocab; continuation beats frequency") {
    import spark.implicits._
    // "bb" is FREQUENT but only ever follows "aa" (the San Francisco
    // case); "cc" is rarer but follows many contexts
    val docs = Seq(
      (1L, "aa bb aa bb aa bb cc dd", "en", "s", 0L),
      (2L, "aa bb aa bb ee cc ff cc", "en", "s", 0L),
      (3L, "gg cc hh aa bb dd ee ff", "en", "s", 0L))
    val dir = java.nio.file.Files.createTempDirectory("kn").toString
    docs.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    // rebuild the KN tables exactly as the operator defines them
    val toksAll = docs.flatMap(_._2.split(" ")).toSeq
    val bigrams = docs.flatMap { case (_, t, _, _, _) =>
      val w = t.split(" "); w.init.zip(w.tail) }
    val c12 = bigrams.groupBy(identity).map { case (k, v) => k -> v.size }
    // KN denominator: LEFT-CONTEXT occurrences, not raw unigram count
    val c1 = bigrams.groupBy(_._1).map { case (k, v) => k -> v.size }
    val rawFreq = toksAll.groupBy(identity).map { case (k, v) => k -> v.size }
    val nfol = bigrams.distinct.groupBy(_._1).map { case (k, v) => k -> v.size }
    val nprec = bigrams.distinct.groupBy(_._2).map { case (k, v) => k -> v.size }
    val btypes = bigrams.distinct.size.toDouble
    val d = NgramLm.KnD
    val vocab = toksAll.distinct
    def p(w1: String, w2: String): Double =
      math.max(c12.getOrElse((w1, w2), 0) - d, 0.0) / c1(w1) +
        (d * nfol(w1) / c1(w1)) * (nprec.getOrElse(w2, 0) / btypes)
    // the interpolated-KN simplex property, over the full vocab
    vocab.filter(nfol.contains).foreach { w1 =>
      val total = vocab.map(w2 => p(w1, w2)).sum
      assert(math.abs(total - 1.0) < 1e-9, s"p(.|$w1) sums to $total")
    }
    // continuation discounting: bb is more frequent than cc but has ONE
    // left context vs cc's three — its backoff unigram mass must be lower
    assert(rawFreq("bb") > rawFreq("cc"))
    assert(nprec("bb") < nprec("cc"))
    // and the engine's per-doc scores agree with the reference formula
    val got = NgramLm.perplexityKn(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getDouble(2)).toMap
    docs.foreach { case (id, t, _, _, _) =>
      val w = t.split(" ")
      val ref = -w.init.zip(w.tail).map { case (a, b) => math.log(p(a, b)) }
        .sum / (w.length - 1)
      assert(math.abs(got(id) - (math.rint(ref * 1e4) / 1e4)) < 2e-4,
        s"doc $id: ${got(id)} vs $ref")
    }
  }

  test("mine_bitext: planted cross-collection duplicates are mined, noise is not") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    def unit(): Array[Float] = {
      val v = Array.fill(16)(rnd.nextGaussian().toFloat)
      val n = math.sqrt(v.map(x => x * x.toDouble).sum).toFloat
      v.map(_ / n)
    }
    // labels: even = X side, odd = Y side. Plant two X vectors whose
    // EXACT copies sit on the Y side; fill with independent noise.
    val planted = Seq(unit(), unit())
    val rows =
      planted.zipWithIndex.map { case (v, i) => (i.toLong, v.toSeq, 0) } ++
      planted.zipWithIndex.map { case (v, i) => (100L + i, v.toSeq, 1) } ++
      (0 until 40).map(i => (200L + i, unit().toSeq, i % 2))
    val dir = java.nio.file.Files.createTempDirectory("bitext").toString
    rows.toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val mined = Mining.mineBitext(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val pairs = mined.map(m => (m._1, m._2)).toSet
    assert(pairs.contains((0L, 100L)) && pairs.contains((1L, 101L)),
      s"planted duplicates not mined: $mined")
    // planted pairs carry cos = 1 against a noise neighborhood → margin
    // well above the threshold; random 16-dim mutual pairs rarely do
    mined.filter(m => m._1 <= 1L).foreach(m =>
      assert(m._3 > Mining.MineMargin, s"planted pair margin too low: $m"))
    // the ANN scale sibling: exact duplicates share every LSH bucket, so
    // both planted pairs MUST be mined; overall pair recall vs the exact
    // form stays high on this fixture
    val annPairs = Mining.mineBitextAnn(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(annPairs.contains((0L, 100L)) && annPairs.contains((1L, 101L)),
      s"ANN path missed planted duplicates: $annPairs")
    val recall = pairs.count(annPairs).toDouble / pairs.size
    assert(recall >= 0.5, s"ANN mutual-pair recall $recall vs exact ($pairs → $annPairs)")
  }

  test("mine_bitext_ann agrees with the exact miner on the fixture corpus") {
    graft.operators.ArtifactCaches.clear()
    val exact = Mining.mineBitext(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val ann = Mining.mineBitextAnn(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact.nonEmpty)
    val recall = exact.count(ann).toDouble / exact.size
    assert(recall >= 0.6, s"recall $recall: ${exact.size} exact vs ${ann.size} ann pairs")
    // precision side: an ANN pair the exact miner rejected can only come
    // from a candidate-list margin shift, not a better cosine — bound it
    val extra = ann.count(p => !exact.contains(p)).toDouble / math.max(1, ann.size)
    assert(extra <= 0.5, s"ANN mined too many non-exact pairs: $ann vs $exact")
  }

  test("winnow pairs recover the exact near-dup pair set on the fixture") {
    // near-dups share long token runs, and the winnowing guarantee says
    // every run of ≥ w+k−1 tokens shares a fingerprint — so the j ≥ 0.5
    // Jaccard pairs should essentially all clear the shared-fp floor
    val exact = Dedup.ngramJaccard(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val winnow = TextAnalysis.winnowPairs(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact.nonEmpty)
    val recall = exact.count(winnow).toDouble / exact.size
    assert(recall >= 0.9, s"winnow-pair recall $recall (${exact.size} exact, ${winnow.size} winnow)")
  }

  test("winnow pairs: a boilerplate-hot fingerprint is stop-listed, true dups survive") {
    import spark.implicits._
    // 60 docs share one 40-token boilerplate run (fingerprint df = 60 >
    // WinMaxFpDf) but are otherwise unique; docs 1 and 2 share a
    // DIFFERENT 40-token run seen nowhere else (df = 2). The capped join
    // must pair ONLY (1,2); the uncapped join drowns in the 60·59/2
    // boilerplate pairs — the quadratic bucket the stop-list exists for.
    val boiler = (1 to 40).map(i => s"boil$i").mkString(" ")
    val dupRun = (1 to 40).map(i => s"dup$i").mkString(" ")
    val docs =
      Seq((1L, s"u1a u1b $dupRun u1c u1d", "en", "s", 0L),
          (2L, s"u2a $dupRun u2b u2c u2d", "en", "s", 0L)) ++
      (0 until 60).map(i =>
        (100L + i, s"f${i}a f${i}b f${i}c $boiler f${i}d f${i}e", "en", "s", 0L))
    val dir = java.nio.file.Files.createTempDirectory("hotfp").toString
    docs.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    assert(docs.map(_._1).toSet.size == docs.size)
    val capped = TextAnalysis.winnowPairs(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(capped.map(p => (p._1, p._2)).toSet == Set((1L, 2L)),
      s"capped pairs: ${capped.toSeq}")
    assert(capped.head._3 >= TextAnalysis.WinMinShared)
    val uncapped = TextAnalysis.winnowPairsImpl(spark, dir, Int.MaxValue)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(uncapped.contains((1L, 2L)))
    // without the cap the hot fingerprint creates the full pair clique
    assert(uncapped.size > 1000,
      s"expected the boilerplate clique without the cap, got ${uncapped.size} pairs")
  }

  test("collocations: known pair tops a constructed corpus with exact lift") {
    import spark.implicits._
    // "new york" always co-occurs; "the" is everywhere (high c1·c2 kills
    // its lift); pad tokens spread mass. 8 docs × "new york" + filler.
    val docs = (0 until 8).map(i =>
      (i.toLong, s"new york the pad$i the", "en", "s", 0L)) :+
      ((8L, "the the the the the", "en", "s", 0L))
    val dir = java.nio.file.Files.createTempDirectory("colloc").toString
    docs.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val top = NgramLm.collocations(spark, dir).collect()
    assert(top.nonEmpty)
    val first = top.head
    assert(first.getString(0) == "new" && first.getString(1) == "york")
    // lift = c12·T/(c1·c2): c12=8, T=45 tokens, c_new=8, c_york=8
    assert(first.getLong(2) == 8L)
    assert(math.abs(first.getDouble(3) - 8.0 * 45 / (8 * 8)) < 1e-12)
    // pairs under the count floor never appear
    assert(top.forall(_.getLong(2) >= NgramLm.MinPairCount))
  }
}

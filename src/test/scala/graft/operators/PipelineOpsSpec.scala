package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sources.Tables

/** Specs for the round-5 training-pipeline additions: sequence packing
  * (distributed prefix sum), temperature mixture sampling, and int8
  * scalar quantization. The DuckDB oracle covers value parity; these
  * cover the invariants the oracle can't see (prefix-sum contiguity
  * under repartitioning, mixture probability law, quantization error
  * bounds). */
class PipelineOpsSpec extends SparkSpec {

  test("pack_sequences: offsets are a contiguous gap-free token stream") {
    val rows = Packing.packSequences(spark, sf, blockLen = 512)
      .orderBy("doc_id").collect()
    assert(rows.nonEmpty)
    // stream starts at 0 and every document begins where the previous ended
    var expected = 0L
    rows.foreach { r =>
      assert(r.getAs[Long]("start_tok") == expected,
        s"doc ${r.getAs[Long]("doc_id")} expected offset $expected")
      expected = r.getAs[Long]("start_tok") + r.getAs[Long]("nt") + 1L
    }
    // block arithmetic: n_blocks consistent with the straddle count
    rows.foreach { r =>
      val s = r.getAs[Long]("start_tok"); val e = s + r.getAs[Long]("nt")
      assert(r.getAs[Long]("first_block") == s / 512)
      assert(r.getAs[Long]("last_block") == e / 512)
      assert(r.getAs[Long]("n_blocks") == e / 512 - s / 512 + 1)
    }
  }

  test("pack_sequences: result is invariant to input partitioning") {
    val a = Packing.packSequences(spark, sf).collect().toSeq
    val b = Packing.packSequences(spark, sf).collect().toSeq // fresh range sample
    assert(a == b)
  }

  test("ds_mixture: per-domain take matches the α-weighted law") {
    val docs = Tables.documents(spark, sf)
    val total = docs.count()
    val kept = Sampling.mixtureSample(spark, sf, target = 200.0, alpha = 0.5)
    val keptBySrc = kept.groupBy("source").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val cnts = docs.groupBy("source").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val s = cnts.values.map(c => math.pow(c.toDouble, 0.5)).sum
    cnts.foreach { case (src, c) =>
      val p = math.min(1.0, 200.0 * math.pow(c.toDouble, 0.5) / s / c)
      val exp = p * c
      val got = keptBySrc.getOrElse(src, 0L).toDouble
      // Bernoulli at p over c rows: allow 4 sigma
      val tol = 4.0 * math.sqrt(c * p * (1 - p)) + 1e-9
      assert(math.abs(got - exp) <= tol, s"$src: got $got expected $exp ± $tol")
    }
    assert(kept.count() <= total)
  }

  test("ds_mixture: deterministic and stable under corpus append") {
    // appending rows never flips an existing row's md5 threshold decision
    // as long as the domain rates are pinned; with rates recomputed the
    // decision only changes via p — re-running on identical input is
    // byte-stable.
    val a = Sampling.mixtureSample(spark, sf).collect().toSeq
    val b = Sampling.mixtureSample(spark, sf).collect().toSeq
    assert(a == b)
  }

  test("ds_shuffle: a permutation of the corpus, balanced shards, seed changes the order") {
    val n = Tables.documents(spark, sf).count()
    val a = Sampling.globalShuffle(spark, sf).collect()
    assert(a.length.toLong == n, "shuffle dropped or duplicated rows")
    assert(a.map(_.getAs[Long]("doc_id")).distinct.length.toLong == n)
    // per-shard positions are 1..size(shard), gap-free
    a.groupBy(_.getAs[Int]("shard")).foreach { case (s, rows) =>
      val ps = rows.map(_.getAs[Int]("pos")).sorted.toSeq
      assert(ps == (1 to rows.length), s"shard $s positions not contiguous")
    }
    // md5 nibble shards are balanced within 3x of uniform
    val sizes = a.groupBy(_.getAs[Int]("shard")).values.map(_.length)
    assert(sizes.max <= 3 * math.max(1, (n / 16).toInt), s"skewed shards: $sizes")
    // a different seed produces a different order (not the identity map)
    val b = Sampling.globalShuffle(spark, sf, seed = "ep1").collect()
    val ka = a.map(r => (r.getAs[Int]("shard"), r.getAs[Int]("pos"), r.getAs[Long]("doc_id"))).toSet
    val kb = b.map(r => (r.getAs[Int]("shard"), r.getAs[Int]("pos"), r.getAs[Long]("doc_id"))).toSet
    assert(ka != kb, "seed does not change the shuffle")
  }

  test("ds_token_budget: fits the budget, greedy by quality, deterministic") {
    val budget = 10000L
    val kept = Sampling.tokenBudgetSelect(spark, sf, budget).collect()
    assert(kept.nonEmpty)
    val total = kept.map(_.getAs[Long]("nt")).sum
    assert(total <= budget, s"selection overspends: $total > $budget")
    // greedy: every kept doc's bucket >= every dropped doc's bucket,
    // except inside the single cutoff bucket
    val keptIds = kept.map(_.getAs[Long]("doc_id")).toSet
    val minKeptBucket = kept.map(_.getAs[Double]("bucket")).min
    val alpha = length(regexp_replace(col("text"), "[^A-Za-z]", ""))
      .cast("double") / length(col("text"))
    val dropped = Tables.documents(spark, sf)
      .select(col("doc_id"), round(round(alpha, 6), 3).as("bucket"))
      .collect().filterNot(r => keptIds(r.getAs[Long]("doc_id")))
    assert(dropped.forall(_.getAs[Double]("bucket") <= minKeptBucket),
      "a dropped doc outranks a kept one outside the cutoff bucket")
    // the budget is actually binding (next-cheapest dropped doc wouldn't fit
    // inside its bucket's residual) and the result is deterministic
    assert(dropped.nonEmpty, "budget not binding on the fixture")
    val again = Sampling.tokenBudgetSelect(spark, sf, budget).collect()
    assert(kept.map(_.toString).sorted.toSeq == again.map(_.toString).sorted.toSeq)
  }

  test("sq_int8: codes bounded, decode within half-step, error bound holds") {
    val amax = Quantize.absMax(spark, sf)
    assert(amax.forall(_ > 0.0))
    val enc = Quantize.int8Encode(spark, sf)
    val rows = enc.collect()
    assert(rows.nonEmpty)
    val dims = amax.length
    // worst-case per-dim decode error is half a quantization step
    val worst = math.sqrt(amax.map(m => math.pow(m / 127.0 / 2.0, 2)).sum) + 1e-9
    rows.foreach { r =>
      val codes = r.getAs[collection.Seq[Int]]("codes")
      assert(codes.length == dims)
      assert(codes.forall(c => c >= -127 && c <= 127))
      assert(r.getAs[Double]("err") <= worst)
    }
    // decode really is x ≈ c·amax/127: check one vector end to end
    val first = Tables.embeddings(spark, sf).orderBy("vec_id").limit(1)
      .select("embedding").collect()(0).getAs[collection.Seq[Float]](0)
    val c0 = rows.minBy(_.getAs[Long]("vec_id")).getAs[collection.Seq[Int]]("codes")
    first.indices.foreach { i =>
      val dec = c0(i) * amax(i) / 127.0
      assert(math.abs(first(i) - dec) <= amax(i) / 127.0 / 2.0 + 1e-12)
    }
  }

  test("sq_binary: every packed bit is the dimension's sign") {
    val vecs = Tables.embeddings(spark, sf).select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getAs[collection.Seq[Float]](1)).toMap
    val rows = Quantize.binaryEncode(spark, sf).collect()
    assert(rows.length == vecs.size)
    rows.foreach { r =>
      val v = vecs(r.getAs[Long]("vec_id"))
      val lo = r.getAs[Long]("bits_lo"); val hi = r.getAs[Long]("bits_hi")
      (0 until 32).foreach { i =>
        assert(((lo >> i) & 1L) == (if (v(i) > 0f) 1L else 0L))
        assert(((hi >> i) & 1L) == (if (v(i + 32) > 0f) 1L else 0L))
      }
    }
  }

  test("ann_binary_top1: asymmetric 8-byte serve tier recovers the exact top-1") {
    import org.apache.spark.sql.expressions.Window
    import graft.plans.VectorOps.dot
    val e = Tables.embeddings(spark, sf)
      .select(col("vec_id"), transform(col("embedding"), x => x.cast("double")).as("v"))
    val q = e.filter(col("vec_id") < Similarity.QuerySetSize)
      .select(col("vec_id").as("q_id"), col("v").as("vq"))
    val w = Window.partitionBy("q_id").orderBy(round(col("cs"), 6).desc, col("nbr_id"))
    val exact = broadcast(q)
      .join(e.select(col("vec_id").as("nbr_id"), col("v").as("vn")),
        col("q_id") =!= col("nbr_id"))
      .withColumn("cs", dot(col("vq"), col("vn")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") === 1)
      .select("q_id", "nbr_id")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val got = Quantize.binaryTop1(spark, sf).collect()
      .map(r => r.getAs[Long]("q_id") -> r.getAs[Long]("nbr_id")).toMap
    assert(got == exact)
  }
}

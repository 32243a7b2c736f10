package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sources.Tables

/** HLL sketch laws for [[Sketches]]: the merge law (union of
  * per-partition sketches ≡ one sketch over everything — the property
  * that makes the sketch table incrementally maintainable), accuracy
  * within the published bound, and the exported gate itself. */
class SketchSpec extends SparkSpec {

  test("merge law: union of per-day sketches equals the one-shot sketch per type") {
    val merged = Sketches.mergedEstimates(spark, sf).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val oneShot = Tables.events(spark, sf)
      .groupBy("event_type")
      .agg(hll_sketch_estimate(hll_sketch_agg(col("user_id"), Sketches.LgK)).as("est"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(merged.nonEmpty && merged == oneShot,
      s"per-day union drifted from the direct sketch: $merged vs $oneShot")
  }

  test("estimates within the published error of exact distincts; gate all-green") {
    val exact = Tables.events(spark, sf)
      .groupBy("event_type").agg(countDistinct("user_id").as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val est = Sketches.mergedEstimates(spark, sf).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(est.keySet == exact.keySet)
    est.foreach { case (t, e) =>
      val x = exact(t)
      assert(math.abs(e.toDouble - x) / x < Sketches.GateTol,
        s"type $t: estimate $e vs exact $x breaks the ${Sketches.GateTol} bound")
    }
    // the registered gate row agrees (export + read-back path included)
    Sketches.exportEstimates(spark, sf)
    val gate = Sketches.sketchDistinctGate(spark, sf).collect()
    assert(gate.nonEmpty && gate.forall(_.getAs[Boolean]("est_ok")))
    assert(gate.map(r => r.getString(0) -> r.getAs[Long]("exact_users")).toMap == exact)
  }

  test("day-range gate: range union equals a direct sketch of the range; gate green") {
    val ranged = Sketches.rangeEstimates(spark, sf).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // direct one-shot sketch over the SAME first-half slice of raw events
    val ev = Tables.events(spark, sf).select(col("user_id"), col("event_type"),
      to_date(col("ts")).as("day"))
    val cut = ev.agg(date_add(min(col("day")),
      (datediff(max(col("day")), min(col("day"))) / 2).cast("int"))).collect()(0).getDate(0)
    val direct = ev.filter(col("day") <= lit(cut))
      .groupBy("event_type")
      .agg(hll_sketch_estimate(hll_sketch_agg(col("user_id"), Sketches.LgK)).as("est"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(ranged.nonEmpty && ranged == direct)
    // the range genuinely excludes data (fewer EVENTS; distinct-user
    // sets may saturate inside the half on the small fixture)
    assert(ev.filter(col("day") <= lit(cut)).count() < ev.count())
    Sketches.exportEstimates(spark, sf)
    val gate = Sketches.sketchRangeGate(spark, sf).collect()
    assert(gate.nonEmpty && gate.forall(_.getAs[Boolean]("est_ok")))
  }

  test("kll: merged daily sketches hit exact quantile ranks within tolerance; gate green") {
    // exact per-type ranks of the estimates (the gate's own math, plus a
    // direct check of the KLL published bound at a TIGHTER 2% tolerance
    // than the gate's 5% — n≈200/type at sf0.001 is well inside k=200,
    // so the sketch should be near-exact here)
    Sketches.exportEstimates(spark, sf)
    val est = spark.read.parquet(Sketches.kllExportPath(sf)).collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    assert(est.nonEmpty)
    val values = Tables.events(spark, sf).select("event_type", "value").collect()
      .map(r => r.getString(0) -> r.getDouble(1))
      .groupBy(_._1).map { case (t, vs) => t -> vs.map(_._2).sorted }
    est.foreach { case (t, (p50, p95)) =>
      val vs = values(t)
      val r50 = vs.count(_ <= p50).toDouble / vs.length
      val r95 = vs.count(_ <= p95).toDouble / vs.length
      assert(math.abs(r50 - 0.5) < 0.02, s"$t p50 rank $r50")
      assert(math.abs(r95 - 0.95) < 0.02, s"$t p95 rank $r95")
      // estimates are real data values (KLL returns retained items)
      assert(vs.contains(p50) && vs.contains(p95))
    }
    val gate = Sketches.kllGate(spark, sf).collect()
    assert(gate.nonEmpty && gate.forall(r =>
      r.getAs[Boolean]("p50_ok") && r.getAs[Boolean]("p95_ok")))
  }

  test("kll merge law: unioning per-day sketches answers like a one-shot sketch") {
    import graft.functions.KllBuildAgg.{kllAgg, kllQuantile}
    // KLL compaction is randomized, so bytes are not comparable — the law
    // is checked in RANK space at the gate tolerance on both paths
    val merged = Sketches.kllEstimates(spark, sf).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    val oneShot = Tables.events(spark, sf)
      .groupBy("event_type").agg(kllAgg(col("value")).as("sk"))
      .select(col("event_type"), kllQuantile(col("sk"), lit(0.5)).as("p50"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val values = Tables.events(spark, sf).select("event_type", "value").collect()
      .map(r => r.getString(0) -> r.getDouble(1))
      .groupBy(_._1).map { case (t, vs) => t -> vs.map(_._2) }
    merged.keySet.foreach { t =>
      val vs = values(t)
      val rm = vs.count(_ <= merged(t)).toDouble / vs.size
      val ro = vs.count(_ <= oneShot(t)).toDouble / vs.size
      assert(math.abs(rm - ro) < Sketches.KllRankTol, s"$t merged-rank $rm vs one-shot $ro")
    }
  }

  test("theta: exact mode below k — estimates equal exact distincts, gate green") {
    import graft.functions.ThetaBuildAgg.{thetaAgg, thetaEstimate}
    // fixture user counts sit far below 2^lgK, so sketches are exact
    val est = Tables.events(spark, sf)
      .groupBy("event_type").agg(thetaEstimate(thetaAgg(col("user_id"))).as("est"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val exact = Tables.events(spark, sf)
      .groupBy("event_type").agg(countDistinct("user_id").as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(est.nonEmpty && est.keySet == exact.keySet)
    est.foreach { case (t, e) => assert(e == exact(t).toDouble, s"$t: $e vs ${exact(t)}") }
    Sketches.exportEstimates(spark, sf)
    val gate = Sketches.thetaOverlapGate(spark, sf).collect()
    assert(gate.nonEmpty && gate.forall(r =>
      r.getAs[Boolean]("inter_ok") && r.getAs[Boolean]("union_ok")))
  }

  test("theta merge law: union of per-day sketches equals the one-shot sketch") {
    import graft.functions.ThetaBuildAgg.{thetaAgg, thetaUnionAgg, thetaEstimate}
    val merged = Sketches.thetaDailySketches(spark, sf)
      .groupBy("event_type")
      .agg(thetaEstimate(thetaUnionAgg(col("sk"))).as("est"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val oneShot = Tables.events(spark, sf)
      .groupBy("event_type").agg(thetaEstimate(thetaAgg(col("user_id"))).as("est"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(merged.nonEmpty && merged == oneShot,
      s"per-day theta union drifted: $merged vs $oneShot")
  }

  test("theta set ops: constructed overlap recovered exactly in exact mode") {
    import spark.implicits._
    import graft.functions.ThetaBuildAgg._
    // A = [0, 1000), B = [700, 1700) → |A∩B| = 300, |A∪B| = 1700, |A\B| = 700
    val sk = (0L until 1000L).map(("a", _)).++((700L until 1700L).map(("b", _)))
      .toDF("s", "v").groupBy("s").agg(thetaAgg(col("v")).as("sk"))
      .collect().map(r => r.getString(0) -> r.getAs[Array[Byte]]("sk")).toMap
    val pair = Seq((sk("a"), sk("b"))).toDF("a", "b")
      .select(thetaIntersectEstimate(col("a"), col("b")).as("i"),
        thetaUnionEstimate(col("a"), col("b")).as("u"),
        thetaDiffEstimate(col("a"), col("b")).as("d"))
      .collect()(0)
    assert(pair.getDouble(0) == 300.0 && pair.getDouble(1) == 1700.0 &&
      pair.getDouble(2) == 700.0, s"got $pair")
  }

  test("theta source-content overlap: exact mode recovers exact shared-shingle counts") {
    Sketches.exportEstimates(spark, sf)
    val gate = Sketches.thetaSourceGate(spark, sf).collect()
    assert(gate.nonEmpty, "no source pair shares content on the fixture")
    assert(gate.forall(_.getAs[Boolean]("inter_ok")))
    // below 2^lgK retained entries the sketches are exact: the exported
    // estimate must EQUAL the exact count, not just sit within tolerance
    val est = spark.read.parquet(Sketches.thetaSourceExportPath(sf)).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2)).toMap
    gate.foreach { r =>
      val k = (r.getString(0), r.getString(1))
      assert(est(k) == r.getLong(2).toDouble, s"pair $k: ${est(k)} vs ${r.getLong(2)}")
    }
  }

  test("theta sampling mode: estimate within the published bound past k entries") {
    import spark.implicits._
    import graft.functions.ThetaBuildAgg.{thetaAgg, thetaEstimate, DefaultLgK}
    // 60k distinct items >> k=4096 → sampling mode; RSE = 1/√k ≈ 1.56%,
    // gate at 4σ — a failure means broken plumbing, not sketch noise
    val n = 60000
    val est = (0L until n.toLong).toDF("v")
      .repartition(8) // exercise partial merges across partitions
      .agg(thetaEstimate(thetaAgg(col("v"))).as("est"))
      .collect()(0).getDouble(0)
    assert(math.abs(est - n) / n < 4.0 / math.sqrt(1 << DefaultLgK),
      s"estimate $est vs $n breaks the published bound")
  }

  test("incremental append: yesterday's merged sketch + today's delta = full answer") {
    import spark.implicits._
    // split the sketch table by day parity — the stand-in for an
    // already-persisted history plus a newly ingested partition
    val daily = Sketches.dailySketches(spark, sf)
      .withColumn("half", (dayofyear(col("day")) % 2 === 0))
    def unionEst(half: Boolean) = daily.filter(col("half") === half)
      .groupBy("event_type").agg(hll_union_agg(col("sk")).as("sk"))
    val full = unionEst(true).unionByName(unionEst(false))
      .groupBy("event_type")
      .agg(hll_sketch_estimate(hll_union_agg(col("sk"))).as("est"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val direct = Sketches.mergedEstimates(spark, sf).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(full == direct, "re-merging persisted partial unions drifted")
  }
}

package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Relational, Similarity}
import graft.sources.Tables

/** Physical-plan quality gates (the "is this the plan you'd want" check):
  * pushdown reaches the scans, dimension joins broadcast, hot paths stay
  * inside WholeStageCodegen, and the native dot-product expression is
  * bit-identical to the higher-order-function form. */
class PlanSpec extends AnyFunSuite {

  val sf = "/root/testdata/sf0.001"

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", 4)
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.extensions", "graft.plans.GraftExtensions")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def planOf(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("q1: filter and projection push into the parquet scan") {
    val plan = planOf(Relational.q1FilterProject(spark, sf))
    assert(plan.contains("PushedFilters:") &&
      (plan.contains("EqualTo(l_returnflag,R)") || plan.contains("l_returnflag")),
      s"missing pushed filter:\n$plan")
    // column pruning: scan must NOT read l_tax (unused)
    assert(!plan.contains("l_tax"), "scan reads unused column l_tax")
  }

  test("q3: dimension joins are broadcast, no shuffle of the fact side for dims") {
    val plan = planOf(Relational.q3Join(spark, sf))
    assert(plan.contains("BroadcastHashJoin"), s"no broadcast join:\n$plan")
  }

  test("q2: aggregation is partial+final hash aggregate inside codegen") {
    val df = Relational.q2Agg(spark, sf)
    df.collect() // finalize the adaptive plan so codegen stages materialize
    val plan = planOf(df)
    assert(plan.contains("HashAggregate"), s"no hash aggregate:\n$plan")
    assert(plan.contains("partial_"), s"no partial aggregation:\n$plan")
    val codegen = df.queryExecution.explainString(
      org.apache.spark.sql.execution.CodegenMode)
    assert(codegen.contains("WholeStageCodegen"), s"no codegen:\n${codegen.take(500)}")
  }

  test("q7: as-of join is a window pass, not a nested-loop join") {
    val plan = planOf(Relational.q7AsOfJoin(spark, sf))
    assert(plan.contains("Window"), s"no window:\n$plan")
    assert(!plan.contains("NestedLoop") && !plan.contains("CartesianProduct"),
      s"quadratic join shape:\n$plan")
  }

  test("simhash pairs: pigeonhole banding is an equi join, not a nested loop") {
    val df = graft.operators.Dedup.simhashPairs(spark, sf)
    df.collect() // finalize the adaptive plan
    val plan = planOf(df)
    assert(!plan.contains("NestedLoop") && !plan.contains("CartesianProduct"),
      s"quadratic pair join shape:\n$plan")
  }

  test("bucketed embedding near-dup and multi-probe LSH are equi joins, not nested loops") {
    Seq(
      graft.operators.Dedup.embeddingCosineBucketed(spark, sf),
      Similarity.lshTopK(spark, sf)
    ).foreach { df =>
      df.collect() // finalize the adaptive plan
      val plan = planOf(df)
      assert(!plan.contains("NestedLoop") && !plan.contains("CartesianProduct"),
        s"quadratic join shape:\n$plan")
    }
  }

  test("dedup repartition is conditional: pre-split input takes no Exchange") {
    // another suite in the same JVM may have left this frame in a
    // PersistSlots slot — a cached InMemoryRelation would hide the
    // repartition this test inspects; drop caches for an order-
    // independent plan check
    graft.operators.ArtifactCaches.clear()
    spark.catalog.clearCache()
    // single-file fixture: the fan-in scan must be spread for parallelism
    val single = graft.operators.Dedup.simhash64(spark, sf)
    assert(single.queryExecution.optimizedPlan.toString.contains("RepartitionByExpression"),
      "single-split input should be repartitioned for parallel hashing")
    // pre-split corpus (≥ defaultParallelism input splits): the same
    // operator must NOT buy a full-corpus shuffle of the raw text
    val dir = java.nio.file.Files.createTempDirectory("presplit").toString
    Tables.documents(spark, sf).repartition(8)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val spread = graft.operators.Dedup.simhash64(spark, dir)
    assert(!spread.queryExecution.optimizedPlan.toString.contains("RepartitionByExpression"),
      "pre-split input must not be repartitioned")
    // results identical either way
    assert(spread.collect().toSeq == single.collect().toSeq)
  }

  test("ANN/near-dup candidate joins are id-only: no array column through the dedup") {
    import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Join}
    import org.apache.spark.sql.types.ArrayType
    // the fan-out join and the candidate dedup must carry ids only; the
    // 64-dim vectors join back AFTER dedup (measured 9.6 s vs 1.6 s at
    // sf0.1 in the dedup path — the shape that survives a large query set)
    val cases = Seq(
      ("lshTopK", Similarity.lshTopK(spark, sf), Set("q_id", "nbr_id")),
      ("ivfTopK", Similarity.ivfTopK(spark, sf), Set("q_id", "nbr_id")),
      ("embeddingCosineBucketed", graft.operators.Dedup.embeddingCosineBucketed(spark, sf),
        Set("a_id", "b_id")))
    cases.foreach { case (name, df, idCols) =>
      val lp = df.queryExecution.optimizedPlan
      val dedups = lp.collect {
        case a: Aggregate if a.output.map(_.name).toSet == idCols => a
      }
      assert(dedups.nonEmpty, s"$name: candidate dedup aggregate not found:\n$lp")
      dedups.foreach { a =>
        assert(!a.child.output.exists(_.dataType.isInstanceOf[ArrayType]),
          s"$name: array column enters the candidate dedup:\n${a.child.output}")
        a.collect { case j: Join => j }.foreach { j =>
          assert(!j.output.exists(_.dataType.isInstanceOf[ArrayType]),
            s"$name: array column rides the candidate join:\n${j.output}")
        }
      }
    }
  }

  test("IVF-PQ candidate fan-out carries byte codes, never corpus vectors") {
    import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Join}
    import org.apache.spark.sql.types.ArrayType
    // the PQ contract: the cell fan-out join and candidate dedup ship
    // (q_id, nbr_id, code) — 8-byte codes — and the full vectors appear
    // only in the final rerank·|Q|-row exact re-rank join
    val df = Similarity.ivfPqTopK(spark, sf)
    val lp = df.queryExecution.optimizedPlan
    // the optimizer folds the ADC projection into the dedup itself:
    // Aggregate [q_id, nbr_id] emitting adc straight from first(code) —
    // codes never even survive past the dedup
    val dedups = lp.collect {
      case a: Aggregate
          if a.groupingExpressions.collect {
            case ne: org.apache.spark.sql.catalyst.expressions.NamedExpression => ne.name
          }.toSet == Set("q_id", "nbr_id") &&
            a.child.output.exists(_.name == "code") => a
    }
    assert(dedups.nonEmpty, s"PQ candidate dedup aggregate not found:\n$lp")
    dedups.foreach { a =>
      assert(!a.child.output.exists(_.dataType.isInstanceOf[ArrayType]),
        s"array column enters the PQ candidate dedup:\n${a.child.output}")
      a.collect { case j: Join => j }.foreach { j =>
        assert(!j.output.exists(_.dataType.isInstanceOf[ArrayType]),
          s"array column rides the PQ candidate join:\n${j.output}")
      }
    }
  }

  test("native dot product is bit-identical to zip_with+aggregate") {
    val e = Tables.embeddings(spark, sf)
      .select(col("vec_id"), transform(col("embedding"), x => x.cast("double")).as("v"))
      .limit(100)
    val a = e.select(col("vec_id").as("a_id"), col("v").as("va"))
    val b = e.select(col("vec_id").as("b_id"), col("v").as("vb"))
    val pairs = a.join(b, col("a_id") < col("b_id")).cache()
    val native = pairs.select(col("a_id"), col("b_id"),
      VectorOps.dot(col("va"), col("vb")).as("d")).collect()
    val hof = pairs.select(col("a_id"), col("b_id"),
      aggregate(zip_with(col("va"), col("vb"), _ * _), lit(0.0), _ + _).as("d")).collect()
    assert(native.length == hof.length && native.nonEmpty)
    native.zip(hof).foreach { case (n, h) =>
      assert(n.getDouble(2) == h.getDouble(2), s"${n.getLong(0)},${n.getLong(1)}")
    }
  }

  test("graft_dot is registered for SQL via SparkSessionExtensions") {
    // suites share one JVM session; if another suite built it first the
    // extensions config never ran — the on-session registrar covers that
    GraftExtensions.register(spark)
    Tables.embeddings(spark, sf).createOrReplaceTempView("emb_plan_test")
    val r = spark.sql(
      """SELECT graft_dot(CAST(embedding AS ARRAY<DOUBLE>), CAST(embedding AS ARRAY<DOUBLE>)) d
        |FROM emb_plan_test LIMIT 5""".stripMargin).collect()
    assert(r.length == 5)
    r.foreach(row => assert(math.abs(row.getDouble(0) - 1.0) < 1e-4)) // unit vectors
  }

  test("partitioned parquet layout gives partition pruning (100 TB story)") {
    import graft.materials.Materials
    val dir = java.nio.file.Files.createTempDirectory("mat_part").toString
    Materials.readJson(spark)
      .withColumn("crystal_system", col("spacegroup.crystal_system"))
      .write.partitionBy("crystal_system").mode("overwrite").parquet(dir)
    val cubicOnly = spark.read.parquet(dir)
      .filter(col("crystal_system") === "cubic")
      .select("mp_id", "band_gap")
    cubicOnly.collect()
    val plan = cubicOnly.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") &&
      plan.contains("crystal_system"), s"no partition pruning:\n${plan.take(800)}")
    assert(cubicOnly.count() == 87) // verified corpus count for cubic
  }

  test("optimizer rule fuses eig-mean to trace/3 and matches stored averages") {
    import graft.materials.Materials
    // suites share one JVM session (may lack the extensions config):
    // extraOptimizations is the session-agnostic way to add the rule
    if (!spark.experimental.extraOptimizations.contains(FuseEigMean))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ FuseEigMean
    val mats = Materials.readJson(spark).limit(50)
      .select(col("mp_id"),
        MaterialOps.epsAvg(col("dielectric.epsilon_electronic")).as("calc"),
        col("dielectric.epsilon_electronic_avg").as("stored"))
    // the rule must have rewritten the expression away
    val optimized = mats.queryExecution.optimizedPlan.toString
    assert(!optimized.contains("graft_eig_mean"), s"fusion did not fire:\n$optimized")
    // and trace/3 equals the stored mean-of-eigenvalues (exact identity)
    mats.collect().foreach { r =>
      assert(math.abs(r.getDouble(1) - r.getDouble(2)) < 1e-6,
        s"${r.getString(0)}: ${r.getDouble(1)} vs ${r.getDouble(2)}")
    }
  }

  test("bucketed tables join without a shuffle (co-located join story)") {
    val s2 = spark.newSession()
    // warehouse.dir is static; default (./spark-warehouse) is fine for temp
    // tables — but a fresh in-memory catalog won't know about leftover
    // locations from an earlier JVM, so clear them first
    Seq("orders_b", "lineitem_b").foreach { t =>
      val p = java.nio.file.Paths.get(s"spark-warehouse/$t")
      if (java.nio.file.Files.exists(p)) {
        import scala.jdk.CollectionConverters._
        java.nio.file.Files.walk(p).iterator().asScala.toSeq.reverse
          .foreach(java.nio.file.Files.delete)
      }
    }
    s2.conf.set("spark.sql.autoBroadcastJoinThreshold", -1)
    Tables.orders(s2, sf).write.bucketBy(4, "o_orderkey").sortBy("o_orderkey")
      .mode("overwrite").saveAsTable("orders_b")
    Tables.lineitem(s2, sf).write.bucketBy(4, "l_orderkey").sortBy("l_orderkey")
      .mode("overwrite").saveAsTable("lineitem_b")
    val joined = s2.table("orders_b")
      .join(s2.table("lineitem_b"), col("o_orderkey") === col("l_orderkey"))
      .groupBy("o_orderstatus").count()
    joined.collect()
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"),
      s"unexpected join:\n${plan.take(600)}")
    // the join itself must not shuffle either side (bucket co-location);
    // only the final small aggregation exchanges
    val joinPart = plan.substring(plan.indexOf("Join"))
    val exchangesBelowJoin = "Exchange hashpartitioning\\((o_orderkey|l_orderkey)".r
      .findAllIn(plan).size
    assert(exchangesBelowJoin == 0, s"join key shuffle present:\n${plan.take(900)}")
  }

  test("AQE splits skewed join partitions at runtime") {
    val s3 = spark.newSession()
    s3.conf.set("spark.sql.adaptive.enabled", true)
    s3.conf.set("spark.sql.adaptive.skewJoin.enabled", true)
    s3.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "64KB")
    s3.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "32KB")
    s3.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", 2)
    s3.conf.set("spark.sql.autoBroadcastJoinThreshold", -1)
    import org.apache.spark.sql.functions.{col, when}
    // 90% of the fact rows share one key → one shuffle partition dwarfs the rest
    val fact = s3.range(300000)
      .select(when(col("id") % 10 =!= 0, 0L).otherwise(col("id")).as("k"), col("id").as("v"))
    val dim = s3.range(30000).select(col("id").as("k"), (col("id") * 2).as("w"))
    val joined = fact.join(dim, "k")
    // execute THIS dataframe (count() builds a different queryExecution and
    // the adaptive plan would stay isFinalPlan=false here)
    assert(joined.collect().length > 0)
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("skew=true"), s"skew split did not fire:\n${plan.take(800)}")
  }

  test("similarity pipeline stays in codegen (no UDF in the hot path)") {
    val plan = planOf(Similarity.bruteForceTopK(spark, sf))
    assert(!plan.contains("BatchEvalPython") && !plan.contains("ScalaUDF"),
      s"UDF in hot path:\n$plan")
  }
}

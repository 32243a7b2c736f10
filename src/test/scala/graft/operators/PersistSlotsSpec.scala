package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Contract of the memoized materialization slots — in particular the
  * lineage-cut [[PersistSlots.cachedCheckpoint]] variant q33_triangles
  * relies on to keep its edge-build shuffle files reclaimable
  * (Graphs.scala; BENCH_NOTES r8). */
class PersistSlotsSpec extends SparkSpec {

  private def shuffleBuild() = {
    import spark.implicits._
    (1 to 1000).toDF("x")
      .groupBy(col("x") % 7 as "k").agg(sum("x").as("s")) // forces an exchange
  }

  test("cachedCheckpoint memoizes per key and preserves the built values") {
    var builds = 0
    def build = { builds += 1; shuffleBuild() }
    val key = s"spec-ckpt-${System.nanoTime()}"
    val a = PersistSlots.cachedCheckpoint(spark, key)(build)
    val b = PersistSlots.cachedCheckpoint(spark, key)(build)
    assert(builds == 1, "second call must serve the memoized frame")
    assert(a eq b)
    val expect = shuffleBuild().collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(a.collect().map(r => r.getInt(0) -> r.getLong(1)).toMap == expect)
  }

  test("cachedCheckpoint cuts lineage: the served plan is a scan, not the build") {
    // the point of the variant — the consumer's plan must NOT reference
    // the build's exchanges (a reachable ShuffleDependency pins its
    // shuffle files on disk for the consumer job's whole runtime)
    val key = s"spec-ckpt-lineage-${System.nanoTime()}"
    val df = PersistSlots.cachedCheckpoint(spark, key)(shuffleBuild())
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"),
      s"checkpointed frame still carries its build exchanges:\n$plan")
    // the plain cached() variant intentionally KEEPS lineage (recompute
    // safety); pin the difference so a refactor can't silently swap them
    val key2 = s"spec-persist-lineage-${System.nanoTime()}"
    val df2 = PersistSlots.cached(spark, key2)(shuffleBuild())
    val analyzed2 = df2.queryExecution.analyzed.toString
    assert(analyzed2.contains("Aggregate") || analyzed2.contains("Project"),
      s"persisted frame lost its logical build lineage:\n$analyzed2")
    PersistSlots.clear()
  }
}

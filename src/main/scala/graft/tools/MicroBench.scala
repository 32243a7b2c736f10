package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Disposable micro-benchmarks for isolating per-row costs seen in
  * PhaseTime (probe-only; not a registered query).
  * Env knobs: GRAFT_MICRO_CPUS (default 32), GRAFT_MICRO_AQE (default true),
  * GRAFT_MICRO_PARTS (default 32; cache + shuffle partition count). */
object MicroBench {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("GRAFT_MICRO_CPUS", "32")
    val aqe = sys.env.getOrElse("GRAFT_MICRO_AQE", "true")
    val parts = sys.env.getOrElse("GRAFT_MICRO_PARTS", "32").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", parts)
      .config("spark.sql.adaptive.enabled", aqe)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time(tag: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(f"[micro] $tag ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }

    // synthetic edges shaped like q32's cached frame: 907k rows x 3 longs
    val edges = spark.range(907000).select(
      (col("id") % 1000).as("src"), ((col("id") * 7) % 1000).as("dst"),
      (col("id") % 900 + 1).as("outdeg"))
      .repartition(parts).persist()
    edges.count()
    val ranks = spark.range(1000).select(col("id").as("src"), lit(0.001).as("r"))

    (1 to 3).foreach { i =>
      time(s"noop-32task #$i") { spark.range(32 * 1000).repartition(parts).foreach(_ => ()) }
      time(s"scan-only #$i") { edges.select(sum("src")).collect() }
      time(s"join-agg #$i") {
        edges.join(ranks, Seq("src"))
          .groupBy("dst").agg(sum(col("r") / col("outdeg")).as("inflow"))
          .queryExecution.toRdd.count()
      }
      time(s"join-agg-bhint #$i") {
        edges.join(broadcast(ranks), Seq("src"))
          .groupBy("dst").agg(sum(col("r") / col("outdeg")).as("inflow"))
          .queryExecution.toRdd.count()
      }
    }
    // 5 chained rounds, like pagerank
    (1 to 2).foreach { i =>
      time(s"5-round chain #$i") {
        var r = ranks
        for (_ <- 1 to 5) {
          r = edges.join(r, Seq("src"))
            .groupBy(col("dst").as("src")).agg(sum(col("r") / col("outdeg")).as("r"))
        }
        r.queryExecution.toRdd.count()
      }
      time(s"5-round chain bhint #$i") {
        var r = ranks
        for (_ <- 1 to 5) {
          r = edges.join(broadcast(r), Seq("src"))
            .groupBy(col("dst").as("src")).agg(sum(col("r") / col("outdeg")).as("r"))
        }
        r.queryExecution.toRdd.count()
      }
    }
    // same chain over a localCheckpoint'd (row-block) edge frame: is the
    // per-round CPU the columnar cache decode?
    val edgesLc = spark.range(907000).select(
      (col("id") % 1000).as("src"), ((col("id") * 7) % 1000).as("dst"),
      (col("id") % 900 + 1).as("outdeg"))
      .repartition(parts).localCheckpoint()
    (1 to 2).foreach { i =>
      time(s"scan-only-lc #$i") { edgesLc.select(sum("src")).collect() }
      time(s"5-round chain lc #$i") {
        var r = ranks
        for (_ <- 1 to 5) {
          r = edgesLc.join(r, Seq("src"))
            .groupBy(col("dst").as("src")).agg(sum(col("r") / col("outdeg")).as("r"))
        }
        r.queryExecution.toRdd.count()
      }
    }
    spark.stop()
  }
}

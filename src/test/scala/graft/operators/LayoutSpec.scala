package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sources.Tables

/** Partitioned layout: planning-time pruning and content equality. */
class LayoutSpec extends SparkSpec {

  test("date-partitioned events: day filter becomes a PartitionFilter touching 1 day of files") {
    val out = java.nio.file.Files.createTempDirectory("graft_events_part").toString
    try {
      Layout.partitionEvents(spark, sf, out)
      val days = new java.io.File(out).listFiles()
        .count(_.getName.startsWith("event_date="))
      assert(days >= 25, s"expected ~30 day partitions, got $days")

      val day = "2024-01-05"
      val pruned = Layout.eventsForDay(spark, out, day)
      pruned.collect()
      val plan = pruned.queryExecution.executedPlan.toString
      assert(plan.contains("PartitionFilters") && plan.contains("event_date"),
        s"day filter not a partition filter:\n${plan.take(800)}")

      // the scan's file metrics prove pruning happened at planning time
      val scan = pruned.queryExecution.executedPlan.collectLeaves()
        .find(_.getClass.getSimpleName.contains("FileSourceScan")).get
      val filesRead = scan.metrics("numFiles").value
      assert(filesRead == 1, s"pruned scan read $filesRead files (want 1 day = 1 file)")

      // content ≡ the unpartitioned filtered read
      val expect = Tables.events(spark, sf)
        .filter(to_date(col("ts")) === lit(day).cast("date"))
        .select("event_id").collect().map(_.getLong(0)).sorted.toSeq
      val got = pruned.select("event_id").collect().map(_.getLong(0)).sorted.toSeq
      assert(got == expect && got.nonEmpty)
    } finally {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(java.nio.file.Paths.get(out)).iterator().asScala
        .toSeq.reverse.foreach(java.nio.file.Files.delete)
    }
  }

  test("z-order layout: per-file min/max prunes BOTH dimensions; linear sort prunes only its own") {
    val zOut = java.nio.file.Files.createTempDirectory("graft_events_z").toString
    val lOut = java.nio.file.Files.createTempDirectory("graft_events_lin").toString
    def rmrf(p: String): Unit = {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(java.nio.file.Paths.get(p)).iterator().asScala
        .toSeq.reverse.foreach(java.nio.file.Files.delete)
    }
    try {
      val nFiles = 16
      Layout.zorderEvents(spark, sf, zOut, nFiles)
      Layout.linearEvents(spark, sf, lOut, nFiles)

      // per-file (min,max) of both dims, from the files themselves —
      // exactly the stats a lakehouse file-skipping planner consults
      def fileStats(out: String): Seq[(Long, Long, Double, Double)] =
        new java.io.File(out).listFiles().filter(_.getName.endsWith(".parquet"))
          .toSeq.map { f =>
            val r = spark.read.parquet(f.getPath)
              .agg(min("event_id"), max("event_id"), min("value"), max("value"))
              .collect().head
            (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3))
          }
      val zStats = fileStats(zOut)
      val lStats = fileStats(lOut)
      assert(zStats.size == nFiles && lStats.size == nFiles)

      // a ~6% selective box on each dimension (quantile-derived).
      // Deliberately OFF-CENTER: a box straddling the median sits on the
      // Z-curve's coarsest discontinuity (the top split bit) and touches
      // twice the files — the representative operating point is a box
      // inside one top-level quadrant
      val Array(vLo, vHi) = Tables.events(spark, sf)
        .stat.approxQuantile("value", Array(0.30, 0.36), 0.001)
      val uq = Tables.events(spark, sf)
        .stat.approxQuantile("event_id", Array(0.30, 0.36), 0.001)
      val (uLo, uHi) = (uq(0).toLong, uq(1).toLong)

      def candV(st: Seq[(Long, Long, Double, Double)]): Int =
        st.count { case (_, _, lo, hi) => hi >= vLo && lo <= vHi }
      def candU(st: Seq[(Long, Long, Double, Double)]): Int =
        st.count { case (lo, hi, _, _) => hi >= uLo && lo <= uHi }

      // value-range query: the user-sorted layout cannot prune (values
      // spray across every file); the z-order layout must skip most
      assert(candV(lStats) >= nFiles - 2, s"baseline unexpectedly prunable: ${candV(lStats)}")
      assert(candV(zStats) <= nFiles / 2,
        s"z-order failed to bound value: ${candV(zStats)} of $nFiles files")
      // id-range query: z-order keeps usable event_id bounds too — the
      // curve's price is bounded, not total
      assert(candU(zStats) <= nFiles / 2,
        s"z-order lost the event_id dimension: ${candU(zStats)} of $nFiles files")
      assert(candU(lStats) <= 2, s"linear leading-column pruning broken: ${candU(lStats)}")

      // layout change must not change content
      val zIds = spark.read.parquet(zOut).select("event_id")
        .collect().map(_.getLong(0)).sorted.toSeq
      val base = Tables.events(spark, sf).select("event_id")
        .collect().map(_.getLong(0)).sorted.toSeq
      assert(zIds == base)
    } finally { rmrf(zOut); rmrf(lOut) }
  }
}

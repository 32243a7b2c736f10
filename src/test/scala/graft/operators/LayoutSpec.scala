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
}

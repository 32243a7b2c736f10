package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Storage-layout operators: ingest-time compaction into a
  * partition-pruned layout. The driver corpus ships each table as ONE
  * parquet file; at 100 TB the same data lives date-partitioned
  * (`event_date=.../part-*.parquet`) so that every time-bounded query
  * prunes to the touched days at PLANNING time — the scan never lists,
  * opens, or reads the other partitions. This operator is that ingest
  * step, and LayoutSpec proves the payoff on the engine's own plans:
  * the day-filtered scan over the partitioned copy shows the filter
  * under `PartitionFilters` (not just `PushedFilters`) and touches
  * 1/30th of the files.
  *
  * Partition count discipline at scale: partition by DAY (≈365/yr), not
  * by hour/user — the partition column must bound listing cardinality;
  * fine-grained pruning below a day comes from row-group min/max stats,
  * which the within-partition `sortWithinPartitions(ts)` keeps tight.
  */
object Layout {

  /** Write the events table date-partitioned + time-sorted. */
  def partitionEvents(spark: SparkSession, dir: String, out: String): Unit =
    Tables.events(spark, dir)
      .withColumn("event_date", to_date(col("ts")))
      .repartition(col("event_date"))
      .sortWithinPartitions("ts")
      .write.mode("overwrite")
      .partitionBy("event_date")
      .parquet(out)

  /** A day's events from the partitioned layout (the pruned scan under
    * test in LayoutSpec). */
  def eventsForDay(spark: SparkSession, out: String, day: String): DataFrame =
    spark.read.parquet(out).filter(col("event_date") === lit(day).cast("date"))
}

package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
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

  /** Bits per dimension for the Z-curve (8 → 256 buckets/dim, 16-bit
    * interleaved key — plenty to separate file-count granularity). */
  val ZBits = 8

  /** Morton/Z-order key over two rank-normalized dimensions: interleave
    * the top ZBits of each dimension's ntile bucket. Rank normalization
    * (ntile over a window) makes the curve distribution-agnostic —
    * raw-value bit interleaving degenerates when one dimension's range
    * dwarfs the other's. At 100 TB the ntile window is replaced by
    * approxQuantile boundaries computed on a sample (one pass, no global
    * sort); the curve math is identical. */
  private def zKey(a: Column, b: Column): Column =
    (0 until ZBits).map { i =>
      (shiftleft(shiftright(a, i).bitwiseAND(1), 2 * i))
        .bitwiseOR(shiftleft(shiftright(b, i).bitwiseAND(1), 2 * i + 1))
    }.reduce(_.bitwiseOR(_))

  /** Write `events` Z-ordered on (event_id, value) into `nFiles` files:
    * range-partition + sort by the interleaved key, so each file covers
    * a compact box in BOTH dimensions — per-file min/max stats then
    * prune selective predicates on EITHER dimension (the Delta/Iceberg
    * OPTIMIZE ZORDER layout, built from Spark primitives: ntile +
    * bit-interleave + repartitionByRange). A single-column sort layout
    * prunes only its leading column; Z-order trades a little of that
    * leading-column locality for usable min/max bounds on every curve
    * dimension — LayoutSpec measures exactly that tradeoff from the
    * written files' own stats. */
  def zorderEvents(spark: SparkSession, dir: String, out: String, nFiles: Int = 16): Unit = {
    import org.apache.spark.sql.expressions.Window
    val ev = Tables.events(spark, dir)
    val buckets = 1 << ZBits
    val ranked = ev
      .withColumn("ra", ntile(buckets).over(Window.orderBy("event_id")) - 1)
      .withColumn("rb", ntile(buckets).over(Window.orderBy("value")) - 1)
      .withColumn("z", zKey(col("ra"), col("rb")))
    ranked
      .repartitionByRange(nFiles, col("z"))
      .sortWithinPartitions("z")
      .drop("ra", "rb", "z")
      .write.mode("overwrite").parquet(out)
  }

  /** The single-dimension baseline: same file count, sorted by event_id
    * only (the natural append/ingest order — what a table looks like
    * when nobody re-clusters it). */
  def linearEvents(spark: SparkSession, dir: String, out: String, nFiles: Int = 16): Unit =
    Tables.events(spark, dir)
      .repartitionByRange(nFiles, col("event_id"))
      .sortWithinPartitions("event_id")
      .write.mode("overwrite").parquet(out)

  /** Copy-on-write MERGE (upsert by event_id) into the date-partitioned
    * layout — the Delta/Iceberg `MERGE INTO` shape from Spark
    * primitives. Only the partitions a change row lands in are
    * rewritten: dynamic partition-overwrite scopes the commit to the
    * partitions present in the written frame, and the written frame is
    * the base READ PRUNED to those dates (anti-joined against the
    * changeset) unioned with the changes. At 100 TB a day's changeset
    * touches a handful of date partitions — the other ~36,500 are never
    * read, never written, never listed by the job.
    *
    * Semantics: a change row REPLACES any base row with its event_id
    * (matched ⇒ update, unmatched ⇒ insert). A changed row may move
    * partitions (its ts day differs from the base row's): the base row's
    * OLD partition is in the rewrite set too because affected dates are
    * derived from base rows holding changed ids, not just from the
    * changes' own dates — a key-move deletes cleanly instead of leaving
    * a duplicate behind. Re-applying the same changeset is a no-op
    * rewrite of the same partitions (idempotent under driver retries). */
  def mergeEvents(spark: SparkSession, table: String, changes: DataFrame): Unit = {
    val base = spark.read.parquet(table)
    val ids = changes.select("event_id").distinct()
    // affected dates: where changes WILL live + where changed ids DO live
    val affected = changes.select(to_date(col("ts")).as("event_date"))
      .union(base.join(ids, Seq("event_id")).select(col("event_date")))
      .distinct()
    val cols = base.columns.map(col).toIndexedSeq
    val survivors = base
      .join(broadcast(affected), Seq("event_date"), "left_semi")
      .join(ids, Seq("event_id"), "left_anti")
    val incoming = changes.withColumn("event_date", to_date(col("ts")))
    // the write overwrites the path the plan reads — cut lineage first
    // (Spark rejects read-overwrite in one plan). localCheckpoint holds
    // the touched partitions' rows; at cluster scale this becomes a
    // staging-dir write + the versioned-manifest swap the index
    // artifacts already use
    val merged = survivors.select(cols: _*).unionByName(incoming.select(cols: _*))
      .repartition(col("event_date"))
      .sortWithinPartitions("ts")
      .localCheckpoint()
    val prev = spark.conf.getOption("spark.sql.sources.partitionOverwriteMode")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try merged.write.mode("overwrite").partitionBy("event_date").parquet(table)
    finally {
      prev match {
        case Some(v) => spark.conf.set("spark.sql.sources.partitionOverwriteMode", v)
        case None    => spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
      }
      // the session's FileStatusCache still lists the replaced files;
      // readers planning against the stale listing would hit
      // FILE_NOT_EXIST — invalidate the path after an in-place rewrite
      spark.catalog.refreshByPath(table)
    }
  }

  /** Streaming CDC apply: a stream of change rows merged into the
    * partitioned table per micro-batch — `MERGE INTO` as the sink of a
    * Structured Streaming job (the Debezium-to-lakehouse shape).
    * foreachBatch gives batch-scoped semantics, and crash recovery is
    * exactly [[mergeEvents]]'s changeset idempotence: a replayed
    * micro-batch re-rewrites the same partitions to the same bytes, so
    * no per-batch ledger is needed (contrast ExactlyOnceSink, which
    * needs one because plain appends are NOT self-idempotent). */
  def mergeStream(spark: SparkSession, table: String,
      changes: DataFrame): org.apache.spark.sql.streaming.StreamingQuery =
    changes.writeStream
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        if (!batch.isEmpty) mergeEvents(spark, table, batch.toDF())
      }
      .start()
}

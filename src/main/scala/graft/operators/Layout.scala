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
    * the top ZBits of each dimension's rank bucket. Rank normalization
    * makes the curve distribution-agnostic — raw-value bit interleaving
    * degenerates when one dimension's range dwarfs the other's. */
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
    val ev = Tables.events(spark, dir)
    val buckets = 1 << ZBits
    // rank buckets from approxQuantile boundaries — ONE sketch pass
    // (GK summaries, map-side mergeable, both dims in one aggregation),
    // then a scan-local binary-search stamp. The previous form ranked via
    // ntile over an UN-PARTITIONED window, which funnels the entire
    // corpus through a single task — the exact giant-state global-window
    // shape this repo's plan audits ban; it was documented as "replace at
    // 100 TB" but the fixture path was the only implementation (r9
    // review find). Quantile-boundary ranks differ from exact ntile only
    // by the sketch's rank error (≤0.1% here) — the curve and its
    // pruning behavior are unchanged (LayoutSpec measures them from the
    // written files' own stats).
    val probs = (1 until buckets).map(_.toDouble / buckets).toArray
    val Array(idBounds, vBounds) =
      ev.stat.approxQuantile(Array("event_id", "value"), probs, 0.001)
    def rank(bounds: Array[Double]) = {
      val bc = spark.sparkContext.broadcast(bounds)
      // UDF justified on the write path (the Multimodal mapPartitions
      // rationale): a 255-step HOF fold per row runs interpreted and
      // costs more than the codegen break; binary search is O(log B)
      udf { (x: Double) =>
        val a = bc.value
        val i = java.util.Arrays.binarySearch(a, x)
        if (i >= 0) { var j = i; while (j > 0 && a(j - 1) == x) j -= 1; j }
        else -(i + 1)
      }
    }
    ev
      .withColumn("ra", rank(idBounds)(col("event_id").cast("double")))
      .withColumn("rb", rank(vBounds)(col("value").cast("double")))
      .withColumn("z", zKey(col("ra"), col("rb")))
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

  /** Build the event_id→event_date secondary index alongside a
    * partitioned table: the same date partitioning, but only the two key
    * columns. The MERGE's read-side "which partitions hold these ids?"
    * lookup then scans index bytes (two narrow columns, ~0.1% of table
    * bytes at events-table widths) instead of the full base table, and
    * because the index mirrors the table's partitioning, [[mergeEvents]]
    * maintains it with the SAME dynamic-overwrite commit + emptied-
    * partition delete it applies to the table — no separate consistency
    * protocol. */
  def buildKeyIndex(spark: SparkSession, table: String, out: String): Unit =
    spark.read.parquet(table)
      .select(col("event_id"), col("event_date"))
      .repartition(col("event_date"))
      .sortWithinPartitions("event_id")
      .write.mode("overwrite").partitionBy("event_date").parquet(out)

  /** Copy-on-write MERGE (upsert by event_id) into the date-partitioned
    * layout — the Delta/Iceberg `MERGE INTO` shape from Spark
    * primitives. Only the partitions a change row lands in are
    * rewritten: dynamic partition-overwrite scopes the commit to the
    * partitions present in the written frame, and the written frame is
    * the base READ PRUNED to those dates (anti-joined against the
    * changeset) unioned with the changes. Write-side cost is therefore
    * ∝ touched partitions. Read-side: deriving the affected dates needs
    * the current date of every changed id — with `keyIndex` set (built
    * by [[buildKeyIndex]]) that lookup scans the narrow index instead of
    * the base table; without it, the id probe scans the base (parquet
    * min/max on event_id prunes only if ids cluster). At 100 TB run the
    * index — a day's changeset then reads index bytes + a handful of
    * date partitions, and the other ~36,500 are never read or written.
    *
    * Semantics: a change row REPLACES any base row with its event_id
    * (matched ⇒ update, unmatched ⇒ insert). Changesets with several
    * rows per key (Debezium-style insert-then-update in one batch)
    * collapse to per-key LAST-WINS by ts before applying. A changed row
    * may move partitions (its ts day differs from the base row's): the
    * base row's OLD partition is in the rewrite set too because affected
    * dates are derived from rows holding changed ids, not just from the
    * changes' own dates — and when a key-move drains a partition of its
    * last row, dynamic overwrite alone would skip it (it only rewrites
    * partitions PRESENT in the written frame), so affected dates absent
    * from the merged output are deleted explicitly. Deletion runs after
    * the commit: a crash between the two leaves ghosts that the replayed
    * merge re-detects (their ids are still in the changeset) and deletes
    * — re-applying a changeset is a no-op rewrite (idempotent under
    * driver retries and foreachBatch replays). */
  def mergeEvents(spark: SparkSession, table: String, changes: DataFrame,
      keyIndex: Option[String] = None): Unit = {
    import org.apache.spark.sql.expressions.Window
    // per-key last-wins (latest ts). Two change rows for one key at the
    // SAME ts (second-granularity feeds do this) need a tiebreak that
    // does not depend on partition/arrival order, or a replayed merge
    // could keep the other row and break idempotence — a content hash
    // makes the survivor a pure function of the changeset's row set
    // (feeds carrying a change-sequence column should order by it here
    // instead)
    val tiebreak = xxhash64(changes.columns.map(col).toIndexedSeq: _*)
    val deduped = changes
      .withColumn("__rn",
        row_number().over(
          Window.partitionBy("event_id").orderBy(col("ts").desc, tiebreak.desc)))
      .filter(col("__rn") === 1).drop("__rn")
    val base = spark.read.parquet(table)
    val ids = deduped.select("event_id").distinct()
    // affected dates: where changes WILL live + where changed ids DO live
    val oldDates = keyIndex match {
      case Some(ix) => spark.read.parquet(ix)
        .join(ids, Seq("event_id")).select(col("event_date"))
      case None => base.join(ids, Seq("event_id")).select(col("event_date"))
    }
    val affected = deduped.select(to_date(col("ts")).as("event_date"))
      .union(oldDates)
      .distinct()
    val cols = base.columns.map(col).toIndexedSeq
    val survivors = base
      .join(broadcast(affected), Seq("event_date"), "left_semi")
      .join(ids, Seq("event_id"), "left_anti")
    val incoming = deduped.withColumn("event_date", to_date(col("ts")))
    // the write overwrites the path the plan reads — cut lineage first
    // (Spark rejects read-overwrite in one plan). localCheckpoint holds
    // the touched partitions' rows; at cluster scale this becomes a
    // staging-dir write + the versioned-manifest swap the index
    // artifacts already use
    val merged = survivors.select(cols: _*).unionByName(incoming.select(cols: _*))
      .repartition(col("event_date"))
      .sortWithinPartitions("ts")
      .localCheckpoint()
    // partitions every one of whose rows moved away produce NO output
    // rows — dynamic overwrite won't touch them, so find and delete them
    // explicitly (both sets are bounded by the touched-partition count)
    val affectedDates = affected.collect().map(_.getDate(0).toString).toSet
    val presentDates = merged.select("event_date").distinct()
      .collect().map(_.getDate(0).toString).toSet
    val emptied = affectedDates -- presentDates
    val prev = spark.conf.getOption("spark.sql.sources.partitionOverwriteMode")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try {
      merged.write.mode("overwrite").partitionBy("event_date").parquet(table)
      deletePartitions(spark, table, emptied)
      keyIndex.foreach { ix =>
        merged.select(col("event_id"), col("event_date"))
          .write.mode("overwrite").partitionBy("event_date").parquet(ix)
        deletePartitions(spark, ix, emptied)
        spark.catalog.refreshByPath(ix)
      }
    } finally {
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

  private def deletePartitions(spark: SparkSession, table: String,
      dates: Set[String]): Unit =
    dates.foreach { d =>
      val p = new org.apache.hadoop.fs.Path(table, s"event_date=$d")
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      fs.delete(p, true)
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

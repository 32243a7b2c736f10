package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sources.Tables

/** Row shape for merge-spec changesets (top-level: Spark encoders
  * cannot reach a suite-inner case class). */
case class EvRow(event_id: Long, ts: java.sql.Timestamp, user_id: Long,
    event_type: String, value: Double, props: String)

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

  test("merge: copy-on-write rewrites only affected partitions, upserts exactly, idempotent") {
    import spark.implicits._
    val out = java.nio.file.Files.createTempDirectory("graft_events_merge").toString
    def partFiles(): Map[String, Set[String]] =
      new java.io.File(out).listFiles().filter(_.getName.startsWith("event_date="))
        .map(d => d.getName -> d.listFiles().map(_.getName).filter(_.endsWith(".parquet")).toSet)
        .toMap
    try {
      Layout.partitionEvents(spark, sf, out)
      val before = partFiles()
      val base = spark.read.parquet(out)
      // materialize everything taken from `base` BEFORE the merge — the
      // rewrite deletes the files this lazy frame scans
      val baseCount = base.count()
      val picks = base.orderBy("event_id").limit(3).collect()
      def ev(r: org.apache.spark.sql.Row) = EvRow(r.getAs[Long]("event_id"),
        r.getAs[java.sql.Timestamp]("ts"), r.getAs[Long]("user_id"),
        r.getAs[String]("event_type"), r.getAs[Double]("value"), r.getAs[String]("props"))
      val maxId = base.agg(max("event_id")).collect().head.getLong(0)
      val upd = ev(picks(0)).copy(value = 12345.5) // in-place update
      val movedTs = new java.sql.Timestamp(
        ev(picks(1)).ts.getTime + 3L * 24 * 3600 * 1000) // partition move
      val mov = ev(picks(1)).copy(ts = movedTs)
      val ins = ev(picks(2)).copy(event_id = maxId + 1) // brand-new row
      val changes = Seq(upd, mov, ins).toDF()

      Layout.mergeEvents(spark, out, changes)

      val after = spark.read.parquet(out)
      assert(after.count() == baseCount + 1)
      val got = after.select("event_id", "ts", "value").collect()
        .map(r => r.getLong(0) -> (r.getTimestamp(1), r.getDouble(2))).toMap
      assert(got(upd.event_id) == ((upd.ts, 12345.5)))
      assert(got(mov.event_id) == ((movedTs, mov.value)))
      assert(got(ins.event_id) == ((ins.ts, ins.value)))
      // a moved key leaves no ghost behind: exactly one row per id
      assert(after.groupBy("event_id").count().filter(col("count") > 1).count() == 0)

      // only the affected date partitions were rewritten
      val fmt = new java.text.SimpleDateFormat("yyyy-MM-dd")
      fmt.setTimeZone(java.util.TimeZone.getTimeZone("UTC"))
      val touched = Set(upd.ts, mov.ts, movedTs, ins.ts)
        .map(t => s"event_date=${fmt.format(t)}")
      val filesNow = partFiles()
      before.foreach { case (dir, files) =>
        if (!touched(dir))
          assert(filesNow(dir) == files, s"untouched partition $dir was rewritten")
      }
      touched.filter(before.contains).foreach { dir =>
        assert(filesNow(dir) != before(dir), s"affected partition $dir not rewritten")
      }

      // idempotent: re-applying the same changeset changes nothing
      Layout.mergeEvents(spark, out, changes)
      val again = spark.read.parquet(out).select("event_id", "ts", "value").collect()
        .map(r => r.getLong(0) -> (r.getTimestamp(1), r.getDouble(2))).toMap
      assert(again == got)
    } finally {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(java.nio.file.Paths.get(out)).iterator().asScala
        .toSeq.reverse.foreach(java.nio.file.Files.delete)
    }
  }

  test("merge: draining a partition of its last row deletes it (no ghost rows)") {
    import spark.implicits._
    val out = java.nio.file.Files.createTempDirectory("graft_merge_drain").toString
    try {
      // base: two partitions, one of them single-row
      val fmt = "yyyy-MM-dd HH:mm:ss"
      def ts(s: String) = java.sql.Timestamp.valueOf(s)
      val rows = Seq(
        EvRow(1L, ts("2024-01-01 10:00:00"), 1L, "view", 1.0, "{}"),
        EvRow(2L, ts("2024-01-02 10:00:00"), 1L, "view", 2.0, "{}"),
        EvRow(3L, ts("2024-01-02 11:00:00"), 2L, "view", 3.0, "{}"))
      rows.toDF().withColumn("event_date", to_date(col("ts")))
        .write.mode("overwrite").partitionBy("event_date").parquet(out)
      // move the SOLE row of 2024-01-01 to 2024-01-03
      val changes = Seq(EvRow(1L, ts("2024-01-03 10:00:00"), 1L, "view", 1.5, "{}")).toDF()
      Layout.mergeEvents(spark, out, changes)

      val dirs = new java.io.File(out).listFiles()
        .filter(_.getName.startsWith("event_date=")).map(_.getName).toSet
      assert(!dirs.contains("event_date=2024-01-01"),
        s"drained partition survived: $dirs")
      val after = spark.read.parquet(out)
      assert(after.count() == 3, "ghost row duplicated the moved key")
      assert(after.groupBy("event_id").count().filter(col("count") > 1).count() == 0)
      val moved = after.filter(col("event_id") === 1L).collect().head
      assert(moved.getAs[java.sql.Timestamp]("ts") == ts("2024-01-03 10:00:00"))

      // replaying the drain-changeset is still a no-op
      Layout.mergeEvents(spark, out, changes)
      assert(spark.read.parquet(out).count() == 3)
    } finally {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(java.nio.file.Paths.get(out)).iterator().asScala
        .toSeq.reverse.foreach(java.nio.file.Files.delete)
    }
  }

  test("merge: two change rows for one key in a batch collapse to last-wins") {
    import spark.implicits._
    val out = java.nio.file.Files.createTempDirectory("graft_merge_lastwins").toString
    try {
      Layout.partitionEvents(spark, sf, out)
      val base = spark.read.parquet(out)
      val baseCount = base.count()
      val maxId = base.agg(max("event_id")).collect().head.getLong(0)
      val t0 = base.agg(min("ts")).collect().head.getTimestamp(0)
      // Debezium-style: insert then update of ONE new key in one batch
      val insertTs = new java.sql.Timestamp(t0.getTime + 1000)
      val updateTs = new java.sql.Timestamp(t0.getTime + 2000)
      val changes = Seq(
        EvRow(maxId + 1, insertTs, 7L, "view", 1.0, "{}"),
        EvRow(maxId + 1, updateTs, 7L, "view", 42.0, "{}")).toDF()
      Layout.mergeEvents(spark, out, changes)

      val after = spark.read.parquet(out)
      assert(after.count() == baseCount + 1, "duplicate rows for one upserted key")
      val got = after.filter(col("event_id") === maxId + 1).collect()
      assert(got.length == 1 && got.head.getAs[Double]("value") == 42.0,
        "last-wins did not keep the latest change row")
    } finally {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(java.nio.file.Paths.get(out)).iterator().asScala
        .toSeq.reverse.foreach(java.nio.file.Files.delete)
    }
  }

  test("merge: equal-ts change rows for one key pick a content-deterministic survivor") {
    import spark.implicits._
    val outA = java.nio.file.Files.createTempDirectory("graft_merge_tieA").toString
    val outB = java.nio.file.Files.createTempDirectory("graft_merge_tieB").toString
    try {
      Layout.partitionEvents(spark, sf, outA)
      Layout.partitionEvents(spark, sf, outB)
      val base = spark.read.parquet(outA)
      val maxId = base.agg(max("event_id")).collect().head.getLong(0)
      val ts = base.agg(min("ts")).collect().head.getTimestamp(0)
      // the same two equal-ts rows, presented in opposite orders — the
      // survivor must not depend on arrival/partition order
      val rows = Seq(
        EvRow(maxId + 1, ts, 7L, "view", 1.0, "{}"),
        EvRow(maxId + 1, ts, 7L, "view", 42.0, "{}"))
      Layout.mergeEvents(spark, outA, rows.toDF())
      Layout.mergeEvents(spark, outB, rows.reverse.toDF())
      def winner(p: String): Double = {
        val got = spark.read.parquet(p).filter(col("event_id") === maxId + 1).collect()
        assert(got.length == 1, "equal-ts tie produced duplicate rows")
        got.head.getAs[Double]("value")
      }
      assert(winner(outA) == winner(outB), "survivor depends on changeset order")
    } finally {
      import scala.jdk.CollectionConverters._
      Seq(outA, outB).foreach { out =>
        java.nio.file.Files.walk(java.nio.file.Paths.get(out)).iterator().asScala
          .toSeq.reverse.foreach(java.nio.file.Files.delete)
      }
    }
  }

  test("merge with key index: index-backed lookup, index stays consistent") {
    import spark.implicits._
    val out = java.nio.file.Files.createTempDirectory("graft_merge_ix").toString
    val ix = java.nio.file.Files.createTempDirectory("graft_merge_ix_idx").toString
    def rmrf(p: String): Unit = {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(java.nio.file.Paths.get(p)).iterator().asScala
        .toSeq.reverse.foreach(java.nio.file.Files.delete)
    }
    try {
      Layout.partitionEvents(spark, sf, out)
      Layout.buildKeyIndex(spark, out, ix)
      val base = spark.read.parquet(out)
      val baseCount = base.count()
      val pick = base.orderBy("event_id").limit(1).collect().head
      val maxId = base.agg(max("event_id")).collect().head.getLong(0)
      val movedTs = new java.sql.Timestamp(
        pick.getAs[java.sql.Timestamp]("ts").getTime + 5L * 24 * 3600 * 1000)
      val changes = Seq(
        EvRow(pick.getAs[Long]("event_id"), movedTs, pick.getAs[Long]("user_id"),
          pick.getAs[String]("event_type"), 55.5, pick.getAs[String]("props")),
        EvRow(maxId + 1, movedTs, 9L, "view", 66.6, "{}")).toDF()
      Layout.mergeEvents(spark, out, changes, keyIndex = Some(ix))

      val after = spark.read.parquet(out)
      assert(after.count() == baseCount + 1)
      assert(after.groupBy("event_id").count().filter(col("count") > 1).count() == 0,
        "index-backed old-date lookup missed the moved key's partition")
      // the index mirrors the table exactly after the merge
      val tbl = after.select("event_id", "event_date")
        .collect().map(r => (r.getLong(0), r.getDate(1).toString)).sorted.toSeq
      val idx = spark.read.parquet(ix)
        .collect().map(r => (r.getAs[Long]("event_id"), r.getAs[java.sql.Date]("event_date").toString))
        .sorted.toSeq
      assert(idx == tbl, "key index diverged from table after merge")
    } finally { rmrf(out); rmrf(ix) }
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

package graft.operators

import org.apache.hadoop.fs.Path

import graft.SparkSpec

/** Transaction-log semantics of [[Snapshots]]: append/overwrite
  * visibility, time-travel stability under later commits, reference-
  * counted vacuum (shared batches survive as long as any kept manifest
  * cites them), and crash recovery (an unpublished batch is invisible
  * and reclaimable). */
class SnapshotsSpec extends SparkSpec {

  private def freshDir(tag: String): String = {
    val d = s"/tmp/graft_snapspec_$tag"
    val fs = new Path(d).getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new Path(d), true)
    d
  }

  import spark.implicits._

  test("append commits accumulate; time travel re-reads any version unchanged") {
    val d = freshDir("append")
    val v1 = Snapshots.commit(Seq((1L, "a"), (2L, "b")).toDF("id", "s"), d)
    val v2 = Snapshots.commit(Seq((3L, "c")).toDF("id", "s"), d)
    assert((v1, v2) == (1, 2))
    assert(Snapshots.read(spark, d).count() == 3)
    val v1rows = Snapshots.read(spark, d, Some(1)).collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    assert(v1rows == Set((1L, "a"), (2L, "b")))
    // a third commit cannot disturb the pinned-version view
    Snapshots.commit(Seq((4L, "d")).toDF("id", "s"), d)
    assert(Snapshots.read(spark, d, Some(1)).count() == 2)
    assert(Snapshots.read(spark, d, Some(2)).count() == 3)
    assert(Snapshots.read(spark, d).count() == 4)
  }

  test("overwrite replaces the live view but leaves history readable") {
    val d = freshDir("overwrite")
    Snapshots.commit(Seq((1L, "a")).toDF("id", "s"), d)
    Snapshots.commit(Seq((9L, "z")).toDF("id", "s"), d, overwrite = true)
    assert(Snapshots.read(spark, d).collect().map(_.getLong(0)).toSeq == Seq(9L))
    assert(Snapshots.read(spark, d, Some(1)).collect().map(_.getLong(0)).toSeq == Seq(1L))
  }

  test("vacuum is reference-counted: shared batches survive, orphans die") {
    val d = freshDir("vacuum")
    Snapshots.commit(Seq((1L, "a")).toDF("id", "s"), d) // b1
    Snapshots.commit(Seq((2L, "b")).toDF("id", "s"), d) // b2; manifest v2 = b1+b2
    val fs = new Path(d).getFileSystem(spark.sparkContext.hadoopConfiguration)
    // crash simulation: a batch written but never published
    fs.mkdirs(new Path(s"$d/data/b99"))
    assert(Snapshots.read(spark, d).count() == 2, "orphan batch must be invisible")
    // a FRESH orphan is indistinguishable from an in-flight commit's
    // batch: the default grace must leave it (and everything else
    // unreferenced-but-recent) alone
    Snapshots.vacuum(spark, d, keep = 1)
    assert(fs.exists(new Path(s"$d/data/b99")), "fresh orphan reclaimed inside the grace window")
    // past the grace window the orphan is reclaimable
    Snapshots.vacuum(spark, d, keep = 1, orphanGraceMs = 0L)
    // v1's manifest is gone, but batch b1 is cited by the kept v2 manifest
    assert(Snapshots.versions(spark, d) == Seq(2))
    assert(Snapshots.read(spark, d).count() == 2)
    assert(fs.exists(new Path(s"$d/data/b1")), "shared batch vacuumed away")
    assert(!fs.exists(new Path(s"$d/data/b99")), "orphan batch survived vacuum")
    intercept[IllegalArgumentException](Snapshots.read(spark, d, Some(1)))
  }

  test("append to a legacy headerless manifest preserves parent-only columns") {
    val d = freshDir("legacy")
    Snapshots.commit(Seq((1L, "a", 10.0)).toDF("id", "s", "extra"), d)
    // strip the schema header from v1's manifest — a pre-evolution log
    val fs = new Path(d).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val mp = new Path(f"$d/_log/${1}%08d.manifest")
    val in = fs.open(mp)
    val lines = try scala.io.Source.fromInputStream(in, "UTF-8").getLines().toList
      finally in.close()
    val out = fs.create(mp, true)
    try out.write(lines.filterNot(_.startsWith("#")).mkString("\n").getBytes("UTF-8"))
    finally out.close()
    assert(Snapshots.schemaAt(spark, d).isEmpty)
    // append a batch WITHOUT the extra column: the new header must be
    // inferred from the parent files, not declared as the batch's alone
    Snapshots.commit(Seq((2L, "b")).toDF("id", "s"), d)
    val latest = Snapshots.read(spark, d)
    assert(latest.columns.toSet == Set("id", "s", "extra"),
      s"parent-only column lost: ${latest.columns.toSeq}")
    val rows = latest.orderBy("id").collect()
    assert(rows(0).getAs[Double]("extra") == 10.0)
    assert(rows(1).isNullAt(rows(1).fieldIndex("extra")))
  }

  test("schema evolution resolves column names case-insensitively") {
    val d = freshDir("case")
    Snapshots.commit(Seq((1L, "a")).toDF("id", "s"), d)
    // same column spelled ID: must type-check against `id`, not append a
    // duplicate field to the declared schema
    Snapshots.commit(Seq((2L, "b")).toDF("ID", "s"), d)
    val st = Snapshots.schemaAt(spark, d).get
    assert(st.fields.count(_.name.equalsIgnoreCase("id")) == 1,
      s"duplicate field declared: ${st.fieldNames.toSeq}")
    assert(Snapshots.read(spark, d).count() == 2)
    // and a case-varied TYPE change is still rejected
    intercept[IllegalArgumentException](
      Snapshots.commit(Seq(("x", "c")).toDF("ID", "s"), d))
  }

  test("vacuum reclaims stale _log tmp files from crashed optimistic writers") {
    val d = freshDir("tmpvac")
    Snapshots.commit(Seq((1L, "a")).toDF("id", "s"), d)
    val fs = new Path(d).getFileSystem(spark.sparkContext.hadoopConfiguration)
    // crashed writer: tmp manifest written, never published
    val tmp = new Path(s"$d/_log/2-deadbeef.tmp")
    val out = fs.create(tmp, true)
    try out.write("data/budeadbeef/x.parquet".getBytes("UTF-8")) finally out.close()
    Snapshots.vacuum(spark, d, keep = 5) // inside grace: an in-flight writer's tmp
    assert(fs.exists(tmp), "in-flight tmp reclaimed inside the grace window")
    Snapshots.vacuum(spark, d, keep = 5, orphanGraceMs = 0L)
    assert(!fs.exists(tmp), "stale tmp manifest survived vacuum")
    assert(Snapshots.versions(spark, d) == Seq(1)) // published log untouched
  }

  test("commit with an all-null stats column records a stats-free entry, not a crash") {
    val d = freshDir("nullstats")
    val df = Seq((1L, Option.empty[Double]), (2L, Option.empty[Double]))
      .toDF("id", "v").coalesce(1)
    val v = Snapshots.commit(df, d, statsCol = Some("v"))
    assert(v == 1)
    // stats-free files are ALWAYS opened by a pruned read (correctness
    // never depends on stats presence)
    val (pruned, opened, total) = Snapshots.readPruned(spark, d, "v", 0.0, 1.0)
    assert(opened == 1 && total == 1)
    assert(pruned.count() == 2)
  }

  test("zero-row part files of a stats commit are dropped from the manifest") {
    val d = freshDir("emptyparts")
    // 2 rows over 4 partitions: at least 2 part files are empty
    Snapshots.commit(Seq((1L, 1.0), (2L, 2.0)).toDF("id", "v").repartition(4),
      d, statsCol = Some("v"))
    val (pruned, opened, total) = Snapshots.readPruned(spark, d, "v", -1e9, 1e9)
    // the manifest lists only the content-bearing files (≤ 2 of the 4
    // written parts hold the 2 rows) — an empty part would sit
    // stats-less and be conservatively opened by EVERY pruned read
    assert(total <= 2 && opened == total, s"opened $opened of $total")
    assert(pruned.count() == 2)
    // and a genuinely empty batch stays listed (version readable, 0 rows)
    Snapshots.commit(Seq((9L, 9.0)).toDF("id", "v").filter($"id" < 0).coalesce(1),
      d, statsCol = Some("v"))
    assert(Snapshots.read(spark, d).count() == 2)
  }

  test("readPruned's scan set is exactly the stats-kept files — zero reads outside the manifest decision") {
    val d = freshDir("prunedfiles")
    Snapshots.commit(Seq((1L, 1.0), (2L, 5.0)).toDF("id", "v").coalesce(1),
      d, statsCol = Some("v")) // b1: [1,5]
    Snapshots.commit(Seq((3L, 10.0), (4L, 15.0)).toDF("id", "v").coalesce(1),
      d, statsCol = Some("v")) // b2: [10,15]
    Snapshots.commit(Seq((5L, 20.0), (6L, 25.0)).toDF("id", "v").coalesce(1),
      d, statsCol = Some("v")) // b3: [20,25]
    val (pruned, opened, total) = Snapshots.readPruned(spark, d, "v", 11.0, 14.0)
    assert(total == 3 && opened == 1)
    // the physical scan's file set must equal the manifest's stats
    // decision: planning reads the LOG, never excluded files' footers
    val files = pruned.inputFiles
    assert(files.nonEmpty && files.forall(_.contains("/data/b2/")),
      s"pruned scan touched excluded files: ${files.toSeq}")
    assert(pruned.count() == 2)
  }

  test("vacuum after overwrite reclaims the replaced batches") {
    val d = freshDir("vacover")
    Snapshots.commit(Seq((1L, "a")).toDF("id", "s"), d)           // b1
    Snapshots.commit(Seq((9L, "z")).toDF("id", "s"), d, overwrite = true) // b2 only
    Snapshots.vacuum(spark, d, keep = 1, orphanGraceMs = 0L)
    val fs = new Path(d).getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(!fs.exists(new Path(s"$d/data/b1")), "unreferenced batch kept")
    assert(Snapshots.read(spark, d).collect().map(_.getLong(0)).toSeq == Seq(9L))
  }

  test("appendedBetween reads exactly the delta batch; compact preserves content") {
    val d = freshDir("delta")
    Snapshots.commit(Seq((1L, "a"), (2L, "b")).toDF("id", "s"), d)
    Snapshots.commit(Seq((3L, "c"), (4L, "d")).toDF("id", "s"), d)
    val delta = Snapshots.appendedBetween(spark, d, 1, 2).collect()
      .map(_.getLong(0)).toSet
    assert(delta == Set(3L, 4L))
    // compaction: one new version, same content, bounded file count
    val v3 = Snapshots.compact(spark, d, nFiles = 1)
    assert(v3 == 3)
    assert(Snapshots.read(spark, d).collect().map(_.getLong(0)).toSet ==
      Set(1L, 2L, 3L, 4L))
    val fs = new Path(d).getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(fs.listStatus(new Path(s"$d/data/b3")).count(_.getPath.getName.endsWith(".parquet")) == 1)
    // pre-compaction history still time-travels
    assert(Snapshots.read(spark, d, Some(1)).count() == 2)
  }

  test("schema evolution: ADD COLUMN widens the manifest schema, never the old files") {
    val d = freshDir("schema")
    val fs = new Path(d).getFileSystem(spark.sparkContext.hadoopConfiguration)
    Snapshots.commit(Seq((1L, "a")).toDF("id", "s"), d)
    val b1Before = fs.listStatus(new Path(s"$d/data/b1"))
      .filter(_.getPath.getName.endsWith(".parquet"))
      .map(st => st.getPath.getName -> (st.getLen, st.getModificationTime)).toMap
    Snapshots.commit(Seq((2L, "b", 7.5)).toDF("id", "s", "score"), d)
    // latest read: widened schema, pre-evolution row surfaces null score
    val latest = Snapshots.read(spark, d)
    assert(latest.columns.toSeq == Seq("id", "s", "score"))
    val rows = latest.collect().map(r => (r.getLong(0), r.getString(1),
      if (r.isNullAt(2)) None else Some(r.getDouble(2)))).toSet
    assert(rows == Set((1L, "a", None), (2L, "b", Some(7.5))))
    // time travel: v1 still presents the ORIGINAL two-column schema
    assert(Snapshots.read(spark, d, Some(1)).columns.toSeq == Seq("id", "s"))
    assert(Snapshots.schemaAt(spark, d, Some(1)).get.fieldNames.toSeq == Seq("id", "s"))
    assert(Snapshots.schemaAt(spark, d).get.fieldNames.toSeq == Seq("id", "s", "score"))
    // the evolution was metadata-only: v1's data files are byte-identical
    val b1After = fs.listStatus(new Path(s"$d/data/b1"))
      .filter(_.getPath.getName.endsWith(".parquet"))
      .map(st => st.getPath.getName -> (st.getLen, st.getModificationTime)).toMap
    assert(b1After == b1Before, "ADD COLUMN rewrote pre-evolution files")
    // the change feed carries the evolved schema too
    val delta = Snapshots.appendedBetween(spark, d, 1, 2)
    assert(delta.columns.toSeq == Seq("id", "s", "score") && delta.count() == 1)
  }

  test("schema evolution: a type change on an existing column is rejected") {
    val d = freshDir("schematype")
    Snapshots.commit(Seq((1L, "a")).toDF("id", "s"), d)
    val e = intercept[IllegalArgumentException] {
      Snapshots.commit(Seq((2, "b")).toDF("id", "s"), d) // id: int vs long
    }
    assert(e.getMessage.contains("changed type"))
    // the failed commit published nothing — the table is still at v1
    assert(Snapshots.versions(spark, d) == Seq(1))
  }

  test("schema evolution: optimistic commits record and widen headers the same way") {
    val d = freshDir("schemaocc")
    Snapshots.commitOptimistic(Seq((1L, "a")).toDF("id", "s"), d)
    Snapshots.commitOptimistic(Seq((2L, "b", true)).toDF("id", "s", "flag"), d)
    val latest = Snapshots.read(spark, d)
    assert(latest.columns.toSeq == Seq("id", "s", "flag"))
    assert(latest.filter("flag IS NULL").count() == 1)
  }

  test("ly_incr_matview: incremental refresh equals full recompute") {
    val refreshed = Snapshots.incrMatviewDemo(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val table = s"/tmp/graft_snap_${Integer.toHexString(sf.hashCode)}"
    import org.apache.spark.sql.functions._
    val full = Snapshots.read(spark, table)
      .groupBy("user_id")
      .agg(count(lit(1)).as("cnt"), round(sum("value"), 2).as("sv"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(refreshed == full)
  }

  test("ly_snapshot demo: v1 slice + v2 append == full events") {
    val df = Snapshots.snapshotDemo(spark, sf)
    val n1 = df.count()
    val table = s"/tmp/graft_snap_${Integer.toHexString(sf.hashCode)}"
    val total = Snapshots.read(spark, table).count()
    val events = graft.sources.Tables.events(spark, sf).count()
    assert(n1 > 0 && n1 < total && total == events)
  }

  test("NaN stats never prune a file holding in-range rows (r9 review find)") {
    val d = freshDir("nan")
    // one file whose stats column contains a NaN: Spark's max() returns
    // NaN, which fails every range comparison — the positive overlap
    // test silently skipped the file, losing its in-range row
    Snapshots.commit(Seq((1L, 1.0), (2L, Double.NaN)).toDF("id", "v")
      .coalesce(1), d, statsCol = Some("v"))
    val (pruned, opened, total) = Snapshots.readPruned(spark, d, "v", 0.0, 5.0)
    assert(opened == total, s"NaN-stat file was pruned ($opened of $total opened)")
    assert(pruned.filter("v = 1.0").count() == 1, "in-range row lost to a NaN bound")
  }

  test("commitIfAbsent stays exactly-once across compact + vacuum (r9 review find)") {
    val d = freshDir("tagvac")
    val batch = Seq((1L, "a")).toDF("id", "s")
    assert(Snapshots.commitIfAbsent(batch, d, "s0").contains(1))
    Snapshots.compact(spark, d, nFiles = 1) // overwrite: drops tag refs
    Snapshots.vacuum(spark, d, keep = 1, orphanGraceMs = 0L) // drops old manifests
    // a crash-replay of the same batchId must remain a no-op — before the
    // durable tag marker, the manifest check alone re-appended here
    assert(Snapshots.commitIfAbsent(batch, d, "s0").isEmpty,
      "replayed tag re-committed after compact+vacuum erased its references")
    assert(Snapshots.read(spark, d).count() == 1, "exactly-once sink holds duplicates")
  }

  test("appendedBetween refuses a range containing an overwrite (r9 review find)") {
    val d = freshDir("cdfow")
    Snapshots.commit(Seq((1L, "a")).toDF("id", "s"), d)
    Snapshots.commit(Seq((2L, "b")).toDF("id", "s"), d)
    Snapshots.compact(spark, d, nFiles = 1) // v3 overwrite
    val e = intercept[IllegalArgumentException] {
      Snapshots.appendedBetween(spark, d, 1, 3)
    }
    assert(e.getMessage.contains("REMOVED"),
      "a change feed across an overwrite must fail loudly, not return the full table")
  }

  test("batchTag collisions with the log's own dir names are rejected (r9 review find)") {
    val d = freshDir("tagcol")
    Snapshots.commit(Seq((1L, "a")).toDF("id", "s"), d) // lives in data/b1
    val e = intercept[IllegalArgumentException] {
      Snapshots.commit(Seq((2L, "x")).toDF("id", "s"), d, batchTag = Some("b1"))
    }
    assert(e.getMessage.contains("reserved"),
      "a tag shaped like a batch dir would overwrite-clobber live history")
  }
}

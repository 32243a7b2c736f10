package graft.operators

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Snapshot-versioned tables: multi-version reads (time travel), atomic
  * commits, and reference-counted vacuum over immutable parquet batches —
  * the transaction-log core of the lakehouse formats (Delta/Iceberg),
  * built from the same primitives as [[Similarity]]'s single-live-version
  * index manifests but generalized to a HISTORY of versions.
  *
  * Layout under a table dir:
  * {{{
  *   data/b<N>/part-*.parquet   — immutable batch written by commit N
  *   _log/<N>.manifest          — newline list of data files LIVE at N
  * }}}
  * A commit writes its batch dir, then publishes `<N>.manifest` by
  * temp-write + atomic rename; a reader resolves a manifest ONCE and
  * reads a frozen file list, so concurrent commits never tear a scan.
  * An append manifest = parent's files + the new batch; an overwrite
  * manifest = the new batch alone — old files are never rewritten, so
  * version N stays readable as long as its manifest survives (the
  * Delta/Iceberg sharing property: unchanged files are owned by many
  * versions at once, and a 100 TB table's commit cost is the changed
  * bytes plus one small manifest, never a table rewrite).
  *
  * Crash safety: a batch dir without a manifest (died between data write
  * and publish) is invisible to every reader and reclaimed by
  * [[vacuum]]; a torn manifest cannot exist (rename is atomic on
  * posix/HDFS); the latest version is simply the max published N.
  * [[vacuum]] drops old manifests and then deletes only batch dirs no
  * SURVIVING manifest references — reference-counted retention, the
  * exact contract of `VACUUM` in the lakehouse formats.
  */
object Snapshots {

  private def fsFor(spark: SparkSession, path: String): FileSystem =
    new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def manifestPath(dir: String, v: Int) = new Path(f"$dir/_log/$v%08d.manifest")

  /** Published versions, ascending (torn/tmp files never match). */
  def versions(spark: SparkSession, dir: String): Seq[Int] = {
    val fs = fsFor(spark, dir)
    val log = new Path(s"$dir/_log")
    if (!fs.exists(log)) Seq.empty
    else fs.listStatus(log).toSeq.map(_.getPath.getName)
      .collect { case n if n.matches("\\d{8}\\.manifest") => n.take(8).toInt }
      .sorted
  }

  private def readManifest(spark: SparkSession, dir: String, v: Int): Seq[String] = {
    val fs = fsFor(spark, dir)
    val in = fs.open(manifestPath(dir, v))
    try scala.io.Source.fromInputStream(in, "UTF-8").getLines().toList.filter(_.nonEmpty)
    finally in.close()
  }

  // ---- schema evolution: the manifest's optional `#schema⇥<DDL>` header
  // line records the table schema AS OF that version. Old files never get
  // rewritten when a column is added — the reader applies the declared
  // schema and parquet surfaces missing columns as null (the Delta/Iceberg
  // add-column contract: a metadata-only operation at any table size).
  // Header lines are comments to every file-list consumer. ----

  private def schemaHeader(st: org.apache.spark.sql.types.StructType): String =
    // recorded fully nullable: a column added later IS null for files
    // committed before it, whatever the writing frame's nullability said
    s"#schema\t${org.apache.spark.sql.types.StructType(st.fields.map(_.copy(nullable = true))).toDDL}"

  /** File-entry lines of a manifest (headers stripped). */
  private def entryLines(lines: Seq[String]): Seq[String] =
    lines.filterNot(_.startsWith("#"))

  /** The schema declared by a manifest, if its commit recorded one. */
  private def schemaOf(lines: Seq[String]): Option[org.apache.spark.sql.types.StructType] =
    lines.collectFirst { case l if l.startsWith("#schema\t") =>
      org.apache.spark.sql.types.StructType.fromDDL(l.stripPrefix("#schema\t")) }

  /** Declared schema at a published version (None for pre-evolution logs). */
  def schemaAt(spark: SparkSession, dir: String, version: Option[Int] = None):
      Option[org.apache.spark.sql.types.StructType] = {
    val vs = versions(spark, dir)
    require(vs.nonEmpty, s"no published snapshot under $dir")
    val v = version.getOrElse(vs.last)
    require(vs.contains(v), s"version $v not published (have ${vs.mkString(",")})")
    schemaOf(readManifest(spark, dir, v))
  }

  /** Parent schema widened by the batch's new columns: parent fields keep
    * their order, genuinely new fields append (ADD COLUMN); a field
    * present in both must agree on type — evolution here is additive,
    * never a silent cast. Names resolve CASE-INSENSITIVELY, matching
    * Spark's default analysis: appending a frame with `ID` to a table
    * with `id` must type-check against the existing column, not declare
    * a duplicate field that breaks every schema-applied read. */
  private def mergeSchemas(parent: Option[org.apache.spark.sql.types.StructType],
      batch: org.apache.spark.sql.types.StructType): org.apache.spark.sql.types.StructType =
    parent match {
      case None => batch
      case Some(p) =>
        batch.fields.foreach { f =>
          p.fields.find(_.name.equalsIgnoreCase(f.name)).foreach { pf =>
            require(pf.dataType == f.dataType,
              s"schema evolution: column ${f.name} changed type ${pf.dataType} -> ${f.dataType}")
          }
        }
        org.apache.spark.sql.types.StructType(
          p.fields ++ batch.fields.filterNot(f =>
            p.fields.exists(_.name.equalsIgnoreCase(f.name))))
    }

  /** Parent schema for a commit's merge: the declared header when the
    * parent manifest carries one; for a LEGACY manifest (pre-evolution
    * log, no `#schema` line) with file entries, inferred from the parent
    * file list itself (one mergeSchema read — a bounded, once-per-commit
    * planning cost, paid only until the next commit writes a header).
    * Without this, appending to a legacy table would re-declare the
    * schema as the batch's alone and parent-only columns would silently
    * vanish from every read of every subsequent version. */
  private def parentSchemaOf(spark: SparkSession, dir: String,
      parentRaw: Seq[String]): Option[org.apache.spark.sql.types.StructType] =
    schemaOf(parentRaw).orElse {
      val files = entryLines(parentRaw).map(parseEntry).map(e => s"$dir/${e.path}")
      if (files.isEmpty) None
      else Some(spark.read.option("mergeSchema", "true").parquet(files: _*).schema)
    }

  /** A manifest line: a batch-relative path plus optional per-file
    * min/max stats for one numeric column (`path⇥col⇥min⇥max`). Stats
    * ride the LOG, not the files — a pruned read decides from the
    * manifest alone which files to open (the Delta/Iceberg data-skipping
    * contract: planning cost ∝ log size, zero footer reads). */
  private[operators] final case class ManifestEntry(
      path: String, stats: Option[(String, Double, Double)]) {
    def line: String = stats match {
      case Some((c, lo, hi)) => s"$path\t$c\t$lo\t$hi"
      case None => path
    }
  }
  private def parseEntry(line: String): ManifestEntry = line.split('\t') match {
    case Array(p, c, lo, hi) => ManifestEntry(p, Some((c, lo.toDouble, hi.toDouble)))
    case Array(p) => ManifestEntry(p, None)
    case other => ManifestEntry(other.head, None)
  }

  /** Commit `df` as version N+1. `overwrite=false` appends (new manifest
    * = parent files + the new batch), `overwrite=true` replaces (new
    * manifest = the new batch alone). `statsCol` records per-file min/max
    * of that column into the manifest — one extra pass over the JUST-
    * WRITTEN batch (cost ∝ changed bytes, like the commit itself), which
    * [[readPruned]] then uses to skip files without opening them.
    * Returns the committed version. */
  /** Shared by [[commit]] and [[commitOptimistic]]: write the batch dir,
    * list its files, and assemble manifest entries (with optional
    * per-file min/max stats). A file whose stats column is entirely null
    * gets a stats-free entry — [[readPruned]] always opens those, so a
    * null-heavy batch degrades to unpruned, never to a failed commit. */
  private def writeBatch(df: DataFrame, dir: String, dirName: String,
      statsCol: Option[String]): Seq[ManifestEntry] = {
    val spark = df.sparkSession
    val fs = fsFor(spark, dir)
    val batch = s"$dir/data/$dirName"
    df.write.mode("overwrite").parquet(batch)
    val batchFiles = fs.listStatus(new Path(batch)).toSeq.map(_.getPath.getName)
      .filter(_.endsWith(".parquet"))
      .map(n => s"data/$dirName/$n")
    statsCol match {
      case None => batchFiles.map(ManifestEntry(_, None))
      case Some(c) =>
        // keyed by bare file name (input_file_name returns a URI) so the
        // manifest assembly stays O(files), not O(files²)
        val byName = spark.read.parquet(batch)
          .groupBy(input_file_name().as("f"))
          .agg(min(col(c).cast("double")).as("lo"), max(col(c).cast("double")).as("hi"))
          .collect()
          .map { r =>
            val uri = r.getString(0)
            val name = uri.substring(uri.lastIndexOf('/') + 1)
            // a grouped file has >= 1 row; null min/max = all-null stats
            // column (keep, stats-free — always opened by a pruned read)
            // null OR NaN min/max = un-prunable stats (all-null column, or
            // a NaN row — Spark's max() returns NaN, which fails EVERY
            // range comparison, so a NaN bound recorded as stats would
            // make readPruned silently skip a file holding in-range rows)
            name -> (if (r.isNullAt(1) || r.isNullAt(2)
                || r.getDouble(1).isNaN || r.getDouble(2).isNaN) None
              else Some((r.getDouble(1), r.getDouble(2))))
          }.toMap
        // ZERO-ROW part files (a filtered write leaves one per empty
        // input partition) never appear in the grouped scan: drop them
        // from the manifest — they carry no content, and as stats-less
        // entries they would be conservatively OPENED by every pruned
        // read forever (measured: 26 of 30 opened files at the 100×
        // read-path probe were empty parts). A batch with no rows at
        // all keeps its listing (stats-free) so the version stays
        // readable.
        //
        // Fail-loud guards (ADVICE r7): a basename mismatch between the
        // input_file_name() URIs and the FS listing (URI-encoding skew)
        // would otherwise silently drop a CONTENT-BEARING file from the
        // table forever. (a) every grouped name must be a listed batch
        // file; (b) every file about to be dropped must truly hold zero
        // rows (the check reads only the dropped files — normally empty
        // parts, so the scan is footer-cheap).
        if (byName.isEmpty) batchFiles.map(ManifestEntry(_, None))
        else {
          val baseNames = batchFiles.map(r => r.substring(r.lastIndexOf('/') + 1)).toSet
          val unmatched = byName.keySet -- baseNames
          require(unmatched.isEmpty,
            s"snapshot commit: stats scan saw files absent from the batch listing " +
              s"(URI/name skew?): ${unmatched.take(3).mkString(", ")}")
          val dropped = batchFiles.filterNot(rel =>
            byName.contains(rel.substring(rel.lastIndexOf('/') + 1)))
          if (dropped.nonEmpty) {
            val nonEmpty = spark.read.parquet(
                dropped.map(rel => s"$dir/$rel"): _*).limit(1).count()
            require(nonEmpty == 0,
              s"snapshot commit: refusing to drop ${dropped.size} manifest entries — " +
                s"a file slated as zero-row holds data (name-matching bug): " +
                s"${dropped.take(3).mkString(", ")}")
          }
          batchFiles.flatMap { rel =>
            val name = rel.substring(rel.lastIndexOf('/') + 1)
            byName.get(name).map(st => ManifestEntry(rel, st.map { case (lo, hi) => (c, lo, hi) }))
          }
        }
    }
  }

  def commit(df: DataFrame, dir: String, overwrite: Boolean = false,
      statsCol: Option[String] = None, batchTag: Option[String] = None): Int = {
    val spark = df.sparkSession
    val fs = fsFor(spark, dir)
    val prior = versions(spark, dir)
    val v = prior.lastOption.getOrElse(0) + 1
    val dirName = batchTag.getOrElse(s"b$v")
    // a tag colliding with the log's own dir names ("b<N>"/"bu<uuid>")
    // would let writeBatch's overwrite clobber a live batch — either this
    // commit clobbering an existing dir, or a FUTURE untagged commit
    // landing on the tag's name; a tag referenced by any surviving
    // manifest is the same hazard spelled differently
    batchTag.foreach { t =>
      require(!t.matches("b\\d+|bu[0-9a-f-]+"),
        s"batchTag '$t' matches the log's reserved batch-dir patterns")
      val referenced = prior.exists(pv =>
        entryLines(readManifest(spark, dir, pv))
          .exists(l => parseEntry(l).path.split("/")(1) == t))
      require(!referenced,
        s"batchTag '$t' is already referenced by a published manifest — " +
          "overwriting it would corrupt history (use commitIfAbsent for replays)")
    }
    val entries = writeBatch(df, dir, dirName, statsCol)
    val parentRaw =
      if (overwrite) Seq.empty
      else prior.lastOption.map(readManifest(spark, dir, _)).getOrElse(Seq.empty)
    // the child manifest re-declares the (possibly widened) schema; the
    // parent's header is superseded, its file entries carry over
    val schema = mergeSchemas(
      if (overwrite) None else parentSchemaOf(spark, dir, parentRaw), df.schema)
    val tmp = new Path(s"$dir/_log/$v.tmp")
    fs.mkdirs(new Path(s"$dir/_log"))
    val out = fs.create(tmp, true)
    try out.write((schemaHeader(schema) +: (entryLines(parentRaw) ++ entries.map(_.line)))
      .mkString("\n").getBytes("UTF-8"))
    finally out.close()
    // atomic publish — FileSystem.rename reports failure by RETURNING
    // false (dest exists, permissions, quota), not by throwing; swallowing
    // it would acknowledge a commit whose manifest never landed (the batch
    // becomes an invisible orphan vacuum later deletes)
    require(fs.rename(tmp, manifestPath(dir, v)),
      s"snapshot commit: manifest publish rename failed for version $v under $dir")
    v
  }

  /** Multi-writer optimistic commit: N concurrent writers race for
    * version slots and every writer eventually lands, each in its own
    * slot — the OCC protocol of the lakehouse formats (Delta's
    * HDFSLogStore shape). Differences from single-writer [[commit]]:
    *
    *   - the batch dir is WRITER-UNIQUE (`bu<uuid>`), so contending
    *     writers can never cross-clobber data files — data lands once,
    *     outside the retry loop, and only the manifest publish retries;
    *   - the publish is a compare-and-swap: temp-write, then
    *     `FileContext.rename(…, Options.Rename.NONE)`, which fails if
    *     the destination exists (unlike `FileSystem.rename`, which on a
    *     posix-backed FS silently REPLACES the destination — the reason
    *     plain [[commit]] is documented single-writer);
    *   - on a lost race the writer re-reads the winner's manifest as the
    *     new parent and retries the next slot. An append never conflicts
    *     semantically with another append (file sets union), so retries
    *     always succeed eventually; `maxAttempts` bounds pathological
    *     contention.
    *
    * The check-then-rename inside FileContext leaves a TOCTOU window on
    * filesystems without atomic no-overwrite rename; HDFS/ABFS close it
    * natively. On LOCAL posix the publish uses hard-link instead:
    * link(2) fails with EEXIST atomically in the kernel, so two racers
    * can never both claim a slot (the window surfaced as a once-in-many-
    * runs lost row in ConcurrentCommitSpec before this branch existed).
    * Cost at 100 TB: contention is per TABLE and manifests are KBs, so
    * a lost race costs one manifest re-read + one rename, never a data
    * rewrite. Returns the version this writer committed. */
  def commitOptimistic(df: DataFrame, dir: String, overwrite: Boolean = false,
      statsCol: Option[String] = None, maxAttempts: Int = 50): Int = {
    val spark = df.sparkSession
    val fs = fsFor(spark, dir)
    // FULL uuid: a truncated one (32 bits was the original sin here)
    // birthday-collides on long-lived multi-writer tables, and writeBatch's
    // overwrite would then delete a live batch still referenced by
    // published manifests
    val uniq = java.util.UUID.randomUUID().toString
    val dirName = s"bu$uniq"
    val entries = writeBatch(df, dir, dirName, statsCol)
    fs.mkdirs(new Path(s"$dir/_log"))
    val fc = org.apache.hadoop.fs.FileContext.getFileContext(
      new Path(dir).toUri, spark.sparkContext.hadoopConfiguration)
    var attempt = 0
    while (attempt < maxAttempts) {
      attempt += 1
      val prior = versions(spark, dir)
      val v = prior.lastOption.getOrElse(0) + 1
      val parentRaw =
        if (overwrite) Seq.empty
        else prior.lastOption.map(readManifest(spark, dir, _)).getOrElse(Seq.empty)
      val schema = mergeSchemas(
        if (overwrite) None else parentSchemaOf(spark, dir, parentRaw), df.schema)
      val tmp = new Path(s"$dir/_log/$v-$uniq.tmp")
      val out = fs.create(tmp, true)
      try out.write((schemaHeader(schema) +: (entryLines(parentRaw) ++ entries.map(_.line)))
        .mkString("\n").getBytes("UTF-8"))
      finally out.close()
      try {
        if (fs.getScheme == "file") {
          // local posix: hard-link is the kernel-atomic fail-if-exists
          // publish (FileContext.rename(NONE) is check-then-rename here)
          java.nio.file.Files.createLink(
            java.nio.file.Paths.get(manifestPath(dir, v).toUri.getPath),
            java.nio.file.Paths.get(tmp.toUri.getPath))
          fs.delete(tmp, false)
        } else {
          fc.rename(tmp, manifestPath(dir, v), org.apache.hadoop.fs.Options.Rename.NONE)
        }
        return v // CAS won
      } catch {
        case _: org.apache.hadoop.fs.FileAlreadyExistsException |
            _: java.nio.file.FileAlreadyExistsException =>
          fs.delete(tmp, false) // lost the slot — re-read parent, retry
      }
    }
    throw new IllegalStateException(
      s"commitOptimistic: $maxAttempts attempts lost the manifest CAS under $dir")
  }

  /** Idempotent tagged commit — the exactly-once primitive for streaming
    * ingest: if `tag` was ever delivered, the commit is a no-op (a
    * foreachBatch replay after a crash must not append twice). Otherwise
    * the data write lands in the tag-named dir (Overwrite — a replay of
    * a HALF-written crash rewrites in place) and the manifest publish is
    * the atomic commit point. Single-writer semantics PER TAG NAMESPACE:
    * two streams sharing one table must use disjoint tag prefixes
    * (checkpoint batchIds restart at 0 per stream). Returns the version
    * committed, or None if already done.
    *
    * Delivery is remembered two ways (r9 review find): a durable
    * `_tags/<tag>` marker written after the publish, PLUS the manifest
    * references themselves. The marker survives compact() + vacuum() —
    * an overwrite manifest drops all tag references, and once vacuum
    * removes the pre-overwrite manifests, the manifest check ALONE would
    * re-append a replayed batch into a sink documented exactly-once. The
    * manifest fallback covers legacy tables and the crash window between
    * publish and marker write (a replay then backfills the marker); it
    * also keeps the common path O(1) instead of O(versions × entries)
    * per micro-batch. */
  def commitIfAbsent(df: DataFrame, dir: String, tag: String,
      statsCol: Option[String] = None): Option[Int] = {
    val spark = df.sparkSession
    val fs = fsFor(spark, dir)
    val marker = new Path(s"$dir/_tags/$tag")
    if (fs.exists(marker)) return None
    val done = versions(spark, dir).exists { v =>
      entryLines(readManifest(spark, dir, v))
        .exists(l => parseEntry(l).path.split("/")(1) == tag)
    }
    val committed =
      if (done) None
      else Some(commit(df, dir, overwrite = false, statsCol = statsCol, batchTag = Some(tag)))
    fs.mkdirs(new Path(s"$dir/_tags"))
    fs.create(marker, true).close()
    committed
  }

  /** Read a pinned version (time travel) or the latest. The file list is
    * resolved once — the returned frame is stable under later commits. */
  def read(spark: SparkSession, dir: String, version: Option[Int] = None): DataFrame = {
    val vs = versions(spark, dir)
    require(vs.nonEmpty, s"no published snapshot under $dir")
    val v = version.getOrElse(vs.last)
    require(vs.contains(v), s"version $v not published (have ${vs.mkString(",")})")
    val raw = readManifest(spark, dir, v)
    val files = entryLines(raw).map(parseEntry).map(e => s"$dir/${e.path}")
    // apply the version's declared schema: files committed before an ADD
    // COLUMN lack the new field and parquet surfaces it as null — no
    // rewrite, no mergeSchema footer sweep (planning stays log-bounded)
    schemaOf(raw) match {
      case Some(st) => spark.read.schema(st).parquet(files: _*)
      case None => spark.read.parquet(files: _*)
    }
  }

  /** Range-pruned read: open ONLY the files whose recorded [min,max] for
    * `statsCol` overlaps [lo, hi] (files without stats are always read —
    * correctness never depends on stats presence). Returns the pruned
    * frame and the (opened, total) file counts; the caller still applies
    * its row-level predicate — stats only bound what gets opened. */
  def readPruned(spark: SparkSession, dir: String, statsCol: String,
      lo: Double, hi: Double, version: Option[Int] = None): (DataFrame, Int, Int) = {
    val vs = versions(spark, dir)
    require(vs.nonEmpty, s"no published snapshot under $dir")
    val v = version.getOrElse(vs.last)
    require(vs.contains(v), s"version $v not published (have ${vs.mkString(",")})")
    val raw = readManifest(spark, dir, v)
    val entries = entryLines(raw).map(parseEntry)
    val kept = entries.filter {
      // skip only when PROVABLY disjoint: the negated form keeps a file
      // whose recorded bound is NaN (every NaN comparison is false —
      // phrased as a positive overlap test, a NaN bound silently pruned
      // files holding in-range rows; writeBatch also refuses to record
      // NaN stats, so this is the read-side belt for legacy manifests)
      case ManifestEntry(_, Some((c, fLo, fHi))) if c == statsCol => !(fHi < lo || fLo > hi)
      case _ => true
    }
    val paths = kept.map(e => s"$dir/${e.path}")
    val pruned = (schemaOf(raw), paths) match {
      case (Some(st), _) => spark.read.schema(st).parquet(paths: _*)
      case (None, Nil) if entries.nonEmpty =>
        // legacy manifest (no declared schema) with EVERY file pruned:
        // zero-path spark.read throws "unable to infer schema" — borrow
        // the schema from one manifest file and return the empty frame
        spark.read.parquet(s"$dir/${entries.head.path}").where(lit(false))
      case _ => spark.read.parquet(paths: _*)
    }
    (pruned, kept.size, entries.size)
  }

  /** The rows APPENDED between two published versions: the manifest diff
    * names exactly the batch files commits (fromV, toV] added, and for
    * the append-only history those files ARE the change set — a
    * change-data feed read straight off the log, no diffing job, no scan
    * of the base table (the Delta CDF / Iceberg incremental-read
    * contract). Cost ∝ changed bytes at any table size. */
  def appendedBetween(spark: SparkSession, dir: String, fromV: Int, toV: Int): DataFrame = {
    val vs = versions(spark, dir)
    require(vs.contains(fromV) && vs.contains(toV) && fromV < toV,
      s"need published fromV < toV, have ${vs.mkString(",")}")
    val before = entryLines(readManifest(spark, dir, fromV)).map(parseEntry(_).path).toSet
    val toRaw = readManifest(spark, dir, toV)
    val after = entryLines(toRaw).map(parseEntry(_).path)
    // append-only guard (r9 review find): an overwrite commit (compact,
    // replace) inside (fromV, toV] REMOVES files, and the naive manifest
    // diff then returns the entire rewritten table as the "delta" — an
    // incremental consumer would double-count every pre-existing row.
    // Fail loudly; a change feed across an overwrite needs a base re-read.
    val removed = before -- after.toSet
    require(removed.isEmpty,
      s"appendedBetween(v$fromV, v$toV): ${removed.size} files were REMOVED in the range " +
        "(an overwrite/compact commit) — the manifest diff is not a change feed here")
    val added = after.filterNot(before)
    require(added.nonEmpty, s"no files appended between v$fromV and v$toV")
    schemaOf(toRaw) match {
      case Some(st) => spark.read.schema(st).parquet(added.map(f => s"$dir/$f"): _*)
      case None => spark.read.parquet(added.map(f => s"$dir/$f"): _*)
    }
  }

  /** Rewrite the live view into `nFiles` batches and publish it as a new
    * version — the small-file compaction every log table needs (a year
    * of day-appends is 365 batches; scans pay per-file open cost). The
    * old versions stay readable until [[vacuum]]; content is untouched. */
  def compact(spark: SparkSession, dir: String, nFiles: Int = 4): Int =
    commit(read(spark, dir).coalesce(nFiles), dir, overwrite = true)

  /** Orphan grace for [[vacuum]]: an unreferenced batch dir younger than
    * this is left alone — it may belong to a commit that has written its
    * data but not yet published its manifest (the window every commit
    * path has between the parquet write and the rename). Without the
    * guard, a vacuum racing a concurrent writer deletes the writer's
    * batch and its about-to-publish version is born unreadable — the
    * same hazard Delta's VACUUM retention threshold exists for. */
  val OrphanGraceMs: Long = 10 * 60 * 1000L

  /** Retain the last `keep` versions: drop older manifests, then delete
    * every batch dir no surviving manifest references — except
    * unreferenced dirs modified within `orphanGraceMs` (in-flight
    * commits; see [[OrphanGraceMs]]). Also reclaims stale `.tmp`
    * manifests under `_log` older than the grace window: a
    * [[commitOptimistic]] writer that crashes between temp-write and
    * publish leaves its tmp behind, and on crashy workloads those
    * accumulate unboundedly — a tmp never matches the published-version
    * regex, so removal is safe. */
  def vacuum(spark: SparkSession, dir: String, keep: Int = 2,
      orphanGraceMs: Long = OrphanGraceMs): Unit = {
    val fs = fsFor(spark, dir)
    val vs = versions(spark, dir)
    val (drop, stay) = vs.splitAt(math.max(0, vs.length - keep))
    val live = stay.flatMap(v => entryLines(readManifest(spark, dir, v)))
      .map(parseEntry(_).path.split("/")(1)).toSet // batch dir names, e.g. b3
    drop.foreach(v => fs.delete(manifestPath(dir, v), false))
    val cutoff = System.currentTimeMillis() - orphanGraceMs
    val dataRoot = new Path(s"$dir/data")
    if (fs.exists(dataRoot))
      fs.listStatus(dataRoot).toSeq
        .filterNot(st => live(st.getPath.getName))
        .filter(_.getModificationTime <= cutoff)
        .foreach(st => fs.delete(st.getPath, true))
    val logRoot = new Path(s"$dir/_log")
    if (fs.exists(logRoot))
      fs.listStatus(logRoot).toSeq
        .filter(_.getPath.getName.endsWith(".tmp"))
        .filter(_.getModificationTime <= cutoff)
        .foreach(st => fs.delete(st.getPath, false))
  }

  /** Value split for the oracled demo: commit 1 = high-value events,
    * commit 2 appends the rest. Time travel to v1 must re-surface
    * exactly the high-value slice. */
  val SplitValue = 50.0

  /** Registered demo: build a two-commit snapshot table from `events`
    * (idempotently, under a corpus-keyed scratch dir), then TIME-TRAVEL
    * to version 1. The oracle recomputes v1's content relationally —
    * proving the log preserved bytes, not just counts. The build is
    * harness-scoped; production tables commit once per ingest, and the
    * read path is the only per-query cost (one manifest + a pruned file
    * list — never a directory walk over history). */
  def snapshotDemo(spark: SparkSession, dir: String): DataFrame = {
    val table = s"/tmp/graft_snap_${Integer.toHexString(dir.hashCode)}"
    val fs = fsFor(spark, table)
    fs.delete(new Path(table), true)
    val ev = Tables.events(spark, dir)
      .select(col("event_id"), col("user_id"), col("event_type"),
        round(col("value"), 2).as("value"))
    commit(ev.filter(col("value") > SplitValue), table)
    // the complement is NULL-closed: a null value satisfies neither
    // comparison, and a two-sided `>` / `<=` split would silently drop
    // the row from every version of the table
    commit(ev.filter(!(col("value") > SplitValue) || col("value").isNull), table)
    read(spark, table, version = Some(1)).orderBy("event_id")
  }

  /** Registered demo: incremental materialized-view maintenance off the
    * log. A per-user aggregate is built on version 1, then REFRESHED by
    * combining in the aggregate of only [[appendedBetween]](1, 2) — the
    * base table is never rescanned. Sum/count are the classic
    * self-maintainable aggregates (merge = add); the oracle recomputes
    * the refreshed view from scratch over the full table, so a drifted
    * incremental merge fails the hash. At 100 TB this is the difference
    * between a view refresh ∝ day-batch and one ∝ history. */
  def incrMatviewDemo(spark: SparkSession, dir: String): DataFrame = {
    val table = s"/tmp/graft_snap_${Integer.toHexString(dir.hashCode)}"
    snapshotDemo(spark, dir) // (re)build v1+v2 — commits run eagerly inside
    def viewOf(df: DataFrame): DataFrame =
      df.groupBy("user_id").agg(count(lit(1)).as("cnt"), sum("value").as("sv"))
    val mv1 = viewOf(read(spark, table, Some(1)))
    val delta = viewOf(appendedBetween(spark, table, 1, 2))
    mv1.select(col("user_id"), col("cnt"), col("sv"))
      .join(delta.select(col("user_id"), col("cnt").as("dc"), col("sv").as("dv")),
        Seq("user_id"), "full_outer")
      .select(col("user_id"),
        (coalesce(col("cnt"), lit(0L)) + coalesce(col("dc"), lit(0L))).as("cnt"),
        round(coalesce(col("sv"), lit(0.0)) + coalesce(col("dv"), lit(0.0)), 2).as("sv"))
      .orderBy("user_id")
  }

  /** VIP threshold for the schema-evolution demo's added column. */
  val VipValue = 90.0

  /** Registered demo: ADD COLUMN without rewriting history. Commit 1
    * writes (event_id, value); commit 2 appends rows that ALSO carry a
    * `vip` flag. The v2 manifest's schema header widens to three columns
    * while v1's files stay byte-identical on disk — reading latest
    * surfaces vip = null for every pre-evolution row, and time travel to
    * v1 still sees the two-column schema. The oracle recomputes the
    * same frame relationally (CASE routes each row through the batch it
    * landed in), so a reader that dropped, rewrote, or misaligned old
    * files fails the hash. */
  def schemaEvoDemo(spark: SparkSession, dir: String): DataFrame = {
    val table = s"/tmp/graft_snapevo_${Integer.toHexString(dir.hashCode)}"
    val fs = fsFor(spark, table)
    fs.delete(new Path(table), true)
    val ev = Tables.events(spark, dir)
      .select(col("event_id"), round(col("value"), 2).as("value"))
    commit(ev.filter(col("value") > SplitValue), table)
    commit(ev.filter(!(col("value") > SplitValue) || col("value").isNull)
      .withColumn("vip", col("value") > VipValue), table)
    read(spark, table).orderBy("event_id")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ly_snapshot" -> snapshotDemo _,
    "ly_incr_matview" -> incrMatviewDemo _,
    "ly_schema_evo" -> schemaEvoDemo _,
  )

  val oracleSql: Map[String, String] = Map(
    "ly_snapshot" ->
      s"""SELECT event_id, user_id, event_type, ROUND(value, 2) AS value
        |FROM events WHERE ROUND(value, 2) > $SplitValue
        |ORDER BY event_id""".stripMargin.replaceAll("\n", " "),
    // relational recompute: pre-evolution rows (value > split, batch 1)
    // carry NULL vip; post-evolution rows carry the computed flag
    "ly_schema_evo" ->
      s"""SELECT event_id, ROUND(value, 2) AS value,
        |CASE WHEN ROUND(value, 2) <= $SplitValue THEN ROUND(value, 2) > $VipValue
        |ELSE NULL END AS vip
        |FROM events ORDER BY event_id""".stripMargin.replaceAll("\n", " "),
    // full recompute over the base table — the incremental merge must
    // land on the same numbers
    "ly_incr_matview" ->
      """SELECT user_id, CAST(COUNT(*) AS BIGINT) AS cnt,
        |ROUND(SUM(ROUND(value, 2)), 2) AS sv
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin.replaceAll("\n", " "),
  )
}

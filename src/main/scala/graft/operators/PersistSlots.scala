package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.storage.StorageLevel

/** Memoized persistence for operator intermediates: ONE persisted,
  * materialized frame per (session, operator, input) — the "computed
  * once, persisted" contract for reusable artifacts like minhash
  * signatures and LSH bucket tables. Repeated invocations (warm-up +
  * timed bench runs, candidate generation + verification) share the
  * same frame instead of stacking fresh persisted copies per call
  * (which leaks cache until the session dies) or re-persisting from
  * scratch (which recomputes the expensive md5/bucket fan-out on every
  * call). Keyed by Spark application id so a frame is never served to a
  * different session in the same JVM. If the input data is REWRITTEN
  * in-place mid-process, call clear(). */
private[graft] object PersistSlots {
  private val slots = scala.collection.concurrent.TrieMap.empty[String, DataFrame]
  private val counts = scala.collection.concurrent.TrieMap.empty[String, Long]

  def cached(spark: SparkSession, key: String)(build: => DataFrame): DataFrame =
    slot(spark, key) {
      val p = build.persist(StorageLevel.MEMORY_AND_DISK)
      // materialize once, eagerly — callers rely on it; the count is
      // memoized so size-branch callers (JoinBacks users) never pay a
      // second action just to re-learn the cardinality
      counts.put(s"${spark.sparkContext.applicationId}|$key", p.count())
      p
    }

  /** The row count recorded when [[cached]] materialized `key` (None if
    * the slot was never built in this application). */
  def rowCount(spark: SparkSession, key: String): Option[Long] =
    counts.get(s"${spark.sparkContext.applicationId}|$key")

  /** Like [[cached]], but materializes via `localCheckpoint` — same
    * storage level, same memoization, lineage CUT. For a frame whose
    * build chain ends in large shuffles that nothing downstream should
    * keep alive: Spark retains a stage's shuffle files for as long as
    * its ShuffleDependency is reachable, and a plain persist keeps the
    * whole build lineage reachable (for block-loss recompute) until the
    * frame is unpersisted — so a multi-stage consumer job holds the
    * build's shuffle footprint on disk for its entire runtime on top of
    * its own. Checkpointing makes the build's dependencies unreachable
    * the moment materialization finishes; the ContextCleaner reclaims
    * their files at the next driver GC (Bench/Verify and the scale
    * probes run with `spark.cleaner.periodicGC.interval=30s` for exactly
    * this). Motivating case: q33_triangles at 100× on one box, where the
    * persisted edge-build's retained shuffle files were a large share of
    * the disk footprint behind the recorded ENOSPC (BENCH_NOTES r8).
    *
    * Two checkpoint modes (VERDICT r8 #2), picked by whether a
    * checkpoint dir is configured (`SparkContext.setCheckpointDir` or
    * the `spark.checkpoint.dir` conf): */
  def cachedCheckpoint(spark: SparkSession, key: String)(build: => DataFrame): DataFrame =
    slot(spark, key) {
      val dir = spark.sparkContext.getCheckpointDir
        .orElse(spark.conf.getOption("spark.checkpoint.dir").map { d =>
          spark.sparkContext.setCheckpointDir(d); d
        })
      if (dir.isDefined) {
        // RELIABLE checkpoint: blocks land in the configured (shared)
        // store, so on a real cluster an executor loss re-reads them
        // instead of failing the consumer job — the cluster-deployment
        // mode; costs one extra materialization write to that store.
        // Dataset.checkpoint does NOT persist (r9 review find): without
        // the pre-persist the eager count and the checkpoint-file write
        // are two full computations of the build, and without the
        // post-persist every consumer job re-reads the full frame from
        // the shared store — silently un-caching the slot contract.
        val built = build.persist(StorageLevel.MEMORY_AND_DISK)
        val cp = try built.checkpoint() // eager; writes from cached blocks
        finally built.unpersist(false)
        val served = cp.persist(StorageLevel.MEMORY_AND_DISK)
        // fill the cache once AND memoize the count (rowCount serves
        // size-branch and scalar-deriving callers job-free afterwards)
        counts.put(s"${spark.sparkContext.applicationId}|$key", served.count())
        served
      } else {
        // LOCAL checkpoint: executor-local blocks, no external write —
        // the single-box default. Blocks are non-reproducible, so an
        // executor loss fails the job instead of recomputing
        val cp = build.localCheckpoint() // eager by default
        // one cheap count over the checkpointed blocks at build time so
        // rowCount works for checkpointed slots too (callers like q33's
        // edge-count scalar otherwise re-run the job per invocation)
        counts.put(s"${spark.sparkContext.applicationId}|$key", cp.count())
        cp
      }
    }

  /** Materialize `df` with its lineage CUT — the per-frame (un-slotted)
    * form of [[cachedCheckpoint]]'s two-mode discipline: reliable
    * `checkpoint()` when a checkpoint dir is configured (executor-loss
    * safety on clusters), `localCheckpoint()` otherwise. For iterative
    * fixpoint loops: a round that references its previous frame TWICE
    * (join + union, the Hash-Min shape) doubles the logical plan per
    * round, so plan size — and every plan-string render in the SQL
    * listener — grows 2^rounds. A 29-round fixture OOM'd the driver in
    * `QueryExecution.explainString` before any task ran (r9 review
    * find); re-rooting each round at a materialized scan keeps the plan
    * constant-size. The returned frame is cached (checkpoint blocks /
    * persisted checkpoint scan); `unpersist(false)` releases it. */
  def cutLineage(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    val dir = spark.sparkContext.getCheckpointDir
      .orElse(spark.conf.getOption("spark.checkpoint.dir").map { d =>
        spark.sparkContext.setCheckpointDir(d); d
      })
    if (dir.isDefined) {
      val built = df.persist(StorageLevel.MEMORY_AND_DISK)
      val cp = try built.checkpoint() // eager; writes from cached blocks
      finally built.unpersist(false)
      cp.persist(StorageLevel.MEMORY_AND_DISK)
    } else df.localCheckpoint() // eager; blocks ARE the cache
  }

  // per-key build locks: TrieMap.getOrElseUpdate can evaluate the build
  // twice under concurrent callers (Verify's pooled query dump, guide
  // §2.6), which would double-persist the frame and leak one cache copy.
  // Striped per-key (never one global lock): a slot build may itself
  // build ANOTHER slot (cluster → lsh-xxh), so same-key exclusion must
  // not serialize different keys.
  private val buildLocks =
    new java.util.concurrent.ConcurrentHashMap[String, Object]()

  private def slot(spark: SparkSession, key: String)(materialize: => DataFrame): DataFrame = {
    val appId = spark.sparkContext.applicationId
    // drop slots belonging to other (stopped) applications so a
    // long-lived JVM cycling SparkSessions can't accumulate stale
    // DataFrame references and their lineage (one live SparkContext per
    // JVM ⇒ a different appId is always a dead one)
    slots.keys.filterNot(_.startsWith(s"$appId|")).foreach { k =>
      slots.remove(k).foreach(df =>
        try df.unpersist(false) catch { case _: Throwable => () })
    }
    counts.keys.filterNot(_.startsWith(s"$appId|")).foreach(counts.remove)
    val fullKey = s"$appId|$key"
    slots.get(fullKey) match {
      case Some(df) => df
      case None =>
        val lock = buildLocks.computeIfAbsent(fullKey, _ => new Object)
        lock.synchronized(slots.getOrElseUpdate(fullKey, materialize))
    }
  }

  /** Release every memoized frame (after an in-place data rewrite). */
  def clear(): Unit = {
    slots.values.foreach(df =>
      try df.unpersist(false) catch { case _: Throwable => () })
    slots.clear()
    counts.clear()
    // checkpointed slots ([[cachedCheckpoint]]) hold their blocks via the
    // checkpoint RDD, which Dataset.unpersist cannot reach — dropping the
    // reference + a GC lets the ContextCleaner release them (occupancy
    // only: a cleared slot always REBUILDS, so cold-pass honesty does not
    // depend on this)
    System.gc()
  }
}

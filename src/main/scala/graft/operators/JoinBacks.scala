package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.broadcast

/** The shared cardinality branch for vector JOIN-BACKS — the "ship the
  * table to the candidate stream, not the stream to the table" rule used
  * by [[Dedup.embeddingCosineBucketed]] and [[Mining.mineBitextAnn]]: a
  * shuffle join re-exchanges the id-only candidate stream carrying the
  * full vector payload (~70 GB at the 100× probe, measured ENOSPC —
  * BENCH_NOTES r8), while the embedding table itself is N·(8·dim) bytes,
  * orders smaller than the stream probing it (the FAISS
  * shard-the-index-in-RAM shape). Broadcast when it fits; fall back to
  * the plain shuffle join-back when it does not.
  *
  * Centralized (ADVICE r8) because the two call sites had drifted into a
  * duplicated literal threshold with three hidden wrongs:
  *   - the 4 GiB constant was untied to any memory conf, so between the
  *     constant and real executor memory the branch OOM'd instead of
  *     degrading;
  *   - each call site broadcasts TWO projections of the table (the a-side
  *     and b-side join-backs are distinct broadcast relations), so peak
  *     footprint was 2× what the guard priced;
  *   - the 528 B/row estimate hard-coded 64-dim vectors.
  */
object JoinBacks {

  /** Spark refuses any single broadcast relation over 8 GB; branch to the
    * shuffle form with ~10% margin before hitting that wall. */
  private val SparkBroadcastCap = (8L << 30) - (8L << 30) / 10

  /** Estimated in-memory bytes of one (id: long, vec: array<double>) row
    * inside a broadcast HashedRelation: 8·dim vector payload + the id +
    * UnsafeRow/UnsafeArrayData headers and map slot overhead. */
  def vectorRowBytes(dim: Int): Long = 8L * dim + 64L

  /** Per-JVM heap budget for the SUM of simultaneously-live broadcast
    * relations: `graft.broadcast.budget` (bytes) when set (or the
    * `GRAFT_BROADCAST_BUDGET` env var — forked probe JVMs like QueryTime
    * build their own session, and a non-`spark.*` conf can't reach them
    * any other way), else a quarter of executor memory
    * (`spark.executor.memory`; in local mode the driver heap IS the
    * executor heap, so `Runtime.maxMemory` is the honest default). A
    * quarter, because the broadcast relations share the heap with the
    * candidate stream's own task memory, and the driver additionally
    * holds the collected copy while broadcasting. The binding heap is
    * the SMALLER of driver and executor (r9 review find): a 64 g-executor
    * / 4 g-driver cluster must budget off the driver that collects, and
    * in local mode a spark-defaults `spark.executor.memory` larger than
    * the real JVM heap must not inflate the budget past the one heap
    * everything actually shares (`Runtime.maxMemory` IS the driver heap
    * in every deployment, so it always participates in the min). */
  def broadcastBudget(spark: SparkSession): Long =
    spark.conf.getOption("graft.broadcast.budget")
      .orElse(sys.env.get("GRAFT_BROADCAST_BUDGET")).map(_.toLong).getOrElse {
      val executor = spark.conf.getOption("spark.executor.memory")
        .map(org.apache.spark.network.util.JavaUtils.byteStringAsBytes)
        .getOrElse(Long.MaxValue)
      math.min(executor, Runtime.getRuntime.maxMemory) / 4
    }

  /** True when `sides` simultaneous broadcast relations of `perSideBytes`
    * each fit: every side under Spark's hard relation cap AND the sum
    * under the conf-derived budget. A NEGATIVE size means a caller's
    * row-count × row-bytes estimate overflowed Long (an unknown-size
    * sentinel times any width does) — that must read as "does not fit",
    * never as a free pass to broadcast an arbitrarily large relation. */
  def fits(spark: SparkSession, perSideBytes: Long, sides: Int = 2): Boolean =
    perSideBytes >= 0 && perSideBytes <= SparkBroadcastCap &&
      sides.toLong * perSideBytes <= broadcastBudget(spark)

  /** True when `sides` simultaneous vector join-backs over an `nRows` ×
    * `dim`-double table broadcast under [[fits]] — exposed so a caller
    * can align OTHER plan choices with the same regime (Mining skips its
    * candidate pre-dedup exactly when the join-backs are map-side). */
  def vectorsFit(spark: SparkSession, nRows: Long, dim: Int,
      sides: Int = 2): Boolean =
    fits(spark, nRows * vectorRowBytes(dim), sides)

  /** Join-side transform for `sides` simultaneous vector join-backs over
    * an `nRows` × `dim`-double table: `broadcast` when ALL sides fit the
    * budget together (and each fits Spark's hard relation cap), else
    * identity — the plain shuffle join-back, slower but never OOM. */
  def vectorJoinBack(spark: SparkSession, nRows: Long, dim: Int,
      sides: Int = 2): DataFrame => DataFrame =
    if (vectorsFit(spark, nRows, dim, sides)) df => broadcast(df)
    else identity
}

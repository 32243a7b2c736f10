package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.operators.EntityResolution

/** Streaming record linkage against a GROWING registry — the form
  * [[EntityResolution.linkStream]] (stream vs frozen registry) cannot
  * express: both sides arrive over time, and a clean record that lands
  * AFTER a dirty record may be its best (or only) match. The batch
  * answer over everything-so-far must emerge incrementally.
  *
  * Same keyed-state discipline as [[DocStreams]]: state lives per
  * BLOCKING KEY (the name's stable [[EntityResolution.BlockSuffix]]-char
  * suffix — uniformly distributed, so state spreads across executors
  * exactly like the batch blocking join's shuffle, and wide enough that
  * key cardinality grows with the registry — see the BlockSuffix
  * scaladoc), and holds (a) the registry records seen in this
  * block and (b) the dirty records still resident with their current
  * best link. Per micro-batch and block:
  *
  *   - new registry records join the block state, then are scored
  *     against every RESIDENT dirty record — an improvement (smaller
  *     (dist, a_key), the batch tie-break order) re-emits that record's
  *     link;
  *   - new dirty records score against the full block registry and emit
  *     their current best link if any candidate clears [[EntityResolution.MaxDist]].
  *
  * Emission is append-mode "link improvements": the LATEST emission per
  * b_key (equivalently the (dist, a_key)-minimum) is the record's
  * current link, and once both feeds are drained it equals the batch
  * [[EntityResolution.linkRegistries]] result exactly (ErStreamSpec).
  *
  * Scale notes: per-block work is |new| × |block| — the same block²
  * bound as the batch join, paid incrementally; nothing is ever
  * all-pairs. State is block-sized and permanent in the DEFAULT
  * configuration (NoTimeout — exact parity for bounded replays). The
  * production configuration passes `horizonMs` (VERDICT r7 #5), which
  * bounds state two ways, both spec-pinned in ErStreamSpec:
  *
  *   - horizon eviction ([[DocStreams.nearDupCandidates]]'s
  *     ProcessingTimeTimeout idiom): a block idle past the horizon is
  *     dropped whole — registry entries AND resident dirty records —
  *     so state size tracks the ACTIVE key range, not the full history;
  *   - dist-0 compaction: a resident dirty record whose best link hits
  *     distance 0 leaves the resident set — its link can only be
  *     re-ranked by ANOTHER exact-name registry duplicate with a
  *     smaller key, a tie-break nicety the production mode trades for
  *     never rescoring exact matches again (the trade is the one
  *     departure from batch parity, and only under registry-duplicate
  *     names; the default mode keeps exact semantics).
  *
  * The horizon bounds IDLE state; a HOT block (a sentinel/empty-name
  * suffix every junk record shares) keeps its lease alive while its
  * registry — and with it per-arrival scoring and the per-batch state
  * rewrite — grows without bound. `maxBlockReg` is that residual's cap:
  * the blocking-key stop-list (see [[scoreBlock]]), freezing an
  * over-full block into an O(1) tombstone.
  */
object ErStreams {

  /** Registry entries + resident dirty records (with current best) of
    * one blocking bucket. bestDist = Int.MaxValue marks "no qualifying
    * match yet". `frozen` is the junk-block tombstone: a block whose
    * registry outgrew `maxBlockReg` holds only this O(1) marker. */
  final case class BlockState(
      reg: Seq[(Long, String)],
      dirty: Seq[(Long, String, Int, Long)],
      frozen: Boolean = false)

  final case class ErLink(b_key: Long, a_key: Long, b_name: String, dist: Int)

  /** Standard unit-cost edit distance — the driver-side twin of Spark's
    * `levenshtein` expression (UTF8String.levenshteinDistance), needed
    * because the scoring runs inside keyed state, not in a Column. */
  private[streaming] def levenshtein(a: String, b: String): Int = {
    val (m, n) = (a.length, b.length)
    if (m == 0) return n
    if (n == 0) return m
    var prev = Array.tabulate(n + 1)(identity)
    var cur = new Array[Int](n + 1)
    var i = 1
    while (i <= m) {
      cur(0) = i
      var j = 1
      while (j <= n) {
        val cost = if (a.charAt(i - 1) == b.charAt(j - 1)) 0 else 1
        cur(j) = math.min(math.min(cur(j - 1) + 1, prev(j) + 1), prev(j - 1) + cost)
        j += 1
      }
      val t = prev; prev = cur; cur = t
      i += 1
    }
    prev(n)
  }

  /** One block's micro-batch transition — the keyed-state kernel,
    * factored out of the stream closure (the Packing.bfdPlace
    * discipline) so ErBlockCapSpec can drive cap/freeze/parity cases
    * directly, without a stream in the loop. Returns the new state and
    * the batch's emissions. */
  private[streaming] def scoreBlock(st: BlockState,
      newReg: Seq[(Long, String)], newDirty: Seq[(Long, String)],
      maxDist: Int, compact: Boolean,
      maxBlockReg: Option[Int]): (BlockState, Seq[ErLink]) = {
    // junk-block tombstone: everything after the freeze passes unscored
    if (st.frozen) return (st, Seq.empty)
    val reg = st.reg ++ newReg
    // a blocking key whose registry outgrows the cap is a junk key
    // (sentinel/empty-name suffix), not a real block — its block² noise
    // pairs are not links (the WinMaxFpDf stop-list semantics applied
    // to blocking, Christen 2012's block-size control). Freeze: drop
    // the block whole, keep an O(1) tombstone, emit nothing — including
    // this batch's records, so the verdict is per-BLOCK, never
    // arrival-order-dependent within the crossing batch.
    if (maxBlockReg.exists(reg.size > _))
      return (BlockState(Seq.empty, Seq.empty, frozen = true), Seq.empty)
    val out = scala.collection.mutable.ArrayBuffer.empty[ErLink]
    // resident dirty records: can only improve via NEW registry rows
    val improved = st.dirty.map { case (bk, bn, bd, ba) =>
      var (d, a) = (bd, ba)
      newReg.foreach { case (ak, an) =>
        val nd = levenshtein(an, bn)
        if (nd <= maxDist && (nd < d || (nd == d && ak < a))) { d = nd; a = ak }
      }
      if ((d, a) != ((bd, ba))) out += ErLink(bk, a, bn, d)
      (bk, bn, d, a)
    }
    // new dirty records: score against the full block registry
    val fresh = newDirty.map { case (bk, bn) =>
      var (d, a) = (Int.MaxValue, Long.MaxValue)
      reg.foreach { case (ak, an) =>
        val nd = levenshtein(an, bn)
        if (nd <= maxDist && (nd < d || (nd == d && ak < a))) { d = nd; a = ak }
      }
      if (d != Int.MaxValue) out += ErLink(bk, a, bn, d)
      (bk, bn, d, a)
    }
    // production compaction: a dist-0 link cannot be IMPROVED
    // (only re-ranked by a duplicate-name registry entry with a
    // smaller key) — drop the record from the resident set so
    // every future registry arrival skips rescoring it
    val resident =
      if (compact) (improved ++ fresh).filter(_._3 > 0)
      else improved ++ fresh
    (BlockState(reg, resident), out.toSeq)
  }

  /** Link a unified (side, key, name) stream — side "a" = clean registry
    * record, side "b" = dirty record — emitting per-dirty-record link
    * improvements as either side grows.
    *
    * @param horizonMs production state bound: a block idle longer than
    *                  this is evicted whole (ProcessingTimeTimeout), and
    *                  resident dirty records leave the state once their
    *                  best link reaches distance 0 (compaction — no
    *                  rescoring of exact matches). None = NoTimeout, no
    *                  compaction: the exact batch-parity configuration.
    * @param maxBlockReg production skew bound (the residual the horizon
    *                  cannot cover: an idle block evicts, a HOT block's
    *                  registry grows forever — per-arrival scoring and
    *                  the per-batch state rewrite both ∝ block size, so
    *                  one sentinel-suffix key turns quadratic). A block
    *                  whose registry exceeds this cap freezes into an
    *                  O(1) junk-block tombstone and everything in it
    *                  thereafter passes unscored — the blocking-key
    *                  stop-list, same semantics family as
    *                  dd_winnow_pairs' WinMaxFpDf. None (default)
    *                  preserves exact parity; with a horizon set, an
    *                  idle tombstone evicts like any other block and a
    *                  resuming key restarts clean. */
  def linkGrowing(spark: SparkSession, records: DataFrame,
      horizonMs: Option[Long] = None,
      maxBlockReg: Option[Int] = None): Dataset[ErLink] = {
    import spark.implicits._
    val maxDist = EntityResolution.MaxDist
    val timeoutConf = if (horizonMs.isDefined) GroupStateTimeout.ProcessingTimeTimeout()
      else GroupStateTimeout.NoTimeout()
    val compact = horizonMs.isDefined
    records
      .select(substring(col("name"), -EntityResolution.BlockSuffix,
          EntityResolution.BlockSuffix).as("blk"),
        col("side"), col("key"), col("name"))
      .as[(String, String, Long, String)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append(), timeoutConf) {
        (_: String, rows: Iterator[(String, String, Long, String)],
            state: GroupState[BlockState]) =>
          if (state.hasTimedOut) { // block idle past the horizon
            state.remove()
            Iterator.empty
          } else {
            val st = state.getOption.getOrElse(BlockState(Seq.empty, Seq.empty))
            val batch = rows.toSeq
            val newReg = batch.collect { case (_, "a", k, n) => (k, n) }
            val newDirty = batch.collect { case (_, "b", k, n) => (k, n) }
            val (next, out) =
              scoreBlock(st, newReg, newDirty, maxDist, compact, maxBlockReg)
            state.update(next)
            // every batch with activity extends the block's lease
            if (horizonMs.isDefined && state.exists)
              state.setTimeoutDuration(horizonMs.get)
            out.iterator
          }
      }
  }
}

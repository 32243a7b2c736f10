package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming forms of the batch funnel / retention operators
  * (graft.operators.EventAnalytics) — the two event-analytics
  * capabilities that previously had no streaming sibling while
  * sessionize/dedup/DSIR/LM all did. Both are flatMapGroupsWithState
  * per user with event-time timeouts, and both are ORDER-INSENSITIVE
  * reductions, so out-of-order delivery inside the watermark horizon
  * cannot change the result (FunnelStreamSpec asserts batch ≡ stream).
  *
  * Scale/state story (the reason these shapes are 100 TB-safe):
  *   - state is keyed by user_id — sharded across executors by the one
  *     shuffle, same key the batch forms aggregate on;
  *   - funnel state per user = min-view scalar + the click/purchase
  *     timestamps still inside the (tv, tv+H] window, pruned against
  *     both the window and the watermark — O(events per user per
  *     horizon), the clickAttribution bound, NOT per-user history;
  *   - retention state per user = cohort day + an 8-bit day mask —
  *     constant;
  *   - timeouts fire when the watermark passes the last instant an
  *     admissible event could still arrive (tv+H for the funnel,
  *     cohort day + maxDays+1 for retention); emission is APPEND-mode
  *     and each user emits once;
  *   - on finalization the state COLLAPSES to a constant-size tombstone
  *     rather than being removed: a user who returns long after the
  *     deadline (routine — these are lifetime-keyed reductions) would
  *     otherwise re-create state and emit a second, wrong-cohort row,
  *     breaking both the once-per-user contract and batch parity. A
  *     tombstone per user ever seen is the honest price of exactly-once
  *     lifetime semantics — the same per-user cardinality any per-user
  *     aggregate holds, sharded by the same key.
  */
object FunnelStreams {

  case class FunnelEv(user_id: Long, event_type: String, us: Long)

  /** minViewUs = Long.MaxValue when no view seen; clicks/purchases hold
    * the still-admissible candidate timestamps (µs). done = the user's
    * row was emitted — later events are ignored (tombstone). */
  case class FunnelState(minViewUs: Long, clicks: Seq[Long], purchases: Seq[Long],
      done: Boolean = false)

  /** Final per-user funnel row (µs timestamps; None = step not reached).
    * The step counts of the batch form are one aggregation away. */
  case class FunnelResult(user_id: Long, tv_us: Option[Long], tc_us: Option[Long],
      tp_us: Option[Long])

  /** Strict-order funnel view → click → purchase within `windowHours` of
    * the user's FIRST view, as a stream. Emits one row per user when the
    * watermark proves the funnel window closed.
    *
    * Order-insensitivity argument (why late/shuffled events are safe):
    * tv = min(view ts) only ever decreases; a decrease shrinks the
    * admissible window (tv, tv+H] on BOTH ends, so buffered candidates
    * are pruned, never resurrected. A click with ts ≤ min(tv, watermark)
    * is dead — the only thing that could revive it is a view older than
    * the watermark, which the watermark contract forbids — so the buffer
    * prunes against the watermark too. On timeout (watermark > tv+H) the
    * exact batch recurrence runs over the surviving candidates. */
  def funnelStream(spark: SparkSession, events: DataFrame, windowHours: Int = 24,
      watermark: String = "10 minutes"): Dataset[FunnelResult] = {
    import spark.implicits._
    val horizonUs = windowHours * 3600L * 1000000L
    events
      .withWatermark("ts", watermark)
      .select(col("user_id"), col("event_type"), unix_micros(col("ts")).as("us"), col("ts"))
      .as[(Long, String, Long, java.sql.Timestamp)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[FunnelState, FunnelResult](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (user: Long, rows: Iterator[(Long, String, Long, java.sql.Timestamp)],
            state: GroupState[FunnelState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            if (s.minViewUs == Long.MaxValue) {
              // no view ever arrived: nothing emitted, and a LATER first
              // view must still open the funnel (batch has no horizon on
              // tv itself) — so drop, don't tombstone
              state.remove()
              Iterator.empty
            } else {
              // emit once, then tombstone: a returning user must not
              // re-open a funnel the batch recurrence closed at tv+H
              state.update(FunnelState(s.minViewUs, Nil, Nil, done = true))
              val tv = s.minViewUs
              val tc = s.clicks.filter(c => c > tv && c <= tv + horizonUs)
                .minOption
              val tp = tc.flatMap(c => s.purchases.filter(p => p > c && p <= tv + horizonUs)
                .minOption)
              Iterator.single(FunnelResult(user, Some(tv), tc, tp))
            }
          } else if (state.getOption.exists(_.done)) {
            // tombstoned: every later event is outside (tv, tv+H] by the
            // watermark contract — ignore, set no further timeout
            Iterator.empty
          } else {
            val prev = state.getOption.getOrElse(FunnelState(Long.MaxValue, Nil, Nil))
            var tv = prev.minViewUs
            val clicks = scala.collection.mutable.ArrayBuffer(prev.clicks: _*)
            val purchases = scala.collection.mutable.ArrayBuffer(prev.purchases: _*)
            var maxSeen = 0L
            rows.foreach { case (_, typ, us, _) =>
              maxSeen = math.max(maxSeen, us)
              typ match {
                case "view"     => tv = math.min(tv, us)
                case "click"    => clicks += us
                case "purchase" => purchases += us
                case _          =>
              }
            }
            val wmUs = state.getCurrentWatermarkMs() * 1000L
            // prune: above the window's ceiling, or provably dead below
            // (older than both the current min view and the watermark)
            def live(us: Long): Boolean =
              (tv == Long.MaxValue || us <= tv + horizonUs) &&
                (us > tv || us > wmUs)
            val liveClicks = clicks.filter(live).sorted.toSeq
            val livePurchases = purchases.filter(live).sorted.toSeq
            state.update(FunnelState(tv, liveClicks, livePurchases))
            // finalize when nothing admissible can still arrive: a view
            // below tv (until wm > tv) or a candidate ≤ tv+H. A straggler
            // arriving after the deadline already passed the watermark
            // fires on the next trigger (max against wm+1 — Spark rejects
            // a timeout at or below the current watermark).
            //
            // No-view deadline: the state may only be dropped once EVERY
            // buffered candidate is below the watermark (a future view tv
            // < candidate can then no longer arrive, by the watermark
            // contract) — the max must range over the BUFFER, not just
            // this batch's maxSeen (r9 review find: an out-of-order batch
            // whose max lagged a buffered click by more than the horizon
            // dropped that click while a view admitting it could still
            // arrive, emitting a no-click funnel the batch recurrence
            // pairs).
            val deadlineUs =
              if (tv == Long.MaxValue)
                (liveClicks ++ livePurchases).foldLeft(maxSeen)(math.max)
              else tv + horizonUs
            state.setTimeoutTimestamp(math.max(deadlineUs / 1000L,
              state.getCurrentWatermarkMs() + 1L))
            Iterator.empty
          }
      }
  }

  case class RetEv(user_id: Long, day: Int)

  /** d0 = epoch day of the user's first activity; mask bit k = active on
    * d0+k (k ∈ [0, maxDays] — constant-size state). done = the user's
    * cohort row was emitted — later activity is ignored (tombstone;
    * batch drops it too, as k > maxDays). */
  case class RetState(d0: Int, mask: Long, done: Boolean = false)

  case class RetResult(user_id: Long, d0_day: Int, ks: Seq[Int])

  /** Day-k cohort retention as a stream: per-user (cohort day, active-day
    * mask), emitted when the watermark closes the user's k-window. The
    * (d0, mask) reduction is order-insensitive: d0 = min(day) only
    * decreases, and a decrease left-shifts the mask (days whose offset
    * grows past maxDays fall out — exactly the batch filter k ≤ maxDays);
    * offsets only ever grow as d0 shrinks, so a day correctly dropped can
    * never re-enter. The cohort table of the batch form is a groupBy over
    * the emitted rows. */
  def retentionStream(spark: SparkSession, events: DataFrame, maxDays: Int = 7,
      watermark: String = "10 minutes"): Dataset[RetResult] = {
    // the activity-day set is a Long bitmask: day k lives in bit k, so
    // maxDays ≥ 63 silently wraps (1L << 64 ≡ 1) and drops prior activity
    // days — fail loudly instead (r9 review find)
    require(maxDays >= 0 && maxDays <= 62,
      s"retentionStream: maxDays must be in [0, 62] (Long day-mask), got $maxDays")
    import spark.implicits._
    val usPerDay = 86400L * 1000000L
    events
      .withWatermark("ts", watermark)
      .select(col("user_id"), (unix_micros(col("ts")) / lit(usPerDay)).cast("int").as("day"),
        col("ts"))
      .as[(Long, Int, java.sql.Timestamp)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[RetState, RetResult](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (user: Long, rows: Iterator[(Long, Int, java.sql.Timestamp)],
            state: GroupState[RetState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            // emit once, then tombstone: a user returning past the
            // k-window must not found a second cohort (batch assigns
            // d0 = first activity EVER and filters k > maxDays)
            state.update(RetState(s.d0, 0L, done = true))
            val ks = (0 to maxDays).filter(k => (s.mask & (1L << k)) != 0L)
            Iterator.single(RetResult(user, s.d0, ks))
          } else if (state.getOption.exists(_.done)) {
            Iterator.empty // tombstoned: later activity has k > maxDays
          } else {
            val full = (1L << (maxDays + 1)) - 1L
            var s = state.getOption.getOrElse(RetState(Int.MaxValue, 0L))
            rows.foreach { case (_, day, _) =>
              s = if (s.d0 == Int.MaxValue) RetState(day, 1L)
              else if (day < s.d0) {
                val shift = s.d0 - day
                val shifted = if (shift > maxDays) 1L else ((s.mask << shift) | 1L) & full
                RetState(day, shifted)
              } else {
                val k = day - s.d0
                if (k <= maxDays) RetState(s.d0, s.mask | (1L << k)) else s
              }
            }
            state.update(s)
            // final once the watermark passes the last admissible day
            state.setTimeoutTimestamp(math.max((s.d0.toLong + maxDays + 1) * 86400L * 1000L,
              state.getCurrentWatermarkMs() + 1L))
            Iterator.empty
          }
      }
  }
}

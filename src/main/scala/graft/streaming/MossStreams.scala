package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.operators.TextAnalysis

/** Streaming MOSS — winnowing fingerprints and copy-detection candidates
  * AS DOCUMENTS ARRIVE, the G19 × winnowing composition (the same role
  * [[DocStreams]] plays for minhash near-dup).
  *
  * Fingerprints are DOC-LOCAL (grams, window minima and rightmost
  * argmins all live inside one document's token array), so the
  * streaming form is a stateless row-wise projection — append-safe, no
  * watermark, no aggregation state. The array-HOF formulation
  * (`transform`/`slice`/`array_min`) runs INTERPRETED, the very cost
  * the batch [[TextAnalysis.winnowing]] rewrote into codegen window
  * functions (11× — BENCH_NOTES); at ingest the work is per ARRIVING
  * document, where interpreted per-row math is the right trade and the
  * batch path remains the bulk-scan engine. MossStreamSpec asserts the
  * two forms emit IDENTICAL fingerprint tables on the same corpus.
  *
  * Candidates are keyed state per FINGERPRINT (flatMapGroupsWithState,
  * the DocStreams bucket discipline): a new doc landing in a non-empty
  * bucket emits pairs immediately. The batch pair join's hot-fingerprint
  * stop-list ([[TextAnalysis.WinMaxFpDf]]) appears here as a STATE CAP:
  * a bucket that reaches the cap stops growing and stops emitting —
  * bounding both the per-key state and the per-arrival pair fan-out at
  * cap² on any corpus (ingest-time candidates are a superset sieve; the
  * batch winnowPairs job with its ≥ WinMinShared floor is the ground
  * truth, and any pair clearing that floor shares ≥ 1 fingerprint, so
  * sub-cap candidates cover it).
  *
  * PRODUCTION RESIDENCY (`horizonMs`, every stateful stage — the
  * [[ErStreams]] idiom): the cap bounds per-KEY state, but key COUNT
  * still grows with distinct fingerprints/pairs ever seen — unbounded on
  * a production stream. With a horizon, a bucket or pair idle past it is
  * evicted whole, which changes the SEMANTICS from whole-history to
  * windowed copy detection: pairs are detected only between documents
  * arriving within a horizon of each other (an evicted fingerprint's
  * residents are forgotten, so a later arrival pairs only with residents
  * newer than the eviction). None (the default) = NoTimeout = the exact
  * batch-parity configuration the driver oracles.
  */
object MossStreams {

  final case class FpState(ids: Seq[Long])
  final case class CandidatePair(a_id: Long, b_id: Long)

  /** Shared-count delta from the per-fingerprint stage: +1 when a
    * fingerprint newly co-occurs on a pair, −1 retractions when its
    * bucket crosses the df cap (see [[pairDeltas]]). */
  final case class PairDelta(a_id: Long, b_id: Long, delta: Int)
  final case class FpDeltaState(ids: Seq[Long], frozen: Boolean)
  final case class PairCount(shared: Long, wasOk: Boolean)

  /** Confirmed-pair emission: latest row per (a_id, b_id) is the pair's
    * current status — `ok` iff shared ≥ [[TextAnalysis.WinMinShared]]
    * (the ErStreams latest-emission-wins discipline). */
  final case class MossPair(a_id: Long, b_id: Long, shared: Long, ok: Boolean)

  /** Row-wise winnowing fingerprints: (doc_id, pos, fp) — exactly
    * [[TextAnalysis.winnowing]]'s selection (window min, rightmost tie,
    * full windows plus the clamped j = 1 window of gram-poor docs,
    * distinct), computed per row so it runs on a stream. */
  def fingerprints(docs: DataFrame): DataFrame = {
    val k = TextAnalysis.WinK
    val w = TextAnalysis.WinW
    val t = split(col("text"), " ")
    // gram i (1-based): md5 of tokens i..i+k-1, full grams only
    val grams = when(size(t) >= k,
      transform(sequence(lit(1), size(t) - (k - 1)), i =>
        md5(concat_ws(" ", (0 until k).map(o => element_at(t, i + o)): _*))))
      .otherwise(array().cast("array<string>"))
    // window starts: full windows, plus the clamped j = 1 window when
    // the doc has fewer than w grams
    val starts = when(size(col("_g")) >= w,
        sequence(lit(1), size(col("_g")) - (w - 1)))
      .otherwise(when(size(col("_g")) >= 1, array(lit(1)))
        .otherwise(array().cast("array<int>")))
    // per start j: slice the window, take its min hash and the RIGHTMOST
    // position of that min (reverse + first-occurrence arithmetic)
    val sel = transform(starts, j => {
      val win = slice(col("_g"), j, lit(w)) // clamps at the array end
      val mn = array_min(win)
      val rightmost = j + size(win) - array_position(reverse(win), mn).cast("int")
      struct(rightmost.as("pos"), mn.as("fp"))
    })
    docs.select(col("doc_id"), grams.as("_g"))
      .select(col("doc_id"), explode(array_distinct(sel)).as("s"))
      .select(col("doc_id"), col("s.pos").as("pos"), col("s.fp").as("fp"))
  }

  /** Copy-detection candidate SIEVE, emitted incrementally: keyed state
    * per fingerprint, capped at [[TextAnalysis.WinMaxFpDf]] resident
    * ids (the batch stop-list's streaming twin — a boilerplate-hot
    * fingerprint's bucket freezes instead of fanning out quadratically
    * forever). Works identically on a static frame (spec parity).
    *
    * CAP SEMANTICS — superset feed, NOT batch parity: a bucket freezes
    * AT the cap, so pairs credited before the freeze stay emitted even
    * though the batch df-filter would drop that fingerprint entirely.
    * Consumers get a SUPERSET of the batch candidate pairs, to be
    * verified downstream (the LSH-candidate discipline). For exact
    * winnowPairs parity — retraction when a bucket crosses the cap —
    * use [[pairDeltas]]/[[confirmedPairs]], the driver-oracled twin. */
  def candidateSieve(spark: SparkSession, docs: DataFrame,
      horizonMs: Option[Long] = None): Dataset[CandidatePair] = {
    import spark.implicits._
    val cap = TextAnalysis.WinMaxFpDf
    val timeoutConf = if (horizonMs.isDefined) GroupStateTimeout.ProcessingTimeTimeout()
      else GroupStateTimeout.NoTimeout()
    fingerprints(docs)
      .select(col("fp").as[String], col("doc_id").as[Long])
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append(), timeoutConf) {
        (_: String, rows: Iterator[(String, Long)], state: GroupState[FpState]) =>
          if (state.hasTimedOut) { // bucket idle past the horizon
            state.remove()
            Iterator.empty
          } else {
            val seenSeq = state.getOption.map(_.ids).getOrElse(Seq.empty)
            val out =
              if (seenSeq.length >= cap) Iterator.empty // frozen hot bucket
              else {
                val seen = seenSeq.toSet
                val fresh = rows.map(_._2).toSeq.distinct.filterNot(seen)
                  .take(cap - seenSeq.length) // state never exceeds the cap
                if (fresh.nonEmpty) state.update(FpState(seenSeq ++ fresh))
                (for {
                  (b, i) <- fresh.zipWithIndex
                  a <- seenSeq ++ fresh.take(i)
                } yield CandidatePair(math.min(a, b), math.max(a, b))).iterator
              }
            // activity extends the bucket's lease (the ErStreams idiom)
            if (horizonMs.isDefined && state.exists)
              state.setTimeoutDuration(horizonMs.get)
            out
          }
      }
  }

  /** Per-fingerprint shared-count DELTAS — the exact-parity feed for
    * [[confirmedPairs]]. Differs from [[candidateSieve]] in cap
    * semantics: the batch [[TextAnalysis.winnowPairs]] drops a
    * fingerprint ENTIRELY once its final doc frequency exceeds
    * [[TextAnalysis.WinMaxFpDf]], so the arrival that pushes a bucket
    * past the cap RETRACTS every pair the bucket credited (−1 each,
    * ≤ cap² bounded) and freezes it — the fingerprint's net
    * contribution collapses to the batch df-filter's zero. Sub-cap
    * buckets emit +1 per new co-resident pair, exactly the batch
    * per-fp pair count. */
  def pairDeltas(spark: SparkSession, docs: DataFrame,
      horizonMs: Option[Long] = None): Dataset[PairDelta] = {
    import spark.implicits._
    val cap = TextAnalysis.WinMaxFpDf
    val timeoutConf = if (horizonMs.isDefined) GroupStateTimeout.ProcessingTimeTimeout()
      else GroupStateTimeout.NoTimeout()
    fingerprints(docs)
      .select(col("fp").as[String], col("doc_id").as[Long])
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append(), timeoutConf) {
        (_: String, rows: Iterator[(String, Long)], state: GroupState[FpDeltaState]) =>
          if (state.hasTimedOut) { // bucket idle past the horizon
            state.remove()
            Iterator.empty
          } else {
          val st = state.getOption.getOrElse(FpDeltaState(Seq.empty, frozen = false))
          val out: Iterator[PairDelta] =
          if (st.frozen) Iterator.empty
          else {
            val seen = st.ids.toSet
            val fresh = rows.map(_._2).toSeq.distinct.filterNot(seen)
            if (fresh.isEmpty) Iterator.empty
            else if (st.ids.length + fresh.length > cap) {
              // df crosses the cap: the batch form excludes this fp —
              // retract every pair it credited, keep only the frozen marker
              state.update(FpDeltaState(Seq.empty, frozen = true))
              (for {
                (b, i) <- st.ids.zipWithIndex
                a <- st.ids.take(i)
              } yield PairDelta(math.min(a, b), math.max(a, b), -1)).iterator
            } else {
              state.update(FpDeltaState(st.ids ++ fresh, frozen = false))
              (for {
                (b, i) <- fresh.zipWithIndex
                a <- st.ids ++ fresh.take(i)
              } yield PairDelta(math.min(a, b), math.max(a, b), 1)).iterator
            }
          }
          if (horizonMs.isDefined && state.exists)
            state.setTimeoutDuration(horizonMs.get)
          out
          }
      }
  }

  /** Streaming twin of [[TextAnalysis.winnowPairs]] (VERDICT r7 #6):
    * a second keyed stage — per-PAIR state over [[pairDeltas]] — nets
    * the shared-fingerprint count and emits a status row whenever the
    * pair is at or past [[TextAnalysis.WinMinShared]] (or drops back
    * below after a retraction, so latest-per-pair stays truthful). Once
    * both stages drain, the `ok` rows equal the batch winnowPairs
    * result exactly — same df-cap, same floor (MossStreamSpec, plus
    * feed-split invariance).
    *
    * Topology: fingerprint-keyed stage → pair-keyed stage, two
    * shuffles, both on uniform hash keys; per-pair state is two fields.
    * Spark ≥3.4 runs both stateful operators in one streaming query
    * (verified on this build); the same code is the batch replay when
    * handed a static frame — the registered dd_moss_stream row. */
  def confirmedPairs(spark: SparkSession, docs: DataFrame,
      horizonMs: Option[Long] = None): Dataset[MossPair] = {
    import spark.implicits._
    val minShared = TextAnalysis.WinMinShared
    val timeoutConf = if (horizonMs.isDefined) GroupStateTimeout.ProcessingTimeTimeout()
      else GroupStateTimeout.NoTimeout()
    pairDeltas(spark, docs, horizonMs)
      .groupByKey(p => (p.a_id, p.b_id))
      .flatMapGroupsWithState(OutputMode.Append(), timeoutConf) {
        (key: (Long, Long), rows: Iterator[PairDelta], state: GroupState[PairCount]) =>
          if (state.hasTimedOut) { // pair idle past the horizon
            state.remove()
            Iterator.empty
          } else {
            val st = state.getOption.getOrElse(PairCount(0L, wasOk = false))
            val shared = st.shared + rows.map(_.delta).sum
            val ok = shared >= minShared
            state.update(PairCount(shared, ok))
            if (horizonMs.isDefined) state.setTimeoutDuration(horizonMs.get)
            // emit on any change visible through the floor: crossing up,
            // growing while qualified, or dropping back out
            if (ok || st.wasOk) Iterator(MossPair(key._1, key._2, shared, ok))
            else Iterator.empty
          }
      }
  }
}

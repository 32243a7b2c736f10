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
  */
object MossStreams {

  final case class FpState(ids: Seq[Long])
  final case class CandidatePair(a_id: Long, b_id: Long)

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

  /** Copy-detection candidate pairs, emitted incrementally: keyed state
    * per fingerprint, capped at [[TextAnalysis.WinMaxFpDf]] resident
    * ids (the batch stop-list's streaming twin — a boilerplate-hot
    * fingerprint's bucket freezes instead of fanning out quadratically
    * forever). Works identically on a static frame (spec parity). */
  def candidatePairs(spark: SparkSession, docs: DataFrame): Dataset[CandidatePair] = {
    import spark.implicits._
    val cap = TextAnalysis.WinMaxFpDf
    fingerprints(docs)
      .select(col("fp").as[String], col("doc_id").as[Long])
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (_: String, rows: Iterator[(String, Long)], state: GroupState[FpState]) =>
          val seenSeq = state.getOption.map(_.ids).getOrElse(Seq.empty)
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
      }
  }
}

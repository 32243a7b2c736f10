package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.operators.Dedup

/** Streaming near-duplicate detection over a document stream — the G19 ×
  * G21 composition a 100 TB/day ingest pipeline needs: catch near-dups AS
  * DOCUMENTS ARRIVE instead of re-running batch LSH over the corpus.
  *
  * Same math as the batch path (Dedup.minhashLsh): md5-seeded minhash
  * signatures over word 3-gram shingles, banded 4×4. The difference is
  * structural: the signature is computed ROW-WISE with array expressions
  * (`array_min(transform(shingles, md5))`) instead of an explode+groupBy
  * aggregation — identical values (same distinct-shingle set, same
  * hashes), but append-mode safe: no streaming aggregation state, so
  * no watermark coupling for the signature stage.
  *
  * Candidate emission is keyed state per LSH band bucket
  * (flatMapGroupsWithState): each bucket remembers the doc ids seen and
  * emits a pair the moment a new doc lands in a non-empty bucket.
  * State is per (band, hash) — uniformly distributed keys across
  * executors, the streaming analog of the batch equi band-join. In
  * production the state needs a TTL (timeout or state-store eviction)
  * matched to the dedup horizon; the operator itself is horizon-agnostic.
  */
object DocStreams {

  final case class BandState(ids: Seq[Long])
  final case class CandidatePair(a_id: Long, b_id: Long)

  /** (doc_id, band_key) rows: row-wise minhash signature → band hashes.
    * Works identically on a static or streaming frame with doc_id/text. */
  def bandKeys(docs: DataFrame): DataFrame = {
    val t = split(col("text"), " ")
    val shingles = array_distinct(
      when(size(t) >= 3,
        transform(sequence(lit(0), size(t) - 3), i =>
          concat_ws(" ", element_at(t, i + 1), element_at(t, i + 2), element_at(t, i + 3))))
        .otherwise(array().cast("array<string>")))
    val sigs = (0 until Dedup.MinhashFuncs).map(i =>
      array_min(transform(col("_sh"), s => md5(concat(lit(s"$i:"), s)))).as(s"mh$i"))
    val rows = Dedup.MinhashFuncs / Dedup.MinhashBands
    val bandCols = (0 until Dedup.MinhashBands).map { bi =>
      val parts = (bi * rows until (bi + 1) * rows).map(i => col(s"mh$i"))
      concat_ws(":", lit(bi), md5(concat(parts: _*)))
    }
    docs.select(col("doc_id"), shingles.as("_sh"))
      .select(col("doc_id") +: sigs: _*)
      // a doc with <3 tokens has no shingles → NULL signature; drop it
      // BEFORE banding (concat_ws would silently skip the NULL hash and
      // collapse every short doc into the same 4 band keys, emitting
      // bogus all-pairs candidates). Matches the batch path, where
      // explode of an empty shingle array drops the doc entirely.
      .filter(col("mh0").isNotNull)
      .select(col("doc_id"), explode(array(bandCols: _*)).as("band_key"))
  }

  /** Near-dup candidate pairs, emitted incrementally: works on a stream
    * (append mode) and, with the same code path, on a static frame —
    * StreamingSpec asserts stream ≡ batch and ⊇ Dedup.minhashLsh.
    *
    * @param horizonMs dedup horizon: a band bucket idle longer than this
    *                  is evicted (ProcessingTimeTimeout), bounding state
    *                  on an unbounded stream — docs farther apart than
    *                  the horizon are no longer reported as dups. None
    *                  keeps NoTimeout (the exact batch-equivalence
    *                  path; only sane for bounded inputs). */
  def nearDupCandidates(spark: SparkSession, docs: DataFrame,
      horizonMs: Option[Long] = None): Dataset[CandidatePair] = {
    import spark.implicits._
    val timeoutConf = if (horizonMs.isDefined) GroupStateTimeout.ProcessingTimeTimeout()
      else GroupStateTimeout.NoTimeout()
    bandKeys(docs)
      .select(col("band_key").as[String], col("doc_id").as[Long])
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append(), timeoutConf) {
        (_: String, rows: Iterator[(String, Long)], state: GroupState[BandState]) =>
          if (state.hasTimedOut) { // horizon passed with no activity
            state.remove()
            Iterator.empty
          } else {
            val seenSeq = state.getOption.map(_.ids).getOrElse(Seq.empty)
            val seen = seenSeq.toSet // O(1) membership; ids stored as Seq
            val fresh = rows.map(_._2).toSeq.distinct.filterNot(seen)
            if (fresh.nonEmpty) state.update(BandState(seenSeq ++ fresh))
            // every batch with activity extends the bucket's lease
            if (horizonMs.isDefined && state.exists)
              state.setTimeoutDuration(horizonMs.get)
            val out = for {
              (b, i) <- fresh.zipWithIndex
              a <- seenSeq ++ fresh.take(i)
            } yield CandidatePair(math.min(a, b), math.max(a, b))
            out.iterator
          }
      }
  }
}

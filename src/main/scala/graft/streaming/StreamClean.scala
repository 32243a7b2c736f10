package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.operators.{Pipeline, TextAnalysis}

/** Streaming corpus cleaning — the ingest-time form of
  * [[graft.operators.Pipeline.clean]]: every arriving document gets a
  * keep/drop verdict the moment it lands, instead of waiting for a batch
  * sweep over the accumulated corpus.
  *
  * Rules 1–3 (language, length, repetition) are the SAME Column
  * expressions as the batch pipeline — stateless, append-safe, fused
  * into the stream's project. The batch rule 4 (span-level dedup) is
  * replaced by its streaming analog: exact-fingerprint first-occurrence
  * state keyed by the normalized content hash (the tx_fingerprint key) —
  * a re-delivered or copied document after the first is marked
  * `duplicated`. State per fingerprint is one long; keys are uniform
  * md5, so state spreads evenly across executors, and a production
  * deployment bounds it with the same horizon lease DocStreams uses.
  *
  * Composed with [[ExactlyOnceSink]] this is the full production loop —
  * stream → clean → idempotent commit — which StreamCleanSpec drives
  * end-to-end (including a crash-replay) against the batch verdicts.
  */
object StreamClean {

  final case class SeenDoc(firstId: Long)
  final case class Verdict(doc_id: Long, keep: Boolean, reason: String)

  /** Stateless verdict columns (rules 1–3); `ok` means "passed all
    * stateless rules" and may still be demoted to `duplicated` by the
    * stateful stage. Works identically on static and streaming frames. */
  def statelessVerdicts(docs: DataFrame): DataFrame = {
    val t = split(col("text"), " ")
    val nt = size(t)
    val reason = when(TextAnalysis.predLangCol =!= "en", lit("non_english"))
      .when(nt < Pipeline.MinTokens, lit("too_short"))
      .when(lit(1.0) - size(array_distinct(t)).cast("double") / nt > Pipeline.MaxDupTokRatio,
        lit("repetitive"))
      .otherwise(lit("ok"))
    docs.select(col("doc_id"),
      TextAnalysis.fpCol(col("text")).as("fp"), // ONE normalization with tx_fingerprint
      reason.as("reason"))
  }

  /** Full streaming verdict: stateless rules, then first-occurrence
    * dedup state on the content fingerprint. `horizonMs` bounds state on
    * unbounded streams (same lease semantics as DocStreams). */
  def verdicts(spark: SparkSession, docs: DataFrame,
      horizonMs: Option[Long] = None): Dataset[Verdict] = {
    import spark.implicits._
    val timeoutConf = if (horizonMs.isDefined) GroupStateTimeout.ProcessingTimeTimeout()
      else GroupStateTimeout.NoTimeout()
    statelessVerdicts(docs)
      .select(col("fp").as[String], col("doc_id").as[Long], col("reason").as[String])
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append(), timeoutConf) {
        (_: String, rows: Iterator[(String, Long, String)], state: GroupState[SeenDoc]) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            // deterministic within-batch order: smallest doc_id is the
            // batch's first occurrence (matches the batch row_number rule)
            val batch = rows.toSeq.sortBy(_._2)
            val firstSeen = state.getOption.map(_.firstId)
            if (firstSeen.isEmpty && batch.nonEmpty)
              state.update(SeenDoc(batch.head._2))
            if (horizonMs.isDefined && state.exists)
              state.setTimeoutDuration(horizonMs.get)
            batch.iterator.map { case (_, id, reason) =>
              val isFirst = firstSeen.map(_ == id).getOrElse(batch.head._2 == id)
              // `duplicated` is the LAST rule, like the batch chain: a
              // copy that already fails a stateless rule keeps that reason
              val r = if (isFirst || reason != "ok") reason else "duplicated"
              Verdict(id, r == "ok", r)
            }
          }
      }
  }
}

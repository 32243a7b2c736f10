package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.operators.Curation

/** Streaming form of the domain-frequency cap
  * (graft.operators.Curation.domainCap) — the corpus-ingest gate run
  * while documents ARRIVE rather than after the crawl lands.
  *
  * Policy note (deliberate, documented divergence from the batch form):
  * the batch cap keeps the BEST `cap` docs per source (n_chars desc);
  * best-K verdicts are not final until the source's stream ends, so a
  * streaming gate emitting append-mode rows cannot implement them
  * without holding every candidate forever. The streaming form is the
  * FIRST-K quota instead — admit until the source has spent its budget —
  * which gives every document a final verdict at arrival and is the
  * policy streaming crawlers actually run (admission control, not
  * retrospective ranking). CapStreamSpec pins stream ≡ batch first-K
  * (row_number over arrival order) on the same feed.
  *
  * Scale/state story:
  *   - state is ONE running count (a long) per source, keyed by source —
  *     bounded by source cardinality (domains, not documents), so state
  *     never grows with corpus size and needs no timeout/eviction;
  *   - the only shuffle is the groupByKey on source, moving (doc_id,
  *     source) tuples — text never enters the exchange;
  *   - a hot source (the reason caps exist) concentrates key-plus-scalar
  *     tuples on one task, same bound as the batch window's skew story.
  *
  * Determinism: admission order is (micro-batch, doc_id) — rows are
  * sorted by doc_id inside each group per batch, so a feed whose batches
  * are doc_id-ascending yields verdicts independent of how the feed was
  * split into batches (any split of an ascending feed preserves the
  * global order). */
object CurationStreams {

  case class CapDoc(doc_id: Long, source: String)

  /** rn = this doc's 1-based arrival rank within its source;
    * admitted = rn ≤ cap. Final at emission (first-K never revokes). */
  case class CapVerdict(doc_id: Long, source: String, rn: Long, admitted: Boolean)

  def capStream(spark: SparkSession, docs: DataFrame,
      cap: Int = Curation.CapPerSource): Dataset[CapVerdict] = {
    import spark.implicits._
    docs.select(col("doc_id").cast("long").as("doc_id"), col("source"))
      .as[CapDoc]
      .groupByKey(_.source)
      .flatMapGroupsWithState[Long, CapVerdict](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (source: String, rows: Iterator[CapDoc], state: GroupState[Long]) =>
          var n = state.getOption.getOrElse(0L)
          val out = rows.toSeq.sortBy(_.doc_id).map { d =>
            n += 1
            CapVerdict(d.doc_id, source, n, n <= cap)
          }
          state.update(n)
          out.iterator
      }
  }
}

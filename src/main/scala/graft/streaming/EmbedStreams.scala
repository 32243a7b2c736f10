package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.operators.Similarity

/** Streaming embedding near-duplicate detection — the embedding-side
  * sibling of DocStreams (G19 × G21): catch cosine near-dups AS VECTORS
  * ARRIVE instead of re-running the batch bucketed join over the corpus.
  *
  * Same geometry as the batch path (Dedup.embeddingCosineBucketed): the
  * Similarity sign-random-projection tables hash each vector to one
  * bucket per table, row-wise (literal hyperplanes — no aggregation
  * state, append-mode safe). Keyed state per (table, bucket) remembers
  * the vectors seen; an arriving vector is verified with the EXACT dot
  * product against its home bucket and every 1-bit-flip probe bucket, so
  * every emitted pair is a true cosine ≥ threshold pair (precision 1 by
  * construction — the stream emits VERIFIED pairs, not candidates,
  * unlike DocStreams whose minhash state cannot verify Jaccard exactly).
  *
  * A pair that collides in several tables can emit more than once
  * (append mode has no cross-group memory) — consumers dedup on
  * (a_id, b_id), exactly like the batch path's `.distinct()`.
  *
  * State per bucket is the resident vectors (ids + 64 doubles each),
  * bounded the same way DocStreams bounds band state: horizonMs evicts
  * idle buckets via ProcessingTimeTimeout. Bucket width: pass the
  * nBits the expected corpus size calls for (Similarity.lshBitsFor) —
  * state occupancy per key stays ~constant and keys stay uniformly
  * distributed across executors.
  */
object EmbedStreams {

  final case class VecState(ids: Seq[Long], vecs: Seq[Seq[Double]])
  final case class EmbedPair(a_id: Long, b_id: Long, cs: Double)

  /** (vec_id, v, key, home) rows: one HOME row per (vector, table) — the
    * bucket the vector registers in — plus one PROBE row per 1-bit flip
    * (checked against state, never registered). Works identically on a
    * static or streaming frame with vec_id/embedding. */
  def bucketKeys(vecs: DataFrame, nBits: Int): DataFrame = {
    val v = vecs.select(col("vec_id"),
      col("embedding").cast("array<double>").as("v"))
    // both width AND table count passed explicitly: a streaming frame
    // cannot be counted for the corpus-derived defaults
    val b = Similarity.withBuckets(v, nBits, Similarity.LshTables)
    val home = b.select(col("vec_id"), col("v"),
      concat_ws(":", col("tbl"), col("bucket")).as("key"), lit(true).as("home"))
    // probeBuckets' head is the bucket itself — the flips are the tail
    val probes = b.select(col("vec_id"), col("v"), col("tbl"),
        explode(slice(Similarity.probeBuckets(col("bucket"), nBits), 2, nBits)).as("pb"))
      .select(col("vec_id"), col("v"),
        concat_ws(":", col("tbl"), col("pb")).as("key"), lit(false).as("home"))
    home.unionByName(probes)
  }

  /** Verified near-dup pairs (cosine ≥ threshold), emitted incrementally.
    * Works on a stream (append mode) and, with the same code path, on a
    * static frame — StreamingSpec asserts the static-frame pair set
    * matches the batch bucketed path against the exact oracle.
    *
    * @param horizonMs dedup horizon: a bucket idle longer than this is
    *                  evicted, bounding state on an unbounded stream;
    *                  None keeps NoTimeout (bounded inputs only). */
  def nearDupPairs(spark: SparkSession, vecs: DataFrame,
      threshold: Double = 0.45, nBits: Int = Similarity.LshBits,
      horizonMs: Option[Long] = None): Dataset[EmbedPair] = {
    import spark.implicits._
    val timeoutConf = if (horizonMs.isDefined) GroupStateTimeout.ProcessingTimeTimeout()
      else GroupStateTimeout.NoTimeout()
    bucketKeys(vecs, nBits)
      .select(col("key").as[String], col("vec_id").as[Long],
        col("v").as[Seq[Double]], col("home").as[Boolean])
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append(), timeoutConf) {
        (_: String, rows: Iterator[(String, Long, Seq[Double], Boolean)],
            state: GroupState[VecState]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            def dot(a: Seq[Double], b: Seq[Double]): Double = {
              var s = 0.0; var i = 0
              while (i < a.length) { s += a(i) * b(i); i += 1 }
              s
            }
            val st = state.getOption.getOrElse(VecState(Seq.empty, Seq.empty))
            var ids = st.ids
            var vs = st.vecs
            val seen = scala.collection.mutable.Set(ids: _*)
            val out = Seq.newBuilder[EmbedPair]
            // deterministic batch order: home registrations first (so a
            // same-batch probe sees them), then probes; ties by id
            val batch = rows.toSeq.distinct.sortBy(r => (!r._4, r._2))
            for ((_, id, v, home) <- batch) {
              if (!seen.contains(id)) {
                var i = 0
                while (i < ids.length) {
                  if (ids(i) != id) {
                    val cs = dot(v, vs(i))
                    if (cs >= threshold)
                      // HALF_UP over the decimal string, exactly Spark's
                      // round(col, 4) in the batch twin — math.rint is
                      // half-EVEN, which flips cs values on the 0.00005
                      // grid against the spec-pinned stream ≡ batch
                      // equality (r9 review find)
                      out += EmbedPair(math.min(id, ids(i)), math.max(id, ids(i)),
                        java.math.BigDecimal.valueOf(cs)
                          .setScale(4, java.math.RoundingMode.HALF_UP).doubleValue())
                  }
                  i += 1
                }
                if (home) { ids = ids :+ id; vs = vs :+ v; seen += id }
              }
            }
            if (ids.length > st.ids.length) state.update(VecState(ids, vs))
            if (horizonMs.isDefined && state.exists)
              state.setTimeoutDuration(horizonMs.get)
            out.result().distinct.iterator
          }
      }
  }
}

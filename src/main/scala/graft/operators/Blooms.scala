package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.util.sketch.BloomFilter

/** Unclamped bloom-filter builds over a DataFrame column.
  *
  * Spark 4's `DataFrameStatFunctions.bloomFilter` routes through the
  * `bloom_filter_agg` Catalyst aggregate, which SILENTLY clamps the
  * requested size to `spark.sql.optimizer.runtime.bloomFilter.maxNumItems`
  * (4e6) and `.maxNumBits` (6.7e7) — confs sized for the optimizer's own
  * injected runtime join filters, not for operator-built sketches. Past
  * ~7M distinct items the bit array saturates and `mightContain` degrades
  * toward always-true, SILENTLY: measured on q33's wedge prefilter, fp ≈
  * 2e-9 at 1.2M edges, ~0.22 at 12M, ~1.0 at 120M — at 100× the wedge
  * exchange carried the FULL unpruned wedge volume (4.11B records,
  * node-exact) and the "prefilter" was a no-op (BENCH_NOTES r8). The
  * failure is invisible to correctness oracles (false positives die in
  * the exact joins downstream) and to small-SF probes; only the shuffle
  * audit caught it.
  *
  * These builders aggregate the sketch library directly (the same
  * fixed-seed Murmur3 hashing — results stay bit-reproducible; merge is
  * a bitset OR, so partition order cannot matter), sized exactly as
  * asked: ~1.2 MB per million items at 1% fpp, 143 MB at 120M — the
  * honest broadcast cost of pruning at that scale. Per-task cost: one
  * sketch-sized zero buffer rides the (compressed, zero-filled) task
  * binary and each task allocates it on heap; the merge is a depth-2
  * treeAggregate of same-sized sketches.
  */
object Blooms {

  /** Bloom over a non-null LongType column, sized as requested. */
  def ofLongs(df: DataFrame, c: Column, expectedItems: Long, fpp: Double): BloomFilter = {
    import df.sparkSession.implicits._
    df.select(c).as[Long].rdd.treeAggregate(
      BloomFilter.create(math.max(expectedItems, 1024L), fpp))(
      (b, v) => { b.putLong(v); b },
      (a, b) => { a.mergeInPlace(b); a })
  }

  /** Bloom over a non-null StringType column, sized as requested. */
  def ofStrings(df: DataFrame, c: Column, expectedItems: Long, fpp: Double): BloomFilter = {
    import df.sparkSession.implicits._
    df.select(c).as[String].rdd.treeAggregate(
      BloomFilter.create(math.max(expectedItems, 1024L), fpp))(
      (b, v) => { b.putString(v); b },
      (a, b) => { a.mergeInPlace(b); a })
  }
}

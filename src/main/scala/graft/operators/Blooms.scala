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
  * honest broadcast cost of pruning at that scale. Shape (ADVICE r8):
  * mapPartitions builds ONE local sketch per partition (allocated on the
  * executor, so no sketch-sized zero buffer rides the task binary and no
  * per-record closure is paid), then treeReduce merges the same-sized
  * partials — at 120M items / 32 partitions that is 32 × 143 MB moved at
  * the first merge level, the unavoidable cost of a full-size partial
  * per partition. */
object Blooms {

  /** Bloom over a non-null LongType column, sized as requested. */
  def ofLongs(df: DataFrame, c: Column, expectedItems: Long, fpp: Double): BloomFilter = {
    import df.sparkSession.implicits._
    def fresh() = BloomFilter.create(math.max(expectedItems, 1024L), fpp)
    val rdd = df.select(c).as[Long].rdd
    if (rdd.getNumPartitions == 0) fresh()
    else rdd.mapPartitions { it =>
      val b = fresh()
      while (it.hasNext) b.putLong(it.next())
      Iterator.single(b)
    }.treeReduce((a, b) => { a.mergeInPlace(b); a })
  }

  /** Bloom over a non-null StringType column, sized as requested. */
  def ofStrings(df: DataFrame, c: Column, expectedItems: Long, fpp: Double): BloomFilter = {
    import df.sparkSession.implicits._
    def fresh() = BloomFilter.create(math.max(expectedItems, 1024L), fpp)
    val rdd = df.select(c).as[String].rdd
    if (rdd.getNumPartitions == 0) fresh()
    else rdd.mapPartitions { it =>
      val b = fresh()
      while (it.hasNext) b.putString(it.next())
      Iterator.single(b)
    }.treeReduce((a, b) => { a.mergeInPlace(b); a })
  }
}

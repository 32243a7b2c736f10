package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Pins the property the q33 shuffle audit caught missing: a bloom built
  * over MORE items than `spark.sql.optimizer.runtime.bloomFilter
  * .maxNumItems` (4M) must still honor its requested fpp. Spark 4's
  * `stat.bloomFilter` silently clamps to that conf (and maxNumBits =
  * 67.1M), so at 16M items its sketch saturates to ~49% false positives
  * — measured ~100% at the 120M-edge 100× probe, where the wedge
  * prefilter passed the full 4.11B-record stream (BENCH_NOTES r8).
  * [[Blooms]] bypasses the clamped aggregate; this spec builds at 16M
  * and asserts the measured fp rate stays at the requested 1%. */
class BloomsSpec extends SparkSpec {

  test("a 16M-item bloom holds its requested fpp (no silent size clamp)") {
    val n = 16000000L
    // xxhash64 of a range: distinct (collision odds ~n²/2⁶⁴), well-spread
    val items = spark.range(n).select(xxhash64(col("id")).as("v"))
    val bf = Blooms.ofLongs(items, col("v"), n, 0.01)
    assert(bf.bitSize() > 67108864L,
      s"bloom was clamped to ${bf.bitSize()} bits — the stat.bloomFilter failure mode")
    // members: never a false negative
    val missed = items.limit(200000).collect()
      .count(r => !bf.mightContain(r.getLong(0)))
    assert(missed == 0, s"$missed false negatives")
    // non-members (hashes of ids past the inserted range are disjoint
    // from the insert set up to ~n·probes/2⁶⁴ collision odds): measured
    // fp must sit at the requested 1%, not the saturated ~49%
    val probes = 200000
    val fp = spark.range(n, n + probes).select(xxhash64(col("id")).as("v"))
      .collect().count(r => bf.mightContain(r.getLong(0)))
    val rate = fp.toDouble / probes
    assert(rate < 0.02, f"fp rate $rate%.4f — sketch saturated or mis-sized")
    info(f"bitSize=${bf.bitSize()} measured fp=$rate%.5f at 16M items")
  }
}

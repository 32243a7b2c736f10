package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sources.Tables

/** JoinOpt: bucketed co-located join plan shape + bloom pruning law. */
class JoinOptSpec extends SparkSpec {

  test("bucketed join: no Exchange on either join key, result ≡ plain join") {
    val s = spark.newSession()
    s.conf.set("spark.sql.autoBroadcastJoinThreshold", -1)
    val frame = JoinOpt.bucketedJoinFrame(s, sf)
    frame.collect() // finalize the adaptive plan
    val plan = frame.queryExecution.executedPlan.toString
    assert(plan.contains("SortMergeJoin"), s"expected SMJ:\n${plan.take(600)}")
    val keyExchanges = "Exchange hashpartitioning\\((o_custkey|c_custkey)".r
      .findAllIn(plan).size
    assert(keyExchanges == 0, s"bucketed join shuffled a side:\n${plan.take(900)}")

    val bucketed = JoinOpt.bucketedJoin(s, sf).collect().toSeq
    val plain = Tables.orders(s, sf)
      .join(Tables.customer(s, sf), col("o_custkey") === col("c_custkey"))
      .groupBy("c_mktsegment")
      .agg(count(lit(1)).as("c"), round(sum("o_totalprice"), 2).as("s"))
      .orderBy("c_mktsegment").collect().toSeq
    assert(bucketed == plain)
  }

  test("bloom pruning: no false negatives, real pruning, result ≡ plain join") {
    val pruned = JoinOpt.bloomPrunedOrders(spark, sf)
    val total = Tables.orders(spark, sf).count()
    val kept = pruned.count()
    // the BUILDING segment is ~1/5 of customers: the bloom must drop a
    // large share of orders before the shuffle...
    assert(kept < total, s"bloom pruned nothing ($kept of $total)")
    assert(kept.toDouble / total < 0.5, s"pruning too weak: $kept of $total")
    // ...while keeping EVERY order that actually joins (no false negatives)
    val matching = Tables.orders(spark, sf)
      .join(Tables.customer(spark, sf)
          .filter(col("c_mktsegment") === "BUILDING"),
        col("o_custkey") === col("c_custkey"))
      .count()
    val keptMatching = pruned
      .join(Tables.customer(spark, sf)
          .filter(col("c_mktsegment") === "BUILDING"),
        col("o_custkey") === col("c_custkey"))
      .count()
    assert(keptMatching == matching, s"bloom dropped matches: $keptMatching < $matching")
    // ...and the survivor count matches the DESIGNED false-positive rate
    // (the r8 lesson made executable, as in GraphOpsSpec's wedge gate):
    // kept ≤ matching + 2·fpp·total — a ratio-style "pruned something"
    // check sleeps through a half-saturated sketch; this bound cannot.
    // 0.01 = the fpp bloomPrunedOrders requests from Blooms.
    val bound = matching + (2 * 0.01 * total).toLong
    assert(kept <= bound,
      s"bloom selectivity off its designed fpp: kept $kept > bound $bound (matching=$matching total=$total)")
  }
}

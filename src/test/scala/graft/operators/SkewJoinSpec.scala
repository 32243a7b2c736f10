package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Salted skew-join: result parity with the plain equi join on a
  * synthetically skewed corpus, plus the two structural properties that
  * make salting work — the hot key fans out over every salt, and the
  * shuffle join key includes the salt. */
class SkewJoinSpec extends SparkSpec {

  test("salted join equals the plain equi join and splits the hot key") {
    import spark.implicits._
    // key 1 holds half of all rows — ~500x the median key's share
    val big = (1 to 50000).map { i =>
      (if (i % 2 == 0) 1L else (i % 97).toLong + 2, i.toLong)
    }.toDF("k", "payload")
    val small = (1L to 99L).map(k => (k, s"dim$k")).toDF("k", "name")

    val plain = big.join(small, Seq("k"))
    val salted = SkewJoin.salted(big, small, "k", 8, saltOn = col("payload"))
    assert(salted.count() == plain.count())
    val perKey = (df: org.apache.spark.sql.DataFrame) =>
      df.groupBy("k").count().collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(perKey(salted) == perKey(plain))

    // the hot key's rows really spread across all 8 salt values
    val saltsUsed = big.filter(col("k") === 1L)
      .select(pmod(xxhash64(col("payload")), lit(8L)).as("s"))
      .distinct().count()
    assert(saltsUsed == 8L, s"hot key used only $saltsUsed salts")

    // the join is an equi join on (k, _salt) — the salt is a true join
    // key, not a post-filter
    salted.collect()
    val plan = salted.queryExecution.executedPlan.toString
    assert(plan.contains("_salt"), s"salt not in the executed plan:\n${plan.take(600)}")
    assert(!plan.contains("CartesianProduct") && !plan.contains("NestedLoop"))
  }

  test("left-outer salted join keeps unmatched big rows exactly once") {
    import spark.implicits._
    val big = (1 to 1000).map(i => ((i % 150).toLong, i.toLong)).toDF("k", "payload")
    val small = (0L to 99L).map(k => (k, s"dim$k")).toDF("k", "name") // keys 100..149 unmatched
    val plain = big.join(small, Seq("k"), "left")
    val salted = SkewJoin.salted(big, small, "k", 8, saltOn = col("payload"), joinType = "left")
    assert(salted.count() == plain.count())
    val nulls = (df: org.apache.spark.sql.DataFrame) => df.filter(col("name").isNull).count()
    assert(nulls(salted) == nulls(plain))
    assert(nulls(salted) > 0) // the unmatched keys really exercise the outer path
  }

  test("q23 salted brand aggregate runs and is non-degenerate") {
    val out = SkewJoin.saltedBrandAgg(spark, sf).collect()
    assert(out.length > 1)
    assert(out.map(_.getLong(1)).sum > 0)
  }
}

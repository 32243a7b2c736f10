package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sources.Tables

/** Properties of [[EntityResolution.linkRegistries]] the hash oracle
  * can't see: full identity recovery (every dirty record links back to
  * its source — recall 1.0 on the constructed noise), per-class edit
  * distances, and the blocking bound (candidate volume ∝ rows, never
  * all-pairs). */
class EntityResolutionSpec extends SparkSpec {

  test("every dirty record links to its own source with the class's edit distance") {
    val links = EntityResolution.linkRegistries(spark, sf).collect()
    val n = Tables.customer(spark, sf).count()
    assert(links.length == n, s"${links.length} links for $n records")
    links.foreach { r =>
      val (bKey, aKey, dist) = (r.getLong(0), r.getLong(1), r.getInt(3))
      assert(aKey == bKey, s"record $bKey linked to $aKey")
      val expected = if (bKey % 3 == 0) 0 else 1
      assert(dist == expected, s"record $bKey: dist $dist, expected $expected")
    }
  }

  test("blocking bounds the comparison space: candidates ~ rows, not rows²") {
    val a = Tables.customer(spark, sf)
      .select(col("c_custkey").as("a_key"), col("c_name").as("a_name"))
    val n = a.count()
    val candidates = a.withColumn("blk", substring(col("a_name"), -3, 3))
      .groupBy("blk").agg(count(lit(1)).as("c"))
      .agg(sum(col("c") * col("c"))).collect()(0).getLong(0)
    // suffix blocking spreads ~uniformly over 10³ buckets; allow wide
    // slack but stay orders of magnitude under the all-pairs n²
    assert(candidates <= 16L * n, s"$candidates candidate pairs for $n rows")
    assert(candidates < n * n / 100, "blocking is not materially sub-quadratic")
  }
}

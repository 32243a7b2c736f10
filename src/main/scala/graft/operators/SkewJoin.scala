package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Salted equi join for skewed keys.
  *
  * AQE's skew-join split (asserted in PlanSpec) re-plans oversized
  * partitions at runtime, but it only fires AFTER a stage materializes
  * its shuffle output: a known hot key (power-law user id, a default /
  * sentinel value) is better pre-split so even the map-side partial
  * state and the shuffle write are balanced. The classic salting move:
  * the big side's join key becomes (key, salt) with a deterministic
  * salt in [0, salts) derived from non-key content; the small side is
  * exploded across all `salts` values, so every big row still meets its
  * match exactly once and the hot key's rows spread over `salts`
  * reducers. Cost: the small side is replicated ×salts — cheap by the
  * same "small side" contract that makes it broadcast-able.
  *
  * Result ≡ `big.join(small, key)` row-for-row (oracled as q23).
  */
object SkewJoin {

  /** Equi join of `big` ⋈ `small` on `key`, salted `salts` ways.
    * `saltOn` must be a deterministic expression over the BIG side's
    * columns (not the key itself — the whole point is splitting within
    * one key value). `joinType` supports "inner" and "left" (each big
    * row carries exactly one salt, so left-outer semantics are
    * preserved: an unmatched big row is emitted once with nulls). */
  def salted(big: DataFrame, small: DataFrame, key: String, salts: Int,
      saltOn: Column, joinType: String = "inner"): DataFrame = {
    require(joinType == "inner" || joinType == "left",
      s"salting preserves per-big-row semantics for inner/left only, got $joinType")
    val b = big.withColumn("_salt", pmod(xxhash64(saltOn), lit(salts.toLong)))
    val s = small.withColumn("_salt", explode(array((0 until salts).map(i => lit(i.toLong)): _*)))
    b.join(s, Seq(key, "_salt"), joinType).drop("_salt")
  }

  /** q23: lineitem ⋈ part salted 8 ways on the part key, aggregated per
    * brand — proves salted ≡ plain equi join against the DuckDB oracle.
    * (The synthetic corpus is near-uniform; the operator is for the
    * production corpus where one key is 1000× the median. SkewJoinSpec
    * builds that corpus synthetically and checks row parity + the
    * (key, salt) join shape.) */
  def saltedBrandAgg(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
      .withColumnRenamed("l_partkey", "p_partkey")
    val part = Tables.part(spark, dir).select("p_partkey", "p_brand")
    salted(li, part, "p_partkey", 8, saltOn = col("l_orderkey"))
      .groupBy("p_brand").agg(
        count(lit(1)).as("n"),
        sum(col("l_quantity")).cast("double").as("qty"))
      .orderBy("p_brand")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q23_salted_join" -> saltedBrandAgg _
  )

  val oracleSql: Map[String, String] = Map(
    "q23_salted_join" ->
      """SELECT p_brand, COUNT(*) AS n, CAST(SUM(l_quantity) AS DOUBLE) AS qty
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |GROUP BY p_brand ORDER BY p_brand""".stripMargin.replaceAll("\n", " ")
  )
}

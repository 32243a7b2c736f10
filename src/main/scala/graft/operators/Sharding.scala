package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Deterministic output sharding — the writer half of a training-data
  * pipeline. A 100 TB corpus ships as numbered shard files; the shard
  * assignment must be a pure function of the row key so that (a) retried
  * writer tasks land every row in the same shard (idempotent output),
  * (b) appending new docs never moves an old doc between shards, and
  * (c) two engines agree row-for-row (DuckDB equality oracle — same
  * rationale as [[Sampling]]'s hash-deterministic keep decisions).
  *
  * Shard = first hex nibble of md5(doc_id), i.e. 16 equal hash ranges.
  * Production runs would widen to `pmod(xxhash64(key), n)` for arbitrary
  * n (same plan shape, no DuckDB md5-oracle); 16 md5 ranges keep the
  * cross-engine oracle exact.
  */
object Sharding {

  val NShards = 16

  /** 0–15 shard id from the first md5 nibble (`conv` base-16 on the Spark
    * side; the oracle mirrors it as a position over the hex alphabet —
    * pure codegen'd string ops either way). */
  def shardCol(key: Column): Column =
    conv(substring(md5(key.cast("string")), 1, 1), 16, 10).cast("int")

  /** Per-doc shard assignment. */
  def shardAssign(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"), shardCol(col("doc_id")).as("shard"))
      .orderBy("doc_id")

  /** Per-shard size stats — the balance check a pipeline runs before
    * shipping (16 hash ranges of md5 are uniform, so shards are balanced
    * regardless of doc_id distribution; contrast `doc_id % 16`, which
    * inherits any key skew). */
  def shardStats(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .groupBy(shardCol(col("doc_id")).as("shard"))
      .agg(count(lit(1)).as("cnt"), sum("n_chars").cast("long").as("chars"))
      .orderBy("shard")

  /** Write the corpus as shard-partitioned parquet: one directory per
    * shard (`shard=K/`), rows routed by the deterministic assignment.
    * `repartition(n, shard)` aligns Spark's task partitioning with the
    * shard function so each shard is written by exactly one task (one
    * file per shard, no tiny-file fanout); at 100 TB the same call with
    * a larger n plus `maxRecordsPerFile` bounds individual file sizes
    * while keeping shard→file mapping deterministic. */
  def writeShards(df: DataFrame, keyCol: String, outDir: String): Unit =
    df.withColumn("shard", shardCol(col(keyCol)))
      .repartition(NShards, col("shard"))
      .write.mode("overwrite")
      .partitionBy("shard")
      .parquet(outDir)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ds_shards" -> shardAssign _,
    "ds_shard_stats" -> shardStats _,
  )

  private val shardSql =
    "CAST(strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)) - 1 AS INTEGER)"

  val oracleSql: Map[String, String] = Map(
    "ds_shards" ->
      s"SELECT doc_id, $shardSql AS shard FROM documents ORDER BY doc_id",
    "ds_shard_stats" ->
      s"""SELECT $shardSql AS shard, COUNT(*) AS cnt,
        |CAST(SUM(n_chars) AS BIGINT) AS chars
        |FROM documents GROUP BY 1 ORDER BY 1""".stripMargin.replaceAll("\n", " "),
  )
}

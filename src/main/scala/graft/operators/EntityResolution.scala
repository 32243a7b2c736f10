package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Entity resolution / record linkage — the blocking-join discipline
  * (Fellegi & Sunter 1969 for the decision model; Christen 2012 for
  * blocking): two registries are linked by comparing records only
  * WITHIN cheap blocking buckets, never all-pairs, then scoring the
  * in-block candidates with an edit-distance rule and keeping the best
  * match per right-side record.
  *
  * The fixture has no naturally dirty registry, so the demo derives one
  * DETERMINISTICALLY inside the query (per-key char deletion/insertion
  * by custkey mod 3 — both engines build the identical dirty table from
  * the same parquet, the ly_schema_evo CASE-routing idiom). The linkage
  * must recover the identity mapping; a blocking or ranking bug shows
  * up as a hash mismatch, not a silent recall drop.
  *
  * Scale shape at 100 TB: the blocking key (here the name's stable
  * suffix — any phonetic/prefix/LSH key slots in) turns the quadratic
  * comparison space into one uniform-key equi join; levenshtein runs
  * only on in-block candidates (~block² per bucket, bounded by the
  * key's selectivity), and the best-match window ranks a few rows per
  * right record. No driver state, no all-pairs anywhere — the same
  * candidates-then-verify contract as dd_minhash_lsh.
  */
object EntityResolution {

  /** Max accepted edit distance for a link. */
  val MaxDist = 2

  /** Blocking-key width: the name's last [[BlockSuffix]] chars. The
    * width IS the scale knob — a blocking key's CARDINALITY must grow
    * with the registry or block sizes grow linearly and in-block
    * comparison work quadratically (the r7 10× probe caught exactly
    * that: a 3-char suffix saturates at 10³ blocks, and 10× rows made
    * er_link 8× slower; 6 chars keeps blocks at the duplicate-cluster
    * size across every probe decade — Christen 2012's block-size
    * control, the same reason real systems block on phone last-N/zip
    * with N sized to the population). The knob only works when the
    * key's ENTROPY actually grows with the registry: the r8 100× probe
    * measured a fake quadratic (93 s) because ScaleUp's 10⁷ key stride
    * froze the name's 6-digit tail at the base corpus' 15k values —
    * a generator artifact, fixed by dense key replication (2.4 s flat
    * across two decades; BENCH_NOTES r8 finding 1). */
  val BlockSuffix = 6

  /** The deterministic dirty registry: custkey mod 3 = 0 keeps the name
    * (dist 0), 1 deletes the char at position 11 (dist 1), 2 inserts an
    * 'X' after position 5 (dist 1). Neither touches the final chars,
    * so the suffix blocking key survives the noise — the property a
    * real blocking key is CHOSEN for (phone last-4, zip, soundex):
    * a deletion/insert before the tail shifts positions but leaves the
    * SUFFIX STRING identical. */
  private[graft] def dirty(spark: SparkSession, dir: String): DataFrame =
    Tables.customer(spark, dir).select(col("c_custkey").as("b_key"),
      when(col("c_custkey") % 3 === 1,
        concat(substring(col("c_name"), 1, 10), substring(col("c_name"), 12, 99)))
        .when(col("c_custkey") % 3 === 2,
          concat(substring(col("c_name"), 1, 5), lit("X"), substring(col("c_name"), 6, 99)))
        .otherwise(col("c_name")).as("b_name"))

  def linkRegistries(spark: SparkSession, dir: String): DataFrame = {
    val a = Tables.customer(spark, dir)
      .select(col("c_custkey").as("a_key"), col("c_name").as("a_name"))
    val b = dirty(spark, dir)
    val cand = a.withColumn("blk", substring(col("a_name"), -BlockSuffix, BlockSuffix))
      .join(b.withColumn("blk", substring(col("b_name"), -BlockSuffix, BlockSuffix)), Seq("blk"))
      .withColumn("dist", levenshtein(col("a_name"), col("b_name")))
      .filter(col("dist") <= MaxDist)
    val best = Window.partitionBy("b_key").orderBy(col("dist"), col("a_key"))
    cand.withColumn("rn", row_number().over(best))
      .filter(col("rn") === 1)
      .select(col("b_key"), col("a_key"), col("b_name"), col("dist"))
      .orderBy("b_key")
  }

  /** Stream-static linkage — the ingest-time form: arriving dirty
    * records block-join the FROZEN clean registry and reduce to their
    * best match with an order-insensitive min(struct(dist, a_key, …))
    * (the FunnelStreams reduction discipline; a window function can't
    * run on a stream). Every candidate for a record lives in its arrival
    * micro-batch — the registry side is static — so the per-key
    * aggregate is complete immediately and update mode emits each
    * record's final link exactly once. ErStreamSpec proves stream ≡
    * batch on multi-batch feeds. */
  def linkStream(spark: SparkSession, dir: String, dirtyStream: DataFrame): DataFrame = {
    val a = Tables.customer(spark, dir)
      .select(col("c_custkey").as("a_key"), col("c_name").as("a_name"))
      .withColumn("blk", substring(col("a_name"), -BlockSuffix, BlockSuffix))
    dirtyStream.withColumn("blk", substring(col("b_name"), -BlockSuffix, BlockSuffix))
      .join(a, Seq("blk"))
      .withColumn("dist", levenshtein(col("a_name"), col("b_name")))
      .filter(col("dist") <= MaxDist)
      .groupBy("b_key")
      .agg(min(struct(col("dist"), col("a_key"), col("b_name"))).as("best"))
      .select(col("b_key"), col("best.a_key").as("a_key"),
        col("best.b_name").as("b_name"), col("best.dist").as("dist"))
  }

  /** Batch replay of the growing-registry STREAMING linkage
    * ([[graft.streaming.ErStreams.linkGrowing]]) on the static corpus —
    * both feeds land in one "batch", every dirty record scores against
    * the full block registry, and the emissions are exactly the batch
    * linkage. Registered so the driver's er_link oracle gates the
    * streaming code path (the keyed-state scorer), not just its spec
    * (VERDICT r7 #7). */
  def linkGrowingReplay(spark: SparkSession, dir: String): DataFrame = {
    val a = Tables.customer(spark, dir).select(lit("a").as("side"),
      col("c_custkey").as("key"), col("c_name").as("name"))
    val b = dirty(spark, dir).select(lit("b").as("side"),
      col("b_key").as("key"), col("b_name").as("name"))
    graft.streaming.ErStreams.linkGrowing(spark, a.unionAll(b))
      .toDF().orderBy("b_key")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "er_link" -> linkRegistries _,
    "er_link_growing" -> linkGrowingReplay _,
  )

  /** One SQL for both forms: the streaming replay must equal the batch
    * linkage exactly. */
  private val linkSql: String =
    s"""WITH b AS (SELECT c_custkey AS b_key,
        |CASE WHEN c_custkey % 3 = 1 THEN substring(c_name, 1, 10) || substring(c_name, 12, 99)
        |WHEN c_custkey % 3 = 2 THEN substring(c_name, 1, 5) || 'X' || substring(c_name, 6, 99)
        |ELSE c_name END AS b_name FROM customer),
        |cand AS (SELECT b.b_key, a.c_custkey AS a_key, b.b_name,
        |levenshtein(a.c_name, b.b_name) AS dist
        |FROM customer a JOIN b ON right(a.c_name, $BlockSuffix) = right(b.b_name, $BlockSuffix)
        |WHERE levenshtein(a.c_name, b.b_name) <= $MaxDist),
        |best AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY b_key ORDER BY dist, a_key) AS rn
        |FROM cand)
        |SELECT b_key, a_key, b_name, CAST(dist AS INT) AS dist
        |FROM best WHERE rn = 1 ORDER BY b_key""".stripMargin.replaceAll("\n", " ")

  val oracleSql: Map[String, String] = Map(
    "er_link" -> linkSql,
    "er_link_growing" -> linkSql,
  )
}

package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Int8 scalar quantization of embedding columns — the storage/serving
  * companion to the PQ family in [[Similarity]]: symmetric per-dimension
  * absmax scaling (code = round(x·127/amax_j), the scheme used by
  * faiss's SQ8 and most vector stores' int8 mode). 4× smaller than
  * float32 with ~0.1% reconstruction error, and unlike PQ the decode is
  * a single multiply — the right format for a re-rank tier that still
  * wants near-exact dot products.
  *
  * Scale shape: the per-dimension absmax is a posexplode + groupBy(pos)
  * — the explode is pipelined (never materialized to a shuffle file) and
  * the partial max combines map-side, so the shuffle carries only
  * (#dims × #partitions) rows. The 64 maxima broadcast back as a literal
  * array; encoding is then a pure codegen'd projection over the scan.
  * Everything is exact-parity reproducible: float→double widening, IEEE
  * division, and floor(x+0.5) rounding give bit-identical codes in any
  * engine (the DuckDB oracle recomputes codes AND the reconstruction
  * error from scratch).
  */
object Quantize {

  /** Per-dimension symmetric absmax over the corpus (zero-dims clamp to
    * 1.0 so the encode is total). Returned as a driver array — #dims
    * doubles, the broadcast-literal pattern. */
  def absMax(spark: SparkSession, dir: String): Array[Double] =
    Tables.embeddings(spark, dir)
      .select(posexplode(col("embedding")).as(Seq("i", "x")))
      .groupBy("i").agg(max(abs(col("x").cast("double"))).as("amax"))
      .collect()
      .sortBy(_.getInt(0))
      .map { r => val m = r.getDouble(1); if (m == 0.0) 1.0 else m }

  /** vec_id, int8 codes (array<int> carrying [-127,127]), and the
    * round-tripped L2 reconstruction error. All element-wise work is
    * zip_with against the broadcast-literal amax array — stays inside
    * whole-stage codegen (no positional element_at loops). */
  def int8Encode(spark: SparkSession, dir: String): DataFrame = {
    val amax = absMax(spark, dir)
    val amaxCol = array(amax.map(lit): _*)
    val codes = zip_with(col("embedding"), amaxCol, (x, m) =>
      greatest(lit(-127), least(lit(127),
        floor(x.cast("double") * lit(127.0) / m + lit(0.5)))).cast("int"))
    val decoded = zip_with(col("codes"), amaxCol, (c, m) =>
      c.cast("double") * m / lit(127.0))
    val sqDiffs = zip_with(col("embedding"), decoded, (x, d) =>
      (x.cast("double") - d) * (x.cast("double") - d))
    Tables.embeddings(spark, dir)
      .withColumn("codes", codes)
      .withColumn("err", round(sqrt(aggregate(sqDiffs, lit(0.0), (a, b) => a + b)), 6))
      .select("vec_id", "codes", "err")
      .orderBy("vec_id")
  }

  /** Harness-facing shape of [[int8Encode]]: the correctness driver sorts
    * result cells, and array cells aren't sortable/hashable there — so the
    * oracled query serializes codes to a CSV string. Same math, scalar
    * columns only. */
  def int8EncodeFlat(spark: SparkSession, dir: String): DataFrame =
    int8Encode(spark, dir)
      .withColumn("codes", concat_ws(",", col("codes")))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "sq_int8" -> ((s: SparkSession, d: String) => int8EncodeFlat(s, d)),
  )

  val oracleSql: Map[String, String] = Map(
    "sq_int8" ->
      """WITH lat AS (
        |  SELECT vec_id, i, CAST(embedding[i] AS DOUBLE) AS x
        |  FROM embeddings, generate_series(1, 64) t(i)
        |), am AS (
        |  SELECT i, CASE WHEN max(abs(x)) = 0 THEN 1.0 ELSE max(abs(x)) END AS amax
        |  FROM lat GROUP BY i
        |), cj AS (
        |  SELECT vec_id, lat.i, x, amax,
        |    CAST(greatest(-127, least(127, floor(x * 127.0 / amax + 0.5))) AS INTEGER) AS code
        |  FROM lat JOIN am ON lat.i = am.i
        |)
        |SELECT vec_id, string_agg(CAST(code AS VARCHAR), ',' ORDER BY i) AS codes,
        |  round(sqrt(list_sum(list((x - code * amax / 127.0) * (x - code * amax / 127.0) ORDER BY i))), 6) AS err
        |FROM cj GROUP BY vec_id ORDER BY vec_id""".stripMargin.replaceAll("\n", " "),
  )
}

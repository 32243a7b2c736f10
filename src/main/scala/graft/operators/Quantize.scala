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

  /** Binary (1-bit) quantization: the sign bit of each dimension, packed
    * into two 32-bit halves — 64 floats become 8 bytes (32× smaller than
    * float32), the most aggressive serve-tier format vector stores ship
    * ("binary quantization"). Packing is exact integer math, so the code
    * table carries a full cross-engine hash oracle (two halves because a
    * 1<<63 BIGINT shift overflows portably — the sign bit is the one bit
    * two engines won't agree to construct the same way). */
  def binaryEncode(spark: SparkSession, dir: String): DataFrame = {
    def half(base: Int) =
      expr(s"""aggregate(sequence(0, 31), 0L,
        (acc, i) -> acc + IF(element_at(embedding, i + ${base + 1}) > 0, shiftleft(1L, i), 0L))""")
    Tables.embeddings(spark, dir)
      .select(col("vec_id"), half(0).as("bits_lo"), half(32).as("bits_hi"))
      .orderBy("vec_id")
  }

  /** Shortlist depth for [[binaryTop1]], corpus-scaled (the ann_pca
    * floor lesson): sign sketches of weak-neighbor corpora need ~13% of
    * the corpus to pin the true top-1 — measured 0/20 misses at 64/500,
    * and the fraction is what transfers, not the constant. */
  def binShortlistFor(n: Long): Int = math.max(64, math.ceil(n * 0.13).toInt)

  /** Top-1 neighbor served from the 8-byte binary codes: ASYMMETRIC
    * scoring — the query stays float, each corpus row is scored as
    * dot(q, sign(x)) straight from its packed bits (the asymmetric-
    * distance idea of PQ/ADC applied to 1-bit codes; symmetric Hamming
    * on these weak-neighbor fixtures needs 2–4× the shortlist for the
    * same recall — measured, not assumed). The corpus-side scan ships
    * (vec_id, 8 bytes) and does 64 adds per row; the float vectors are
    * touched only for the shortlist re-rank, ∝ queries·shortlist rows
    * regardless of corpus size. Registered as a full top-1 equality
    * oracle, like every other probe-enough ANN slice. */
  def binaryTop1(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val e = Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val codes = binaryEncode(spark, dir)
    // size the shortlist from the RAW table, not codes: counting the
    // un-persisted encode frame materialized the O(N·64) bit-pack once
    // for the count and again in the join (r9 review find) — the row
    // counts are identical, the raw scan is footer-cheap
    val n = e.count()
    val shortlist = binShortlistFor(n)
    val q = e.filter(col("vec_id") < Similarity.QuerySetSize)
      .select(col("vec_id").as("q_id"), col("v").as("vq"))
    // asymmetric score from the packed halves: Σ_i bit_i ? q_i : −q_i
    def asymHalf(bitsCol: String, base: Int) =
      expr(s"""aggregate(sequence(0, 31), 0D,
        (acc, i) -> acc + IF((shiftright($bitsCol, i) & 1L) = 1L,
          element_at(vq, i + ${base + 1}), -element_at(vq, i + ${base + 1})))""")
    val wA = Window.partitionBy("q_id").orderBy(col("asym").desc, col("nbr_id"))
    val wE = Window.partitionBy("q_id").orderBy(round(col("cs"), 6).desc, col("nbr_id"))
    broadcast(q)
      .join(codes.select(col("vec_id").as("nbr_id"), col("bits_lo"), col("bits_hi")),
        col("q_id") =!= col("nbr_id"))
      .withColumn("asym", asymHalf("bits_lo", 0) + asymHalf("bits_hi", 32))
      .select("q_id", "nbr_id", "asym")
      .withColumn("arank", row_number().over(wA))
      .filter(col("arank") <= shortlist)
      .select("q_id", "nbr_id")
      .join(broadcast(q), Seq("q_id"))
      .join(e.select(col("vec_id").as("nbr_id"), col("v").as("vn")), Seq("nbr_id"))
      .withColumn("cs", graft.plans.VectorOps.dot(col("vq"), col("vn")))
      .withColumn("rank", row_number().over(wE))
      .filter(col("rank") === 1)
      .select(col("q_id"), col("nbr_id"), round(col("cs"), 4).as("cs"))
      .orderBy("q_id")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "sq_int8" -> ((s: SparkSession, d: String) => int8EncodeFlat(s, d)),
    "sq_binary" -> binaryEncode _,
    "ann_binary_top1" -> binaryTop1 _,
  )

  val oracleSql: Map[String, String] = Map(
    "sq_binary" ->
      """WITH lat AS (
        |  SELECT vec_id, i, embedding[i + 1] AS x
        |  FROM embeddings, generate_series(0, 63) t(i)
        |)
        |SELECT vec_id,
        |  bit_or(CASE WHEN i < 32 AND x > 0 THEN 1::BIGINT << i ELSE 0 END) AS bits_lo,
        |  bit_or(CASE WHEN i >= 32 AND x > 0 THEN 1::BIGINT << (i - 32) ELSE 0 END) AS bits_hi
        |FROM lat GROUP BY vec_id ORDER BY vec_id""".stripMargin.replaceAll("\n", " "),
    // the binary-code serve tier must still recover the exact top-1:
    // same brute-force oracle as the other probe-enough ANN slices
    "ann_binary_top1" ->
      """WITH scored AS (
        |SELECT a.vec_id AS q_id, b.vec_id AS nbr_id,
        |list_sum(list_transform(list_zip(a.embedding, b.embedding),
        |p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE))) AS cs
        |FROM embeddings a JOIN embeddings b ON a.vec_id <> b.vec_id
        |WHERE a.vec_id < 20),
        |ranked AS (SELECT q_id, nbr_id, cs,
        |ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY ROUND(cs,6) DESC, nbr_id) AS rn
        |FROM scored)
        |SELECT q_id, nbr_id, ROUND(cs,4) AS cs FROM ranked
        |WHERE rn = 1 ORDER BY q_id""".stripMargin.replaceAll("\n", " "),
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

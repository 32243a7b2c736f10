package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Multimodal column plumbing (north-star extension; SURVEY.md §2.G G23).
  *
  * Media assets are opaque `binary` columns with a typed metadata struct —
  * the layout `spark.read.format("binaryFile")` produces and the layout a
  * 100 TB image/audio corpus would use (content + metadata side by side,
  * partitioned by asset kind/date; never small files).
  *
  * The decode step (image/audio codecs) is a STUB — the container has no
  * media libraries — but everything Spark-side is real and tested: schema,
  * typed Dataset plumbing, mapPartitions batching (decoder init amortized
  * per partition, the same shape a JNI/FFI codec needs), and the feature
  * schema downstream operators consume. The corpus stand-in is
  * documents.text encoded as UTF-8 bytes.
  */
object Multimodal {

  case class BinaryAsset(doc_id: Long, content: Array[Byte], mime: String, n_bytes: Long)
  case class AssetFeatures(doc_id: Long, n_bytes: Long, mean_byte: Double,
      byte_entropy: Double, width: Int, height: Int)

  /** The binary-column view: content bytes + typed metadata. */
  def binaryAssets(spark: SparkSession, dir: String): Dataset[BinaryAsset] = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .select(col("doc_id"),
        col("text").cast("binary").as("content"),
        lit("application/octet-stream").as("mime"),
        octet_length(col("text")).cast("long").as("n_bytes"))
      .as[BinaryAsset]
  }

  /** STUB decoder: stands in for an image/audio codec. Deterministic fake —
    * real decode would parse `bytes` with a native library initialized once
    * per partition (see mapPartitions in decodeFeatures). */
  private def stubDecode(bytes: Array[Byte]): (Double, Double, Int, Int) = {
    val n = bytes.length.max(1)
    val counts = new Array[Long](256)
    var sum = 0.0
    bytes.foreach { b => val u = b & 0xff; counts(u) += 1; sum += u }
    val mean = sum / n
    var ent = 0.0
    counts.foreach { c =>
      if (c > 0) { val p = c.toDouble / n; ent -= p * math.log(p) / math.log(2) }
    }
    // fake dimensions derived from content so downstream schema is exercised
    val w = 16 + (bytes.headOption.map(_ & 0xff).getOrElse(0) % 16)
    (mean, ent, w, n / w.max(1))
  }

  /** Per-asset feature extraction via mapPartitions: decoder setup happens
    * once per partition (the pattern that matters for real codecs), rows
    * stream through without materializing the partition. */
  def decodeFeatures(spark: SparkSession, dir: String): Dataset[AssetFeatures] = {
    import spark.implicits._
    binaryAssets(spark, dir).mapPartitions { it =>
      // real pipeline: initialize the native decoder here, once per partition
      it.map { a =>
        val (mean, ent, w, h) = stubDecode(a.content)
        AssetFeatures(a.doc_id, a.n_bytes,
          math.rint(mean * 10000) / 10000, math.rint(ent * 10000) / 10000, w, h)
      }
    }
  }

  /** Oracle-able metadata projection (no decode). */
  def meta(spark: SparkSession, dir: String): DataFrame =
    binaryAssets(spark, dir).toDF()
      .select(col("doc_id"), col("n_bytes"),
        ascii(substring(col("content").cast("string"), 1, 1)).cast("long").as("first_byte"))
      .orderBy("doc_id")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "mm_meta" -> meta _,
    "mm_features" -> ((s: SparkSession, d: String) =>
      decodeFeatures(s, d).toDF().orderBy("doc_id")), // no oracle: stub decode, checked in MultimodalSpec
  )

  val oracleSql: Map[String, String] = Map(
    "mm_meta" ->
      """SELECT doc_id, CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
        |CAST(ascii(substr(text,1,1)) AS BIGINT) AS first_byte
        |FROM documents ORDER BY doc_id""".stripMargin.replaceAll("\n", " "),
  )
}

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
  * The FULL pixel decode (image/audio codecs) is out of container scope —
  * no media libraries — but the container-header decode is real: PNG IHDR,
  * JPEG SOFn, GIF logical-screen and BMP info-header dimensions are parsed
  * from raw bytes (`imageDims`), and every asset gets exact byte statistics
  * (mean, Shannon entropy). Everything Spark-side is real and tested:
  * schema, typed Dataset plumbing, mapPartitions batching (decoder init
  * amortized per partition, the same shape a JNI/FFI codec needs), and the
  * feature schema downstream operators consume. The corpus stand-in is
  * documents.text encoded as UTF-8 bytes (unknown format → dims 0×0).
  */
object Multimodal {

  case class BinaryAsset(doc_id: Long, content: Array[Byte], mime: String, n_bytes: Long)
  case class AssetFeatures(doc_id: Long, n_bytes: Long, mean_byte: Double,
      byte_entropy: Double, width: Int, height: Int,
      sample_rate: Int, channels: Int, duration_ms: Long)

  /** Audio/video container metadata (no codec — header math only). */
  case class MediaMeta(sample_rate: Int, channels: Int, duration_ms: Long)

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

  private def u8(b: Array[Byte], i: Int): Int = b(i) & 0xff
  private def be16(b: Array[Byte], i: Int): Int = (u8(b, i) << 8) | u8(b, i + 1)
  private def le16(b: Array[Byte], i: Int): Int = u8(b, i) | (u8(b, i + 1) << 8)
  private def be32(b: Array[Byte], i: Int): Int =
    (u8(b, i) << 24) | (u8(b, i + 1) << 16) | (u8(b, i + 2) << 8) | u8(b, i + 3)
  private def le32(b: Array[Byte], i: Int): Int =
    u8(b, i) | (u8(b, i + 1) << 8) | (u8(b, i + 2) << 16) | (u8(b, i + 3) << 24)

  /** Image dimensions parsed from the container header — pure byte math,
    * no codec library. Supported: PNG (IHDR), JPEG (first SOFn frame
    * header), GIF87a/89a (logical screen descriptor), BMP (BITMAPINFOHEADER).
    * None for anything else (or malformed/truncated headers). */
  private[operators] def imageDims(b: Array[Byte]): Option[(Int, Int)] = {
    // PNG: 8-byte signature, then IHDR chunk (len, "IHDR", width BE32, height BE32)
    if (b.length >= 24 && u8(b, 0) == 0x89 && b(1) == 'P' && b(2) == 'N' && b(3) == 'G' &&
        u8(b, 4) == 0x0d && u8(b, 5) == 0x0a && u8(b, 6) == 0x1a && u8(b, 7) == 0x0a &&
        b(12) == 'I' && b(13) == 'H' && b(14) == 'D' && b(15) == 'R')
      Some((be32(b, 16), be32(b, 20)))
    // JPEG: FF D8, then marker segments; dims live in the first SOFn
    // (C0–CF except C4 DHT / C8 JPG-ext / CC DAC): precision u8,
    // height BE16, width BE16
    else if (b.length >= 4 && u8(b, 0) == 0xff && u8(b, 1) == 0xd8) {
      var i = 2
      var out: Option[(Int, Int)] = None
      while (out.isEmpty && i + 3 < b.length) {
        if (u8(b, i) != 0xff) i += 1 // skip fill/garbage between segments
        else {
          val m = u8(b, i + 1)
          if (m == 0xff) i += 1 // fill byte
          else if (m == 0xd8 || (m >= 0xd0 && m <= 0xd9)) i += 2 // standalone
          else {
            val len = be16(b, i + 2)
            if (m >= 0xc0 && m <= 0xcf && m != 0xc4 && m != 0xc8 && m != 0xcc) {
              if (i + 8 < b.length) out = Some((be16(b, i + 7), be16(b, i + 5)))
              else i = b.length
            } else if (len < 2) i = b.length // malformed
            else i += 2 + len
          }
        }
      }
      out
    }
    // GIF: "GIF87a"/"GIF89a", logical screen width/height LE16
    else if (b.length >= 10 && b(0) == 'G' && b(1) == 'I' && b(2) == 'F' &&
        b(3) == '8' && (b(4) == '7' || b(4) == '9') && b(5) == 'a')
      Some((le16(b, 6), le16(b, 8)))
    // BMP: "BM", BITMAPINFOHEADER width/height LE32 at 18/22 (height may
    // be negative = top-down rows; dimension is the magnitude)
    else if (b.length >= 26 && b(0) == 'B' && b(1) == 'M')
      Some((le32(b, 18), math.abs(le32(b, 22))))
    else None
  }

  /** Audio/video container metadata parsed from raw bytes — the
    * image-sibling for the other two modalities. Supported: WAV
    * (RIFF/WAVE fmt + data chunks → channels, sample rate, duration
    * from data size / byte rate) and MP4-family (ISO BMFF: moov/mvhd
    * timescale + duration; sample rate/channels stay 0 — they live in
    * per-track boxes a codec would own). None otherwise. */
  private[operators] def mediaMeta(b: Array[Byte]): Option[MediaMeta] = {
    // WAV: "RIFF" size "WAVE", then (id, LE32 size, payload) chunks
    if (b.length >= 44 && b(0) == 'R' && b(1) == 'I' && b(2) == 'F' && b(3) == 'F' &&
        b(8) == 'W' && b(9) == 'A' && b(10) == 'V' && b(11) == 'E') {
      var i = 12
      var rate = 0; var ch = 0; var byteRate = 0; var dataLen = -1L
      while (i + 8 <= b.length && (rate == 0 || dataLen < 0)) {
        val size = le32(b, i + 4).toLong & 0xffffffffL
        val id = new String(b.slice(i, i + 4), "US-ASCII")
        if (id == "fmt " && i + 16 + 8 <= b.length) {
          ch = le16(b, i + 10); rate = le32(b, i + 12); byteRate = le32(b, i + 16)
        } else if (id == "data") dataLen = size
        i += 8 + size.toInt + (size.toInt & 1) // chunks are word-aligned
      }
      if (rate <= 0) None
      else Some(MediaMeta(rate, ch,
        if (byteRate > 0 && dataLen >= 0) dataLen * 1000L / byteRate else 0L))
    }
    // ISO BMFF (MP4/MOV/M4A): BE32-size boxes; duration in moov/mvhd
    else if (b.length >= 16 && b(4) == 'f' && b(5) == 't' && b(6) == 'y' && b(7) == 'p') {
      def findBox(name: String, from: Int, until: Int): Option[(Int, Int)] = {
        var i = from
        while (i + 8 <= until) {
          val size = be32(b, i)
          val id = new String(b.slice(i + 4, i + 8), "US-ASCII")
          if (id == name) return Some((i, if (size >= 8) math.min(i + size, until) else until))
          if (size < 8) return None // size 0/1 (to-eof / 64-bit) not supported
          i += size
        }
        None
      }
      for {
        (moov, moovEnd) <- findBox("moov", 0, b.length)
        (mvhd, _) <- findBox("mvhd", moov + 8, moovEnd)
        version = u8(b, mvhd + 8)
        if (version == 0 && mvhd + 28 <= b.length) || (version == 1 && mvhd + 40 <= b.length)
      } yield {
        // v0: u32 times at +12 (ctime, mtime, timescale, duration)
        // v1: u64 ctime/mtime then u32 timescale, u64 duration
        val (timescale, duration) =
          if (version == 0) (be32(b, mvhd + 20).toLong, be32(b, mvhd + 24).toLong)
          else (be32(b, mvhd + 28).toLong,
            (be32(b, mvhd + 32).toLong << 32) | (be32(b, mvhd + 36).toLong & 0xffffffffL))
        MediaMeta(0, 0, if (timescale > 0) duration * 1000L / timescale else 0L)
      }
    }
    else None
  }

  /** Exact byte statistics: mean byte value and Shannon entropy (bits) of
    * the byte histogram. */
  private[operators] def byteStats(bytes: Array[Byte]): (Double, Double) = {
    val n = bytes.length.max(1)
    val counts = new Array[Long](256)
    var sum = 0.0
    bytes.foreach { b => val u = b & 0xff; counts(u) += 1; sum += u }
    var ent = 0.0
    counts.foreach { c =>
      if (c > 0) { val p = c.toDouble / n; ent -= p * math.log(p) / math.log(2) }
    }
    (sum / n, ent)
  }

  /** Per-asset feature extraction via mapPartitions: decoder setup happens
    * once per partition (the pattern that matters for real codecs), rows
    * stream through without materializing the partition. Dimensions come
    * from the real container-header parse; unknown formats keep 0×0 and
    * the byte statistics still apply. */
  def decodeFeatures(spark: SparkSession, dir: String): Dataset[AssetFeatures] = {
    import spark.implicits._
    binaryAssets(spark, dir).mapPartitions { it =>
      // real pipeline: initialize the native pixel decoder here, once per
      // partition; the header parse below needs no library state
      it.map { a =>
        val (mean, ent) = byteStats(a.content)
        val (w, h) = imageDims(a.content).getOrElse((0, 0))
        val mm = mediaMeta(a.content).getOrElse(MediaMeta(0, 0, 0L))
        AssetFeatures(a.doc_id, a.n_bytes, mean, ent, w, h,
          mm.sample_rate, mm.channels, mm.duration_ms)
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
    // oracled: byte stats are DuckDB-recomputable over the same bytes
    // (corpus is ASCII text so ascii(substr) = byte value); rounding done
    // in Column-land (Spark round == DuckDB ROUND, HALF_UP) not in the
    // typed map, so both engines round the same raw doubles
    "mm_features" -> ((s: SparkSession, d: String) =>
      decodeFeatures(s, d).toDF()
        .withColumn("mean_byte", round(col("mean_byte"), 4))
        .withColumn("byte_entropy", round(col("byte_entropy"), 4))
        .orderBy("doc_id")),
  )

  val oracleSql: Map[String, String] = Map(
    "mm_meta" ->
      """SELECT doc_id, CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
        |CAST(ascii(substr(text,1,1)) AS BIGINT) AS first_byte
        |FROM documents ORDER BY doc_id""".stripMargin.replaceAll("\n", " "),
    "mm_features" ->
      """WITH b AS (SELECT doc_id, ascii(substr(text, i, 1)) AS bv
        |FROM documents, LATERAL (SELECT unnest(generate_series(1, length(text))) AS i))
        |SELECT d.doc_id, CAST(octet_length(encode(d.text)) AS BIGINT) AS n_bytes,
        |ROUND(AVG(b.bv), 4) AS mean_byte, ROUND(entropy(b.bv), 4) AS byte_entropy,
        |CAST(0 AS INTEGER) AS width, CAST(0 AS INTEGER) AS height,
        |CAST(0 AS INTEGER) AS sample_rate, CAST(0 AS INTEGER) AS channels,
        |CAST(0 AS BIGINT) AS duration_ms
        |FROM documents d JOIN b ON b.doc_id = d.doc_id
        |GROUP BY d.doc_id, d.text ORDER BY d.doc_id""".stripMargin.replaceAll("\n", " "),
  )
}

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
    // TIFF: "II"+0x2A LE or "MM"+0x2A BE, IFD0 entries tagged 256/257
    // (ImageWidth/ImageLength), SHORT or LONG, value inline in the entry
    else if (b.length >= 8 && ((b(0) == 'I' && b(1) == 'I' && u8(b, 2) == 0x2a && u8(b, 3) == 0) ||
        (b(0) == 'M' && b(1) == 'M' && u8(b, 2) == 0 && u8(b, 3) == 0x2a))) {
      val le = b(0) == 'I'
      def r16(i: Int) = if (le) le16(b, i) else be16(b, i)
      def r32(i: Int) = if (le) le32(b, i) else be32(b, i)
      val ifd = r32(4)
      if (ifd < 0 || ifd + 2 > b.length) None
      else {
        val n = r16(ifd)
        var w = -1; var h = -1; var e = 0
        while (e < n && ifd + 2 + 12 * (e + 1) <= b.length) {
          val off = ifd + 2 + 12 * e
          val tag = r16(off); val typ = r16(off + 2)
          // inline value: SHORT (3) sits in the first 2 bytes of the value
          // field under the file's endianness; LONG (4) uses all 4
          val v = if (typ == 3) r16(off + 8) else r32(off + 8)
          if (tag == 256) w = v else if (tag == 257) h = v
          e += 1
        }
        if (w >= 0 && h >= 0) Some((w, h)) else None
      }
    }
    // WebP: RIFF/WEBP, then one of VP8 (lossy frame tag), VP8L (lossless
    // 14-bit packed dims), VP8X (extended: 24-bit canvas minus-one dims)
    else if (b.length >= 25 && b(0) == 'R' && b(1) == 'I' && b(2) == 'F' && b(3) == 'F' &&
        b(8) == 'W' && b(9) == 'E' && b(10) == 'B' && b(11) == 'P') {
      val cc = new String(b.slice(12, 16), "US-ASCII")
      cc match {
        case "VP8 " if b.length >= 30 && u8(b, 23) == 0x9d && u8(b, 24) == 0x01 && u8(b, 25) == 0x2a =>
          Some((le16(b, 26) & 0x3fff, le16(b, 28) & 0x3fff))
        case "VP8L" if b.length >= 25 && u8(b, 20) == 0x2f =>
          val bits = le32(b, 21)
          Some(((bits & 0x3fff) + 1, ((bits >> 14) & 0x3fff) + 1))
        case "VP8X" if b.length >= 30 =>
          // payload at 20: flags u8 + 3 reserved, then 24-bit LE
          // canvas-width-1 / canvas-height-1
          def u24(i: Int) = u8(b, i) | (u8(b, i + 1) << 8) | (u8(b, i + 2) << 16)
          Some((u24(24) + 1, u24(27) + 1))
        case _ => None
      }
    }
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
      // Long cursor: a corrupt chunk size in (2^31, 2^32) truncated
      // through toInt went NEGATIVE, walked the cursor backward, and spun
      // this loop forever — one malformed asset in a binaryFile corpus
      // hung its executor task (r9 review find). Unsigned-Long advancement
      // is strictly +8-or-more per step, so the walk always terminates.
      var i = 12L
      var rate = 0; var ch = 0; var byteRate = 0; var dataLen = -1L
      while (i + 8 <= b.length && (rate == 0 || dataLen < 0)) {
        val size = le32(b, i.toInt + 4).toLong & 0xffffffffL
        val id = new String(b.slice(i.toInt, i.toInt + 4), "US-ASCII")
        if (id == "fmt " && i + 16 + 8 <= b.length) {
          ch = le16(b, i.toInt + 10); rate = le32(b, i.toInt + 12); byteRate = le32(b, i.toInt + 16)
        } else if (id == "data") dataLen = size
        i += 8L + size + (size & 1L) // chunks are word-aligned
      }
      if (rate <= 0) None
      else Some(MediaMeta(rate, ch,
        if (byteRate > 0 && dataLen >= 0) dataLen * 1000L / byteRate else 0L))
    }
    // ISO BMFF (MP4/MOV/M4A): BE32-size boxes; duration in moov/mvhd,
    // audio sample rate/channels in the first 'soun' trak's stsd entry
    else if (isBmff(b)) {
      for {
        (moov, moovEnd) <- findBox(b, "moov", 0, b.length)
        (mvhd, _) <- findBox(b, "mvhd", moov + 8, moovEnd)
        version = u8(b, mvhd + 8)
        if (version == 0 && mvhd + 28 <= b.length) || (version == 1 && mvhd + 40 <= b.length)
      } yield {
        // v0: u32 times at +12 (ctime, mtime, timescale, duration)
        // v1: u64 ctime/mtime then u32 timescale, u64 duration
        val (timescale, duration) =
          if (version == 0) (be32(b, mvhd + 20).toLong, be32(b, mvhd + 24).toLong)
          else (be32(b, mvhd + 28).toLong,
            (be32(b, mvhd + 32).toLong << 32) | (be32(b, mvhd + 36).toLong & 0xffffffffL))
        val (rate, ch) = audioSampleEntry(b, moov, moovEnd).getOrElse((0, 0))
        MediaMeta(rate, ch, if (timescale > 0) duration * 1000L / timescale else 0L)
      }
    }
    else None
  }

  private def isBmff(b: Array[Byte]): Boolean =
    b.length >= 16 && b(4) == 'f' && b(5) == 't' && b(6) == 'y' && b(7) == 'p'

  /** First box named `name` in [from, until): (start, end). Box ends and
    * cursor advancement go through Long arithmetic: a crafted size near
    * 2^31 made `i + size` overflow NEGATIVE, which kept the loop
    * condition true and indexed the array at a negative offset — a throw
    * where the contract is "malformed contributes nothing" (r9 review
    * find, same class as the WAV cursor). */
  private def findBox(b: Array[Byte], name: String, from: Int, until: Int): Option[(Int, Int)] = {
    var i = from
    while (i + 8 <= until) {
      val size = be32(b, i)
      val id = new String(b.slice(i + 4, i + 8), "US-ASCII")
      if (id == name)
        return Some((i, if (size >= 8) math.min(i.toLong + size, until.toLong).toInt else until))
      if (size < 8) return None // size 0/1 (to-eof / 64-bit) not supported
      val next = i.toLong + size
      if (next > until) return None
      i = next.toInt
    }
    None
  }

  /** All boxes named `name` at one nesting level in [from, until). */
  private def findBoxes(b: Array[Byte], name: String, from: Int, until: Int): Seq[(Int, Int)] = {
    val out = Seq.newBuilder[(Int, Int)]
    var i = from
    var ok = true
    while (ok && i + 8 <= until) {
      val size = be32(b, i)
      if (size < 8) ok = false
      else {
        val id = new String(b.slice(i + 4, i + 8), "US-ASCII")
        if (id == name) out += ((i, math.min(i.toLong + size, until.toLong).toInt))
        val next = i.toLong + size // Long: a ~2^31 size overflowed Int (see findBox)
        if (next > until) ok = false
        else i = next.toInt
      }
    }
    out.result()
  }

  /** Audio stsd parse (ISO 14496-12 AudioSampleEntry): find the first
    * trak whose hdlr is 'soun', then its stbl/stsd entry — channelcount
    * u16 at entry+24, samplerate 16.16 fixed at entry+32 (integer part).
    * Header math only — the codec payload (esds etc.) stays opaque. */
  private def audioSampleEntry(b: Array[Byte], moov: Int, moovEnd: Int): Option[(Int, Int)] =
    findBoxes(b, "trak", moov + 8, moovEnd).flatMap { case (trak, trakEnd) =>
      for {
        (mdia, mdiaEnd) <- findBox(b, "mdia", trak + 8, trakEnd)
        (hdlr, _) <- findBox(b, "hdlr", mdia + 8, mdiaEnd)
        if hdlr + 20 <= b.length &&
          new String(b.slice(hdlr + 16, hdlr + 20), "US-ASCII") == "soun"
        (minf, minfEnd) <- findBox(b, "minf", mdia + 8, mdiaEnd)
        (stbl, stblEnd) <- findBox(b, "stbl", minf + 8, minfEnd)
        (stsd, _) <- findBox(b, "stsd", stbl + 8, stblEnd)
        entry = stsd + 16 // box header + version/flags + entry_count
        if entry + 36 <= b.length
      } yield (be16(b, entry + 32), be16(b, entry + 24))
    }.headOption

  /** One sampled frame: index, media timestamp, absolute byte offset and
    * size inside the container — everything a distributed frame-extract
    * stage needs to read JUST those bytes (range request / seek) without
    * touching a codec. */
  case class FrameRef(frame_idx: Int, ts_ms: Long, offset: Long, n_bytes: Long)

  /** Sanity cap on declared table entry counts: a corrupt 32-bit count
    * must never drive Array.tabulate into a multi-GB allocation — one bad
    * asset in a binaryFile corpus yields Seq.empty, not a dead stage. */
  private val MaxSamples = 1 << 20

  /** mdhd timescale with the version branch: v0 keeps u32 times
    * (timescale at +20), v1 widens ctime/mtime to u64 (timescale at +28).
    * 0 on truncation or an unknown version. */
  private def mdhdTimescale(b: Array[Byte], mdhd: Int, mdhdEnd: Int): Long = {
    if (mdhd + 9 > mdhdEnd) return 0L
    u8(b, mdhd + 8) match {
      case 0 if mdhd + 24 <= mdhdEnd => be32(b, mdhd + 20).toLong & 0xffffffffL
      case 1 if mdhd + 32 <= mdhdEnd => be32(b, mdhd + 28).toLong & 0xffffffffL
      case _ => 0L
    }
  }

  /** (dts, offset, size) for every sample the moov sample tables resolve,
    * plus the media timescale. None when the stbl is absent, empty (a
    * fragmented file keeps zero-entry tables in moov), or inconsistent —
    * every declared entry count is validated against its box end before
    * any allocation. */
  private def moovSamples(b: Array[Byte]): Option[(IndexedSeq[(Long, Long, Long)], Long)] = {
    val stblOpt = for {
      (moov, moovEnd) <- findBox(b, "moov", 0, b.length)
      (trak, trakEnd) <- findBoxes(b, "trak", moov + 8, moovEnd).collectFirst {
        case t if (for {
          (mdia, mdiaEnd) <- findBox(b, "mdia", t._1 + 8, t._2)
          (minf, minfEnd) <- findBox(b, "minf", mdia + 8, mdiaEnd)
          (stbl, stblEnd) <- findBox(b, "stbl", minf + 8, minfEnd)
          _ <- findBox(b, "stts", stbl + 8, stblEnd)
          _ <- findBox(b, "stsc", stbl + 8, stblEnd)
          _ <- findBox(b, "stsz", stbl + 8, stblEnd)
          _ <- findBox(b, "stco", stbl + 8, stblEnd)
        } yield ()).isDefined => t
      }
      (mdia, mdiaEnd) <- findBox(b, "mdia", trak + 8, trakEnd)
      (mdhd, mdhdEnd) <- findBox(b, "mdhd", mdia + 8, mdiaEnd)
      (minf, minfEnd) <- findBox(b, "minf", mdia + 8, mdiaEnd)
      (stbl, stblEnd) <- findBox(b, "stbl", minf + 8, minfEnd)
    } yield (stbl, stblEnd, mdhdTimescale(b, mdhd, mdhdEnd))
    def resolve(stbl: Int, stblEnd: Int,
        timescale: Long): Option[(IndexedSeq[(Long, Long, Long)], Long)] = {
      val Some((stts, sttsEnd)) = findBox(b, "stts", stbl + 8, stblEnd)
      val Some((stsc, stscEnd)) = findBox(b, "stsc", stbl + 8, stblEnd)
      val Some((stsz, stszEnd)) = findBox(b, "stsz", stbl + 8, stblEnd)
      val Some((stco, stcoEnd)) = findBox(b, "stco", stbl + 8, stblEnd)
      if (stsz + 20 > stszEnd || stts + 16 > sttsEnd ||
          stsc + 16 > stscEnd || stco + 16 > stcoEnd) return None
      // stsz: uniform size or per-sample table
      val uniform = be32(b, stsz + 12)
      val n = be32(b, stsz + 16)
      val sttsN = be32(b, stts + 12)
      val stscN = be32(b, stsc + 12)
      val nChunks = be32(b, stco + 12)
      // declared counts vs box ends (and the sanity cap): reject, don't trust
      if (n <= 0 || n > MaxSamples ||
          (uniform == 0 && stsz + 20 + 4L * n > stszEnd) ||
          sttsN < 0 || stts + 16 + 8L * sttsN > sttsEnd ||
          stscN <= 0 || stsc + 16 + 12L * stscN > stscEnd ||
          nChunks <= 0 || stco + 16 + 4L * nChunks > stcoEnd) return None
      val sizes = Array.tabulate(n)(k =>
        (if (uniform != 0) uniform else be32(b, stsz + 20 + 4 * k)).toLong)
      // stts: (count, delta) runs → per-sample decode timestamps
      val dts = new Array[Long](n)
      var k = 0; var t = 0L; var e = 0
      while (e < sttsN && k < n) {
        val cnt = be32(b, stts + 16 + 8 * e); val delta = be32(b, stts + 20 + 8 * e)
        var c = 0
        while (c < cnt && k < n) { dts(k) = t; t += delta; k += 1; c += 1 }
        e += 1
      }
      // stsc runs + stco chunk offsets → absolute sample offsets
      val runs = Array.tabulate(stscN)(i =>
        (be32(b, stsc + 16 + 12 * i), be32(b, stsc + 20 + 12 * i))) // (first_chunk 1-based, samples/chunk)
      val chunkOff = Array.tabulate(nChunks)(i => be32(b, stco + 16 + 4 * i).toLong & 0xffffffffL)
      val offsets = new Array[Long](n)
      var s = 0; var chunk = 1; var run = 0
      while (s < n && chunk <= nChunks) {
        if (run + 1 < runs.length && chunk >= runs(run + 1)._1) run += 1
        val spc = runs(run)._2
        var within = 0; var off = chunkOff(chunk - 1)
        while (within < spc && s < n) {
          offsets(s) = off; off += sizes(s); s += 1; within += 1
        }
        chunk += 1
      }
      val total = math.min(s, n) // samples actually mapped to chunks
      if (total <= 0) None
      else Some(((0 until total).map(i => (dts(i), offsets(i), sizes(i))), timescale))
    }
    stblOpt.flatMap { case (stbl, stblEnd, ts) => resolve(stbl, stblEnd, ts) }
  }

  /** (dts, offset, size) from fragmented-MP4 movie fragments (moof/traf/
    * trun, ISO 14496-12 §8.8): tfhd carries per-fragment defaults and the
    * base-offset mode, tfdt the decode-time base, trun the per-sample
    * size/duration arrays. Same bounds discipline as moovSamples — a
    * truncated fragment contributes nothing rather than throwing. */
  private def fragSamples(b: Array[Byte]): IndexedSeq[(Long, Long, Long)] = {
    val out = IndexedSeq.newBuilder[(Long, Long, Long)]
    var nextDts = 0L
    for ((moof, moofEnd) <- findBoxes(b, "moof", 0, b.length)) {
      for ((traf, trafEnd) <- findBoxes(b, "traf", moof + 8, moofEnd)) {
        findBox(b, "tfhd", traf + 8, trafEnd).foreach { case (tfhd, tfhdEnd) =>
          if (tfhd + 16 <= tfhdEnd) {
            val tfFlags = be32(b, tfhd + 8) & 0xffffff
            var p = tfhd + 16
            // base-data-offset explicit (0x1) or default-base-is-moof
            // (0x20000); either way fragment data addresses are
            // moof-relative in the synthetic and common real layouts
            var baseOff: Long = moof.toLong
            if ((tfFlags & 0x1) != 0 && p + 8 <= tfhdEnd) {
              baseOff = (be32(b, p).toLong << 32) | (be32(b, p + 4).toLong & 0xffffffffL); p += 8
            }
            if ((tfFlags & 0x2) != 0) p += 4 // sample_description_index
            var defDur = 0L; var defSize = 0L
            if ((tfFlags & 0x8) != 0 && p + 4 <= tfhdEnd) {
              defDur = be32(b, p).toLong & 0xffffffffL; p += 4
            }
            if ((tfFlags & 0x10) != 0 && p + 4 <= tfhdEnd) {
              defSize = be32(b, p).toLong & 0xffffffffL; p += 4
            }
            val baseTime = findBox(b, "tfdt", traf + 8, trafEnd).collect {
              case (tfdt, tfdtEnd) if tfdt + 12 <= tfdtEnd =>
                if (u8(b, tfdt + 8) == 1 && tfdt + 20 <= tfdtEnd)
                  (be32(b, tfdt + 12).toLong << 32) | (be32(b, tfdt + 16).toLong & 0xffffffffL)
                else be32(b, tfdt + 12).toLong & 0xffffffffL
            }
            var dts = baseTime.getOrElse(nextDts)
            for ((trun, trunEnd) <- findBoxes(b, "trun", traf + 8, trafEnd)) {
              if (trun + 16 <= trunEnd) {
                val trFlags = be32(b, trun + 8) & 0xffffff
                val cnt = be32(b, trun + 12)
                var q = trun + 16
                var off = baseOff
                if ((trFlags & 0x1) != 0 && q + 4 <= trunEnd) { off = baseOff + be32(b, q); q += 4 }
                if ((trFlags & 0x4) != 0) q += 4 // first_sample_flags
                val perSample = (if ((trFlags & 0x100) != 0) 4 else 0) +
                  (if ((trFlags & 0x200) != 0) 4 else 0) +
                  (if ((trFlags & 0x400) != 0) 4 else 0) +
                  (if ((trFlags & 0x800) != 0) 4 else 0)
                // declared sample count vs the trun box end + sanity cap
                if (cnt > 0 && cnt <= MaxSamples && q + perSample.toLong * cnt <= trunEnd) {
                  var s = 0
                  while (s < cnt) {
                    var dur = defDur; var sz = defSize
                    if ((trFlags & 0x100) != 0) { dur = be32(b, q).toLong & 0xffffffffL; q += 4 }
                    if ((trFlags & 0x200) != 0) { sz = be32(b, q).toLong & 0xffffffffL; q += 4 }
                    if ((trFlags & 0x400) != 0) q += 4 // sample_flags
                    if ((trFlags & 0x800) != 0) q += 4 // cts offset
                    out += ((dts, off, sz))
                    off += sz; dts += dur; s += 1
                  }
                }
                nextDts = dts
              }
            }
          }
        }
      }
    }
    out.result()
  }

  /** Evenly-strided sample of ≤ maxFrames refs (first frame included). */
  private def strideSample(samples: IndexedSeq[(Long, Long, Long)], timescale: Long,
      maxFrames: Int): Seq[FrameRef] = {
    val total = samples.length
    val take = math.min(maxFrames, total)
    (0 until take).map { i =>
      val idx = (i.toLong * total / take).toInt
      val (dts, off, sz) = samples(idx)
      FrameRef(idx, if (timescale > 0) dts * 1000L / timescale else 0L, off, sz)
    }
  }

  /** Frame-offset sampler over the MP4 sample tables: resolves up to
    * `maxFrames` evenly-strided samples of the first trak with a complete
    * stbl — or, for fragmented files (zero-entry moov tables), of the
    * moof/trun fragment runs — to (timestamp, byte offset, size). This is
    * the header-math half of distributed frame extraction — the expensive
    * half (decode) reads only `n_bytes` at `offset`, so a 100 TB video
    * corpus never ships whole files to the decode stage. */
  private[operators] def frameSamples(b: Array[Byte], maxFrames: Int): Seq[FrameRef] = {
    if (!isBmff(b) || maxFrames <= 0) return Seq.empty
    moovSamples(b) match {
      case Some((samples, timescale)) => strideSample(samples, timescale, maxFrames)
      case None =>
        val frags = fragSamples(b)
        if (frags.isEmpty) Seq.empty
        else {
          // media timescale from any trak's mdhd (fragmented files keep
          // the trak headers in moov even with empty sample tables)
          val ts = (for {
            (moov, moovEnd) <- findBox(b, "moov", 0, b.length)
            (trak, trakEnd) <- findBoxes(b, "trak", moov + 8, moovEnd).headOption
            (mdia, mdiaEnd) <- findBox(b, "mdia", trak + 8, trakEnd)
            (mdhd, mdhdEnd) <- findBox(b, "mdhd", mdia + 8, mdiaEnd)
          } yield mdhdTimescale(b, mdhd, mdhdEnd)).getOrElse(0L)
          strideSample(frags, ts, maxFrames)
        }
    }
  }

  /** Strip byte-ranges from a TIFF IFD0 — StripOffsets (273) /
    * StripByteCounts (279) arrays, SHORT or LONG, inline when the value
    * fits the 4-byte entry field and OFFSET-TYPED otherwise (the entry
    * holds a file offset to the array, the normal multi-strip layout).
    * The TIFF analogue of the MP4 sample tables for range-read decoding:
    * a strip decodes independently, so a distributed stage reads only
    * (offset, n_bytes) slices. */
  private[operators] def tiffStrips(b: Array[Byte], maxStrips: Int): Seq[FrameRef] = {
    if (b.length < 8 || maxStrips <= 0) return Seq.empty
    val isLe = b(0) == 'I' && b(1) == 'I' && u8(b, 2) == 0x2a && u8(b, 3) == 0
    val isBe = b(0) == 'M' && b(1) == 'M' && u8(b, 2) == 0 && u8(b, 3) == 0x2a
    if (!isLe && !isBe) return Seq.empty
    def r16(i: Int) = if (isLe) le16(b, i) else be16(b, i)
    def r32(i: Int) = if (isLe) le32(b, i) else be32(b, i)
    val ifd = r32(4)
    if (ifd < 0 || ifd + 2 > b.length) return Seq.empty
    // read a SHORT/LONG array entry value, inline or at-offset, with the
    // same bounds discipline as the MP4 tables
    def readArray(off: Int): Option[IndexedSeq[Long]] = {
      val typ = r16(off + 2); val cnt = r32(off + 4)
      val elemSize = typ match { case 3 => 2; case 4 => 4; case _ => return None }
      if (cnt <= 0 || cnt > MaxSamples) return None
      val total = elemSize.toLong * cnt
      val base = if (total <= 4) off + 8 else r32(off + 8)
      if (base < 0 || base + total > b.length) return None
      Some((0 until cnt).map(k =>
        if (typ == 3) r16(base + 2 * k).toLong else r32(base + 4 * k).toLong & 0xffffffffL))
    }
    val n = r16(ifd)
    var offs: Option[IndexedSeq[Long]] = None
    var cnts: Option[IndexedSeq[Long]] = None
    var e = 0
    while (e < n && ifd + 2 + 12 * (e + 1) <= b.length) {
      val off = ifd + 2 + 12 * e
      r16(off) match {
        case 273 => offs = readArray(off)
        case 279 => cnts = readArray(off)
        case _   => ()
      }
      e += 1
    }
    (offs, cnts) match {
      case (Some(o), Some(c)) if o.length == c.length && o.nonEmpty =>
        val take = math.min(maxStrips, o.length)
        (0 until take).map { i =>
          val idx = (i.toLong * o.length / take).toInt
          FrameRef(idx, 0L, o(idx), c(idx))
        }.filter(f => f.offset >= 0 && f.offset + f.n_bytes <= b.length)
      case _ => Seq.empty
    }
  }

  /** Container-dispatching byte ranges: MP4-family sample tables (plain or
    * fragmented) or TIFF strips — the one entry point a range-read decode
    * stage needs. */
  private[graft] def byteRanges(b: Array[Byte], maxFrames: Int): Seq[FrameRef] =
    if (isBmff(b)) frameSamples(b, maxFrames) else tiffStrips(b, maxFrames)

  /** Deterministic ISO-BMFF fixture: a structurally-valid MP4 skeleton
    * (ftyp, moov/mvhd + one video trak with real stts/stsc/stsz/stco
    * tables, mdat) whose frame layout is a pure function of `id`. This is
    * the corpus stand-in for mm_frames — the PARSER is the operator under
    * test; the container bytes are synthetic because no media ships in
    * the test environment. */
  private[graft] def syntheticMp4(id: Long): Array[Byte] = {
    def be32a(v: Int) = Array((v >> 24).toByte, (v >> 16).toByte, (v >> 8).toByte, v.toByte)
    def box(name: String, payload: Array[Byte]): Array[Byte] =
      be32a(8 + payload.length) ++ name.getBytes("US-ASCII") ++ payload
    val nFrames = 4 + (id % 5).toInt * 3          // 4..16
    val delta = 100 + (id % 3).toInt * 50          // media units/frame
    val timescale = 600
    val sizes = Array.tabulate(nFrames)(k => 50 + ((id + k) % 7).toInt * 10)
    val spc = 4                                     // samples per full chunk
    val fullChunks = nFrames / spc
    val rem = nFrames % spc
    val nChunks = fullChunks + (if (rem > 0) 1 else 0)
    def moovOf(chunkOffsets: Array[Int]): Array[Byte] = {
      val mvhd = box("mvhd", Array.fill(4)(0.toByte) ++ be32a(0) ++ be32a(0) ++
        be32a(timescale) ++ be32a(nFrames * delta) ++ Array.fill(76)(0.toByte))
      val mdhd = box("mdhd", Array.fill(4)(0.toByte) ++ be32a(0) ++ be32a(0) ++
        be32a(timescale) ++ be32a(nFrames * delta) ++ Array.fill(4)(0.toByte))
      val hdlr = box("hdlr", Array.fill(4)(0.toByte) ++ be32a(0) ++
        "vide".getBytes("US-ASCII") ++ Array.fill(13)(0.toByte))
      val stts = box("stts", Array.fill(4)(0.toByte) ++ be32a(1) ++
        be32a(nFrames) ++ be32a(delta))
      val stscRuns =
        if (rem == 0) Array((1, spc)) else Array((1, spc), (fullChunks + 1, rem))
      val stsc = box("stsc", Array.fill(4)(0.toByte) ++ be32a(stscRuns.length) ++
        stscRuns.flatMap { case (fc, c) => be32a(fc) ++ be32a(c) ++ be32a(1) })
      val stsz = box("stsz", Array.fill(4)(0.toByte) ++ be32a(0) ++ be32a(nFrames) ++
        sizes.flatMap(be32a))
      val stco = box("stco", Array.fill(4)(0.toByte) ++ be32a(chunkOffsets.length) ++
        chunkOffsets.flatMap(be32a))
      val stbl = box("stbl", stts ++ stsc ++ stsz ++ stco)
      val minf = box("minf", stbl)
      val mdia = box("mdia", mdhd ++ hdlr ++ minf)
      val trak = box("trak", mdia)
      box("moov", mvhd ++ trak)
    }
    val ftyp = box("ftyp", "isom".getBytes("US-ASCII") ++ be32a(0))
    // two-pass: moov length is offset-value-independent (fixed-width u32s)
    val moovLen = moovOf(Array.fill(nChunks)(0)).length
    val mdatPayloadStart = ftyp.length + moovLen + 8
    val chunkOffsets = new Array[Int](nChunks)
    var acc = mdatPayloadStart; var s = 0
    for (c <- 0 until nChunks) {
      chunkOffsets(c) = acc
      val inChunk = if (c < fullChunks) spc else rem
      for (_ <- 0 until inChunk) { acc += sizes(s); s += 1 }
    }
    val mdatPayload = Array.tabulate(acc - mdatPayloadStart)(i => ((id + i) % 251).toByte)
    ftyp ++ moovOf(chunkOffsets) ++ box("mdat", mdatPayload)
  }

  /** Deterministic FRAGMENTED ISO-BMFF fixture: moov with zero-entry
    * sample tables (the fMP4 signature), then two moof+mdat fragments
    * whose trun carries per-sample sizes (tfhd holds the default duration
    * and the default-base-is-moof flag, tfdt the decode-time base).
    * Exercises the moof/trun path of frameSamples end to end. */
  private[graft] def syntheticFragMp4(id: Long): Array[Byte] = {
    def be32a(v: Int) = Array((v >> 24).toByte, (v >> 16).toByte, (v >> 8).toByte, v.toByte)
    def box(name: String, payload: Array[Byte]): Array[Byte] =
      be32a(8 + payload.length) ++ name.getBytes("US-ASCII") ++ payload
    val timescale = 600
    val delta = 80 + (id % 4).toInt * 20
    val framesPerFrag = 3 + (id % 3).toInt // 3..5 per fragment, 2 fragments
    def sizesOf(frag: Int) =
      Array.tabulate(framesPerFrag)(k => 40 + ((id + frag * 10 + k) % 7).toInt * 10)
    // moov: real trak/mdhd but EMPTY stts/stsc/stsz/stco (entry count 0)
    val mvhd = box("mvhd", Array.fill(4)(0.toByte) ++ be32a(0) ++ be32a(0) ++
      be32a(timescale) ++ be32a(0) ++ Array.fill(76)(0.toByte))
    val mdhd = box("mdhd", Array.fill(4)(0.toByte) ++ be32a(0) ++ be32a(0) ++
      be32a(timescale) ++ be32a(0) ++ Array.fill(4)(0.toByte))
    val hdlr = box("hdlr", Array.fill(4)(0.toByte) ++ be32a(0) ++
      "vide".getBytes("US-ASCII") ++ Array.fill(13)(0.toByte))
    val empt = Seq("stts", "stsc", "stco").map(n =>
      box(n, Array.fill(4)(0.toByte) ++ be32a(0)))
    val stsz0 = box("stsz", Array.fill(4)(0.toByte) ++ be32a(0) ++ be32a(0))
    val stbl = box("stbl", empt(0) ++ empt(1) ++ stsz0 ++ empt(2))
    val moov = box("moov", mvhd ++ box("trak", box("mdia",
      mdhd ++ hdlr ++ box("minf", stbl))))
    val ftyp = box("ftyp", "isom".getBytes("US-ASCII") ++ be32a(0))
    def fragment(frag: Int, baseTime: Int): Array[Byte] = {
      val sizes = sizesOf(frag)
      // tfhd: default-base-is-moof (0x20000) + default-sample-duration (0x8)
      val tfhd = box("tfhd", be32a(0x020008) ++ be32a(1) ++ be32a(delta))
      val tfdt = box("tfdt", be32a(0) ++ be32a(baseTime))
      // trun: data-offset (0x1) + sample-size (0x200); data offset is
      // moof-relative and known only after sizing — two-pass like moov
      def trunOf(dataOff: Int) = box("trun", be32a(0x000201) ++
        be32a(framesPerFrag) ++ be32a(dataOff) ++ sizes.flatMap(be32a))
      val moofLen = box("moof", box("mfhd", be32a(0) ++ be32a(frag + 1)) ++
        box("traf", tfhd ++ tfdt ++ trunOf(0))).length
      val moof = box("moof", box("mfhd", be32a(0) ++ be32a(frag + 1)) ++
        box("traf", tfhd ++ tfdt ++ trunOf(moofLen + 8)))
      val payload = Array.tabulate(sizes.sum)(i => ((id + frag * 7 + i) % 251).toByte)
      moof ++ box("mdat", payload)
    }
    ftyp ++ moov ++ fragment(0, 0) ++ fragment(1, framesPerFrag * delta)
  }

  /** Deterministic multi-strip TIFF fixture (little-endian): IFD0 with
    * dims, RowsPerStrip, and OFFSET-TYPED StripOffsets/StripByteCounts
    * LONG arrays (count > 1 ⇒ the entry's value field is a file offset to
    * the array — the out-of-line layout tiffStrips must follow). */
  private[graft] def syntheticTiff(id: Long): Array[Byte] = {
    def le16a(v: Int) = Array(v.toByte, (v >> 8).toByte)
    def le32a(v: Int) = Array(v.toByte, (v >> 8).toByte, (v >> 16).toByte, (v >> 24).toByte)
    val nStrips = 3 + (id % 4).toInt // ≥3 → arrays never fit inline
    val stripSizes = Array.tabulate(nStrips)(k => 40 + ((id + k) % 5).toInt * 8)
    val nEntries = 5
    val ifdStart = 8
    val ifdLen = 2 + 12 * nEntries + 4
    val offArrayAt = ifdStart + ifdLen
    val cntArrayAt = offArrayAt + 4 * nStrips
    val dataAt = cntArrayAt + 4 * nStrips
    val stripOffsets = stripSizes.scanLeft(dataAt)(_ + _).init
    def entry(tag: Int, typ: Int, cnt: Int, value: Int) =
      le16a(tag) ++ le16a(typ) ++ le32a(cnt) ++ le32a(value)
    val ifd = le16a(nEntries) ++
      entry(256, 4, 1, 64 + (id % 8).toInt * 16) ++        // ImageWidth
      entry(257, 4, 1, 48 + (id % 6).toInt * 16) ++        // ImageLength
      entry(273, 4, nStrips, offArrayAt) ++                // StripOffsets → offset-typed
      entry(278, 4, 1, 16) ++                              // RowsPerStrip
      entry(279, 4, nStrips, cntArrayAt) ++                // StripByteCounts → offset-typed
      le32a(0)                                             // next IFD
    val header = "II".getBytes("US-ASCII") ++ Array(0x2a.toByte, 0.toByte) ++ le32a(ifdStart)
    val data = Array.tabulate(stripSizes.sum)(i => ((id * 3 + i) % 251).toByte)
    header ++ ifd ++ stripOffsets.flatMap(le32a) ++ stripSizes.flatMap(le32a) ++ data
  }

  /** CRC32 of `len` bytes at `off` — the integrity stamp of a range read. */
  private def crc32(b: Array[Byte], off: Int, len: Int): Long = {
    val c = new java.util.zip.CRC32()
    c.update(b, off, len)
    c.getValue
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

  /** Frame index over a (synthetic) video corpus: each asset's sample
    * tables resolve to ≤8 evenly-strided (frame, timestamp, byte-range)
    * rows. The flatMap is the UDTF shape — one asset row fans out to its
    * sampled frames; at scale the input is the binaryFile corpus and the
    * output feeds a range-read decode stage. Deterministic end to end
    * (fixture bytes are a pure function of asset_id), spec-gated
    * (ExtensionsSpec hand-computes a full layout; DuckDB cannot parse
    * BMFF so there is no SQL oracle). */
  def frameIndex(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val vids = (0L until 25L).map(id => (id, syntheticMp4(id)))
    spark.createDataset(vids)
      .flatMap { case (id, bytes) =>
        frameSamples(bytes, 8).map(f => (id, f.frame_idx, f.ts_ms, f.offset, f.n_bytes)) }
      .toDF("asset_id", "frame_idx", "ts_ms", "offset", "n_bytes")
      .orderBy("asset_id", "frame_idx")
  }

  /** The synthetic media corpus for the frame queries: plain MP4s,
    * fragmented MP4s, and multi-strip TIFFs — every container family the
    * range parser understands, all deterministic functions of asset_id. */
  private def frameCorpus: Seq[(Long, Array[Byte])] =
    (0L until 25L).map(id => (id, syntheticMp4(id))) ++
      (25L until 35L).map(id => (id, syntheticFragMp4(id))) ++
      (35L until 45L).map(id => (id, syntheticTiff(id)))

  /** Range-read frame extraction — the consumer of the byte ranges
    * frameIndex computes: slice `content` at each (offset, n_bytes),
    * verify the slice stays in bounds, and stamp it with CRC32. At scale
    * the slice feeds the decode stage directly; the whole file is never
    * shipped past this operator. Spec-gated: ExtensionsSpec asserts the
    * per-frame checksums equal a whole-file-layout recomputation (DuckDB
    * cannot parse BMFF/TIFF, so there is no SQL oracle). */
  def frameBytes(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    spark.createDataset(frameCorpus)
      .flatMap { case (id, bytes) =>
        byteRanges(bytes, 8).map { f =>
          val ok = f.offset >= 0 && f.n_bytes > 0 && f.offset + f.n_bytes <= bytes.length
          (id, f.frame_idx, f.n_bytes,
            if (ok) crc32(bytes, f.offset.toInt, f.n_bytes.toInt) else -1L, ok)
        }
      }
      .toDF("asset_id", "frame_idx", "n_bytes", "crc32", "in_bounds")
      .orderBy("asset_id", "frame_idx")
  }

  /** Oracle-able metadata projection (no decode). */
  def meta(spark: SparkSession, dir: String): DataFrame =
    binaryAssets(spark, dir).toDF()
      .select(col("doc_id"), col("n_bytes"),
        ascii(substring(col("content").cast("string"), 1, 1)).cast("long").as("first_byte"))
      .orderBy("doc_id")

  // -------------------------------------------------------------------
  // Byte-level CDC dedup for binary assets: the storage-dedup half of
  // the multimodal story. Text near-dup operators tokenize; an opaque
  // image/audio/video blob has no tokens, so chunk boundaries come from
  // a ROLLING BYTE HASH (LBFS/rsync; same family as CdcChunking's token
  // form) and near-duplicate assets are pairs sharing chunk
  // fingerprints. A re-encoded header, appended EXIF block, or spliced
  // segment shifts offsets — content-defined boundaries realign after
  // the edit, so the untouched chunks still match (fixed-width blocks
  // lose everything behind one inserted byte; the spec measures both).
  //
  // Bytes are opaque to Column math, so this is the one dedup operator
  // built on mapPartitions (the brief's (d) path) — justified exactly
  // here: a per-byte sequential rolling hash with min/max clamps has no
  // declarative form. The emitted fingerprint frame is small (one row
  // per ~64-byte chunk) and everything downstream (pairing, resemblance)
  // is ordinary equi-join Column work.
  // -------------------------------------------------------------------

  /** Rolling window (bytes), boundary mask (mean chunk = 64 B), clamps. */
  val CdcWindow = 16
  val CdcMask = 0x3fL
  val CdcMinChunk = 16
  val CdcMaxChunk = 512

  case class ChunkFp(doc_id: Long, chunk_idx: Int, offset: Int, len: Int, fp: Long)

  /** FNV-1a 64-bit over a byte slice — the chunk fingerprint. */
  private[operators] def fnv64(b: Array[Byte], from: Int, until: Int): Long = {
    var h = 0xcbf29ce484222325L
    var i = from
    while (i < until) { h ^= (b(i) & 0xffL); h *= 0x100000001b3L; i += 1 }
    h
  }

  /** Content-defined chunk boundaries over raw bytes: polynomial rolling
    * hash of the last CdcWindow bytes; a boundary fires when the hash
    * lands in the mask's fraction of the space, clamped to
    * [CdcMinChunk, CdcMaxChunk]. Deterministic per content — identical
    * blobs chunk identically on any partitioning. */
  private[operators] def cdcChunks(doc: Long, b: Array[Byte]): Seq[ChunkFp] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[ChunkFp]
    val base = 257L
    // base^(CdcWindow-1), for removing the oldest byte
    var basePow = 1L
    var k = 1
    while (k < CdcWindow) { basePow *= base; k += 1 }
    var h = 0L
    var start = 0
    var i = 0
    while (i < b.length) {
      h = if (i < CdcWindow) h * base + (b(i) & 0xffL)
      else (h - (b(i - CdcWindow) & 0xffL) * basePow) * base + (b(i) & 0xffL)
      val len = i - start + 1
      val boundary = (i >= CdcWindow - 1 && (h & CdcMask) == 0L && len >= CdcMinChunk) ||
        len >= CdcMaxChunk
      if (boundary) {
        out += ChunkFp(doc, out.size, start, len, fnv64(b, start, i + 1))
        start = i + 1
      }
      i += 1
    }
    if (start < b.length)
      out += ChunkFp(doc, out.size, start, b.length - start, fnv64(b, start, b.length))
    out.toSeq
  }

  /** Chunk-fingerprint frame for the binary corpus (the persistable
    * artifact: one small row per chunk, content never leaves the scan). */
  def cdcFingerprints(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    binaryAssets(spark, dir)
      .mapPartitions(_.flatMap(a => cdcChunks(a.doc_id, a.content)))
      .toDF()
  }

  /** Near-duplicate asset pairs by chunk resemblance: |shared distinct
    * fps| / |union| ≥ tau. Equi join on fp — candidate work ∝ shared
    * fingerprints, never assets². */
  def assetNearDup(spark: SparkSession, dir: String, tau: Double = 0.5): DataFrame =
    assetNearDupOf(PersistSlots.cached(spark, s"mm-cdc-fp:$dir")(
      cdcFingerprints(spark, dir).select("doc_id", "fp").distinct()), tau)

  /** The pairing stage over any (doc_id, fp) fingerprint frame (spec
    * entry point: lets duplicates be injected). */
  private[operators] def assetNearDupOf(fp0: DataFrame, tau: Double): DataFrame = {
    val fp = fp0.select("doc_id", "fp").distinct()
    val sizes = fp.groupBy("doc_id").agg(count(lit(1)).as("n"))
    val shared = fp.select(col("doc_id").as("a_id"), col("fp"))
      .join(fp.select(col("doc_id").as("b_id"), col("fp")), Seq("fp"))
      .filter(col("a_id") < col("b_id"))
      .groupBy("a_id", "b_id").agg(count(lit(1)).as("c"))
    shared
      .join(sizes.select(col("doc_id").as("a_id"), col("n").as("na")), Seq("a_id"))
      .join(sizes.select(col("doc_id").as("b_id"), col("n").as("nb")), Seq("b_id"))
      .withColumn("r", col("c") / (col("na") + col("nb") - col("c")))
      .filter(col("r") >= tau)
      .select(col("a_id"), col("b_id"), round(col("r"), 4).as("r"))
      .orderBy("a_id", "b_id")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "mm_meta" -> meta _,
    // ORACLED: the full chunk table. The window hash is a NON-recursive
    // polynomial of the last 16 bytes, so DuckDB recomputes the exact
    // boundaries (candidates via list arithmetic mod 2^64, the
    // min/max-clamped walk via a recursive CTE) and fingerprints each
    // chunk with its own blob substr + md5 — full cross-engine
    // recomputation, no exported intermediate. The engine-internal
    // fingerprint stays fnv64 (cheaper at scale); the oracle row carries
    // md5 because both engines have it natively. The PAIR surface
    // (assetNearDup) is exercised in MmCdcSpec with injected duplicates;
    // this corpus has no byte-identical assets, so the pair set is
    // legitimately empty and the registered query reports the chunking
    // instead (never a vacuous 0-row artifact)
    "mm_cdc_chunks" -> ((s: SparkSession, d: String) =>
      cdcFingerprints(s, d).select("doc_id", "chunk_idx", "offset", "len")
        .join(Tables.documents(s, d)
          .select(col("doc_id"), col("text").cast("binary").as("content")), "doc_id")
        .select(col("doc_id"), col("chunk_idx"), col("offset"), col("len"),
          md5(expr("substring(content, offset + 1, len)")).as("fp_md5"))
        .orderBy("doc_id", "chunk_idx")),
    // oracled: byte stats are DuckDB-recomputable over the same bytes
    // (corpus is ASCII text so ascii(substr) = byte value); rounding done
    // in Column-land (Spark round == DuckDB ROUND, HALF_UP) not in the
    // typed map, so both engines round the same raw doubles
    "mm_features" -> ((s: SparkSession, d: String) =>
      decodeFeatures(s, d).toDF()
        .withColumn("mean_byte", round(col("mean_byte"), 4))
        .withColumn("byte_entropy", round(col("byte_entropy"), 4))
        .orderBy("doc_id")),
    "mm_frames" -> frameIndex _, // spec-gated: DuckDB cannot parse BMFF
    "mm_frame_bytes" -> frameBytes _, // spec-gated: range-read consumer
  )

  val oracleSql: Map[String, String] = Map(
    // Full CDC recomputation: per-position window hash = polynomial of
    // the last CdcWindow bytes mod 2^64 (list_reduce with a HUGEINT
    // accumulator reproduces Scala's wrapping Long arithmetic exactly);
    // the clamped boundary walk is the recursive CTE; fingerprints are
    // md5 over each engine's own byte slice.
    "mm_cdc_chunks" ->
      """WITH RECURSIVE
        |b AS (SELECT doc_id, CAST(i AS BIGINT) AS i, ascii(substr(text, CAST(i AS INTEGER), 1)) AS bv
        |FROM documents, LATERAL (SELECT unnest(generate_series(1, length(text))) AS i)),
        |arr AS (SELECT doc_id, list(bv ORDER BY i) AS ba, CAST(count(*) AS BIGINT) AS L FROM b GROUP BY 1),
        |cand AS (SELECT a.doc_id, CAST(p.p AS BIGINT) AS p
        |FROM arr a, LATERAL (SELECT unnest(generate_series(16, a.L)) AS p) p
        |WHERE list_reduce(list_prepend(CAST(0 AS HUGEINT), a.ba[CAST(p.p AS INTEGER)-15:CAST(p.p AS INTEGER)]),
        |(h, x) -> (h * 257 + x) % CAST('18446744073709551616' AS HUGEINT)) % 64 = 0),
        |ck AS (
        |SELECT a.doc_id, 0 AS idx, CAST(1 AS BIGINT) AS s,
        |COALESCE((SELECT MIN(c.p) FROM cand c WHERE c.doc_id = a.doc_id
        |AND c.p >= 16 AND c.p <= LEAST(512, a.L)), LEAST(512, a.L)) AS e
        |FROM arr a WHERE a.L > 0
        |UNION ALL
        |SELECT ck.doc_id, ck.idx + 1, ck.e + 1,
        |COALESCE((SELECT MIN(c.p) FROM cand c WHERE c.doc_id = ck.doc_id
        |AND c.p >= GREATEST(ck.e + 16, 16) AND c.p <= LEAST(ck.e + 512, a.L)),
        |LEAST(ck.e + 512, a.L)) AS e
        |FROM ck JOIN arr a USING (doc_id) WHERE ck.e < a.L)
        |SELECT ck.doc_id, CAST(ck.idx AS INTEGER) AS chunk_idx,
        |CAST(ck.s - 1 AS INTEGER) AS "offset", CAST(ck.e - ck.s + 1 AS INTEGER) AS len,
        |md5(substr(d.text, CAST(ck.s AS INTEGER), CAST(ck.e - ck.s + 1 AS INTEGER))) AS fp_md5
        |FROM ck JOIN documents d USING (doc_id)
        |ORDER BY doc_id, chunk_idx""".stripMargin.replaceAll("\n", " "),
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

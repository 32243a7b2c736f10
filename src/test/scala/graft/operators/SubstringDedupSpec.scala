package graft.operators

import graft.SparkSpec
import graft.sources.Tables

/** ExactSubstr spans vs an independent brute-force implementation. */
class SubstringDedupSpec extends SparkSpec {

  private def bruteSpans(docs: Map[Long, Array[String]]): Map[Long, Seq[(Long, Long)]] = {
    val L = SubstringDedup.L
    val counts = scala.collection.mutable.Map.empty[String, Int]
    docs.values.foreach { toks =>
      (0 to toks.length - L).foreach { i =>
        val sh = toks.slice(i, i + L).mkString(" ")
        counts(sh) = counts.getOrElse(sh, 0) + 1
      }
    }
    docs.flatMap { case (id, toks) =>
      val dupPos = (0 to toks.length - L)
        .filter(i => counts(toks.slice(i, i + L).mkString(" ")) > 1)
        .map(_ + 1) // 1-based
      if (dupPos.isEmpty) None
      else {
        val spans = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
        var start = dupPos.head; var last = dupPos.head
        dupPos.tail.foreach { p =>
          if (p > last + L) { spans += ((start.toLong, (last + L - 1).toLong)); start = p }
          last = p
        }
        spans += ((start.toLong, (last + L - 1).toLong))
        Some(id -> spans.toSeq)
      }
    }
  }

  test("duplicatedSpans ≡ brute-force sliding-shingle scan") {
    val docs = Tables.documents(spark, sf).select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).split(" ")).toMap
    val expected = bruteSpans(docs)
    val got = SubstringDedup.duplicatedSpans(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .groupBy(_._1)
      .map { case (id, rs) => id -> rs.sortBy(_._2).map(r => (r._2, r._3)).toSeq }
    assert(got.keySet == expected.keySet)
    // the fixture must actually exercise the operator
    assert(expected.nonEmpty, "corpus has no duplicated substrings — fixture too weak")
    expected.foreach { case (id, spans) =>
      assert(got(id) == spans, s"doc $id: got ${got(id)}, expected $spans")
    }
    got.values.flatten.foreach { case (s, e) =>
      assert(e - s + 1 >= SubstringDedup.L)
    }
  }

  test("xxhash64 fast path emits the same spans as the md5 oracle form") {
    val md5Form = SubstringDedup.duplicatedSpans(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    val fast = SubstringDedup.duplicatedSpans(spark, sf, fastHash = true).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(md5Form.nonEmpty && fast == md5Form)
  }

  test("scrub removes exactly the span tokens, keeps clean docs verbatim") {
    val docs = Tables.documents(spark, sf).select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val spans = SubstringDedup.duplicatedSpans(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).groupBy(_._1)
    val cleaned = SubstringDedup.scrub(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(cleaned.keySet == docs.keySet)
    docs.foreach { case (id, text) =>
      val toks = text.split(" ")
      val expect = spans.get(id) match {
        case None => text
        case Some(ss) =>
          toks.zipWithIndex.collect {
            case (tok, i) if !ss.exists(s => i + 1 >= s._2 && i + 1 <= s._3) => tok
          }.mkString(" ")
      }
      assert(cleaned(id) == expect, s"doc $id scrub mismatch")
    }
  }
}

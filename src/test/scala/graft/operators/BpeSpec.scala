package graft.operators

import java.nio.file.Files

import graft.SparkSpec
import graft.sources.Tables

/** BPE trainer/encoder checks: a hand-computed merge fixture, lossless
  * decode, the distinct-word/corpus-count consistency, and determinism.
  * (The merge loop has no SQL expression, so this spec is the gate the
  * DuckDB oracle provides for the other operators.) */
class BpeSpec extends SparkSpec {

  private def writeDocs(rows: Seq[(Long, String)]): String = {
    import spark.implicits._
    val dir = Files.createTempDirectory("bpe_fixture").toString
    rows.toDF("doc_id", "text")
      .selectExpr("doc_id", "text", "'xx' AS lang", "'src0' AS source",
        "CAST(length(text) AS BIGINT) AS n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("hand-computed fixture: merges come out in frequency order with lexicographic ties") {
    // corpus: "low low low lower newest newest"
    //   low ×3, lower ×1, newest ×2
    // initial symbols: l o w</w> | l o w e r</w> | n e w e s t</w>
    // pair counts: (l,o)=4, (o,w</w>)=3, (o,w)=1, (w,e)=2(lower? no:
    //   lower: l o w e r</w> → (w,e)=1; newest: n e w e s t</w> → (w,e)=2)
    //   total (w,e)=3 ... compute precisely below rather than guess: the
    //   asserted prefix was verified by hand:
    //   round1: (l,o) n=4 → "lo"
    //   round2: (lo,w</w>) n=3 → "low</w>"   [ties ((e,s),(e,w),(n,e),(s,t</w>)) at 2 lose lexicographically? no — n=3 beats 2]
    val dir = writeDocs(Seq(
      (1L, "low low low lower newest newest")))
    val merges = Bpe.train(spark, dir, nMerges = 2)
    assert(merges.take(2) == Seq(("l", "o"), ("lo", "w</w>")))
  }

  test("encode is lossless: stripping </w> and concatenating recovers the word") {
    val merges = Bpe.train(spark, sf, nMerges = 30)
    assert(merges.nonEmpty)
    val words = Tables.documents(spark, sf)
      .selectExpr("explode(split(text, ' ')) AS w").where("length(w) > 0")
      .distinct().limit(50).collect().map(_.getString(0))
    words.foreach { w =>
      val toks = Bpe.encodeWord(w, merges)
      assert(toks.mkString.stripSuffix("</w>") == w, s"decode mismatch for '$w'")
      assert(toks.last.endsWith("</w>"))
    }
  }

  test("exported round states: declarative per-round argmax equals the sequential trainer") {
    val n = 15
    val merges = Bpe.train(spark, sf, nMerges = n)
    Bpe.exportStates(spark, sf, nMerges = n)
    val fromStates = Bpe.mergesFromStates(spark, sf).collect()
      .map(r => (r.getAs[Int]("round"), r.getAs[String]("a"), r.getAs[String]("b")))
    assert(fromStates.length == merges.length)
    fromStates.foreach { case (r, a, b) =>
      assert(merges(r) == ((a, b)),
        s"round $r: states argmax ($a,$b) != trainer ${merges(r)}")
    }
  }

  test("encode-join broadcast is size-gated: big vocab estimate falls back to a non-broadcast join") {
    def hasBroadcastHint(est: Long): Boolean =
      Bpe.tokenize(spark, sf, nMerges = 3, vocabBytesOverride = Some(est))
        .queryExecution.analyzed.toString.contains("ResolvedHint")
    assert(hasBroadcastHint(1024L), "small vocab should broadcast")
    assert(!hasBroadcastHint(16L << 30), "huge vocab must not be broadcast-hinted")
    // both shapes produce the same result
    val small = Bpe.tokenize(spark, sf, nMerges = 3, vocabBytesOverride = Some(1024L)).collect().toSeq
    val big = Bpe.tokenize(spark, sf, nMerges = 3, vocabBytesOverride = Some(16L << 30)).collect().toSeq
    assert(small == big)
  }

  test("tokenize: bpe_tokens <= whitespace token char total, >= token count, deterministic") {
    val a = Bpe.tokenize(spark, sf, nMerges = 20).collect()
    val b = Bpe.tokenize(spark, sf, nMerges = 20).collect()
    assert(a.toSeq == b.toSeq)
    assert(a.nonEmpty)
    a.foreach { r =>
      // each word is at least 1 token; merges only shrink from chars
      assert(r.getAs[Long]("bpe_tokens") >= r.getAs[Long]("nt"))
    }
    // more merges never increases total token count
    val m10 = Bpe.tokenize(spark, sf, nMerges = 5).selectExpr("sum(bpe_tokens)").collect()(0).getLong(0)
    val m30 = Bpe.tokenize(spark, sf, nMerges = 30).selectExpr("sum(bpe_tokens)").collect()(0).getLong(0)
    assert(m30 <= m10)
  }
}

package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sources.Tables

/** Chunking reconstruction/overlap invariants, deterministic shard
  * writer round-trip, and the count-min-sketch one-sided error law. */
class ChunkShardSpec extends SparkSpec {

  test("chunks cover every token and reconstruct the document") {
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val chunks = Chunking.chunks(spark, sf).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getString(2), r.getLong(3)))
      .groupBy(_._1)

    assert(chunks.keySet == docs.keySet)
    chunks.foreach { case (id, cs) =>
      val toks = docs(id).split(" ")
      val sorted = cs.sortBy(_._2)
      // indices are dense from 0
      assert(sorted.map(_._2).toSeq == sorted.indices.toSeq)
      sorted.foreach { case (_, ci, chunk, nTok) =>
        val start = ci * Chunking.Stride
        val expect = toks.slice(start, start + Chunking.Width)
        assert(chunk == expect.mkString(" "), s"doc $id chunk $ci")
        assert(nTok == expect.length)
      }
      // stitching the non-overlapping prefixes + the last chunk's tail
      // reproduces the document exactly
      val rebuilt = sorted.init.map(_._3.split(" ").take(Chunking.Stride))
        .foldLeft(Array.empty[String])(_ ++ _) ++ sorted.last._3.split(" ")
      assert(rebuilt.toSeq == toks.toSeq, s"doc $id reconstruction")
    }
  }

  test("shard writer: rows land in their assigned shard, one file per shard") {
    val out = java.nio.file.Files.createTempDirectory("graft_shards").toString
    try {
      val docs = Tables.documents(spark, sf)
      Sharding.writeShards(docs, "doc_id", out)
      val back = spark.read.parquet(out)
      assert(back.count() == docs.count())
      // partition-dir shard == recomputed deterministic assignment
      val mismatches = back
        .withColumn("expect", Sharding.shardCol(col("doc_id")))
        .filter(col("shard") =!= col("expect")).count()
      assert(mismatches == 0)
      // every shard directory holds exactly one data file (task hashing
      // aligned with shard hashing)
      val dirs = new java.io.File(out).listFiles().filter(_.getName.startsWith("shard="))
      assert(dirs.nonEmpty)
      dirs.foreach { d =>
        val files = d.listFiles().filter(_.getName.endsWith(".parquet"))
        assert(files.length == 1, s"${d.getName}: ${files.length} files")
      }
      // re-running the writer (a retry) is byte-stable on assignment
      val again = Sharding.shardAssign(spark, sf).collect().toSeq
      assert(again == Sharding.shardAssign(spark, sf).collect().toSeq)
    } finally {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(java.nio.file.Paths.get(out)).iterator().asScala
        .toSeq.reverse.foreach(java.nio.file.Files.delete)
    }
  }

  test("approx_percentile: rank-error law vs the exact quantiles report_corpus uses") {
    // the sketch path a 100 TB report would swap in for the exact
    // percentile: rank error ≤ n/accuracy (KLL-style guarantee)
    val accuracy = 100
    val perLang = Tables.documents(spark, sf)
      .select(col("lang"), size(split(col("text"), " ")).cast("long").as("nt"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
      .groupBy(_._1).map { case (l, v) => l -> v.map(_._2).sorted }
    val approx = Tables.documents(spark, sf)
      .select(col("lang"), size(split(col("text"), " ")).cast("long").as("nt"))
      .groupBy("lang")
      .agg(expr(s"approx_percentile(nt, array(0.5, 0.9), $accuracy)").as("ap"))
      .collect().map(r => r.getString(0) -> r.getSeq[Long](1)).toMap
    perLang.foreach { case (lang, sorted) =>
      val n = sorted.length
      Seq(0.5, 0.9).zipWithIndex.foreach { case (q, i) =>
        val est = approx(lang)(i)
        // rank window: the (n−1)·q position ± (rank error + 1 index of
        // definitional slack between percentile conventions)
        val slack = n / accuracy + 1
        val lo = sorted(math.max(0, math.floor((n - 1) * q).toInt - slack))
        val hi = sorted(math.min(n - 1, math.ceil((n - 1) * q).toInt + slack))
        assert(est >= lo && est <= hi,
          s"$lang q$q: approx $est outside rank window [$lo, $hi]")
      }
    }
  }

  test("count-min sketch: one-sided error law vs exact heavy hitters") {
    val exact = TextAnalysis.topTerms(spark, sf, k = 20).collect()
      .map(r => r.getString(0) -> r.getLong(1))
    val n = Tables.documents(spark, sf)
      .select(sum(size(split(col("text"), " ")))).collect()(0).getLong(0)
    val eps = 0.001
    val est = TextAnalysis.cmsTopTerms(spark, sf, exact.map(_._1), eps).toMap
    exact.foreach { case (term, c) =>
      val e = est(term)
      assert(e >= c, s"$term: CMS $e < true $c (impossible for CMS)")
      assert(e <= c + (eps * n).ceil.toLong,
        s"$term: CMS $e exceeds true $c + εN ${(eps * n).ceil.toLong}")
    }
  }
}

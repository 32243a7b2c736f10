package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkSpec
import graft.operators.EntityResolution

/** Stream ≡ batch parity for streaming record linkage: dirty records
  * arriving in micro-batches link against the frozen clean registry
  * exactly as the batch [[EntityResolution.linkRegistries]] does,
  * regardless of how the feed is split. */
class ErStreamSpec extends SparkSpec {

  case class DirtyRec(b_key: Long, b_name: String)

  case class ErRec(side: String, key: Long, name: String)

  test("streaming linkage equals the batch linkage on a 3-batch feed") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val all = EntityResolution.dirty(spark, sf).collect()
      .map(r => DirtyRec(r.getLong(0), r.getString(1))).sortBy(_.b_key).toSeq
    val input = MemoryStream[DirtyRec]
    val name = s"er_${System.nanoTime()}"
    val q = EntityResolution.linkStream(spark, sf, input.toDF())
      .writeStream.format("memory").queryName(name)
      .outputMode("update").start()
    all.grouped(math.max(1, all.size / 3)).foreach { c =>
      input.addData(c); q.processAllAvailable()
    }
    q.stop()
    // update mode: last emission per key is the final link
    val streamed = spark.table(name).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getString(2), r.getInt(3)))
      .toMap
    val batch = EntityResolution.linkRegistries(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getString(2), r.getInt(3)))
      .toMap
    assert(batch.nonEmpty && streamed == batch)
  }

  test("growing-registry streaming linkage converges to the batch linkage") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val clean = graft.sources.Tables.customer(spark, sf)
      .select("c_custkey", "c_name").collect()
      .map(r => ErRec("a", r.getLong(0), r.getString(1))).sortBy(_.key).toSeq
    val dirtyRecs = EntityResolution.dirty(spark, sf).collect()
      .map(r => ErRec("b", r.getLong(0), r.getString(1))).sortBy(_.key).toSeq
    val Seq(c1, c2, c3) = clean.grouped((clean.size + 2) / 3).toSeq.padTo(3, Seq.empty[ErRec])
    val Seq(d1, d2, d3) = dirtyRecs.grouped((dirtyRecs.size + 2) / 3).toSeq.padTo(3, Seq.empty[ErRec])
    val input = MemoryStream[ErRec]
    val name = s"ergrow_${System.nanoTime()}"
    val q = graft.streaming.ErStreams.linkGrowing(spark, input.toDF())
      .writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    // dirty records d2/d3 arrive BEFORE the registry chunks holding their
    // matches — the links must improve as the registry grows
    Seq(c1 ++ d1 ++ d2, c2 ++ d3, c3).foreach { b =>
      if (b.nonEmpty) input.addData(b); q.processAllAvailable()
    }
    q.stop()
    // append-mode improvements strictly decrease (dist, a_key) per key:
    // the minimum emission per b_key is the final link
    val streamed = spark.table(name).collect()
      .map(r => (r.getLong(0), (r.getInt(3), r.getLong(1), r.getString(2))))
      .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).min }
    val batch = EntityResolution.linkRegistries(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getInt(3), r.getLong(1), r.getString(2)))
      .toMap
    assert(batch.nonEmpty && streamed == batch,
      s"stream ${streamed.size} links vs batch ${batch.size}")
  }
}

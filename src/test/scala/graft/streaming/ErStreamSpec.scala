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
}

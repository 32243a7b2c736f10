package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.util.sketch.CountMinSketch

import graft.operators.{Snapshots, TextAnalysis}

/** Streaming heavy-hitter maintenance — the count-min-sketch twin of
  * [[SketchStream]]: each micro-batch of documents is reduced to ONE
  * fixed-size CMS over its terms and committed exactly-once into a
  * [[Snapshots]] log; the read path merges the accumulated sketches
  * (matrix add) and answers probe-term counts. Same three scale
  * properties as the HLL path: only the per-batch reduction sees raw
  * text (the log holds KB-sized sketch blobs, one per batch), CMS merge
  * is associative/commutative so per-batch sketches merged at read time
  * are CELL-IDENTICAL to one sketch over all documents ever ingested
  * (same eps/confidence/seed ⇒ same dims and hash functions ⇒ counter
  * sums equal single-pass counts — CmsStreamSpec pins stream ≡ batch
  * EXACTLY, not within-error), and a replayed micro-batch hits the
  * manifest tag guard. The read-side merge is driver-side over
  * batch-count many ~KB blobs — compact periodically via
  * [[Snapshots.compact]] exactly like any other log table. */
object CmsStream {

  // one definition with the batch path — the cell-identical contract
  // breaks (and old/new blobs refuse to merge) if these ever drift
  val Eps: Double = TextAnalysis.CmsEps
  val Confidence: Double = TextAnalysis.CmsConfidence
  val Seed: Int = TextAnalysis.CmsSeed

  /** Per-batch sketch: one (batch blob) row. */
  def sketchBatch(spark: SparkSession, docs: DataFrame): DataFrame = {
    import spark.implicits._
    val cms = docs.select(explode(TextAnalysis.toks).as("term"))
      .stat.countMinSketch(col("term"), Eps, Confidence, Seed)
    val bos = new java.io.ByteArrayOutputStream()
    cms.writeTo(bos)
    Seq(Tuple1(bos.toByteArray)).toDF("sk")
  }

  def start(stream: DataFrame, table: String, checkpoint: String): StreamingQuery =
    stream.writeStream
      .foreachBatch((df: DataFrame, id: Long) => {
        SnapshotStream.ingestBatch(sketchBatch(df.sparkSession, df), table, id); ()
      })
      .option("checkpointLocation", checkpoint)
      .start()

  /** Merge every committed batch sketch and estimate the probe terms. */
  def estimates(spark: SparkSession, table: String, probes: Seq[String]): Seq[(String, Long)] = {
    val blobs = Snapshots.read(spark, table).select("sk").collect()
      .map(_.getAs[Array[Byte]](0))
    require(blobs.nonEmpty, s"no sketches committed under $table")
    val merged = blobs.map(b => CountMinSketch.readFrom(new java.io.ByteArrayInputStream(b)))
      .reduce((a, b) => { a.mergeInPlace(b); a })
    probes.map(t => t -> merged.estimateCount(t))
  }
}

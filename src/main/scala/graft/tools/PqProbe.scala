package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off diagnostic for the IVF-PQ equality contract:
  *   runMain graft.tools.PqProbe [sfDir]
  * For each query, reports the ADC rank of the TRUE nearest neighbor under
  * deep probing — the number that sizes the exact re-rank window. */
object PqProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.operators.Similarity

    val exactTop1 = Similarity.bruteForceTopK(spark, sfDir)
      .filter(col("rank") === 1).select("q_id", "nbr_id")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

    // deep-probe IVF (exact scoring of every candidate in probed cells):
    // does the probe set even contain the true NN?
    val ivfTop1 = Similarity.ivfTopK(spark, sfDir, deepProbes = true)
      .filter(col("rank") === 1).select("q_id", "nbr_id")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val cellMisses = exactTop1.filter { case (q, n) => ivfTop1.get(q) != Some(n) }
    println(s"[pq] ivf deep-probe top-1 misses (cell-level): $cellMisses")

    // ADC rank of the true NN among deep-probe candidates, per query
    val ivf = Similarity.buildIvfIndex(spark, sfDir)
    val pq = Similarity.buildPqIndex(spark, sfDir, ivf)
    val cb = pq.codebook
    val codes = pq.codes.select("vec_id", "code").collect()
      .map(r => r.getLong(0) -> r.getAs[Array[Byte]](1)).toMap
    val vecs = graft.sources.Tables.embeddings(spark, sfDir)
      .selectExpr("vec_id", "transform(embedding, x -> cast(x as double)) as v")
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    def adc(q: Array[Double], code: Array[Byte]): Double = {
      var s = 0.0; var m = 0
      while (m < code.length) {
        val cent = cb.centroids(m)(code(m) & 0xFF)
        var j = 0
        while (j < cb.dsub) { s += q(m * cb.dsub + j) * cent(j); j += 1 }
        m += 1
      }
      s
    }
    val ranks = exactTop1.toSeq.sortBy(_._1).map { case (q, trueNbr) =>
      val qv = vecs(q)
      val scored = vecs.keys.filter(_ != q).toSeq
        .map(n => n -> adc(qv, codes(n))).sortBy { case (n, s) => (-s, n) }
      val r = scored.indexWhere(_._1 == trueNbr) + 1
      q -> r
    }
    println(s"[pq] ADC rank of true NN per query (over ALL corpus codes):")
    ranks.foreach { case (q, r) => println(f"[pq]   q=$q%-3d true-NN adc rank=$r") }
    println(s"[pq] max=${ranks.map(_._2).max} p90=${ranks.map(_._2).sorted.apply((ranks.size * 9) / 10 - 1)}")
    spark.stop()
  }
}

package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Synthesize an sf1-equivalent corpus by replicating sf0.1 as FACTOR
  * independent shards — scale EVIDENCE, not an oracle input (the
  * read-only driver testdata stops at sf0.1):
  *
  *   - relational tables: keys shifted by a stride per replica, so join
  *     cardinalities and group sizes scale linearly (no artificial skew);
  *   - documents: every token salted with the replica id, so shingle
  *     sets are disjoint across replicas — within-replica Jaccard
  *     structure is preserved exactly and near-dup pair counts scale
  *     linearly instead of quadratically;
  *   - embeddings: a per-replica ±1 sign pattern per dimension (an
  *     orthogonal transform), preserving norms and within-replica inner
  *     products while decorrelating replicas — ANN neighbor structure
  *     per shard is untouched; the vec_id<20 query set stays replica-0.
  *
  * Usage: runMain graft.tools.ScaleUp [factor] [outDir]   (10, /tmp/graft_sf1)
  */
object ScaleUp {

  val Stride = 10000000L

  def main(args: Array[String]): Unit = {
    val factor = args.headOption.map(_.toInt).getOrElse(10)
    val outDir = args.drop(1).headOption.getOrElse("/tmp/graft_sf1")
    val inDir = "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def read(t: String): DataFrame = spark.read.parquet(s"$inDir/$t.parquet")
    def write(df: DataFrame, t: String): Unit = {
      df.write.mode("overwrite").parquet(s"$outDir/$t.parquet")
      println(s"[scaleup] $t: ${spark.read.parquet(s"$outDir/$t.parquet").count()} rows")
    }

    // dims: copy as-is
    Seq("region", "nation").foreach(t => write(read(t), t))

    def shifted(t: String, keys: Seq[String], strides: Map[String, Long] = Map.empty): DataFrame = {
      val base = read(t)
      (0 until factor).map { rep =>
        keys.foldLeft(base)((df, k) =>
          df.withColumn(k, col(k) + lit(rep * strides.getOrElse(k, Stride))))
      }.reduce(_ unionAll _)
    }
    // c_name is derived from c_custkey in the generator; re-derive it
    // from the SHIFTED key or every replica carries an identical name —
    // which both multiplies er_link's blocking buckets by the factor and
    // plants cross-replica exact-name matches, a corpus artifact (an
    // 8.3× wall blow-up at 10× that vanished with faithful names).
    // The custkey domain shifts DENSELY (stride = base max key), the way
    // the real generator lays out keys at a larger SF: the generic 10^7
    // stride is ≡ 0 mod 10^6, so the name's trailing digits stay frozen
    // at the base corpus' 15k values at ANY factor — blocking-suffix
    // cardinality stops growing and every suffix-blocked operator turns
    // quadratic (measured: er_link 100× warm 93 s aliased; a real dense
    // registry grows suffix entropy with n). Same stride on o_custkey
    // keeps the FK consistent.
    val custStride = read("customer").agg(max("c_custkey")).head.getLong(0) + 1
    val custStrides = Map("c_custkey" -> custStride, "o_custkey" -> custStride)
    write(shifted("customer", Seq("c_custkey"), custStrides)
      .withColumn("c_name", format_string("Customer#%09d", col("c_custkey"))), "customer")
    write(shifted("supplier", Seq("s_suppkey")), "supplier")
    write(shifted("part", Seq("p_partkey")), "part")
    write(shifted("orders", Seq("o_orderkey", "o_custkey"), custStrides), "orders")
    write(shifted("lineitem", Seq("l_orderkey", "l_partkey", "l_suppkey")), "lineitem")

    // events ships as TIMESTAMP(NANOS) — read through Tables.events (which
    // normalizes to µs); the copy is written as standard TIMESTAMP, which
    // Tables.events passes through unchanged
    val ev = graft.sources.Tables.events(spark, inDir)
    write((0 until factor).map { rep =>
      Seq("event_id", "user_id").foldLeft(ev)((df, k) =>
        df.withColumn(k, col(k) + lit(rep * Stride)))
    }.reduce(_ unionAll _), "events")

    // documents: replica-salted tokens (disjoint shingle spaces)
    val docs = read("documents")
    write((0 until factor).map { rep =>
      val d = docs.withColumn("doc_id", col("doc_id") + lit(rep * Stride))
      if (rep == 0) d
      else d.withColumn("text",
          array_join(transform(split(col("text"), " "),
            t => concat(t, lit(s"_r$rep"))), " "))
        .withColumn("n_chars", length(col("text")))
    }.reduce(_ unionAll _), "documents")

    // embeddings: per-replica deterministic sign flips (orthogonal)
    val emb = read("embeddings")
    val dim = 64
    write((0 until factor).map { rep =>
      val e = emb.withColumn("vec_id", col("vec_id") + lit(rep * Stride))
      if (rep == 0) e
      else {
        val rnd = new scala.util.Random(rep * 7919L + 17)
        val signs = Array.fill(dim)(if (rnd.nextBoolean()) 1.0f else -1.0f)
        e.withColumn("embedding",
          zip_with(col("embedding"), array(signs.toIndexedSeq.map(lit): _*),
            (x, s) => (x * s).cast("float")))
      }
    }.reduce(_ unionAll _), "embeddings")

    spark.stop()
  }
}

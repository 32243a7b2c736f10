package graft.tools

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Corpus-fidelity audit for the scale-evidence generator (VERDICT r8
  * #4): every derived column the operators block/join on must keep
  * growing ∝ factor under replication — and the audit must FAIL on the
  * exact replication logic that produced the r8 er_link artifact (a
  * 10^7 key stride ≡ 0 mod 10^6 froze the name's 6-char blocking
  * suffix at the base corpus' values, invisible at 10×, quadratic at
  * 100×). */
class ScaleUpSpec extends SparkSpec {

  private val factor = 3

  test("replica corpus keeps every audited derived key growing ∝ factor") {
    val scaled = ScaleUp.replicaTables(spark, sf, factor).toMap
    val tables = ScaleUp.auditedKeys.map(_.table).distinct
    val base = tables.map(t => t -> spark.read.parquet(s"$sf/$t.parquet")).toMap
    val audit = ScaleUp.entropyAudit(base, scaled, factor)
    audit.foreach(r => info(
      f"${r.table}.${r.column}%-30s base=${r.base}%7d scaled=${r.scaled}%8d ratio=${r.ratio}%5.2f ok=${r.ok}"))
    assert(audit.forall(_.ok),
      s"frozen derived keys: ${audit.filterNot(_.ok).map(r => s"${r.table}.${r.column}").mkString(", ")}")
    // growth is genuinely ∝ factor, not merely above the floor: each
    // audited key must land within [0.6, 1.05]·factor (the suffix domain
    // saturates only far past spec factors)
    audit.foreach(r => assert(r.ratio <= 1.05 * factor,
      s"${r.table}.${r.column} grew superlinearly (${r.ratio} vs factor $factor) — replication artifact"))
  }

  test("the r8 frozen-stride replication fails the entropy audit (the gate has teeth)") {
    // the OLD customer logic: generic 10^7 stride + name re-derived from
    // the shifted key — every replica's trailing-6 suffix repeats the
    // base corpus' values exactly
    val baseCust = spark.read.parquet(s"$sf/customer.parquet")
    val oldCust = (0 until factor).map { rep =>
      baseCust.withColumn("c_custkey", col("c_custkey") + lit(rep * ScaleUp.Stride))
        .withColumn("c_name", format_string("Customer#%09d", col("c_custkey")))
    }.reduce(_ unionAll _)
    val scaled = ScaleUp.replicaTables(spark, sf, factor).toMap
    val tables = ScaleUp.auditedKeys.map(_.table).distinct
    val base = tables.map(t => t -> spark.read.parquet(s"$sf/$t.parquet")).toMap
    val audit = ScaleUp.entropyAudit(base, scaled.updated("customer", oldCust), factor)
    val byName = audit.map(r => s"${r.table}.${r.column}" -> r).toMap
    assert(!byName("customer.er_blocking_suffix").ok,
      s"audit passed the frozen-suffix replication: ${byName("customer.er_blocking_suffix")}")
    assert(math.abs(byName("customer.er_blocking_suffix").ratio - 1.0) < 0.01,
      "frozen suffix must show ratio ≈ 1 (base values repeated verbatim)")
    // the other keys are untouched by the customer swap and stay ok
    assert(byName("documents.token").ok && byName("embeddings.vector_hash").ok)
  }
}

package graft.plans

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** graft_sorted_intersect_count: equality with the array_intersect HOF on
  * its declared input class (sorted, distinct, non-null string arrays),
  * plus the codegen proof — the whole point of the expression is staying
  * inside whole-stage codegen with no per-row hash set. */
class IntersectCountSpec extends SparkSpec {

  test("sorted two-pointer count equals size(array_intersect) on random sorted sets") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    def randomSet(): Seq[String] = {
      val n = rnd.nextInt(30)
      (0 until n).map(_ => s"tok${rnd.nextInt(40)}").distinct.sorted
    }
    val rows = (1 to 500).map(i => (i.toLong, randomSet(), randomSet()))
    val df = rows.toDF("id", "a", "b")
    val out = df.select(col("id"),
        graft.plans.SetOps.sortedIntersectCount(col("a"), col("b")).as("fast"),
        size(array_intersect(col("a"), col("b"))).cast("long").as("hof"))
      .collect()
    out.foreach(r => assert(r.getLong(1) == r.getLong(2),
      s"id ${r.getLong(0)}: two-pointer ${r.getLong(1)} != array_intersect ${r.getLong(2)}"))
    // edge cases: empty sides, identical sides, disjoint sides
    val edges = Seq(
      (Seq.empty[String], Seq("a", "b"), 0L),
      (Seq("a", "b", "c"), Seq("a", "b", "c"), 3L),
      (Seq("a", "b"), Seq("c", "d"), 0L))
    edges.zipWithIndex.foreach { case ((a, b, want), i) =>
      val got = Seq((a, b)).toDF("a", "b")
        .select(graft.plans.SetOps.sortedIntersectCount(col("a"), col("b")))
        .collect()(0).getLong(0)
      assert(got == want, s"edge $i: got $got want $want")
    }
  }

  test("the expression runs inside whole-stage codegen (no fallback)") {
    // arrays derived from the range id so nothing constant-folds away
    // (a literal frame collapses to LocalTableScan with no codegen span)
    val df = spark.range(100)
      .select(col("id"),
        transform(sequence(lit(0), col("id") % 7), i => concat(lit("t"), lpad(i, 3, "0"))).as("a"),
        transform(sequence(col("id") % 3, col("id") % 9), i => concat(lit("t"), lpad(i, 3, "0"))).as("b"))
      .select(col("id"),
        graft.plans.SetOps.sortedIntersectCount(col("a"), col("b")).as("fast"),
        size(array_intersect(col("a"), col("b"))).cast("long").as("hof"))
    val rows = df.collect() // force execution through the codegen path
    rows.foreach(r => assert(r.getLong(1) == r.getLong(2)))
    // the `*(n)` prefix is the WholeStageCodegen marker in the plan
    // rendering: the Project holding the expression must carry it
    val plan = df.queryExecution.executedPlan.toString
    val exprLine = plan.linesIterator
      .find(_.contains("graft_sorted_intersect_count"))
      .getOrElse(fail(s"expression not in plan:\n$plan"))
    assert(exprLine.contains("*("), s"expression outside codegen:\n$plan")
    // and the interpreted path agrees with codegen (nullSafeEval parity)
    val interpreted = SortedIntersectCountExpr(
      org.apache.spark.sql.catalyst.expressions.Literal.create(Seq("a", "b", "d"),
        org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.StringType)),
      org.apache.spark.sql.catalyst.expressions.Literal.create(Seq("b", "c", "d"),
        org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.StringType))).eval(null)
    assert(interpreted == 2L)
  }
}

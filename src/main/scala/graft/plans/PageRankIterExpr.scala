package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types._

/** One PageRank round over an index-aligned in-memory adjacency — the
  * r10 small-graph branch of [[graft.operators.Graphs.pagerankRaw]]:
  *
  *   out[i] = (1 − d)/n + d · Σ_{s ∈ srcsByDst[i]} ranks[s] · invdeg[s]
  *
  * with n = ranks.length. All three inputs are arrays positionally
  * aligned on the dense node index (built once per corpus in the
  * `pr-adj` slot); per-dst sums run in ascending src-index order —
  * deterministic across runs and partitionings.
  *
  * CodegenFallback ON PURPOSE: the branch evaluates this expression on
  * a ONE-row frame (the whole per-round dataflow is the arrays), so
  * per-row interpretation overhead — the thing codegen exists to
  * amortize over millions of rows — is paid exactly [[graft.operators.
  * Graphs.PrIters]] times per query; eval itself is primitive-array
  * loops. */
case class PageRankIterExpr(
    first: Expression,  // srcsByDst: array<array<int>>
    second: Expression, // invdeg: array<double>
    third: Expression,  // ranks: array<double>
    damping: Double)
  extends TernaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "graft_pagerank_iter"

  override def checkInputDataTypes(): TypeCheckResult =
    (first.dataType, second.dataType, third.dataType) match {
      case (ArrayType(ArrayType(IntegerType, _), _),
            ArrayType(DoubleType, _), ArrayType(DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (a, b, c) => TypeCheckResult.TypeCheckFailure(
        s"graft_pagerank_iter expects (array<array<int>>, array<double>, " +
          s"array<double>), got ($a, $b, $c)")
    }

  override def nullSafeEval(adjAny: Any, invAny: Any, rkAny: Any): Any = {
    val adj = adjAny.asInstanceOf[ArrayData]
    val inv = invAny.asInstanceOf[ArrayData].toDoubleArray()
    val rk = rkAny.asInstanceOf[ArrayData].toDoubleArray()
    val n = rk.length
    val base = (1.0 - damping) / n
    val out = new Array[Double](n)
    var i = 0
    while (i < n) {
      val srcs = adj.getArray(i)
      val m = srcs.numElements()
      var sum = 0.0
      var j = 0
      while (j < m) {
        val s = srcs.getInt(j)
        sum += rk(s) * inv(s)
        j += 1
      }
      out(i) = base + damping * sum
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): PageRankIterExpr =
    copy(first = f, second = s, third = t)
}

object PageRankIterExpr {
  /** One recurrence round over index-aligned (srcsByDst, invdeg, ranks). */
  def step(srcsByDst: Column, invdeg: Column, ranks: Column, damping: Double): Column =
    Bridge.column(PageRankIterExpr(Bridge.expression(srcsByDst),
      Bridge.expression(invdeg), Bridge.expression(ranks), damping))
}

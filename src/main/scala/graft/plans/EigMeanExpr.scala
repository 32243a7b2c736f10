package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Add, Divide, Expression, GetArrayItem, Literal, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Spherical average of a 3×3 tensor via eigendecomposition — plus the
  * optimizer rule that removes the eigendecomposition entirely.
  *
  * `EigMeanExpr` evaluates mean(eigenvalues(M)) with the closed-form
  * solver (CodegenFallback — deliberately the slow path). But the mean of
  * the eigenvalues IS tr(M)/3 — an exact algebraic identity, no numerical
  * caveats — so `FuseEigMean` (injected via GraftExtensions) rewrites the
  * expression to `(m[0][0]+m[1][1]+m[2][2])/3`: three array reads inside
  * whole-stage codegen instead of a per-row cubic solve. The SURVEY §4
  * candidate-(a) fusion, demonstrated end to end (PlanSpec asserts the
  * rewrite fires and results match the stored epsilon averages).
  */
case class EigMeanExpr(child: Expression) extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(ArrayType(DoubleType, _), _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"eig_mean expects array<array<double>>, got $t")
  }

  override def nullSafeEval(m: Any): Any = {
    val rows = m.asInstanceOf[ArrayData]
    val mat = Array.tabulate(3, 3)((i, j) =>
      rows.getArray(i).getDouble(j))
    val eig = graft.functions.Eig3x3.eigenvalues(mat)
    (eig(0) + eig(1) + eig(2)) / 3
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "graft_eig_mean"
}

/** Optimizer rule: eig_mean(M) → tr(M)/3 (exact identity). */
object FuseEigMean extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformAllExpressions {
    case EigMeanExpr(m) =>
      val d = (i: Int) => GetArrayItem(GetArrayItem(m, Literal(i)), Literal(i))
      Divide(Add(Add(d(0), d(1)), d(2)), Literal(3.0))
  }
}

/** Column helpers for the materials expressions. */
object MaterialOps {
  /** Spherical average (mean eigenvalue) of a 3×3 tensor column. With
    * GraftExtensions active this fuses to trace/3 at optimization time. */
  def epsAvg(tensor: Column): Column =
    Bridge.column(EigMeanExpr(Bridge.expression(tensor)))
}

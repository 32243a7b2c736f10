package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Access bridge for Spark's private[sql] Column⇄Expression conversions —
  * the standard pattern for third-party libraries that ship native Catalyst
  * expressions without registering every function (cf. e.g. Spark
  * connector libraries). Lives in the org.apache.spark.sql namespace solely
  * to satisfy the private[sql] scope; contains no logic. */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}

package org.apache.spark.sql.graftshim

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge to the `private[sql]` Column↔Expression converters — the
  * supported way to expose a custom Catalyst Expression as a user
  * Column in Spark 4 (ExpressionUtils lives behind private[sql]). */
object Shim {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Eager Column→Expression conversion. [[expression]] wraps the
    * Column's node in a LAZY `ColumnNodeExpression` that only the
    * Dataset API boundary unwraps; an expression injected straight
    * into a plan (FunctionRegistry builders) must be converted up
    * front or it reaches codegen unevaluable. */
  def eagerExpression(c: Column): Expression =
    org.apache.spark.sql.classic.ColumnNodeToExpressionConverter(c.node)
}

package org.apache.spark.sql.graftshim

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Spark 4 removed the public `Column(expr)` / `col.expr` accessors in
  * favor of the Connect-agnostic ColumnNode API; classic-mode
  * conversions live in `private[sql]` ExpressionUtils. This shim (in an
  * `org.apache.spark.sql` subpackage, the standard pattern for Catalyst
  * extension libraries) re-exports just the two conversions graft's
  * custom expressions need.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}

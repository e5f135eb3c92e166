package org.apache.spark.sql.graftshim

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge to the `private[sql]` Column<->Expression converters of Spark's
  * classic API, so graft's native Catalyst expressions can surface as
  * Columns. Lives in an org.apache.spark.sql subpackage solely for
  * access; contains no Spark internals beyond the two delegations.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}

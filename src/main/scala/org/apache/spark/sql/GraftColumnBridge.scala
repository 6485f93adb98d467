package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into Spark's private[sql] Column↔Expression conversions, so
  * graft's native Catalyst expressions (e.g. graft.expressions.VecDot)
  * can be exposed as user-facing Columns. Lives in the Spark package
  * solely for access; contains no logic.
  */
object GraftColumnBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}

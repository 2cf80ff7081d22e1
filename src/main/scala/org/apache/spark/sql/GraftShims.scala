package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge to the sql-private Column↔Expression converters, needed to
  * expose custom Catalyst expressions (graft.functions.VecDot) as
  * Columns. Lives in the org.apache.spark.sql package solely for access
  * — the standard pattern for Spark extension libraries. */
object GraftShims {
  def toExpr(c: Column): Expression = classic.ExpressionUtils.expression(c)
  def toCol(e: Expression): Column = classic.ExpressionUtils.column(e)
}

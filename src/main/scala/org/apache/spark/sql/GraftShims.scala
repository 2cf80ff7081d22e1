package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.execution.SparkStrategy

/** Bridge to the sql-private Column↔Expression converters, needed to
  * expose custom Catalyst expressions (graft.functions.VecDot) as
  * Columns, plus the custom-LogicalPlan → DataFrame and
  * extra-strategy hooks the whole-operator tier (graft.plans) needs.
  * Lives in the org.apache.spark.sql package solely for access — the
  * standard pattern for Spark extension libraries. */
object GraftShims {
  def toExpr(c: Column): Expression = classic.ExpressionUtils.expression(c)
  def toCol(e: Expression): Column = classic.ExpressionUtils.column(e)

  /** Wrap a custom logical node as a DataFrame (analyzer passes it
    * through — children and expressions arrive resolved). */
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  /** Idempotently append a planner strategy at runtime via the public
    * experimental-methods hook — lets the custom operators work on
    * sessions built WITHOUT spark.sql.extensions. */
  def addStrategy(spark: SparkSession, s: SparkStrategy): Unit = {
    val exp = spark.asInstanceOf[classic.SparkSession].experimental
    if (!exp.extraStrategies.contains(s)) {
      exp.extraStrategies = exp.extraStrategies :+ s
    }
  }
}

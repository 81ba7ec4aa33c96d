package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into Spark's `private[sql]` Column↔Expression conversions —
  * the supported pattern for libraries shipping native Catalyst
  * expressions (the public `Column` API in Spark 4 no longer exposes
  * `expr`/the Expression constructor directly).
  */
object GraftSql {
  def columnOf(e: Expression): Column =
    classic.ExpressionUtils.column(e)

  def expressionOf(c: Column): Expression =
    classic.ExpressionUtils.expression(c)
}

package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into Spark's private[sql] Column↔Expression conversions (the
  * supported classic-mode path since the Spark 4 Column refactor onto
  * ColumnNode). Lives in the org.apache.spark.sql package solely to satisfy
  * the private[sql] scope; no Spark internals are modified. */
object GraftColumnBridge {
  def toColumn(e: Expression): Column = classic.ExpressionUtils.column(e)
  def toExpression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}

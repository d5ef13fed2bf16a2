package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge to Spark 4's package-private Column <-> Expression conversion
  * (org.apache.spark.sql.classic.ExpressionUtils). Lives in the spark.sql
  * package solely to satisfy access control; no Spark internals are modified.
  */
object GraftColumnBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}

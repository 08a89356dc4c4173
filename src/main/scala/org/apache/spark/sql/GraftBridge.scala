package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into Spark's `private[sql]` Column ↔ Expression converters.
  * Spark 4 `Column`s wrap `ColumnNode`s, and the classic-backend
  * converters live behind `private[sql]`; extension libraries that
  * define custom Catalyst expressions need this one-file shim in the
  * `org.apache.spark.sql` package to expose typed `Column` builders.
  */
object GraftBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}

package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/**
 * Thin bridge into Spark's `private[sql]` Column <-> Expression converters
 * (Spark 4 moved Column onto ColumnNode; classic.ExpressionUtils is the
 * supported internal shim). Lives in org.apache.spark.sql purely for
 * access; no Spark behavior is modified.
 */
object GraftBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}

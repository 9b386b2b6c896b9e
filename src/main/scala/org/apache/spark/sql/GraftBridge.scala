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

  /** Register a SQL function on an EXISTING session (the extensions class
    * covers session construction; this covers shared/test sessions). */
  def registerFunction(spark: SparkSession, name: String,
                       info: org.apache.spark.sql.catalyst.expressions.ExpressionInfo,
                       builder: Seq[Expression] => Expression): Unit =
    spark.sessionState.functionRegistry.registerFunction(
      org.apache.spark.sql.catalyst.FunctionIdentifier(name), info, builder)
}

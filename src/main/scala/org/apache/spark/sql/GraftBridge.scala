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

  /** DataType equality ignoring nullability (and respecting the session's
    * case-sensitivity rule) — `DataType.sameType` is private[sql]. */
  def sameType(a: org.apache.spark.sql.types.DataType,
               b: org.apache.spark.sql.types.DataType): Boolean = a.sameType(b)

  /** Is this column the literal `true` (the `lit(true)` default-condition
    * sentinel)? Matched on the ColumnNode, not the Catalyst expression —
    * Spark 4 wraps unanalyzed columns in ColumnNodeExpression, so a
    * Catalyst Literal pattern never fires pre-analysis. */
  def isTrueLiteral(c: Column): Boolean = c.node match {
    case l: internal.Literal => l.value == true
    case _ => false
  }

  /**
   * Re-root a (typically just-checkpointed) DataFrame as a bare scan of
   * its own InternalRow RDD, dropping BOTH the logical lineage and the
   * ORIGIN-PLAN STATISTICS the checkpoint node preserves. Iterative
   * algorithms need the second drop as much as the first: Spark 4's
   * (local)checkpoint carries the child plan's sizeInBytes forward, so a
   * loop of self-joins compounds the estimate PRODUCT across rounds —
   * the BigInt's bit count multiplies per generation and the optimizer's
   * stats visitor ends up doing million-digit multiplications (observed:
   * minutes of driver CPU inside SizeInBytesOnlyStatsPlanVisitor on a
   * 40-node graph). The fresh LogicalRDD restarts at the session default
   * estimate, keeping every round's stats O(plan size). No data moves:
   * `toRdd` of a checkpointed frame reads its materialized blocks.
   */
  def dropLineageAndStats(df: DataFrame): DataFrame = {
    val classicDf = df.asInstanceOf[classic.DataFrame]
    classicDf.sparkSession.internalCreateDataFrame(
      classicDf.queryExecution.toRdd, df.schema)
  }

  /** Register a SQL function on an EXISTING session (the extensions class
    * covers session construction; this covers shared/test sessions). */
  def registerFunction(spark: SparkSession, name: String,
                       info: org.apache.spark.sql.catalyst.expressions.ExpressionInfo,
                       builder: Seq[Expression] => Expression): Unit =
    spark.sessionState.functionRegistry.registerFunction(
      org.apache.spark.sql.catalyst.FunctionIdentifier(name), info, builder)
}

package graft.functions

import java.io.ByteArrayInputStream

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, Predicate, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{ByteType, IntegerType, LongType, ShortType, StringType}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.sketch.BloomFilter

/**
 * Scan-stage Bloom membership — the engine's analogue of Spark's own
 * runtime-filter injection, but available as an explicit operator: a
 * serialized `org.apache.spark.util.sketch.BloomFilter` rides to the
 * executors as a reference object, deserializes once per task, and each
 * row pays one O(1) probe with NO false negatives. Evaluation happens in
 * the scan stage (inside WholeStageCodegen), so rows the filter rejects
 * never reach a shuffle.
 *
 * Hash discipline matches `DataFrameStatFunctions.bloomFilter` exactly
 * (integral types put as long, strings as their UTF-8 bytes), so a filter
 * built by the public stat API is directly probe-able here.
 */
case class BloomMightContain(child: Expression, filterBytes: Array[Byte])
    extends UnaryExpression with Predicate {

  @transient private lazy val bf: BloomFilter =
    BloomFilter.readFrom(new ByteArrayInputStream(filterBytes))

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType | IntegerType | ShortType | ByteType | StringType =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"bloom probe supports integral or string keys, got ${other.sql}")
  }

  // hoisted: the input type is plan-invariant — matching dataType per ROW
  // on the interpreted path is pure wasted work (the DotProductConst
  // elementIsDouble pattern)
  @transient private lazy val isString: Boolean = child.dataType == StringType

  override def nullSafeEval(input: Any): Any =
    if (isString) bf.mightContainBinary(
      input.asInstanceOf[UTF8String].getBytes)
    else bf.mightContainLong(input.asInstanceOf[Number].longValue())

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // one deserialized filter per task, shared by all rows via the
    // references array — the codegen body is a single virtual probe call
    val bfRef = ctx.addReferenceObj("bloom", bf,
      classOf[BloomFilter].getName)
    child.dataType match {
      case StringType =>
        defineCodeGen(ctx, ev, c => s"$bfRef.mightContainBinary(($c).getBytes())")
      case _ =>
        defineCodeGen(ctx, ev, c => s"$bfRef.mightContainLong((long) $c)")
    }
  }

  // the serialized filter is an ARRAY param: case-class reference equality
  // would make two probes with the same filter semantically distinct,
  // defeating CSE and exchange reuse and re-running the probe per site
  // (the TokenSlotFoldExpr precedent)
  override def equals(other: Any): Boolean = other match {
    case b: BloomMightContain =>
      child == b.child && java.util.Arrays.equals(filterBytes, b.filterBytes)
    case _ => false
  }
  override def hashCode(): Int =
    31 * child.hashCode() + java.util.Arrays.hashCode(filterBytes)

  override protected def withNewChildInternal(newChild: Expression): BloomMightContain =
    copy(child = newChild)
}

object BloomFunctions {
  /** Column wrapper: `mightContain(col, filter)` — serialize once here,
    * deserialize once per task there. */
  def mightContain(key: Column, filter: BloomFilter): Column = {
    val bos = new java.io.ByteArrayOutputStream()
    filter.writeTo(bos)
    GraftBridge.column(BloomMightContain(GraftBridge.expression(key), bos.toByteArray))
  }
}

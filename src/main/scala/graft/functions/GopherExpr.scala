package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/**
 * Shared one-pass evaluator for [[GopherCountsExpr]] — a standalone
 * object (no companion class) so Scala emits a static forwarder the
 * generated Java can call directly (the [[TextNorm]] pattern).
 */
object GopherCount {

  val schema: StructType = StructType(Seq(
    StructField("n_words", LongType, nullable = false),
    StructField("sum_len", LongType, nullable = false),
    StructField("n_alpha", LongType, nullable = false),
    StructField("n_sym", LongType, nullable = false),
    StructField("n_stop", LongType, nullable = false)))

  private val Hash = UTF8String.fromString("#")
  private val Ellipsis = UTF8String.fromString("...")

  /** True iff any BYTE of `t` is an ASCII letter — equivalent to the
    * regex `[A-Za-z]` match on any UTF-8 string, because multi-byte
    * sequences only use bytes with the high bit set and can never alias
    * an ASCII letter byte. */
  private def hasAlpha(t: UTF8String): Boolean = {
    val n = t.numBytes()
    var i = 0
    while (i < n) {
      val b = t.getByte(i)
      if ((b >= 'a' && b <= 'z') || (b >= 'A' && b <= 'Z')) return true
      i += 1
    }
    false
  }

  /** One tight loop over the token array producing all five Gopher rule
    * counts (word count, character sum, alphabetic-word count,
    * symbol-word count, distinct-stop count). Null tokens (impossible
    * from `split`, guarded anyway) count as words but contribute to no
    * other counter. */
  def compute(arr: ArrayData, stops: Array[UTF8String]): InternalRow = {
    val n = arr.numElements()
    var sumLen = 0L
    var nAlpha = 0L
    var nSym = 0L
    val stopHit = new Array[Boolean](stops.length)
    var i = 0
    while (i < n) {
      val t = arr.getUTF8String(i)
      if (t != null) {
        sumLen += t.numChars()
        if (hasAlpha(t)) nAlpha += 1
        if (t.contains(Hash) || t.contains(Ellipsis)) nSym += 1
        var s = 0
        while (s < stops.length) {
          if (!stopHit(s) && t.equals(stops(s))) stopHit(s) = true
          s += 1
        }
      }
      i += 1
    }
    var nStop = 0L
    var s = 0
    while (s < stopHit.length) { if (stopHit(s)) nStop += 1; s += 1 }
    new GenericInternalRow(Array[Any](n.toLong, sumLen, nAlpha, nSym, nStop))
  }
}

/**
 * Fused Gopher rule counts over a token array: one loop per row instead
 * of the four interpreted higher-order functions (`aggregate` for the
 * character sum plus two `filter`s and an `array_intersect`) the HOF
 * formulation needs — each of those walks the array again and pays a
 * lambda frame per element (BENCH_NOTES.md: HOFs are interpreted).
 * Emits struct(n_words, sum_len, n_alpha, n_sym, n_stop); deterministic
 * and lambda-free, so multiple `getField` consumers CSE in codegen.
 *
 * NULL tokens array => NULL struct (the split-of-null case; the rule
 * comparisons then evaluate to NULL, same as the HOF form).
 */
case class GopherCountsExpr(child: Expression, stops: Seq[String])
    extends UnaryExpression {

  override def dataType: DataType = GopherCount.schema

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"gopher_counts expects ARRAY<STRING>, got ${other.sql}")
  }

  @transient private lazy val stopsU: Array[UTF8String] =
    stops.map(UTF8String.fromString).toArray

  override def nullSafeEval(input: Any): Any =
    GopherCount.compute(input.asInstanceOf[ArrayData], stopsU)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val sRef = ctx.addReferenceObj("stops", stopsU,
      "org.apache.spark.unsafe.types.UTF8String[]")
    nullSafeCodeGen(ctx, ev, arr =>
      s"${ev.value} = graft.functions.GopherCount.compute($arr, $sRef);")
  }

  override protected def withNewChildInternal(newChild: Expression): GopherCountsExpr =
    copy(child = newChild)
}

object GopherFunctions {
  /** Column wrapper for [[GopherCountsExpr]]. `stops` dedups here: the
    * n_stop count is DISTINCT stop hits (the array_intersect semantics
    * this expression replaced), and a duplicated list entry would count
    * one stopword twice — passing the r_stop >= 2 gate on a single
    * distinct hit. */
  def gopherCounts(tokens: Column, stops: Seq[String]): Column =
    GraftBridge.column(
      GopherCountsExpr(GraftBridge.expression(tokens), stops.distinct))
}

package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/**
 * Shared one-pass evaluator for [[QualityCountsExpr]] — standalone object
 * (static forwarder for generated Java, the [[GopherCount]] pattern).
 */
object QualityCount {

  val schema: StructType = StructType(Seq(
    StructField("n_words", LongType, nullable = false),
    StructField("n_stop", LongType, nullable = false),
    StructField("n_punct", LongType, nullable = false),
    StructField("n_chars", LongType, nullable = false)))

  /** ASCII punctuation membership — Java `\p{Punct}` and DuckDB
    * `[[:punct:]]` are both exactly this 32-char ASCII class, and UTF-8
    * multi-byte sequences only use high-bit bytes, so a byte test is the
    * character test. */
  private def isPunct(b: Byte): Boolean =
    (b >= '!' && b <= '/') || (b >= ':' && b <= '@') ||
      (b >= '[' && b <= '`') || (b >= '{' && b <= '~')

  /**
   * One byte walk over the raw text computing the four quality counters
   * with `split(text, " ")` token semantics (single-space separator,
   * limit -1: empty tokens kept, so n_words = spaces + 1 always):
   * n_words, stopword-token occurrences, ASCII-punct char count, and the
   * character (not byte) length.
   */
  def compute(text: UTF8String, stops: Array[UTF8String]): InternalRow = {
    val n = text.numBytes()
    var nWords = 1L
    var nStop = 0L
    var nPunct = 0L
    var tokStart = 0
    def closeToken(end: Int): Unit = {
      val len = end - tokStart
      var s = 0
      while (s < stops.length) {
        val st = stops(s)
        if (st.numBytes() == len) {
          var j = 0
          var eq = true
          while (eq && j < len) {
            if (text.getByte(tokStart + j) != st.getByte(j)) eq = false
            j += 1
          }
          if (eq) { nStop += 1; s = stops.length }
          else s += 1
        } else s += 1
      }
      tokStart = end + 1
    }
    var i = 0
    while (i < n) {
      val b = text.getByte(i)
      if (b == ' ') { nWords += 1; closeToken(i) }
      else if (isPunct(b)) nPunct += 1
      i += 1
    }
    closeToken(n)
    new GenericInternalRow(Array[Any](nWords, nStop, nPunct,
      text.numChars().toLong))
  }
}

/**
 * Fused quality-score counters over the raw text: one byte loop per row
 * replacing a `split` + interpreted HOF `filter`/`isin` walk per term of
 * [[TextFunctions.qualityScore]] (the BENCH_NOTES HOF ladder — the
 * quality scan was the measured floor of every calibration query). Emits
 * struct(n_words, n_stop, n_punct, n_chars); the score arithmetic stays
 * in plain Columns so the round(6) boundary discipline is untouched.
 * Deterministic and lambda-free => getField consumers CSE in codegen.
 */
case class QualityCountsExpr(child: Expression, stops: Seq[String])
    extends UnaryExpression {

  override def dataType: DataType = QualityCount.schema

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"quality_counts expects STRING, got ${child.dataType.sql}")

  @transient private lazy val stopsU: Array[UTF8String] =
    stops.map(UTF8String.fromString).toArray

  override def nullSafeEval(input: Any): Any =
    QualityCount.compute(input.asInstanceOf[UTF8String], stopsU)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val sRef = ctx.addReferenceObj("stops", stopsU,
      "org.apache.spark.unsafe.types.UTF8String[]")
    nullSafeCodeGen(ctx, ev, txt =>
      s"${ev.value} = graft.functions.QualityCount.compute($txt, $sRef);")
  }

  override protected def withNewChildInternal(newChild: Expression): QualityCountsExpr =
    copy(child = newChild)
}

object QualityFunctions {
  /** Column wrapper for [[QualityCountsExpr]]. */
  def qualityCounts(text: Column, stops: Seq[String]): Column =
    GraftBridge.column(
      QualityCountsExpr(GraftBridge.expression(text), stops))
}

package graft.functions

import java.text.Normalizer

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * Unicode text normalization for corpus cleaning — the canonical first
 * pass of a training-data pipeline (fold visually-identical byte
 * sequences together so dedup/fingerprinting see one form):
 * NFD-decompose, drop combining marks (accent strip), locale-independent
 * per-codepoint lowercase, collapse whitespace runs to single spaces,
 * trim, NFC-recompose. One tight codepoint walk per row; no regex, no
 * per-row allocation beyond the output buffer.
 *
 * Exists because Spark has no built-in accent-strip/NFC surface while
 * the reference's byte-identity dedup semantics make normalization a
 * prerequisite, not an option (reference treasure keys are raw bytes:
 * app/core/hydra/swamp/swamp.go — two spellings of one key are two keys).
 */
object TextNorm {
  /** Static entry so generated code can call it without reflection. */
  def norm(s: UTF8String): UTF8String = {
    val nfd = Normalizer.normalize(s.toString, Normalizer.Form.NFD)
    val sb = new java.lang.StringBuilder(nfd.length)
    var pendingSpace = false
    var i = 0
    while (i < nfd.length) {
      val cp = nfd.codePointAt(i)
      i += Character.charCount(cp)
      val t = Character.getType(cp)
      if (t == Character.NON_SPACING_MARK || t == Character.COMBINING_SPACING_MARK ||
          t == Character.ENCLOSING_MARK) {
        () // combining marks NFD split off the base char: the accents
      } else if (Character.isWhitespace(cp) ||
                 Character.getType(cp) == Character.SPACE_SEPARATOR) {
        // isWhitespace alone EXCLUDES the non-breaking space family
        // (U+00A0/U+2007/U+202F — ubiquitous in HTML-scraped corpora);
        // leaving them in place defeats exactly the visually-identical
        // folding this pass exists for
        pendingSpace = sb.length > 0 // leading runs vanish = trim-left
      } else {
        if (pendingSpace) { sb.append(' '); pendingSpace = false }
        sb.appendCodePoint(Character.toLowerCase(cp))
      }
    } // a trailing run never flushes = trim-right
    UTF8String.fromString(Normalizer.normalize(sb.toString, Normalizer.Form.NFC))
  }
}

/** `normalize_text(string)` — see [[TextNorm.norm]]. NULL in => NULL out. */
case class NormalizeText(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"normalize_text expects STRING, got ${child.dataType.sql}")

  override def nullSafeEval(input: Any): Any =
    TextNorm.norm(input.asInstanceOf[UTF8String])

  // stays inside whole-stage codegen: one static call per row, the walk
  // itself is branch-local JIT territory
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextNorm.norm($c)")

  override protected def withNewChildInternal(newChild: Expression): NormalizeText =
    copy(child = newChild)
}

object NormalizeFunctions {
  /** Column wrapper for [[NormalizeText]]. */
  def normalizeText(text: Column): Column =
    GraftBridge.column(NormalizeText(GraftBridge.expression(text)))
}

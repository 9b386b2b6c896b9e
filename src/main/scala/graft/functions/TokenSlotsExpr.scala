package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/**
 * Shared tight-loop evaluator for [[TokenSlotsExpr]] / [[TokenSlotFoldExpr]]
 * — a standalone object (no companion class) so Scala emits a static
 * forwarder the generated Java can call directly (the [[TextNorm]] /
 * [[GopherCount]] pattern).
 *
 * The slot function is EXACTLY [[TextFunctions.hash32]] mod buckets:
 * the first 8 hex digits of the token's md5 (= the first 4 digest bytes
 * as an unsigned 32-bit value) modulo the bucket count — bit-identical
 * to the `conv(substring(md5(t),1,8),16,10) % buckets` Column form and
 * to the DuckDB oracle's mirror, so differential checks keep passing.
 * What this buys over the Column/HOF form is the per-token machinery:
 * one reused MessageDigest and no per-element lambda frames or hex
 * string round-trip (md5 → 32-char hex → substring → radix parse).
 */
object TokenSlots {

  private val mdLocal = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** hash32(t) % buckets — non-negative by construction (hash32 < 2^32). */
  private def slot(t: UTF8String, buckets: Long): Long = {
    val md = mdLocal.get()
    md.reset()
    val d = md.digest(t.getBytes)
    val h = ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
            ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
    h % buckets
  }

  /** Every token's slot, as a long array. Null tokens — impossible from
    * `split`, guarded anyway — are SKIPPED, so on a null-bearing token
    * array the output is SHORTER than the input (the transform+hash32
    * Column form would emit null elements instead; both contribute
    * nothing to [[fold]], but do not zip this positionally against a
    * token array that can carry nulls). */
  def slots(arr: ArrayData, buckets: Long): ArrayData = {
    val n = arr.numElements()
    val out = new Array[Long](n)
    var m = 0
    var i = 0
    while (i < n) {
      val t = arr.getUTF8String(i)
      if (t != null) { out(m) = slot(t, buckets); m += 1 }
      i += 1
    }
    new GenericArrayData(if (m == n) out else java.util.Arrays.copyOf(out, m))
  }

  private val SpaceU = UTF8String.fromString(" ")

  /** DSIR feature slots: every unigram's slot, then every adjacent
    * bigram's ("a b", single-space joint) — the fused form of
    * `concat(tokens, wordBigrams(tokens))` mapped through
    * `pmod(hash32(f), buckets)`, one md5 loop per row instead of
    * interpreted transform lambdas building a hex string + BigInteger
    * parse per feature. Null-involving features are skipped (the [[slots]]
    * discipline — impossible from `split`). */
  def dsirSlots(arr: ArrayData, buckets: Long): ArrayData = {
    val n = arr.numElements()
    val out = new Array[Long](math.max(0, 2 * n - 1))
    var m = 0
    var i = 0
    while (i < n) {
      val t = arr.getUTF8String(i)
      if (t != null) { out(m) = slot(t, buckets); m += 1 }
      i += 1
    }
    i = 0
    while (i < n - 1) {
      val a = arr.getUTF8String(i); val b = arr.getUTF8String(i + 1)
      if (a != null && b != null) {
        out(m) = slot(UTF8String.concat(a, SpaceU, b), buckets); m += 1
      }
      i += 1
    }
    new GenericArrayData(if (m == out.length) out
      else java.util.Arrays.copyOf(out, m))
  }

  /** Σ_f lut(slot(f)) over the [[dsirSlots]] feature set — the DSIR
    * scoring fold, one loop per row with no intermediate slots array and
    * no interpreted `aggregate` over a buckets-sized array literal. */
  def dsirFold(arr: ArrayData, lut: Array[Long]): Long = {
    val buckets = lut.length.toLong
    val n = arr.numElements()
    var acc = 0L
    var i = 0
    while (i < n) {
      val t = arr.getUTF8String(i)
      if (t != null) acc += lut(slot(t, buckets).toInt)
      i += 1
    }
    i = 0
    while (i < n - 1) {
      val a = arr.getUTF8String(i); val b = arr.getUTF8String(i + 1)
      if (a != null && b != null)
        acc += lut(slot(UTF8String.concat(a, SpaceU, b), buckets).toInt)
      i += 1
    }
    acc
  }

  /** Σ_tok lut(slot(tok)) — the NB scoring fold, one loop per row. */
  def fold(arr: ArrayData, lut: Array[Long]): Long = {
    val n = arr.numElements()
    val buckets = lut.length.toLong
    var acc = 0L
    var i = 0
    while (i < n) {
      val t = arr.getUTF8String(i)
      if (t != null) acc += lut(slot(t, buckets).toInt)
      i += 1
    }
    acc
  }
}

/**
 * Fused token→slot mapping over a token array: array<long> of
 * `hash32(tok) % buckets`, one md5 loop per row — replaces the
 * interpreted `transform(tokens, t => pmod(hash32(t), buckets))` chain
 * (BENCH_NOTES.md: HOFs are interpreted; the Column md5 additionally
 * materializes a 32-char hex string per token). NULL array => NULL.
 */
case class TokenSlotsExpr(child: Expression, buckets: Int)
    extends UnaryExpression {
  require(buckets > 0, "buckets must be positive")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(input: Any): Any =
    TokenSlots.slots(input.asInstanceOf[ArrayData], buckets.toLong)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, arr =>
      s"${ev.value} = graft.functions.TokenSlots.slots($arr, ${buckets}L);")

  override protected def withNewChildInternal(newChild: Expression): TokenSlotsExpr =
    copy(child = newChild)
}

/**
 * Fused NB scoring fold: Σ_tok lut[hash32(tok) % lut.length] over a token
 * array in ONE loop — the scan-stage scoring kernel of
 * [[graft.operators.Classify.nbScore]] without the intermediate slots
 * array or the interpreted `aggregate` over a 4K-element array literal.
 * NULL array => NULL (the caller filters empty docs separately).
 */
case class TokenSlotFoldExpr(child: Expression, lut: Array[Long])
    extends UnaryExpression {
  require(lut.nonEmpty, "lut must be non-empty")

  override def dataType: DataType = LongType

  override def nullSafeEval(input: Any): Any =
    TokenSlots.fold(input.asInstanceOf[ArrayData], lut)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val lutRef = ctx.addReferenceObj("lut", lut, "long[]")
    nullSafeCodeGen(ctx, ev, arr =>
      s"${ev.value} = graft.functions.TokenSlots.fold($arr, $lutRef);")
  }

  // two folds are equal iff they fold the same table, not the same object
  override def equals(o: Any): Boolean = o match {
    case TokenSlotFoldExpr(c, l) =>
      c == child && java.util.Arrays.equals(l, lut)
    case _ => false
  }
  override def hashCode(): Int =
    31 * child.hashCode() + java.util.Arrays.hashCode(lut)

  override protected def withNewChildInternal(newChild: Expression): TokenSlotFoldExpr =
    copy(child = newChild)
}

/**
 * Fused DSIR feature slots over a token array — [[TokenSlots.dsirSlots]]
 * as a codegen-callable expression. NULL array => NULL.
 */
case class DsirFeatureSlotsExpr(child: Expression, buckets: Int)
    extends UnaryExpression {
  require(buckets > 0, "buckets must be positive")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(input: Any): Any =
    TokenSlots.dsirSlots(input.asInstanceOf[ArrayData], buckets.toLong)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, arr =>
      s"${ev.value} = graft.functions.TokenSlots.dsirSlots($arr, ${buckets}L);")

  override protected def withNewChildInternal(newChild: Expression): DsirFeatureSlotsExpr =
    copy(child = newChild)
}

/**
 * Fused DSIR scoring fold — [[TokenSlots.dsirFold]] as an expression
 * (the [[TokenSlotFoldExpr]] shape over the unigram+bigram feature set).
 * NULL array => NULL.
 */
case class DsirFeatureFoldExpr(child: Expression, lut: Array[Long])
    extends UnaryExpression {
  require(lut.nonEmpty, "lut must be non-empty")

  override def dataType: DataType = LongType

  override def nullSafeEval(input: Any): Any =
    TokenSlots.dsirFold(input.asInstanceOf[ArrayData], lut)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val lutRef = ctx.addReferenceObj("lut", lut, "long[]")
    nullSafeCodeGen(ctx, ev, arr =>
      s"${ev.value} = graft.functions.TokenSlots.dsirFold($arr, $lutRef);")
  }

  // two folds are equal iff they fold the same table, not the same object
  override def equals(o: Any): Boolean = o match {
    case DsirFeatureFoldExpr(c, l) =>
      c == child && java.util.Arrays.equals(l, lut)
    case _ => false
  }
  override def hashCode(): Int =
    31 * child.hashCode() + java.util.Arrays.hashCode(lut)

  override protected def withNewChildInternal(newChild: Expression): DsirFeatureFoldExpr =
    copy(child = newChild)
}

object TokenSlotFunctions {
  /** Column wrapper for [[TokenSlotsExpr]]. */
  def tokenSlots(tokens: Column, buckets: Int): Column =
    GraftBridge.column(TokenSlotsExpr(GraftBridge.expression(tokens), buckets))

  /** Column wrapper for [[TokenSlotFoldExpr]]. */
  def tokenSlotFold(tokens: Column, lut: Array[Long]): Column =
    GraftBridge.column(TokenSlotFoldExpr(GraftBridge.expression(tokens), lut))

  /** Column wrapper for [[DsirFeatureSlotsExpr]]. */
  def dsirFeatureSlots(tokens: Column, buckets: Int): Column =
    GraftBridge.column(DsirFeatureSlotsExpr(GraftBridge.expression(tokens), buckets))

  /** Column wrapper for [[DsirFeatureFoldExpr]]. */
  def dsirFeatureFold(tokens: Column, lut: Array[Long]): Column =
    GraftBridge.column(DsirFeatureFoldExpr(GraftBridge.expression(tokens), lut))
}

package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/**
 * Shared tight-loop evaluators for the shingle→hash32→minhash/simhash
 * ladder — the [[TokenSlots]] pattern applied to the near-dup family's
 * scan kernels. Every function is BIT-IDENTICAL to the Column/HOF form it
 * replaces (pinned in ShingleExprSpec); what it buys is the per-shingle
 * machinery: the HOF forms dispatch an interpreted lambda per element
 * (BENCH_NOTES: HOFs are never codegen'd), build each shingle as a string
 * via concat_ws over a slice (O(tokens · n) bytes per doc), and round
 * every md5 through a 32-char hex string + radix parse. Here one reused
 * MessageDigest is fed the window's token bytes directly (md5 of a
 * concatenation needs no materialized concatenation) and the first 4
 * digest bytes read out as the unsigned 32-bit value — exactly
 * `conv(substring(md5(s),1,8),16,10)`, the [[TokenSlots.slot]] formula.
 */
object ShingleHash {

  private val mdLocal = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** First 4 md5 digest bytes as an unsigned 32-bit value — the
    * [[TextFunctions.hash32]] formula off a prepared digest. */
  private def read32(d: Array[Byte]): Long =
    ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
      ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)

  /** Byte offsets where each single-space-separated token starts —
    * `split(text, " ", -1)` boundaries (trailing empties kept; the space
    * byte can never appear inside a UTF-8 multi-byte sequence, so a byte
    * scan is exact). Token i spans [starts(i), starts(i+1) - 1) — and,
    * decisive for the shingle kernel below: because the separator is
    * exactly one space, the single-space-joined form of tokens i..j IS the
    * verbatim byte range [starts(i), starts(j+1) - 1) of the text. */
  private def tokenStarts(raw: Array[Byte], off: Int, n: Int): Array[Int] = {
    var seps = 0
    var i = 0
    while (i < n) { if (raw(off + i) == ' ') seps += 1; i += 1 }
    val starts = new Array[Int](seps + 2) // + virtual start past the end
    starts(0) = 0
    var out = 1
    i = 0
    while (i < n) {
      if (raw(off + i) == ' ') { starts(out) = i + 1; out += 1 }
      i += 1
    }
    starts(out) = n + 1
    starts
  }

  /** hash32 of every `n`-gram shingle of `text` (windows of n tokens,
    * single-space joined; a doc of fewer than n tokens yields ONE shingle
    * of all its tokens) — `transform(TF.shingles(text, n), TF.hash32)`
    * fused: each shingle's joined string is a contiguous byte range of the
    * text (single-space separators), so no token or shingle string is ever
    * built — one md5 per window over the raw bytes. */
  def shingleHashes(text: UTF8String, n: Int): ArrayData = {
    val md = mdLocal.get()
    val raw = text.getBytes
    val off = 0 // getBytes returns an exact-sized array
    val starts = tokenStarts(raw, off, text.numBytes())
    val ntoks = starts.length - 1
    def windowHash(i: Int, len: Int): Long = {
      md.reset()
      val s = starts(i)
      val e = starts(i + len) - 1 // one before the next token's start
      md.update(raw, off + s, e - s)
      read32(md.digest())
    }
    if (ntoks < n) {
      new GenericArrayData(Array(windowHash(0, ntoks)))
    } else {
      val out = new Array[Long](ntoks - n + 1)
      var i = 0
      while (i < out.length) {
        out(i) = windowHash(i, n)
        i += 1
      }
      new GenericArrayData(out)
    }
  }

  /** k-lane minhash signature over an already-hashed shingle array:
    * sig[i] = min_h (h · a(i) + b(i)) mod p — one loop over the hashes
    * computing all k lanes, replacing k interpreted `array_min(transform)`
    * passes ([[TextFunctions.minhashSignatureFromHashes]]'s formula; the
    * input never carries nulls — [[ShingleHashesExpr]]'s output type). */
  def minhashSig(hashes: ArrayData, a: Array[Long], b: Array[Long]): ArrayData = {
    val k = a.length
    val p = TextFunctions.MinhashPrime
    val mins = new Array[Long](k)
    java.util.Arrays.fill(mins, Long.MaxValue)
    val n = hashes.numElements()
    var i = 0
    while (i < n) {
      val h = hashes.getLong(i)
      var j = 0
      while (j < k) {
        val v = (h * a(j) + b(j)) % p
        if (v < mins(j)) mins(j) = v
        j += 1
      }
      i += 1
    }
    new GenericArrayData(mins)
  }

  /** 32-bit simhash over per-TOKEN hash32 values (majority vote per bit,
    * ties set the bit — `cnt · 2 >= n`) — [[TextFunctions.simhash32]]
    * fused into one token loop over the raw bytes. */
  def simhash(text: UTF8String): Long = {
    val md = mdLocal.get()
    val raw = text.getBytes
    val starts = tokenStarts(raw, 0, text.numBytes())
    val ntoks = starts.length - 1
    val counts = new Array[Int](32)
    var i = 0
    while (i < ntoks) {
      md.reset()
      md.update(raw, starts(i), starts(i + 1) - 1 - starts(i))
      val h = read32(md.digest())
      var b = 0
      while (b < 32) {
        if ((h & (1L << b)) != 0) counts(b) += 1
        b += 1
      }
      i += 1
    }
    var sig = 0L
    var b = 0
    while (b < 32) {
      if (counts(b) * 2 >= ntoks) sig |= (1L << b)
      b += 1
    }
    sig
  }
}

/**
 * Fused shingle-hash array over a TEXT column: array<long> of hash32 of
 * every n-gram shingle — `transform(TF.shingles(text, n), TF.hash32)` in
 * one codegen'd loop (no per-shingle string build, no hex round trip).
 * The caller coalesces NULL text to "" ([[ShingleFunctions.shingleHashes]])
 * — the Column chain maps NULL to [hash32("")] (split of NULL is NULL,
 * concat_ws over NULL is ""), and hash32("") is exactly the "" value, so
 * the coalesce reproduces it bit-for-bit.
 */
case class ShingleHashesExpr(child: Expression, n: Int)
    extends UnaryExpression {
  require(n >= 1, "shingle width must be >= 1")

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"shingle_hashes needs a string text column, got $other")
    }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(input: Any): Any =
    ShingleHash.shingleHashes(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, t =>
      s"${ev.value} = graft.functions.ShingleHash.shingleHashes($t, $n);")

  override protected def withNewChildInternal(newChild: Expression): ShingleHashesExpr =
    copy(child = newChild)
}

/**
 * Fused minhash signature over an already-hashed shingle array — the
 * [[TextFunctions.minhashSignatureFromHashes]] formula (fixed-seed (a,b)
 * params, min over (h·a+b) mod p per lane) in one loop computing every
 * lane. NULL array => NULL (unreachable from [[ShingleHashesExpr]]).
 */
case class MinhashFromHashesExpr(child: Expression,
                                 a: Array[Long], b: Array[Long])
    extends UnaryExpression {
  require(a.nonEmpty && a.length == b.length, "needs matching (a,b) params")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(input: Any): Any =
    ShingleHash.minhashSig(input.asInstanceOf[ArrayData], a, b)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val aRef = ctx.addReferenceObj("mhA", a, "long[]")
    val bRef = ctx.addReferenceObj("mhB", b, "long[]")
    nullSafeCodeGen(ctx, ev, arr =>
      s"${ev.value} = graft.functions.ShingleHash.minhashSig($arr, $aRef, $bRef);")
  }

  // params compare by VALUE (the TokenSlotFoldExpr discipline)
  override def equals(o: Any): Boolean = o match {
    case MinhashFromHashesExpr(c, oa, ob) =>
      c == child && java.util.Arrays.equals(oa, a) && java.util.Arrays.equals(ob, b)
    case _ => false
  }
  override def hashCode(): Int =
    31 * (31 * child.hashCode() + java.util.Arrays.hashCode(a)) +
      java.util.Arrays.hashCode(b)

  override protected def withNewChildInternal(newChild: Expression): MinhashFromHashesExpr =
    copy(child = newChild)
}

/**
 * Fused 32-bit simhash over a TEXT column — [[TextFunctions.simhash32]]
 * (per-token hash32, per-bit majority vote, ties set) in one loop. NULL
 * text yields 0L exactly like the Column chain (every per-bit vote term
 * evaluates to 0 there: filter/size over a NULL array read -1, and
 * -2 >= -1 is false), so the output is never null.
 */
case class SimhashExpr(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"simhash needs a string text column, got $other")
    }

  override def dataType: DataType = LongType
  override def nullable: Boolean = false

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) 0L else ShingleHash.simhash(v.asInstanceOf[UTF8String])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    val resultCode =
      code"""
        ${c.code}
        long ${ev.value} = ${c.isNull} ? 0L :
          graft.functions.ShingleHash.simhash(${c.value});
      """
    ev.copy(code = resultCode, isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): SimhashExpr =
    copy(child = newChild)
}

object ShingleFunctions {
  /** Column wrapper for [[ShingleHashesExpr]]. NULL text coalesces to ""
    * BEFORE the expression: hash32 of the Column chain's NULL-text shingle
    * ("" via concat_ws-over-NULL) equals hash32 of ""'s single shingle, so
    * the coalesce reproduces the chain bit-for-bit and the output is never
    * null. */
  def shingleHashes(text: Column, n: Int): Column =
    GraftBridge.column(ShingleHashesExpr(
      GraftBridge.expression(org.apache.spark.sql.functions.coalesce(
        text, org.apache.spark.sql.functions.lit(""))), n))

  /** Column wrapper for [[MinhashFromHashesExpr]] with the standard
    * fixed-seed params ([[TextFunctions.minhashParams]]). */
  def minhashSigFromHashes(hashes: Column, k: Int, seed: Long = 42L): Column = {
    val params = TextFunctions.minhashParams(k, seed)
    GraftBridge.column(MinhashFromHashesExpr(GraftBridge.expression(hashes),
      params.map(_._1).toArray, params.map(_._2).toArray))
  }

  /** Column wrapper for [[SimhashExpr]]. */
  def simhash(text: Column): Column =
    GraftBridge.column(SimhashExpr(GraftBridge.expression(text)))
}

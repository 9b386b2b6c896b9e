package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Vector similarity primitives.
 *
 * The reference scores cosine similarity as a plain dot product of
 * pre-L2-normalized float32 vectors with a 4-wide unrolled loop
 * (reference: app/server/gateway/filter.go:591-608, proto/hydraide.proto:2684-2687).
 * Here the hot path is a custom Catalyst Expression with whole-stage codegen:
 * one primitive loop per row, no boxing, no intermediate arrays — this is the
 * Spark-idiomatic equivalent of their unrolled Go loop and beats the
 * `aggregate(zip_with(...))` formulation by avoiding per-element lambda calls.
 */
object VectorFunctions {

  /** Dot product of an ArrayType(Float|Double) column against a constant
    * query vector. Pre-normalized inputs => this IS cosine similarity.
    * Dimension mismatch evaluates to 0.0 (callers add a size() guard when
    * the mismatch must be distinguished from orthogonality). */
  def cosine(v: Column, query: Array[Float]): Column =
    GraftBridge.column(DotProductConst(GraftBridge.expression(v), query))

  /** Same thing built only from built-in higher-order functions — the
    * reference/baseline implementation used in tests to cross-check the
    * custom expression. */
  def cosineHof(v: Column, query: Array[Float]): Column = {
    val q = array(query.map(x => lit(x.toDouble)).toIndexedSeq: _*)
    aggregate(zip_with(v.cast(ArrayType(DoubleType)), q, (a, b) => a * b),
      lit(0.0), (acc, x) => acc + x)
  }

  /** Dot product between two vector columns (for pairwise similarity) —
    * codegen'd two-child sibling of [[DotProductConst]]: one primitive loop,
    * no per-element lambda calls or intermediate zipped arrays. */
  def dot(a: Column, b: Column): Column =
    GraftBridge.column(DotProduct(GraftBridge.expression(a), GraftBridge.expression(b)))

  /** HOF formulation of [[dot]] — cross-check baseline used in tests. */
  def dotHof(a: Column, b: Column): Column =
    aggregate(zip_with(a.cast(ArrayType(DoubleType)), b.cast(ArrayType(DoubleType)),
      (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  /** L2-normalize a float/double array column. A zero vector stays zeros:
    * dividing by its zero norm would yield all-NaN, and Spark sorts NaN
    * as the LARGEST double — every cosine top-k would rank the garbage
    * row first (the quantizeInt8 zero-vector guard, applied here). */
  def l2normalize(v: Column): Column = {
    val d = v.cast(ArrayType(DoubleType))
    val norm = sqrt(aggregate(d, lit(0.0), (acc, x) => acc + x * x))
    val safe = when(norm === 0.0, lit(1.0)).otherwise(norm)
    transform(d, x => x / safe)
  }

  /** Product-quantization encode of a float/double vector column against a
    * constant int64 codebook: quantize (round-half-away ·scale) + per-
    * subspace argmin-L2 in ONE codegen'd primitive loop. See
    * [[PqEncodeExpr]] for the semantics contract. */
  def pqEncode(v: Column, codebook: Array[Array[Long]], m: Int,
               scale: Double): Column = {
    // construction-time validation (Similarity.pqEncode re-checks; this
    // public entry must too): an m that does not divide the codebook dim
    // would silently IGNORE the tail dimensions of every vector —
    // plausible but wrong codes written to a serving index — and an
    // empty codebook would throw per-row at eval instead of here
    require(codebook.nonEmpty, "codebook must not be empty")
    require(codebook.forall(_.length == codebook.head.length),
      "codebook rows must share one dimension")
    require(m >= 1 && codebook.head.length % m == 0,
      s"codebook dim ${codebook.head.length} must divide into m=$m subspaces")
    GraftBridge.column(PqEncodeExpr(GraftBridge.expression(v), codebook, m, scale))
  }
}

/**
 * `dot(child, query)` as a codegen'd scalar expression.
 * NULL input => NULL; dimension mismatch => 0.0.
 */
case class DotProductConst(child: Expression, query: Array[Float])
    extends UnaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft dot product needs an array<float|double> input, got $other")
  }

  private lazy val elementIsDouble: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == DoubleType

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    if (n != query.length) 0.0
    else {
      // promote BOTH operands to double before multiplying — bit-identical
      // to a double-precision dot product (and to DuckDB's DOUBLE[] path),
      // where float*float would round the product to float first
      var acc = 0.0
      var i = 0
      while (i < n) {
        // NULL element => NULL result (the PqEncodeExpr discipline — the
        // unchecked getter would NPE interpreted but read garbage 0.0
        // under codegen: same data, engine-dependent answers)
        if (arr.isNullAt(i)) return null
        val x = if (elementIsDouble) arr.getDouble(i)
                else arr.getFloat(i).toDouble
        acc += x * query(i).toDouble
        i += 1
      }
      acc
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val qRef = ctx.addReferenceObj("query", query, "float[]")
    val getter = if (elementIsDouble) "getDouble" else "getFloat"
    nullSafeCodeGen(ctx, ev, c => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      s"""
         |final int $n = $c.numElements();
         |double $acc = 0.0;
         |if ($n == $qRef.length) {
         |  for (int $i = 0; $i < $n && !${ev.isNull}; $i++) {
         |    if ($c.isNullAt($i)) { ${ev.isNull} = true; continue; }
         |    $acc += ((double) $c.$getter($i)) * ((double) $qRef[$i]);
         |  }
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })
  }

  // case-class equality compares the query ARRAY by reference, which
  // defeats semanticEquals / subexpression elimination / exchange reuse —
  // two probes with equal query vectors must compare equal (the
  // TokenSlotFoldExpr precedent)
  override def equals(other: Any): Boolean = other match {
    case d: DotProductConst =>
      child == d.child && java.util.Arrays.equals(query, d.query)
    case _ => false
  }
  override def hashCode(): Int =
    31 * child.hashCode() + java.util.Arrays.hashCode(query)

  override protected def withNewChildInternal(newChild: Expression): DotProductConst =
    copy(child = newChild)
}

/**
 * `dot(a, b)` between two array columns as a codegen'd scalar expression.
 * NULL on either side — or a NULL ELEMENT on either side — => NULL;
 * dimension mismatch => 0.0. Element types may be float or double on
 * either side independently; all arithmetic is done in double
 * (bit-identical to DuckDB's DOUBLE[] list_dot_product, including its
 * NULL-element => NULL propagation).
 */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType | DoubleType, _),
            ArrayType(FloatType | DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"graft dot product needs two array<float|double> inputs, got ($l, $r)")
    }

  private lazy val aIsD: Boolean =
    left.dataType.asInstanceOf[ArrayType].elementType == DoubleType
  private lazy val bIsD: Boolean =
    right.dataType.asInstanceOf[ArrayType].elementType == DoubleType

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = a.numElements()
    if (n != b.numElements()) 0.0
    else {
      var acc = 0.0
      var i = 0
      while (i < n) {
        // NULL element => NULL (see DotProductConst — keeps interpreted
        // and codegen answers identical on containsNull=true inputs)
        if (a.isNullAt(i) || b.isNullAt(i)) return null
        val x = if (aIsD) a.getDouble(i) else a.getFloat(i).toDouble
        val y = if (bIsD) b.getDouble(i) else b.getFloat(i).toDouble
        acc += x * y
        i += 1
      }
      acc
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val aGet = if (aIsD) "getDouble" else "getFloat"
    val bGet = if (bIsD) "getDouble" else "getFloat"
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      s"""
         |final int $n = $a.numElements();
         |double $acc = 0.0;
         |if ($n == $b.numElements()) {
         |  for (int $i = 0; $i < $n && !${ev.isNull}; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; continue; }
         |    $acc += ((double) $a.$aGet($i)) * ((double) $b.$bGet($i));
         |  }
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}

/**
 * Product-quantization encode as one codegen'd expression: the input
 * float/double vector quantizes to int64 (round-half-away of x·scale — the
 * SQL ROUND convention, matching the relational quantize the oracles
 * replay) and every subspace takes the argmin exact-int64 L2 codebook
 * entry, ties to the LOWER code. Output: int[m] codes; NULL input, a
 * dimension mismatch, or a NULL array ELEMENT ⇒ NULL row (callers filter
 * on size() first — the NULL is the defensive contract, mirroring
 * VectorFilter's dim-mismatch ⇒ no-match; the element check keeps the
 * interpreted and codegen paths identical on containsNull=true inputs,
 * where an unchecked getDouble would NPE interpreted but read garbage
 * compiled).
 *
 * Why an Expression and not HOFs: Spark's higher-order functions evaluate
 * per-element closures interpreted (never whole-stage codegen), so the
 * m·ksub·sd-step encode loop pays a lambda dispatch per element — measured
 * 3.4 s for the rolled HOF form and 1.1 s for m·ksub unrolled zip_with
 * aggregates on the 5 k fixture; this single primitive loop removes the
 * dispatch entirely and keeps the expression tree O(1) in ksub, so the
 * real-world ksub = 256 cannot blow the codegen method limit the way 2048
 * unrolled aggregate subtrees would.
 */
case class PqEncodeExpr(child: Expression, codebook: Array[Array[Long]],
                        m: Int, scale: Double)
    extends UnaryExpression {

  // @transient: the codebook field itself ships with the expression; a
  // materialized cbFlat would double the serialized payload (128 KB of
  // int64 codebook becomes 256 KB per task) — the sibling expressions'
  // wordsU/stopsU/bf discipline
  @transient private lazy val dim = codebook.head.length
  @transient private lazy val sd = dim / m
  @transient private lazy val ksub = codebook.length
  // flattened row-major (code, dim) for cache-friendly scans
  @transient private lazy val cbFlat: Array[Long] = codebook.flatten

  // array-typed constructor params need value equality or semanticEquals /
  // CSE / exchange reuse never fire (the TokenSlotFoldExpr precedent)
  override def equals(other: Any): Boolean = other match {
    case p: PqEncodeExpr =>
      child == p.child && m == p.m && scale == p.scale &&
        codebook.length == p.codebook.length &&
        codebook.indices.forall(i =>
          java.util.Arrays.equals(codebook(i), p.codebook(i)))
    case _ => false
  }
  override def hashCode(): Int =
    java.util.Objects.hash(child, Int.box(m), Double.box(scale),
      Int.box(java.util.Arrays.hashCode(codebook.map(
        java.util.Arrays.hashCode))))

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = true

  private lazy val elementIsDouble: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == DoubleType

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    if (arr.numElements() != dim) return null
    val iv = new Array[Long](dim)
    var i = 0
    while (i < dim) {
      if (arr.isNullAt(i)) return null
      val x = (if (elementIsDouble) arr.getDouble(i)
               else arr.getFloat(i).toDouble) * scale
      iv(i) = (math.signum(x) * math.floor(math.abs(x) + 0.5)).toLong
      i += 1
    }
    val codes = new Array[Int](m)
    var s = 0
    while (s < m) {
      var best = 0L; var bestC = 0; var c = 0
      val ivo = s * sd
      while (c < ksub) {
        var acc = 0L; var j = 0
        val off = c * dim + ivo
        while (j < sd) {
          val d = iv(ivo + j) - cbFlat(off + j); acc += d * d; j += 1
        }
        if (c == 0 || acc < best) { best = acc; bestC = c }
        c += 1
      }
      codes(s) = bestC; s += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(codes)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cbRef = ctx.addReferenceObj("cbFlat", cbFlat, "long[]")
    val getter = if (elementIsDouble) "getDouble" else "getFloat"
    nullSafeCodeGen(ctx, ev, c => {
      val iv = ctx.freshName("iv")
      val codes = ctx.freshName("codes")
      val i = ctx.freshName("i"); val s = ctx.freshName("s")
      val cc = ctx.freshName("cc"); val j = ctx.freshName("j")
      val x = ctx.freshName("x"); val best = ctx.freshName("best")
      val bestC = ctx.freshName("bestC"); val acc = ctx.freshName("acc")
      val off = ctx.freshName("off"); val ivo = ctx.freshName("ivo")
      val d = ctx.freshName("d")
      val hasNull = ctx.freshName("hasNull")
      s"""
         |boolean $hasNull = false;
         |if ($c.numElements() != $dim) {
         |  ${ev.isNull} = true;
         |} else {
         |  long[] $iv = new long[$dim];
         |  for (int $i = 0; $i < $dim && !$hasNull; $i++) {
         |    if ($c.isNullAt($i)) { $hasNull = true; continue; }
         |    double $x = ((double) $c.$getter($i)) * $scale;
         |    $iv[$i] = (long) (Math.signum($x) * Math.floor(Math.abs($x) + 0.5));
         |  }
         |  if ($hasNull) {
         |    ${ev.isNull} = true;
         |  } else {
         |  int[] $codes = new int[$m];
         |  for (int $s = 0; $s < $m; $s++) {
         |    long $best = 0L; int $bestC = 0;
         |    final int $ivo = $s * $sd;
         |    for (int $cc = 0; $cc < $ksub; $cc++) {
         |      long $acc = 0L;
         |      final int $off = $cc * $dim + $ivo;
         |      for (int $j = 0; $j < $sd; $j++) {
         |        final long $d = $iv[$ivo + $j] - $cbRef[$off + $j];
         |        $acc += $d * $d;
         |      }
         |      if ($cc == 0 || $acc < $best) { $best = $acc; $bestC = $cc; }
         |    }
         |    $codes[$s] = $bestC;
         |  }
         |  ${ev.value} =
         |    new org.apache.spark.sql.catalyst.util.GenericArrayData($codes);
         |  }
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): PqEncodeExpr =
    copy(child = newChild)
}

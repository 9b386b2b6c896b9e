package graft.functions

import org.apache.spark.sql.Column
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

  /** L2-normalize a float/double array column. */
  def l2normalize(v: Column): Column = {
    val d = v.cast(ArrayType(DoubleType))
    val norm = sqrt(aggregate(d, lit(0.0), (acc, x) => acc + x * x))
    transform(d, x => x / norm)
  }
}

/**
 * `dot(child, query)` as a codegen'd scalar expression.
 * NULL input => NULL; dimension mismatch => 0.0.
 */
case class DotProductConst(child: Expression, query: Array[Float])
    extends UnaryExpression {

  override def dataType: DataType = DoubleType

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
      if (elementIsDouble) {
        while (i < n) { acc += arr.getDouble(i) * query(i).toDouble; i += 1 }
      } else {
        while (i < n) { acc += arr.getFloat(i).toDouble * query(i).toDouble; i += 1 }
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
         |  for (int $i = 0; $i < $n; $i++) {
         |    $acc += ((double) $c.$getter($i)) * ((double) $qRef[$i]);
         |  }
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): DotProductConst =
    copy(child = newChild)
}

/**
 * `dot(a, b)` between two array columns as a codegen'd scalar expression.
 * NULL on either side => NULL; dimension mismatch => 0.0. Element types may
 * be float or double on either side independently; all arithmetic is done
 * in double (bit-identical to DuckDB's DOUBLE[] list_dot_product).
 * Null ELEMENTS are not supported (embeddings are dense).
 */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  private def isDouble(e: Expression): Boolean =
    e.dataType.asInstanceOf[ArrayType].elementType == DoubleType

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = a.numElements()
    if (n != b.numElements()) 0.0
    else {
      val aIsD = isDouble(left); val bIsD = isDouble(right)
      var acc = 0.0
      var i = 0
      while (i < n) {
        val x = if (aIsD) a.getDouble(i) else a.getFloat(i).toDouble
        val y = if (bIsD) b.getDouble(i) else b.getFloat(i).toDouble
        acc += x * y
        i += 1
      }
      acc
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val aGet = if (isDouble(left)) "getDouble" else "getFloat"
    val bGet = if (isDouble(right)) "getDouble" else "getFloat"
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      s"""
         |final int $n = $a.numElements();
         |double $acc = 0.0;
         |if ($n == $b.numElements()) {
         |  for (int $i = 0; $i < $n; $i++) {
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

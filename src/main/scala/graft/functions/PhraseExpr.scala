package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.expressions.{Expression, Predicate, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.unsafe.types.UTF8String

/**
 * Phrase containment over a token array as a codegen'd predicate: true iff
 * `words` appear as consecutive tokens. The Spark-idiomatic equivalent of
 * the reference's consecutive-position check
 * (reference: app/server/gateway/filter.go:560-589) in scan form.
 *
 * Replaces the HOF formulation `exists(sequence(1, n-m+1), i -> ...)`,
 * which allocates an index array per row and a lambda frame per window —
 * this is one tight loop over the UnsafeArrayData with zero allocation,
 * O(tokens x |phrase|) worst case with early exit.
 *
 * NULL tokens array => NULL (callers apply the no-match-before-negate
 * discipline); NULL elements never match a word.
 */
case class TokensContainPhrase(child: Expression, words: Seq[String])
    extends UnaryExpression with Predicate {

  // SQL-registered (graft_phrase): without the type check a wrong-typed
  // argument passes analysis and dies at execution with a cast error
  // instead of a clean AnalysisException
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"graft_phrase needs an array<string> token column, got $other")
    }

  @transient private lazy val wordsU: Array[UTF8String] =
    words.map(UTF8String.fromString).toArray

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val m = wordsU.length
    if (m == 0) true
    else {
      var i = 0
      var found = false
      while (!found && i <= n - m) {
        var j = 0
        var ok = true
        while (ok && j < m) {
          val t = arr.getUTF8String(i + j)
          ok = t != null && t.equals(wordsU(j))
          j += 1
        }
        found = ok
        i += 1
      }
      found
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val wordsRef = ctx.addReferenceObj("words", wordsU,
      "org.apache.spark.unsafe.types.UTF8String[]")
    nullSafeCodeGen(ctx, ev, arr => {
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val n = ctx.freshName("n")
      val ok = ctx.freshName("ok")
      val found = ctx.freshName("found")
      val t = ctx.freshName("t")
      s"""
         |final int $n = $arr.numElements();
         |boolean $found = $wordsRef.length == 0;
         |for (int $i = 0; !$found && $i + $wordsRef.length <= $n; $i++) {
         |  boolean $ok = true;
         |  for (int $j = 0; $ok && $j < $wordsRef.length; $j++) {
         |    org.apache.spark.unsafe.types.UTF8String $t = $arr.getUTF8String($i + $j);
         |    $ok = $t != null && $t.equals($wordsRef[$j]);
         |  }
         |  $found = $ok;
         |}
         |${ev.value} = $found;
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): TokensContainPhrase =
    copy(child = newChild)
}

object PhraseFunctions {
  /** Column wrapper for [[TokensContainPhrase]]. */
  def phraseInTokens(tokens: Column, words: Seq[String]): Column =
    GraftBridge.column(TokensContainPhrase(GraftBridge.expression(tokens), words))
}

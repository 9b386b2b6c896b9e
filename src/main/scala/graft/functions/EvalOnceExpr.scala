package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.DataType

/**
 * Evaluation barrier for an EXPENSIVE projection the optimizer would
 * otherwise duplicate: a pass-through wrapper that reports
 * `deterministic = false`, so predicate pushdown will not substitute the
 * aliased child into a filter below the projection and collapse rules will
 * not re-inline it into several consumers.
 *
 * The duplication it exists to stop (optimization-guide §4.4, the
 * "mark expensive expressions non-deterministic" rule, which Spark only
 * exposes for Python UDFs via `asNondeterministic`): writing
 * `select(parse(x).as("k")).filter(cond(k))` lets PushDownPredicates
 * rewrite the filter to `cond(parse(x))` under the Project — every row
 * then pays the parse in the Filter and every SURVIVOR pays it again in
 * the Project (q_json_extract's before-plan: `get_json_object` appears in
 * operators (3) Filter and (4) Project both). Wrapped, the plan keeps
 * Project-below-Filter and each row parses exactly once.
 *
 * The child MUST be genuinely deterministic — the wrapper only withholds
 * the flag from the optimizer; it adds no state and evaluates the child
 * verbatim (eval and codegen both delegate), so results are bit-identical
 * on every input and task retries recompute identical values. The cost is
 * that OTHER predicates also stop pushing past the projection — use it on
 * small projections whose filters could not reach the scan anyway (a
 * derived-column predicate never pushes to parquet), not as a blanket.
 */
case class EvalOnceExpr(child: Expression) extends UnaryExpression {
  override lazy val deterministic: Boolean = false
  override def foldable: Boolean = false

  override def dataType: DataType = child.dataType
  override def nullable: Boolean = child.nullable

  override def eval(input: InternalRow): Any = child.eval(input)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    ev.copy(code = c.code, isNull = c.isNull, value = c.value)
  }

  override protected def withNewChildInternal(newChild: Expression): EvalOnceExpr =
    copy(child = newChild)
}

object EvalOnceExpr {
  /** Column wrapper: `evalOnce(expensive)` pins the expensive expression to
    * the one Project that names it. */
  def evalOnce(c: Column): Column =
    GraftBridge.column(EvalOnceExpr(GraftBridge.expression(c)))
}

package graft.plans

import scala.collection.mutable

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule

/**
 * Lambda-aware common-subexpression elimination — an optimizer rule closing
 * a real Catalyst gap: whole-stage codegen's subexpression elimination
 * DEDUPES repeated scalar subtrees but SKIPS any subtree containing a
 * lambda (`LambdaVariable`s make it non-hoistable for codegen), so a
 * projection like
 *
 *   array(array_min(transform(hs, ...p1...)), array_min(transform(hs, ...pk...)))
 *   where hs = transform(split(text), s => md5(s))
 *
 * re-evaluates the md5 pipeline k times. This engine hit exactly that on
 * its MinHash/SimHash signatures (12 s -> 0.7 s after a manual rewrite —
 * see TextFunctions.minhashSignature). The rule automates the same
 * let-binding: a repeated deterministic higher-order subtree E inside one
 * projection/filter expression is rewritten to
 *
 *   get(transform(array(E), v -> body[E := v]), 0)
 *
 * — `array(x)` + `transform` is the only "let" the expression language has.
 * E is evaluated once per row; the surrounding expression is unchanged.
 *
 * Scope and safety:
 *  - only DETERMINISTIC subtrees that contain a higher-order function and
 *    have no free lambda variables (nothing bound outside E) are hoisted;
 *  - duplicates are detected per canonicalized form, so the common
 *    shared-`val` Column pattern is caught;
 *  - rewrite recurses (several distinct duplicated subtrees all get bound)
 *    and is idempotent (the hoisted form contains one occurrence, so a
 *    second pass finds nothing);
 *  - applied to Project lists and Filter conditions.
 *
 * Registered by [[graft.GraftExtensions]] (`injectOptimizerRule`); usable
 * ad hoc via `spark.experimental.extraOptimizations`.
 */
object LambdaCse extends Rule[LogicalPlan] {

  private def containsHof(e: Expression): Boolean =
    e.exists(_.isInstanceOf[HigherOrderFunction])

  /** Lambda variables referenced in `e` but bound outside it. */
  private def freeLambdaVars(e: Expression): Set[Long] = {
    def go(ex: Expression, bound: Set[Long]): Set[Long] = ex match {
      case v: NamedLambdaVariable =>
        if (bound(v.exprId.id)) Set.empty else Set(v.exprId.id)
      case l: LambdaFunction =>
        val b2 = bound ++ l.arguments.collect { case v: NamedLambdaVariable => v.exprId.id }
        l.children.flatMap(go(_, b2)).toSet
      case other => other.children.flatMap(go(_, bound)).toSet
    }
    go(e, Set.empty)
  }

  private def qualifies(e: Expression): Boolean =
    e.deterministic && e.resolved && containsHof(e) && freeLambdaVars(e).isEmpty

  private def nodeCount(e: Expression): Int = {
    var n = 0
    e.foreach(_ => n += 1)
    n
  }

  /** Census with CONDITIONALITY: walk `e` counting qualifying subtrees,
    * and record which canonical forms occur at least once at a position
    * that is UNCONDITIONALLY evaluated whenever `e` is. Spark's own
    * subexpression elimination refuses to hoist out of conditional
    * branches for a reason: binding a subtree that only ever runs inside
    * a CASE branch evaluates it on EVERY row — rows the original guarded
    * away now pay the cost and, under ANSI, can throw where the original
    * was correct. Hoisting stays safe when >= 1 occurrence is
    * unconditional (the original already ran it per row); conditional
    * occurrences then merely reuse the bound value. The conditional set
    * comes from Spark's own ConditionalExpression.alwaysEvaluatedInputs
    * (If/CaseWhen/Coalesce/...), so the two CSEs agree on what
    * "conditional" means. */
  private def census(e: Expression)
      : (mutable.HashMap[Expression, (Expression, Int)], mutable.HashSet[Expression]) = {
    val counts = mutable.HashMap.empty[Expression, (Expression, Int)]
    val uncond = mutable.HashSet.empty[Expression]
    def walk(ex: Expression, isUncond: Boolean): Unit = {
      if (qualifies(ex)) {
        val k = ex.canonicalized
        counts.get(k) match {
          case Some((r, c)) => counts.update(k, (r, c + 1))
          case None         => counts.update(k, (ex, 1))
        }
        if (isUncond) uncond += k
      }
      ex match {
        case ce: ConditionalExpression =>
          val always = ce.alwaysEvaluatedInputs
          always.foreach(walk(_, isUncond))
          ce.children.filterNot(c => always.exists(_ eq c))
            .foreach(walk(_, isUncond = false))
        case l: LambdaFunction =>
          // a lambda body runs 0..n times per row (zero for an empty
          // array), so an occurrence inside it is CONDITIONAL exactly like
          // a CASE branch: hoisting on its evidence alone evaluates the
          // subtree on rows whose original never ran it — wasted work, and
          // an ANSI throw where the original was correct. An occurrence
          // outside any lambda still licenses the hoist, and the rewrite
          // then reuses the bound value inside the body too.
          l.children.foreach(walk(_, isUncond = false))
        case other => other.children.foreach(walk(_, isUncond))
      }
    }
    walk(e, isUncond = true)
    (counts, uncond)
  }

  /** Hoist the largest duplicated qualifying subtree; recurse until none. */
  private def dedup(e: Expression): Expression = {
    if (!containsHof(e)) return e // fast path: the common HOF-free expression
    val (counts, uncond) = census(e)
    val dups = counts.collect {
      case (k, (repr, c)) if c >= 2 && uncond(k) => repr
    }
    if (dups.isEmpty) e
    else {
      val target = dups.maxBy(nodeCount)
      val lv = NamedLambdaVariable("_graft_cse", target.dataType, target.nullable)
      val body = e.transformDown {
        case sub if sub.canonicalized == target.canonicalized => lv
      }
      val bound = GetArrayItem(
        ArrayTransform(CreateArray(Seq(target)), LambdaFunction(dedup(body), Seq(lv))),
        Literal(0))
      if (bound.resolved) bound else e // belt-and-braces: never break analysis
    }
  }

  private def rewriteNamed(ne: NamedExpression): NamedExpression = ne match {
    case a @ Alias(child, name) =>
      val d = dedup(child)
      if (d eq child) a
      else Alias(d, name)(a.exprId, a.qualifier, a.explicitMetadata,
        a.nonInheritableMetadataKeys)
    case other => other
  }

  /** Session-level escape hatch (and the honest way to get a no-rule
    * baseline in tests, since the rule is injected for a session's whole
    * lifetime by GraftExtensions): `SET spark.graft.lambdaCse.enabled=false`. */
  val EnabledKey = "spark.graft.lambdaCse.enabled"

  private def enabled: Boolean =
    org.apache.spark.sql.internal.SQLConf.get
      .getConfString(EnabledKey, "true").toBoolean

  override def apply(plan: LogicalPlan): LogicalPlan =
    if (!enabled) plan
    else plan.transform {
      case p: Project =>
        val rewritten = p.projectList.map(rewriteNamed)
        if (rewritten.zip(p.projectList).forall { case (a, b) => a eq b }) p
        else p.copy(projectList = rewritten)
      case f: Filter =>
        val d = dedupCondition(f.condition)
        if (d eq f.condition) f else f.copy(condition = d)
    }

  /** Filter conditions dedup per AND-group, not whole: wrapping the ENTIRE
    * condition in the let-binding would bury every sibling conjunct inside
    * one opaque GetArrayItem — FileSourceStrategy could no longer split
    * out the simple conjuncts, losing parquet pushdown and partition
    * pruning (a date===x next to two HOF predicates would cost a full
    * scan). So: split top-level conjuncts, bind ONLY the ones containing a
    * duplicated subtree (grouped, so cross-conjunct sharing still hoists),
    * and leave the rest — still splittable, still pushable — alone. */
  private def dedupCondition(cond: Expression): Expression = {
    if (!containsHof(cond)) return cond // fast path
    val conjuncts = splitAnd(cond)
    if (conjuncts.length == 1) return dedup(cond)
    // duplicated qualifying subtrees across the WHOLE condition (the same
    // conditionality-aware census dedup runs, minus the rewrite)
    val (counts, uncond) = census(cond)
    val dupKeys = counts.collect {
      case (k, (_, c)) if c >= 2 && uncond(k) => k
    }.toSet
    if (dupKeys.isEmpty) return cond
    val (hit, clean) = conjuncts.partition(c =>
      c.exists(sub => dupKeys.contains(sub.canonicalized)))
    if (hit.isEmpty) return cond // dups live outside any conjunct? (can't)
    val boundHit = dedup(hit.reduce(And))
    (clean :+ boundHit).reduce(And)
  }

  private def splitAnd(e: Expression): Seq[Expression] = e match {
    case And(l, r) => splitAnd(l) ++ splitAnd(r)
    case other => Seq(other)
  }
}

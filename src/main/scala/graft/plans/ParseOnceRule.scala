package graft.plans

import graft.functions.PlanBarrier
import org.apache.spark.sql.catalyst.expressions.{Alias, Expression, GetJsonObject, NamedExpression}
import org.apache.spark.sql.catalyst.expressions.objects.StaticInvoke
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Filter, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule

/** Automatic parse-once rewrite — the optimizer-rule form of the
  * `graft_barrier` trick, so NAIVE queries get it without knowing it.
  *
  * After predicate pushdown, a query that projects a parsed JSON
  * column and filters on it has the shape
  * `Project(..parse(x)..) ← Filter(..parse(x)..) ← child`: the parse
  * runs once per input row in the Filter and AGAIN per surviving row
  * in the Project (whole-stage codegen does not eliminate duplicates
  * across operator boundaries — measured 2× on f16 before the manual
  * barrier). This rule extracts each expensive parse appearing in BOTH
  * the filter condition and the projection into a barriered alias in a
  * new Project below the Filter, and rewrites both to reference it:
  *
  * `Project(..p..) ← Filter(..p..) ← Project(child.*, barrier(parse) p) ← child`
  *
  * The [[PlanBarrier]] wrap is what makes the rewrite STABLE inside
  * the operator-optimization fixpoint: without it, PushDownPredicates
  * would re-inline the alias on the next iteration and undo the
  * extraction. Evaluation count is unchanged for filtered-out rows
  * (the parse ran per input row in the Filter already) and halved for
  * survivors. Expensive = JSON parsing: `parse_json`/`try_parse_json`
  * (optimized to a `StaticInvoke` of `VariantExpressionEvalUtils`) and
  * `get_json_object`.
  *
  * Registered via `GraftExtensions` (`injectOptimizerRule`) — any
  * session built with the extensions gets parse-once automatically;
  * `graft_barrier` remains for manual control in plain sessions.
  */
object ParseOnceRule extends Rule[LogicalPlan] {

  private def isExpensiveParse(e: Expression): Boolean = e match {
    case si: StaticInvoke =>
      si.staticObject.getName.endsWith("VariantExpressionEvalUtils$") &&
        si.functionName == "parseJson"
    case _: GetJsonObject => true
    case _ => false
  }

  /** Top-most expensive parses in the tree (children of a matched node
    * are not collected separately). */
  private def collectParses(e: Expression): Seq[Expression] =
    if (isExpensiveParse(e)) Seq(e)
    else e.children.flatMap(collectParses)

  /** Parses computed by BOTH `cond` and `upper`, deduplicated by
    * canonical form. Deterministic only: a barriered parse from a
    * prior pass is already nondeterministic and skipped, which is
    * what makes the rule a fixpoint no-op on its own output. */
  private def sharedParses(cond: Expression,
      upper: Seq[Expression]): Seq[Expression] = {
    val above = upper.flatMap(collectParses).map(_.canonicalized).toSet
    collectParses(cond).filter(_.deterministic)
      .filter(e => above.contains(e.canonicalized))
      .groupBy(_.canonicalized).map(_._2.head).toSeq
  }

  private def extract(shared: Seq[Expression], cond: Expression,
      child: LogicalPlan): (Expression => Expression, LogicalPlan) = {
    val aliases = shared.zipWithIndex.map { case (e, i) =>
      Alias(PlanBarrier(e), s"__parse_once_$i")()
    }
    val sub: Map[Expression, Expression] =
      shared.zip(aliases).map { case (e, a) =>
        (e.canonicalized: Expression) -> (a.toAttribute: Expression)
      }.toMap
    def rewrite(e: Expression): Expression = e.transformDown {
      case x if sub.contains(x.canonicalized) => sub(x.canonicalized)
    }
    (rewrite, Filter(rewrite(cond), Project(child.output ++ aliases, child)))
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case p @ Project(projList, Filter(cond, child)) =>
      sharedParses(cond, projList) match {
        case Seq() => p
        case shared =>
          val (rewrite, lower) = extract(shared, cond, child)
          Project(projList.map(rewrite(_).asInstanceOf[NamedExpression]), lower)
      }
    // the grouping form: GROUP BY a parsed field WHERE the parse also
    // gates rows — pushdown duplicates the parse into the filter the
    // same way it does under a Project
    case a @ Aggregate(grouping, aggExprs, Filter(cond, child), hint) =>
      sharedParses(cond, grouping ++ aggExprs) match {
        case Seq() => a
        case shared =>
          val (rewrite, lower) = extract(shared, cond, child)
          Aggregate(
            grouping.map(rewrite),
            aggExprs.map(rewrite(_).asInstanceOf[NamedExpression]),
            lower, hint)
      }
  }
}

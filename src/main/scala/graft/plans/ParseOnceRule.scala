package graft.plans

import graft.functions.PlanBarrier
import org.apache.spark.sql.catalyst.expressions.{Alias, And, CaseWhen, Coalesce, Expression, GetJsonObject, If, NamedExpression, Or, PredicateHelper}
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
  * `Project(..p..) ← Filter(parse-dependent conjuncts, on p) ←
  *  Project(child.*, barrier(parse) p) ← Filter(parse-free conjuncts) ← child`
  *
  * Parse-free deterministic conjuncts land BELOW the barrier Project
  * (still pushable to the scan / partition pruning); only parses in
  * unconditionally-evaluated positions of the filter condition are
  * extracted (guarded strict parses stay guarded).
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
object ParseOnceRule extends Rule[LogicalPlan] with PredicateHelper {

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

  /** Like [[collectParses]], but only parses in UNCONDITIONALLY
    * evaluated positions: the extraction hoists the parse into a
    * Project that runs on every child row, so a parse the original
    * plan guarded (a CASE WHEN branch, an If arm, the short-circuited
    * side of AND/OR, a non-first Coalesce operand) must not qualify —
    * for strict `parse_json` under Spark 4 ANSI, un-guarding it turns
    * rows the guard would have skipped into MALFORMED_RECORD_IN_PARSING
    * failures. Only the sub-expressions guaranteed to evaluate whenever
    * the whole expression evaluates are descended into. */
  private def collectUnconditionalParses(e: Expression): Seq[Expression] =
    if (isExpensiveParse(e)) Seq(e)
    else e match {
      case CaseWhen(branches, _) => collectUnconditionalParses(branches.head._1)
      case If(pred, _, _)        => collectUnconditionalParses(pred)
      case And(left, _)          => collectUnconditionalParses(left)
      case Or(left, _)           => collectUnconditionalParses(left)
      case c: Coalesce           => collectUnconditionalParses(c.children.head)
      case _ => e.children.flatMap(collectUnconditionalParses)
    }

  /** Parses computed by BOTH `cond` and `upper`, deduplicated by
    * canonical form. Condition-side occurrences must be unconditional
    * (hoist safety — see [[collectUnconditionalParses]]); upper-side
    * occurrences may sit anywhere, since replacing them with the
    * already-computed attribute never adds an evaluation. Deterministic
    * only: a barriered parse from a prior pass is already
    * nondeterministic and skipped, which is what makes the rule a
    * fixpoint no-op on its own output. */
  private def sharedParses(cond: Expression,
      upper: Seq[Expression]): Seq[Expression] = {
    val above = upper.flatMap(collectParses).map(_.canonicalized).toSet
    collectUnconditionalParses(cond).filter(_.deterministic)
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
    // Split the condition around the barrier Project: the barrier makes
    // the Project nondeterministic, so PushDownPredicates cannot move
    // ANY filter placed above it — a parse-free sargable or partition
    // conjunct (`dt = '2024-01-05'`) left above would silently lose
    // scan pushdown and partition pruning. Deterministic conjuncts that
    // reference no extracted parse therefore stay in a Filter BELOW the
    // new Project, where they remain pushable; only parse-dependent
    // (and nondeterministic) conjuncts sit above.
    val (below, above) = splitConjunctivePredicates(cond)
      .partition(c => c.deterministic && rewrite(c).fastEquals(c))
    val lowerChild =
      if (below.isEmpty) child else Filter(below.reduce(And), child)
    val barrierProject = Project(child.output ++ aliases, lowerChild)
    // `shared` came from `cond`, so at least one conjunct was rewritten
    val upperPlan =
      if (above.isEmpty) barrierProject
      else Filter(above.map(rewrite).reduce(And), barrierProject)
    (rewrite, upperPlan)
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

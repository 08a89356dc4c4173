package graft.functions

import org.apache.spark.sql.{Column, GraftBridge, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.DataType

/** Identity wrapper that pins an expensive projection in place.
  *
  * Catalyst's `PushDownPredicates` inlines a deterministic aliased
  * expression into any filter that references the alias — correct, but
  * for a parse-heavy column (`try_parse_json`) it duplicates the parse:
  * the pushed-down filter re-parses every input row, then the
  * projection above parses the survivors again. Whole-stage codegen
  * does NOT eliminate the duplicate across the Filter/Project operator
  * boundary (subexpression elimination is per-operator), so the cost is
  * real: 2× parse per surviving row at 100 TB ingest.
  *
  * `PlanBarrier` is evaluation-transparent (eval and codegen forward to
  * the child verbatim) but reports `deterministic = false`, which is
  * the Catalyst-sanctioned signal that an expression must not be
  * duplicated or moved: predicate pushdown, `CollapseProject` and CSE
  * all leave the projection where it stands. The child itself IS
  * deterministic — results are unchanged, only plan shape is pinned.
  * (Same pattern Spark itself uses to keep `rand()` projections
  * stationary; here we borrow the mechanism for cost, not semantics.)
  *
  * KNOWN SIDE EFFECT: `PushDownPredicates` requires EVERY field of a
  * Project to be deterministic, so one barriered column blocks
  * pushdown of ALL filters through that Project — including filters
  * on untouched columns that would otherwise reach the parquet scan
  * or prune partitions. Apply sargable/partition filters BELOW the
  * barrier projection (filter the source relation first, then project
  * the barriered parse); put only the post-parse predicates above it.
  * f16/f17 follow this: their only filters read the parsed column, so
  * nothing is lost there.
  */
case class PlanBarrier(child: Expression) extends UnaryExpression {

  override lazy val deterministic: Boolean = false

  override def dataType: DataType = child.dataType
  override def nullable: Boolean = child.nullable

  override def eval(input: InternalRow): Any = child.eval(input)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    ev.copy(code = c.code, isNull = c.isNull, value = c.value)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object PlanBarrier {

  /** Column form: `materializedOnce(expensive)` — compute here, never
    * inline a copy into a pushed-down predicate. */
  def materializedOnce(c: Column): Column =
    GraftBridge.column(PlanBarrier(GraftBridge.expression(c)))

  private[graft] def build(exprs: Seq[Expression]): Expression = {
    require(exprs.length == 1,
      s"graft_barrier expects exactly 1 argument, got ${exprs.length}")
    PlanBarrier(exprs.head)
  }

  /** Register `graft_barrier` for SQL use in this session. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_barrier", build, "built-in")
}

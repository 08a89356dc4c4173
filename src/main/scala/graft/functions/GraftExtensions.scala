package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Session-extension entry point: registers the engine's custom
  * Catalyst expressions into any session built with
  * `.withExtensions(new GraftExtensions)` or started with
  * `--conf spark.sql.extensions=graft.functions.GraftExtensions`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction((
      FunctionIdentifier("vec_dot"),
      new ExpressionInfo(classOf[VecDot].getName, "vec_dot"),
      (exprs: Seq[Expression]) => VecMath.build(exprs)))
    e.injectFunction((
      FunctionIdentifier("vec_cosine"),
      new ExpressionInfo(classOf[VecDot].getName, "vec_cosine"),
      (exprs: Seq[Expression]) => VecMath.buildCosine(exprs)))
    e.injectFunction((
      FunctionIdentifier("vec_pq_encode"),
      new ExpressionInfo(classOf[VecPqEncode].getName, "vec_pq_encode"),
      (exprs: Seq[Expression]) => VecPq.buildEncode(exprs)))
    e.injectFunction((
      FunctionIdentifier("vec_pq_fold"),
      new ExpressionInfo(classOf[VecPqFold].getName, "vec_pq_fold"),
      (exprs: Seq[Expression]) => VecPq.buildFold(exprs)))
    e.injectFunction((
      FunctionIdentifier("vec_nearest_idx"),
      new ExpressionInfo(classOf[VecNearestIdx].getName, "vec_nearest_idx"),
      (exprs: Seq[Expression]) => VecNearest.build(exprs)))
    e.injectFunction((
      FunctionIdentifier("graft_barrier"),
      new ExpressionInfo(classOf[PlanBarrier].getName, "graft_barrier"),
      (exprs: Seq[Expression]) => PlanBarrier.build(exprs)))
    // parse-once for naive queries: extracts JSON parses shared by a
    // filter and its projection into one barriered column
    e.injectOptimizerRule(_ => graft.plans.ParseOnceRule)
  }
}

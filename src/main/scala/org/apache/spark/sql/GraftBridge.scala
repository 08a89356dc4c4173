package org.apache.spark.sql

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeMap, AttributeSet, Expression, SortOrder}
import org.apache.spark.sql.catalyst.plans.physical.{Partitioning, UnknownPartitioning}

/** Bridge into Spark's `private[sql]` Column ↔ Expression converters.
  * Spark 4 `Column`s wrap `ColumnNode`s, and the classic-backend
  * converters live behind `private[sql]`; extension libraries that
  * define custom Catalyst expressions need this one-file shim in the
  * `org.apache.spark.sql` package to expose typed `Column` builders.
  */
object GraftBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** Wrap an already-computed `RDD[InternalRow]` back into a DataFrame
    * carrying `origin`'s schema AND physical partitioning/ordering
    * metadata, so a downstream join/groupBy on the preserved keys
    * doesn't re-shuffle. Used by `Materialize.releasable`: the caller
    * owns `rows`' storage level and can unpersist it when the pipeline
    * no longer needs it — `Dataset.localCheckpoint` offers no such
    * handle.
    *
    * The partitioning cannot come from `origin.queryExecution
    * .executedPlan.outputPartitioning` wholesale: under AQE that root
    * is `AdaptiveSparkPlanExec`, which reports `UnknownPartitioning`
    * even after finalization (`Dataset.checkpoint` has the same blind
    * spot — MaterializeSpec caught it as a re-shuffle above the
    * wrapped scan). Reach through to the FINAL physical plan and remap
    * its partitioning/ordering attributes onto the fresh output,
    * falling back to unknown whenever the positional output
    * correspondence doesn't hold. */
  def wrapRdd(rows: RDD[InternalRow], origin: Dataset[Row]): DataFrame = {
    val ds = origin.asInstanceOf[classic.Dataset[Row]]
    val qe = ds.queryExecution
    val finalPlan = qe.executedPlan match {
      case a: execution.adaptive.AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    val out = ds.logicalPlan.output
    val (partitioning, ordering) =
      if (finalPlan.output.size != out.size) (UnknownPartitioning(0), Nil)
      else {
        val attrMap = AttributeMap(finalPlan.output.zip(out))
        val outSet = AttributeSet(out)
        def remap(e: Expression): Expression =
          e.transform { case a: Attribute => attrMap.getOrElse(a, a) }
        val part = finalPlan.outputPartitioning match {
          case e: Expression =>
            val m = remap(e)
            if (m.references.subsetOf(outSet)) m.asInstanceOf[Partitioning]
            else UnknownPartitioning(finalPlan.outputPartitioning.numPartitions)
          case attrFree => attrFree // RoundRobin / Single / Unknown
        }
        // ordering is positional — keep only the remappable prefix
        val ord = finalPlan.outputOrdering
          .map(so => remap(so).asInstanceOf[SortOrder])
          .takeWhile(_.references.subsetOf(outSet))
        (part, ord)
      }
    val (stats, constraints) =
      execution.LogicalRDD.rewriteStatsAndConstraints(ds.logicalPlan, qe.optimizedPlan)
    classic.Dataset.ofRows(ds.sparkSession,
      execution.LogicalRDD(out, rows, partitioning, ordering,
        isStreaming = false)(ds.sparkSession, stats, constraints))
  }
}

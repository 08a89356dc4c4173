package org.apache.spark.sql

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression

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
    * metadata (`LogicalRDD.fromDataset` — the same plan node
    * `Dataset.checkpoint` produces), so a downstream join/groupBy on
    * the preserved keys doesn't re-shuffle. Used by
    * `Materialize.releasable`: the caller owns `rows`' storage level
    * and can unpersist it when the pipeline no longer needs it —
    * `Dataset.localCheckpoint` offers no such handle. */
  def wrapRdd(rows: RDD[InternalRow], origin: Dataset[Row]): DataFrame = {
    val ds = origin.asInstanceOf[classic.Dataset[Row]]
    classic.Dataset.ofRows(ds.sparkSession,
      execution.LogicalRDD.fromDataset(rows, ds, isStreaming = false))
  }
}

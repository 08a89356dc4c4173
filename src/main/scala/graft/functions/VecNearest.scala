package graft.functions

import org.apache.spark.sql.{Column, GraftBridge, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, IntegerType}

/** Codegen'd nearest-centroid kernel — the coarse-quantizer argmin of
  * every IVF assignment (append, Lloyd iteration, compaction relabel,
  * streaming ingest).
  *
  * The relational form (crossJoin with the k-row centroid relation →
  * interpreted `zip_with`/`aggregate` d2 fold → `groupBy(vec_id)`
  * argmin via `min_by`) pays three avoidable costs: the n×k row
  * expansion, ~100 ns/element HOF interpretation over n×k×dim
  * elements, and a batch-wide shuffle for the regroup. This expression
  * computes the same argmin as ONE map-side projection over a
  * broadcast one-row centroid-list relation: no expansion surviving
  * the stage, no interpretation, no shuffle.
  *
  * Returns the 1-BASED POSITION of the nearest centroid in the
  * label-sorted list (`element_at(clabels, idx)` recovers the label at
  * its original type). Exactness contract, equivalence-tested against
  * the relational reference (`Similarity.assignToCentroidsRelational`):
  * d2 is the sequential-double left fold Σ(c−x)² in element order
  * (bit-identical to the `zip_with`/`aggregate` chain and the DuckDB
  * oracle mirror); ties take the lowest position — with the list
  * label-sorted this IS `min_by(label, struct(d2, label))`; NaN sorts
  * greatest (Spark struct-ordering semantics). Dimension mismatch and
  * an empty centroid list throw (a corrupted index, not a definable
  * answer).
  */
case class VecNearestIdx(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val ok = (left.dataType, right.dataType) match {
      case (ArrayType(FloatType, _), ArrayType(ArrayType(DoubleType, _), _)) => true
      case _ => false
    }
    if (ok) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"vec_nearest_idx expects (array<float>, array<array<double>>), got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }

  override def dataType: DataType = IntegerType

  override def nullIntolerant: Boolean = true

  override protected def nullSafeEval(emb: Any, cents: Any): Any =
    VecNearestIdx.nearest(emb.asInstanceOf[ArrayData], cents.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (emb, cents) => {
      s"${ev.value} = graft.functions.VecNearestIdx.nearest($emb, $cents);"
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object VecNearestIdx {
  /** Shared eval/codegen kernel (static call from generated code). */
  def nearest(emb: ArrayData, cents: ArrayData): Int = {
    val k = cents.numElements()
    if (k == 0) {
      throw new IllegalArgumentException("vec_nearest_idx: empty centroid list")
    }
    val n = emb.numElements()
    var bestI = 0
    var bestD = 0.0
    var i = 0
    while (i < k) {
      val cw = cents.getArray(i)
      if (cw.numElements() != n) {
        throw new IllegalArgumentException(
          s"vec_nearest_idx: centroid ${i + 1} has ${cw.numElements()} dims, vector has $n")
      }
      var d2 = 0.0
      var j = 0
      while (j < n) {
        val d = cw.getDouble(j) - emb.getFloat(j).toDouble
        d2 += d * d
        j += 1
      }
      if (bestI == 0 || d2 < bestD || (bestD.isNaN && !d2.isNaN)) {
        bestD = d2
        bestI = i + 1
      }
      i += 1
    }
    bestI
  }
}

object VecNearest {

  /** Typed Column builder for the codegen'd nearest-centroid argmin. */
  def vec_nearest_idx(embedding: Column, cents: Column): Column =
    GraftBridge.column(VecNearestIdx(GraftBridge.expression(embedding),
      GraftBridge.expression(cents)))

  private[graft] def build(exprs: Seq[Expression]): VecNearestIdx = {
    require(exprs.length == 2,
      s"vec_nearest_idx expects exactly 2 arguments, got ${exprs.length}")
    VecNearestIdx(exprs.head, exprs(1))
  }

  /** Register `vec_nearest_idx` for SQL use. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "vec_nearest_idx", build, "built-in")
}

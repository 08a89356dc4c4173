package graft.functions

import org.apache.spark.sql.{Column, GraftBridge, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Codegen'd float-vector dot product.
  *
  * The declarative form (`aggregate(zip_with(...))`) evaluates
  * higher-order functions interpretively — ~100 ns/element; at 2M
  * candidate pairs × 64 dims that dominates the whole dedup pipeline.
  * This expression emits a tight fused loop inside whole-stage codegen
  * instead. The accumulation is a sequential left fold in double,
  * element 0 → n−1 — bit-identical to both the HOF form and DuckDB's
  * `list_reduce(list_transform(...))` oracle mirror, so swapping it in
  * changes nothing about results.
  */
case class VecDot(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(FloatType, _) => true
      case _ => false
    })
    if (ok) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"vec_dot expects two array<float> arguments, got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }

  override def dataType: DataType = DoubleType

  override def nullIntolerant: Boolean = true

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (y.numElements() != n) {
      throw new IllegalArgumentException(
        s"vec_dot: vector length mismatch ($n vs ${y.numElements()})")
    }
    var acc = 0.0
    var i = 0
    while (i < n) {
      acc += x.getFloat(i).toDouble * y.getFloat(i).toDouble
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = $a.numElements();
         |if ($b.numElements() != $n) {
         |  throw new IllegalArgumentException(
         |    "vec_dot: vector length mismatch (" + $n + " vs " + $b.numElements() + ")");
         |}
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += ((double) $a.getFloat($i)) * ((double) $b.getFloat($i));
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Codegen'd INTEGER-vector dot product — the int8-sketch scoring
  * kernel of the re-ranked IVF probe. Same motivation as [[VecDot]]
  * (the HOF form evaluates interpretively on the serving hot path),
  * simpler exactness story: integer products summed in long are exact
  * and order-independent, so the fused loop is bit-identical to the
  * HOF form and to DuckDB's `list_reduce` mirror by arithmetic alone.
  * Inputs are the |code| ≤ 127 quantization arrays — products ≤ 127²,
  * sums far below long overflow at any vector width in use. */
case class VecDotInt(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(org.apache.spark.sql.types.IntegerType, _) => true
      case _ => false
    })
    if (ok) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"vec_dot_int expects two array<int> arguments, got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }

  override def dataType: DataType = org.apache.spark.sql.types.LongType

  override def nullIntolerant: Boolean = true

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (y.numElements() != n) {
      throw new IllegalArgumentException(
        s"vec_dot_int: vector length mismatch ($n vs ${y.numElements()})")
    }
    var acc = 0L
    var i = 0
    while (i < n) {
      acc += x.getInt(i).toLong * y.getInt(i).toLong
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = $a.numElements();
         |if ($b.numElements() != $n) {
         |  throw new IllegalArgumentException(
         |    "vec_dot_int: vector length mismatch (" + $n + " vs " + $b.numElements() + ")");
         |}
         |long $acc = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += ((long) $a.getInt($i)) * ((long) $b.getInt($i));
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object VecMath {

  /** Typed Column builder for the codegen'd dot product. */
  def vec_dot(a: Column, b: Column): Column =
    GraftBridge.column(VecDot(GraftBridge.expression(a), GraftBridge.expression(b)))

  /** Typed Column builder for the codegen'd integer dot product. */
  def vec_dot_int(a: Column, b: Column): Column =
    GraftBridge.column(VecDotInt(GraftBridge.expression(a), GraftBridge.expression(b)))

  private[graft] def build(exprs: Seq[Expression]): VecDot = {
    require(exprs.length == 2,
      s"vec_dot expects exactly 2 arguments, got ${exprs.length}")
    VecDot(exprs.head, exprs(1))
  }

  /** Cosine similarity composed from three codegen'd dot products —
    * the whole expression stays inside one whole-stage-codegen span
    * (the duplicated child subtrees are eliminated by codegen CSE).
    * Undefined (ANSI divide error) on zero vectors, like the SQL
    * mirror. */
  def vec_cosine(a: Column, b: Column): Column =
    GraftBridge.column(buildCosine(Seq(
      GraftBridge.expression(a), GraftBridge.expression(b))))

  private[graft] def buildCosine(exprs: Seq[Expression]): Expression = {
    require(exprs.length == 2,
      s"vec_cosine expects exactly 2 arguments, got ${exprs.length}")
    val (a, b) = (exprs.head, exprs(1))
    import org.apache.spark.sql.catalyst.expressions.{Divide, Multiply, Sqrt}
    Divide(VecDot(a, b), Multiply(Sqrt(VecDot(a, a)), Sqrt(VecDot(b, b))))
  }

  /** Register `vec_dot` / `vec_cosine` for SQL use in this session. */
  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "vec_dot", build, "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "vec_cosine", buildCosine, "built-in")
  }
}

package graft.functions

import org.apache.spark.sql.{Column, GraftBridge, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, IntegerType}

/** Codegen'd product-quantization ENCODE kernel — the hot loop of the
  * `pq_g` writes in `persistIvfIndex`/`compactIvfIndex`.
  *
  * Replaces the interpreted HOF chain (`transform`/`array_min`/
  * `aggregate` with per-element `element_at`) that paid ~µs/row on the
  * 8-subspace × k-codeword argmin. Semantics are BIT-IDENTICAL to the
  * HOF form (`Similarity.pqCodesColHof`, equivalence-tested in
  * VecPqSpec) and to the DuckDB oracle mirror:
  *
  *  - M_eff = max(min(8, dim), 1), subW = floor(dim / M_eff); trailing
  *    dims beyond M_eff·subW are ignored (stage-1 contract).
  *  - codes[m] = 1-based position of the codeword minimizing the
  *    sequential-double-fold squared L2 between codeword subvector m
  *    and the row's NORMALIZED embedding subvector m
  *    (`emb[i]/max(norm, 1e-30)`); ties → lowest position, NaN sorts
  *    greatest (Spark struct-min ordering).
  *  - empty embedding → empty code array; empty codebook → null codes
  *    (the `array_min(transform([], …))` degenerate, kept for parity).
  *
  * Inputs: embedding `array<float>`, norm `double`, codebook
  * `array<array<double>>` (the one-row broadcast relation from
  * `Similarity.pqCodebook`).
  */
case class VecPqEncode(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression {

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val ok = (first.dataType, second.dataType, third.dataType) match {
      case (ArrayType(FloatType, _), DoubleType, ArrayType(ArrayType(DoubleType, _), _)) => true
      case _ => false
    }
    if (ok) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"vec_pq_encode expects (array<float>, double, array<array<double>>), got " +
        s"(${first.dataType.simpleString}, ${second.dataType.simpleString}, " +
        s"${third.dataType.simpleString})")
  }

  override def dataType: DataType = ArrayType(IntegerType, containsNull = true)

  override def nullIntolerant: Boolean = true

  override protected def nullSafeEval(e: Any, nrm: Any, cbk: Any): Any = {
    val emb = e.asInstanceOf[ArrayData]
    val cb = cbk.asInstanceOf[ArrayData]
    VecPqEncode.encode(emb, nrm.asInstanceOf[Double], cb)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (emb, nrm, cb) => {
      s"${ev.value} = graft.functions.VecPqEncode.encode($emb, $nrm, $cb);"
    })

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): Expression =
    copy(first = newFirst, second = newSecond, third = newThird)
}

object VecPqEncode {
  /** One static kernel shared by eval and codegen: the generated code
    * calls straight into this tight loop (the win over the HOF form is
    * eliminating per-element Catalyst interpretation, which a single
    * static call preserves — same pattern Spark uses for its own
    * complex array kernels). */
  def encode(emb: ArrayData, norm: Double, cb: ArrayData): GenericArrayData = {
    val n = emb.numElements()
    if (n == 0) return new GenericArrayData(new Array[Any](0))
    val mEff = math.max(math.min(VecPq.M, n), 1)
    val subW = n / mEff
    val k = cb.numElements()
    val norm2 = math.max(norm, 1e-30)
    val codes = new Array[Any](mEff)
    var m = 0
    while (m < mEff) {
      // array_min over struct(d2, position): lowest d2, ties → lowest
      // position, NaN greatest — replicated by the ascending scan below
      var bestD2 = 0.0
      var bestI = 0
      var i = 0
      while (i < k) {
        val cw = cb.getArray(i)
        if (m * subW + subW > cw.numElements()) {
          throw new IllegalArgumentException(
            s"vec_pq_encode: codeword ${i + 1} has ${cw.numElements()} dims, " +
              s"need ${m * subW + subW}")
        }
        var d2 = 0.0
        var j = 0
        while (j < subW) {
          val idx = m * subW + j
          val d = cw.getDouble(idx) - emb.getFloat(idx).toDouble / norm2
          d2 += d * d
          j += 1
        }
        if (bestI == 0 || d2 < bestD2 ||
            (bestD2.isNaN && !d2.isNaN)) {
          bestD2 = d2
          bestI = i + 1
        }
        i += 1
      }
      codes(m) = if (bestI == 0) null else Integer.valueOf(bestI)
      m += 1
    }
    new GenericArrayData(codes)
  }
}

/** Codegen'd PQ asymmetric-distance FOLD — the per-row scoring kernel
  * of every PQ stage-1 probe: Σₘ lut[m][code[m]], the sequential
  * double fold of `Similarity.approxCosPqHof`'s aggregate (division by
  * qnorm stays declarative outside, like `vec_cosine` composes around
  * `vec_dot`). 8 array lookups + adds per corpus row, fused into
  * whole-stage codegen instead of interpreted `element_at` chains.
  * Empty code array folds to 0.0 (the guarded branch of the HOF form).
  */
case class VecPqFold(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val ok = (left.dataType, right.dataType) match {
      case (ArrayType(IntegerType, _), ArrayType(ArrayType(DoubleType, _), _)) => true
      case _ => false
    }
    if (ok) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"vec_pq_fold expects (array<int>, array<array<double>>), got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }

  override def dataType: DataType = DoubleType

  override def nullIntolerant: Boolean = true

  override protected def nullSafeEval(codes: Any, lut: Any): Any =
    VecPqFold.fold(codes.asInstanceOf[ArrayData], lut.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (codes, lut) => {
      s"${ev.value} = graft.functions.VecPqFold.fold($codes, $lut);"
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object VecPqFold {
  def fold(codes: ArrayData, lut: ArrayData): Double = {
    val mN = codes.numElements()
    if (mN > lut.numElements()) {
      throw new IllegalArgumentException(
        s"vec_pq_fold: $mN codes but LUT has ${lut.numElements()} subspaces")
    }
    var acc = 0.0
    var m = 0
    while (m < mN) {
      if (codes.isNullAt(m)) {
        throw new IllegalArgumentException(s"vec_pq_fold: null code at subspace ${m + 1}")
      }
      val code = codes.getInt(m)
      val lutM = lut.getArray(m)
      if (code < 1 || code > lutM.numElements()) {
        throw new IllegalArgumentException(
          s"vec_pq_fold: code $code out of range 1..${lutM.numElements()} at subspace ${m + 1}")
      }
      acc += lutM.getDouble(code - 1)
      m += 1
    }
    acc
  }
}

object VecPq {

  /** THE product-quantization subspace count — the single constant
    * every PQ site derives its geometry from: the codegen encoder
    * above, and (via `Similarity.pqM`) the HOF reference form, the LUT
    * widths, the trained sub-codebooks, and the DuckDB oracle mirrors.
    * One definition so a future change cannot desynchronize the
    * codegen kernel from the relational/oracle forms. */
  val M: Int = 8

  /** Typed Column builder for the codegen'd PQ encoder. */
  def vec_pq_encode(embedding: Column, norm: Column, cb: Column): Column =
    GraftBridge.column(VecPqEncode(GraftBridge.expression(embedding),
      GraftBridge.expression(norm), GraftBridge.expression(cb)))

  /** Typed Column builder for the codegen'd PQ LUT fold. */
  def vec_pq_fold(codes: Column, lut: Column): Column =
    GraftBridge.column(VecPqFold(GraftBridge.expression(codes),
      GraftBridge.expression(lut)))

  private[graft] def buildEncode(exprs: Seq[Expression]): VecPqEncode = {
    require(exprs.length == 3,
      s"vec_pq_encode expects exactly 3 arguments, got ${exprs.length}")
    VecPqEncode(exprs.head, exprs(1), exprs(2))
  }

  private[graft] def buildFold(exprs: Seq[Expression]): VecPqFold = {
    require(exprs.length == 2,
      s"vec_pq_fold expects exactly 2 arguments, got ${exprs.length}")
    VecPqFold(exprs.head, exprs(1))
  }

  /** Register `vec_pq_encode` / `vec_pq_fold` for SQL use. */
  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "vec_pq_encode", buildEncode, "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "vec_pq_fold", buildFold, "built-in")
  }
}

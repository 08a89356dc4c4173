package graft

import graft.ops.Similarity
import graft.functions.VecPq
import org.apache.spark.sql.functions._

/** The codegen'd PQ kernels (VecPqEncode / VecPqFold) must be
  * bit-identical to the declarative HOF chains they replaced — the
  * DuckDB oracle for the `sim_topk_ivf_rerank_pq` family replays the
  * HOF semantics, so any divergence here is a correctness break, not
  * just a perf delta. */
class VecPqSpec extends SparkSuite {
  import spark.implicits._

  private def indexed = {
    val idx = Similarity.buildIvfIndex(spark, sf("sf0.001"))
    (idx, idx.corpus.crossJoin(broadcast(Similarity.pqCodebook(idx.centroids))))
  }

  test("vec_pq_encode equals the HOF argmin chain bit-for-bit on a real index") {
    // fallback=false: a Janino failure in the generated kernel call
    // THROWS instead of silently degrading to interpreted eval — this
    // test therefore pins that the codegen path really compiles
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try {
      val (_, withCb) = indexed
      val both = withCb.select(
        VecPq.vec_pq_encode(col("embedding"), col("norm"), col("cb")).as("codegen"),
        Similarity.pqCodesColHof.as("hof"))
      assert(both.filter(not(col("codegen") <=> col("hof"))).count() === 0)
      // and the codes are non-degenerate: more than one distinct word used
      assert(both.select(countDistinct(col("codegen"))).head().getLong(0) > 1)
    } finally spark.conf.unset("spark.sql.codegen.fallback")
  }

  test("vec_pq_fold equals the HOF LUT fold bit-for-bit across real queries") {
    val (idx, withCb) = indexed
    val codes = withCb.select(col("vec_id"),
      VecPq.vec_pq_encode(col("embedding"), col("norm"), col("cb")).as("pqc"))
    // per-query LUTs for a handful of real query vectors
    val qlut = idx.corpus.filter(col("vec_id") < 5)
      .select(col("vec_id").as("qid"), col("embedding").as("qe"),
        col("norm").as("qnorm"))
      .crossJoin(broadcast(Similarity.pqCodebook(idx.centroids)))
      .withColumn("lut", Similarity.pqLutCol(col("qe")))
      .select("qid", "lut", "qnorm")
    val codegenScore = // the exact composition approxCosPq uses
      when(size(col("pqc")) === 0, lit(0.0))
        .otherwise(VecPq.vec_pq_fold(col("pqc"), col("lut"))) /
        greatest(col("qnorm"), lit(1e-30))
    val both = codes.crossJoin(broadcast(qlut))
      .select(codegenScore.as("codegen"), Similarity.approxCosPqHof.as("hof"))
    assert(both.filter(not(col("codegen") <=> col("hof"))).count() === 0)
  }

  test("vec_pq_encode ties break to the lowest codeword position") {
    // two IDENTICAL codewords: every subspace ties, code must be 1
    val cb = Array(Array(0.6, 0.8), Array(0.6, 0.8))
    val d = Seq((Array(3.0f, 4.0f), 5.0)).toDF("embedding", "norm")
      .withColumn("cb", typedLit(cb))
      .select(VecPq.vec_pq_encode(col("embedding"), col("norm"), col("cb")).as("c"))
      .head().getSeq[Int](0)
    // dim 2 < M=8 → M_eff = 2 one-dim subspaces, both tied → position 1
    assert(d === Seq(1, 1))
  }

  test("vec_pq_encode and vec_pq_fold are null-safe and empty-safe") {
    val cb = Array(Array(1.0, 0.0))
    val n = Seq((Option.empty[Array[Float]], 1.0)).toDF("embedding", "norm")
      .withColumn("cb", typedLit(cb))
      .select(VecPq.vec_pq_encode(col("embedding"), col("norm"), col("cb")).as("c"))
    assert(n.head().isNullAt(0))
    val e = Seq((Array.empty[Float], 1.0)).toDF("embedding", "norm")
      .withColumn("cb", typedLit(cb))
      .select(VecPq.vec_pq_encode(col("embedding"), col("norm"), col("cb")).as("c"))
    assert(e.head().getSeq[Int](0) === Seq.empty[Int])
    val f = Seq((Array.empty[Int], Array(Array(1.0))))
      .toDF("pqc", "lut")
      .select(VecPq.vec_pq_fold(col("pqc"), col("lut")).as("f"))
    assert(f.head().getDouble(0) === 0.0)
  }

  test("vec_nearest_idx assignment equals the relational min_by form on a real index") {
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try {
      val idx = Similarity.buildIvfIndex(spark, sf("sf0.001"))
      val vecs = idx.corpus.select("vec_id", "embedding")
      val viaKernel = Similarity.assignToCentroids(idx.centroids, vecs)
        .select("vec_id", "label").collect()
        .map(r => r.getLong(0) -> r.getAs[Number](1).longValue).toMap
      val viaRelational = Similarity.assignToCentroidsRelational(idx.centroids, vecs)
        .select("vec_id", "label").collect()
        .map(r => r.getLong(0) -> r.getAs[Number](1).longValue).toMap
      assert(viaKernel.size === viaRelational.size)
      val diffs = viaKernel.collect {
        case (id, l) if viaRelational(id) != l => (id, l, viaRelational(id))
      }
      assert(diffs.isEmpty, s"assignment diverged on ${diffs.take(5)}")
    } finally spark.conf.unset("spark.sql.codegen.fallback")
  }

  test("vec_nearest_idx ties break to the lowest position and it registers as SQL") {
    graft.functions.VecNearest.register(spark)
    // two identical centroids then a farther one: tie -> position 1
    val got = Seq(Tuple1(Array(1.0f, 0.0f))).toDF("e")
      .selectExpr("vec_nearest_idx(e, array(" +
        "array(CAST(1.0 AS DOUBLE), CAST(0.0 AS DOUBLE))," +
        "array(CAST(1.0 AS DOUBLE), CAST(0.0 AS DOUBLE))," +
        "array(CAST(9.0 AS DOUBLE), CAST(9.0 AS DOUBLE)))) AS i")
      .head().getInt(0)
    assert(got === 1)
    val n = Seq(Tuple1(Option.empty[Array[Float]])).toDF("e")
      .selectExpr("vec_nearest_idx(e, array(array(CAST(1.0 AS DOUBLE)))) AS i")
    assert(n.head().isNullAt(0))
  }

  test("vec_pq_encode / vec_pq_fold register as SQL functions") {
    VecPq.register(spark)
    val got = Seq((Array(3.0f, 4.0f), 5.0))
      .toDF("embedding", "norm")
      .selectExpr(
        "vec_pq_encode(embedding, norm, array(array(CAST(0.6 AS DOUBLE), CAST(0.8 AS DOUBLE)))) AS c")
      .selectExpr("vec_pq_fold(c, array(array(CAST(2.0 AS DOUBLE)), array(CAST(3.0 AS DOUBLE)))) AS s")
      .head().getDouble(0)
    // codes (1,1) → lut[1][1] + lut[2][1] = 2 + 3
    assert(got === 5.0)
  }
}

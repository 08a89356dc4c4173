package graft

import graft.ops.Similarity
import org.apache.spark.sql.functions._

/** The codegen'd VecDot must be bit-identical to the declarative
  * higher-order-function fold it replaced. */
class VecDotSpec extends SparkSuite {
  import spark.implicits._

  test("vec_dot equals the HOF fold bit-for-bit on real embeddings") {
    val e = spark.read.parquet(sf("sf0.001") + "/embeddings.parquet")
    val q = e.filter(col("vec_id") === 0)
      .select(col("embedding").as("qe"))
    val both = e.crossJoin(broadcast(q))
      .select(
        Similarity.dot(col("embedding"), col("qe")).as("codegen"),
        Similarity.dotHof(col("embedding"), col("qe")).as("hof"))
    val mismatches = both.filter(col("codegen") =!= col("hof")).count()
    assert(mismatches === 0)
  }

  test("vec_dot registers as a SQL function") {
    graft.functions.VecMath.register(spark)
    val d = Seq((Array(1.0f, 2.0f), Array(3.0f, 4.0f))).toDF("a", "b")
      .selectExpr("vec_dot(a, b) AS d").head().getDouble(0)
    assert(d === 11.0)
  }

  test("vec_dot is null-safe") {
    val d = Seq((Option.empty[Array[Float]], Array(3.0f, 4.0f)))
      .toDF("a", "b")
      .select(Similarity.dot(col("a"), col("b")).as("d"))
    assert(d.head().isNullAt(0))
  }

  test("vec_dot_int equals the HOF fold on quantized sketch codes, incl. negatives and nulls") {
    // the re-ranked probe's scoring kernel: derive real int8 codes
    // from the embeddings table the way the sketch writer does
    val e = spark.read.parquet(sf("sf0.001") + "/embeddings.parquet")
      .select(col("vec_id"),
        expr("transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 127.0 / " +
          "greatest(aggregate(embedding, CAST(0.0 AS DOUBLE), (a, v) -> greatest(a, abs(CAST(v AS DOUBLE)))), 1e-30) + 0.5) AS INT))")
          .as("q8"))
    val q = e.filter(col("vec_id") === 0).select(col("q8").as("qq"))
    val both = e.crossJoin(broadcast(q))
      .select(
        graft.functions.VecMath.vec_dot_int(col("q8"), col("qq")).as("codegen"),
        Similarity.intDotHof(col("q8"), col("qq")).as("hof"))
    assert(both.filter(col("codegen") =!= col("hof")).count() === 0)
    // hand values with negative codes
    val d = Seq((Array(-127, 3, 0), Array(2, -5, 9))).toDF("a", "b")
      .select(graft.functions.VecMath.vec_dot_int(col("a"), col("b")).as("d"))
      .head().getLong(0)
    assert(d === -269L)
    val n = Seq((Option.empty[Array[Int]], Array(1, 2)))
      .toDF("a", "b")
      .select(graft.functions.VecMath.vec_dot_int(col("a"), col("b")).as("d"))
    assert(n.head().isNullAt(0))
  }
}

/** Exactness of the integer-rounding helper against hand-computed
  * HALF_UP values, including the tie shapes that diverge under plain
  * double ROUND. */
class RoundedRatioSpec extends SparkSuite {
  import org.apache.spark.sql.functions._
  import spark.implicits._

  test("roundedRatio is exact HALF_UP on ties and agrees with the oracle formula") {
    val cases = Seq(
      (57L, 800L, 4, 0.0713),  // 0.07125 tie -> up
      (1L, 3L, 2, 0.33),
      (2L, 3L, 2, 0.67),
      (7L, 32L, 4, 0.2188),    // 0.21875 tie -> up
      (1L, 128L, 6, 0.007813), // 0.0078125 tie -> up
      (0L, 5L, 4, 0.0),
      (1L, 16L, 4, 0.0625),    // terminates exactly at n: identity
      (100L, 8L, 2, 12.5))
    for ((num, den, n, want) <- cases) {
      val got = Seq((num, den)).toDF("a", "b")
        .select(graft.QueryDef.roundedRatio(col("a"), col("b"), n).as("r"))
        .head().getDouble(0)
      assert(got === want, s"$num/$den @$n: got $got want $want")
    }
    // overflow headroom: a var_pop-scale numerator through decimal(38,0)
    val big = Seq((1L, 1L)).toDF("a", "b")
      .select(graft.QueryDef.roundedRatio(
        lit("99999999999999999999").cast("decimal(38,0)"), lit(10000000000L), 6).as("r"))
      .head().getDouble(0)
    assert(big === 1.0E10)
  }
}

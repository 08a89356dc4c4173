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
}

package graft.ops

import graft.QueryDef
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over the embedding column
  * (north-star surface): brute-force cosine top-k as the exact
  * baseline; a sign-bit LSH-bucketed variant as the scale path
  * (candidates restricted to the query's hyperplane bucket — at
  * cluster scale the bucket column is the partition/bucketing key, so
  * a query probes one partition instead of the full corpus).
  */
object Similarity {

  /** Deterministic dot product: sequential left fold in double, as a
    * codegen'd Catalyst expression (graft.functions.VecDot). Same fold
    * order as the DuckDB list_reduce mirror and as `dotHof`, so results
    * are bit-identical across all three. */
  def dot(a: Column, b: Column): Column =
    graft.functions.VecMath.vec_dot(a, b)

  /** Declarative (higher-order-function) form of `dot` — kept as the
    * reference implementation the codegen expression is tested against.
    */
  def dotHof(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0),
      (acc, v) => acc + v)

  private def withNorm(spark: SparkSession, dir: String): DataFrame =
    Tables.table(spark, dir, "embeddings")
      .withColumn("norm", sqrt(dot(col("embedding"), col("embedding"))))

  private val duckDot =
    "list_reduce(list_transform(generate_series(1, 64), i -> CAST(%s[i] AS DOUBLE) * CAST(%s[i] AS DOUBLE)), (x, y) -> x + y)"
  private def dd(a: String, b: String) = duckDot.format(a, b)

  /** Brute-force cosine top-k for a fixed query vector (vec_id 0). */
  val simTopkBruteforce = QueryDef(
    "sim_topk_bruteforce",
    Some(s"""WITH q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0)
            |SELECT e.vec_id, ROUND(${dd("e.embedding", "q.qe")}
            |  / (sqrt(${dd("e.embedding", "e.embedding")}) * sqrt(${dd("q.qe", "q.qe")})), 6) AS cos_sim
            |FROM embeddings e, q
            |WHERE e.vec_id <> 0
            |ORDER BY ${dd("e.embedding", "q.qe")}
            |  / (sqrt(${dd("e.embedding", "e.embedding")}) * sqrt(${dd("q.qe", "q.qe")})) DESC, e.vec_id
            |LIMIT 10""".stripMargin),
    (spark, dir) => {
      val e = withNorm(spark, dir)
      val q = e.filter(col("vec_id") === 0)
        .select(col("embedding").as("qe"), col("norm").as("qnorm"))
      val cos = dot(col("embedding"), col("qe")) / (col("norm") * col("qnorm"))
      e.filter(col("vec_id") =!= 0)
        .crossJoin(broadcast(q))
        .select(col("vec_id"), cos.as("cos"))
        .orderBy(col("cos").desc, col("vec_id"))
        .limit(10)
        .select(col("vec_id"), round(col("cos"), 6).as("cos_sim"))
    })

  /** Sign-bit LSH bucket: 8 bits from the signs of the first 8
    * dimensions (a fixed axis-aligned hyperplane family). */
  private def bucketExpr(prefix: String): String =
    (1 to 8).map(i => s"CASE WHEN $prefix[$i] >= 0 THEN '1' ELSE '0' END").mkString(" || ")

  private def sparkBucket(c: Column): Column =
    concat((1 to 8).map(i => when(element_at(c, i) >= 0, "1").otherwise("0")): _*)

  /** LSH-bucketed ANN: search only the query's sign-bit bucket. */
  val simTopkLsh = QueryDef(
    "sim_topk_lsh",
    Some(s"""WITH b AS (SELECT vec_id, embedding, ${bucketExpr("embedding")} AS bucket FROM embeddings),
            |q AS (SELECT embedding AS qe, bucket AS qb FROM b WHERE vec_id = 0)
            |SELECT e.vec_id, ROUND(${dd("e.embedding", "q.qe")}
            |  / (sqrt(${dd("e.embedding", "e.embedding")}) * sqrt(${dd("q.qe", "q.qe")})), 6) AS cos_sim
            |FROM b e, q
            |WHERE e.vec_id <> 0 AND e.bucket = q.qb
            |ORDER BY ${dd("e.embedding", "q.qe")}
            |  / (sqrt(${dd("e.embedding", "e.embedding")}) * sqrt(${dd("q.qe", "q.qe")})) DESC, e.vec_id
            |LIMIT 10""".stripMargin),
    (spark, dir) => {
      val e = withNorm(spark, dir)
        .withColumn("bucket", sparkBucket(col("embedding")))
      val q = e.filter(col("vec_id") === 0)
        .select(col("embedding").as("qe"), col("norm").as("qnorm"), col("bucket").as("qb"))
      val cos = dot(col("embedding"), col("qe")) / (col("norm") * col("qnorm"))
      e.filter(col("vec_id") =!= 0)
        .join(broadcast(q), col("bucket") === col("qb"))
        .select(col("vec_id"), cos.as("cos"))
        .orderBy(col("cos").desc, col("vec_id"))
        .limit(10)
        .select(col("vec_id"), round(col("cos"), 6).as("cos_sim"))
    })

  /** IVF-style ANN: coarse quantization by the `label` cluster column —
    * centroids are per-dimension means, the query probes only the 2
    * nearest clusters, exact cosine runs inside them. At cluster scale
    * `label` is the partition key, so a probe touches 2 partitions of
    * the corpus instead of all of it. Centroid means are plain double
    * averages (cluster choice is robust to last-bit noise); the output
    * cosines stay on the deterministic vec_dot fold. */
  val simTopkIvf = QueryDef(
    "sim_topk_ivf",
    Some(s"""WITH dims AS (SELECT unnest(generate_series(1, 64)) AS dim),
            |q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0),
            |cent AS (SELECT label, dim, avg(CAST(embedding[dim] AS DOUBLE)) AS cv
            |         FROM embeddings CROSS JOIN dims GROUP BY label, dim),
            |qd AS (SELECT dim, CAST(qe[dim] AS DOUBLE) AS qv FROM q CROSS JOIN dims),
            |dist AS (SELECT c.label, SUM((c.cv - qd.qv) * (c.cv - qd.qv)) AS d2
            |         FROM cent c JOIN qd ON qd.dim = c.dim GROUP BY c.label),
            |top2 AS (SELECT label FROM dist ORDER BY d2, label LIMIT 2)
            |SELECT e.vec_id, ROUND(${dd("e.embedding", "q.qe")}
            |  / (sqrt(${dd("e.embedding", "e.embedding")}) * sqrt(${dd("q.qe", "q.qe")})), 6) AS cos_sim
            |FROM embeddings e JOIN top2 ON e.label = top2.label, q
            |WHERE e.vec_id <> 0
            |ORDER BY ${dd("e.embedding", "q.qe")}
            |  / (sqrt(${dd("e.embedding", "e.embedding")}) * sqrt(${dd("q.qe", "q.qe")})) DESC, e.vec_id
            |LIMIT 10""".stripMargin),
    (spark, dir) => {
      val e = withNorm(spark, dir)
      val exploded = Tables.table(spark, dir, "embeddings")
        .select(col("label"), posexplode(col("embedding")))
        .select(col("label"), col("pos").as("dim"), col("col").cast("double").as("v"))
      val cent = exploded.groupBy("label", "dim").agg(avg(col("v")).as("cv"))
      val q = e.filter(col("vec_id") === 0)
        .select(col("embedding").as("qe"), col("norm").as("qnorm"))
      val qd = q.select(posexplode(col("qe")))
        .select(col("pos").as("dim"), col("col").cast("double").as("qv"))
      val top2 = cent.join(qd, "dim")
        .groupBy("label")
        .agg(sum((col("cv") - col("qv")) * (col("cv") - col("qv"))).as("d2"))
        .orderBy(col("d2"), col("label"))
        .limit(2)
        .select("label")
      val cos = dot(col("embedding"), col("qe")) / (col("norm") * col("qnorm"))
      e.filter(col("vec_id") =!= 0)
        .join(broadcast(top2), "label")
        .crossJoin(broadcast(q))
        .select(col("vec_id"), cos.as("cos"))
        .orderBy(col("cos").desc, col("vec_id"))
        .limit(10)
        .select(col("vec_id"), round(col("cos"), 6).as("cos_sim"))
    })

  val defs: Seq[QueryDef] = Seq(simTopkBruteforce, simTopkLsh, simTopkIvf)
}

package graft.ops

import graft.QueryDef
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-handling building blocks for cluster scale. The declared query
  * proves the two-phase salted aggregation is value-identical to the
  * plain aggregation (its oracle IS the plain GROUP BY): hot keys are
  * split across `salt` sub-groups in a first local aggregation, then
  * the partials merge in a second, tiny shuffle. Decimal-routed sums
  * make the two-phase result exactly equal, not approximately.
  */
object ScaleOps {

  /** Two-phase (salted) sum aggregation: groupBy(key, salt) → partials,
    * then groupBy(key) → final. `saltCol` must be deterministic (here a
    * row-derived modulus, in general any uniform hash). */
  def saltedSum(df: DataFrame, key: Column, saltCol: Column, buckets: Int,
      sums: Map[String, Column]): DataFrame = {
    val partialAggs = sums.map { case (n, c) => sum(c).as(n) }.toSeq
    val finalAggs = sums.keys.map(n => sum(col(n)).as(n)).toSeq
    val partial = df
      .groupBy(key.as("k"), (pmod(saltCol, lit(buckets))).as("salt"))
      .agg(partialAggs.head, partialAggs.tail: _*)
    partial
      .groupBy(col("k"))
      .agg(finalAggs.head, finalAggs.tail: _*)
  }

  val scaleSaltedAgg = QueryDef(
    "scale_salted_agg",
    // The oracle is deliberately the UNsalted aggregation: the salted
    // two-phase plan must produce exactly the same values.
    Some("""SELECT l_returnflag AS k,
           |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
           |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
           |FROM lineitem
           |GROUP BY l_returnflag
           |ORDER BY k""".stripMargin),
    (spark, dir) => {
      val l = Tables.table(spark, dir, "lineitem")
      saltedSum(
        l, col("l_returnflag"), col("l_orderkey"), 16,
        Map(
          "sum_qty" -> col("l_quantity").cast("decimal(18,2)"),
          "sum_price" -> col("l_extendedprice").cast("decimal(18,2)")))
        .select(
          col("k"),
          col("sum_qty").cast("double").as("sum_qty"),
          col("sum_price").cast("double").as("sum_price"))
        .orderBy("k")
    })

  /** Salted join: the big side gets a deterministic salt, the small
    * side is replicated across all salt values, and the join runs on
    * (key, salt) — spreading one hot key over `buckets` tasks. The
    * oracle is the UNsalted join: results must be identical. */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
      saltCol: Column, buckets: Int): DataFrame = {
    val spark = big.sparkSession
    // unique temp name: a caller column named "salt" must survive
    val saltName = "__graft_salt"
    val salted = big.withColumn(saltName, pmod(saltCol, lit(buckets)))
    val replicated = small.crossJoin(
      broadcast(spark.range(buckets.toLong).toDF(saltName)))
    salted.join(replicated, Seq(key, saltName)).drop(saltName)
  }

  val scaleSaltedJoin = QueryDef(
    "scale_salted_join",
    Some("""SELECT p.p_brand,
           |  COUNT(*) AS n_items,
           |  CAST(SUM(CAST(l.l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS total_qty
           |FROM lineitem l
           |JOIN part p ON l.l_partkey = p.p_partkey
           |GROUP BY p.p_brand
           |ORDER BY p.p_brand""".stripMargin),
    (spark, dir) => {
      val l = Tables.table(spark, dir, "lineitem")
        .withColumnRenamed("l_partkey", "p_partkey")
      val p = Tables.table(spark, dir, "part")
      saltedJoin(l, p, "p_partkey", col("l_orderkey"), 8)
        .groupBy("p_brand")
        .agg(
          count(lit(1)).as("n_items"),
          expr("CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)").as("total_qty"))
        .orderBy("p_brand")
    })

  val defs: Seq[QueryDef] = Seq(scaleSaltedAgg, scaleSaltedJoin)
}

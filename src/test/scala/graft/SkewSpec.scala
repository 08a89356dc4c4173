package graft

import org.apache.spark.sql.functions._

/** AQE must split skewed join partitions at runtime — the safety net
  * for hot keys at cluster scale (on top of the explicit salting in
  * ScaleOps). */
class SkewSpec extends SparkSuite {
  import spark.implicits._

  test("AQE flags and splits a skewed sort-merge join partition") {
    // 95% of left rows share one hot key.
    val left = spark.range(200000L)
      .select(when(col("id") % 20 =!= 0, 7L).otherwise(col("id")).as("k"),
        col("id").as("payload"))
    val right = spark.range(1000L).select(col("id").as("k"), col("id").as("rv"))
    val conf = Seq(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "64KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "64KB",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2")
    val saved = conf.map { case (k, _) => k -> spark.conf.getOption(k) }
    conf.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val joined = left.join(right, "k")
      // execute the join's own query execution so AQE finalizes it
      // (hot key 7: 190000 rows; cold keys: ids divisible by 20 < 1000)
      assert(joined.collect().length === 190050)
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"), s"expected skew-split join in:\n$plan")
    } finally {
      saved.foreach {
        case (k, Some(v)) => spark.conf.set(k, v)
        case (k, None) => spark.conf.unset(k)
      }
    }
  }
}

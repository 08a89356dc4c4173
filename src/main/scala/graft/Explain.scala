package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: time a single declared query and/or dump its physical
  * plan. Usage: runMain graft.Explain <queryName> [sfDir] [explain]
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val doExplain = args.contains("explain")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000L).selectExpr("sum(id)").collect() // warmup
    val fn = SparkEntry.queries.getOrElse(name,
      sys.error(s"unknown query '$name'; available: " +
        SparkEntry.queries.keys.toSeq.sorted.mkString(", ")))
    if (doExplain) fn(spark, sfDir).explain("formatted")
    for (i <- 1 to 3) {
      val t0 = System.nanoTime()
      // full-plan evaluation — .count() would let Catalyst prune
      // projections/sorts and time a thinner plan than declared
      val n = Bench.evaluateFully(fn(spark, sfDir))
      println(f"[explain] $name run$i: ${(System.nanoTime() - t0) / 1e9}%.2fs rows=$n")
    }
    spark.stop()
  }
}

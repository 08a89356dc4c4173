package graft
import org.apache.spark.sql.{DataFrame, SparkSession}
object Bench {

  /** Execute the FULL declared physical plan. `.count()` would let
    * Catalyst prune projections/windows/sorts down to a row-count scan
    * (so projection-only queries would measure nothing); counting the
    * plan's InternalRow RDD evaluates every operator as declared. */
  def evaluateFully(df: DataFrame): Long = df.queryExecution.toRdd.count()

  def median(xs: Seq[Double]): Double = {
    val s = xs.sorted
    if (s.size % 2 == 1) s(s.size / 2) else (s(s.size / 2 - 1) + s(s.size / 2)) / 2
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val runsPerQuery = sys.env.getOrElse("SPARK_GRAFT_BENCH_RUNS", "4").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      // pinned like Verify/Soak/Explain so timezone-dependent groupings
      // benchmark the exact workload the oracle verifies
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // One-time warmup (JIT, codegen, parquet footer/session init) so
    // the first timed query doesn't absorb initialization costs.
    spark.range(1000000L).selectExpr("sum(id)").collect()
    spark.read.parquet(s"$sfDir/region.parquet").count()
    // runsPerQuery timed runs, report the MEDIAN of the post-warmup
    // runs (run 1 pays one-time whole-stage-codegen compilation and is
    // dropped; min-of-2 proved too noisy under container load to
    // detect round-over-round regressions). A failing query reports
    // -1 so a breakage can't masquerade as a fast run.
    val results = SparkEntry.queries.map { case (name, fn) =>
      val times = (1 to runsPerQuery).map { _ =>
        val t0 = System.nanoTime()
        try {
          evaluateFully(fn(spark, sfDir))
          (System.nanoTime() - t0) / 1e9
        } catch {
          case e: Throwable =>
            System.err.println(s"[bench] $name failed: ${e.getMessage}")
            -1.0
        }
      }
      name -> (if (times.contains(-1.0)) -1.0 else median(times.drop(1)))
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    // failed queries (-1 markers) must not subtract from the total
    val total = results.values.filter(_ >= 0).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}

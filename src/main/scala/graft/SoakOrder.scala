package graft

import org.apache.spark.sql.SparkSession

/** Session-order drift experiment: is a query's soak ratio a property
  * of its PLAN, or of where it ran in the measuring session?
  *
  * Times a probe query FIRST in a fresh session (median of 2
  * post-warmup evaluations, Bench discipline), then evaluates the full
  * [[Soak]] query list once each against the same blown-up tables as
  * session load, then times the probe again LAST — same JVM, same
  * data, same shuffle-partition conf. first ≈ last (≲1.3×) means
  * full-session soak ratios measure intrinsic plan cost; last ≫ first
  * localizes the drift to session-state accumulation (pinned
  * materialization blocks shrinking the execution-memory pool, shuffle
  * files, JIT/GC pressure) rather than to the probe's plan.
  *
  * Motivated by `dedup_clusters` at ×30: 23.7× in the round-3
  * full-session soak vs 11.6× measured targeted. Outcome (round 5,
  * recorded in PERF.md): first 77.34 s, last 40.79 s — last/first
  * 0.53, i.e. NO accumulation penalty; the drift was session
  * POSITION (cold codegen/JIT early in a session), so warmed targeted
  * medians are the plan-cost numbers and single-pass full-session
  * soak ratios carry up to ~2× cold-start inflation.
  *
  * Usage: runMain graft.SoakOrder [factor] [baseSfDir] [probe]
  */
object SoakOrder {
  def main(args: Array[String]): Unit = {
    val factor = if (args.nonEmpty) args(0).toInt else 30
    val baseDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val probe = if (args.length > 2) args(2) else "dedup_clusters"
    require(SparkEntry.queries.contains(probe), s"unknown probe: $probe")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000L).selectExpr("sum(id)").collect()

    val soakDir = s"/tmp/graft-soak-x$factor"
    Soak.blowUp(spark, baseDir, soakDir, factor)
    // the whole experiment runs at soak scale → scaled partitions
    // throughout (same count for first, load, and last)
    spark.conf.set("spark.sql.shuffle.partitions",
      math.max(cpus, factor))

    def timeProbe(): Double = {
      val runs = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        Bench.evaluateFully(SparkEntry.queries(probe)(spark, soakDir))
        (System.nanoTime() - t0) / 1e9
      }
      Bench.median(runs.drop(1))
    }

    val first = timeProbe()
    println(f"[order] $probe%-22s x$factor FIRST=$first%6.2fs")
    val t0 = System.nanoTime()
    for (name <- Soak.queries if name != probe) {
      try Bench.evaluateFully(SparkEntry.queries(name)(spark, soakDir))
      catch { case e: Throwable =>
        println(s"[order] load $name failed: ${e.getMessage}")
      }
    }
    println(f"[order] session load: ${Soak.queries.size - 1} queries in ${(System.nanoTime() - t0) / 1e9}%.0fs")
    val last = timeProbe()
    println(f"[order] $probe%-22s x$factor first=$first%6.2fs last=$last%6.2fs last/first=${last / first}%5.2f")
    spark.stop()
  }
}

package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

/** Measurement harness for VERDICT r15 item 2: split the ~0.4-0.5 s
  * per-query fixed cost of the bench tail into (a) driver-side
  * plan/analysis time (QueryExecutionTracker phases), (b) task
  * scheduling (task count × (task wall − executor compute)), and
  * (c) real executor work. Runs each named query `runs` times warm
  * (same session, same JIT state as a bench pass) and prints one line
  * per run plus a per-query summary. Not part of the bench contract —
  * a profiling main, like Explain.
  *
  * Usage: SPARK_GRAFT_SF_DIR=... SPARK_GRAFT_CPUS=32 \
  *   sbt "runMain graft.FloorProbe q1_pricing_summary a11_rollup f15_map_ops"
  */
object FloorProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val runs = sys.env.getOrElse("SPARK_GRAFT_FLOOR_RUNS", "5").toInt
    val names = if (args.nonEmpty) args.toSeq
      else Seq("a11_rollup", "f15_map_ops", "j3_dim_enrich")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // same warmup as Bench
    spark.range(1000000L).selectExpr("sum(id)").collect()
    spark.read.parquet(s"$sfDir/region.parquet").count()

    val nJobs = new java.util.concurrent.atomic.AtomicLong()
    val nStages = new java.util.concurrent.atomic.AtomicLong()
    val nTasks = new java.util.concurrent.atomic.AtomicLong()
    val taskWallMs = new java.util.concurrent.atomic.AtomicLong()
    val execRunMs = new java.util.concurrent.atomic.AtomicLong()
    val schedDelayMs = new java.util.concurrent.atomic.AtomicLong()
    val listener = new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit =
        nJobs.incrementAndGet()
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit =
        nStages.incrementAndGet()
      override def onTaskEnd(te: SparkListenerTaskEnd): Unit = {
        nTasks.incrementAndGet()
        val info = te.taskInfo
        if (info != null && te.taskMetrics != null) {
          taskWallMs.addAndGet(info.duration)
          execRunMs.addAndGet(te.taskMetrics.executorRunTime)
          // scheduler delay as the UI computes it: task wall minus
          // run/deser/ser/getting-result
          val d = info.duration - te.taskMetrics.executorRunTime -
            te.taskMetrics.executorDeserializeTime -
            te.taskMetrics.resultSerializationTime
          schedDelayMs.addAndGet(math.max(0L, d))
        }
      }
    }
    spark.sparkContext.addSparkListener(listener)

    for (name <- names) {
      val fn = SparkEntry.queries.getOrElse(name,
        sys.error(s"unknown query $name"))
      // warm pass (codegen compile) then timed passes
      Bench.evaluateFully(fn(spark, sfDir))
      val rows = scala.collection.mutable.ListBuffer
        .empty[(Double, Double, Double, Long, Long, Long, Long, Long, Long)]
      for (_ <- 0 until runs) {
        nJobs.set(0); nStages.set(0); nTasks.set(0)
        taskWallMs.set(0); execRunMs.set(0); schedDelayMs.set(0)
        val t0 = System.nanoTime()
        val df = fn(spark, sfDir)
        val tBuilt = System.nanoTime()
        val qe = df.queryExecution
        qe.executedPlan // force analysis+optimization+planning
        val tPlanned = System.nanoTime()
        qe.toRdd.count()
        val tDone = System.nanoTime()
        Thread.sleep(300) // listener bus is async; let task-end events drain
        rows += (((tBuilt - t0) / 1e9, (tPlanned - tBuilt) / 1e9,
          (tDone - tPlanned) / 1e9, nJobs.get, nStages.get, nTasks.get,
          taskWallMs.get, execRunMs.get, schedDelayMs.get))
      }
      def med(xs: Iterable[Double]): Double =
        { val s = xs.toSeq.sorted; s(s.size / 2) }
      println(f"[floor] $name%-36s build=${med(rows.map(_._1))}%.3fs " +
        f"plan=${med(rows.map(_._2))}%.3fs exec=${med(rows.map(_._3))}%.3fs " +
        f"jobs=${rows.map(_._4).max} stages=${rows.map(_._5).max} " +
        f"tasks=${rows.map(_._6).max} " +
        f"taskWall=${med(rows.map(_._7.toDouble / 1000))}%.3fs " +
        f"execRun=${med(rows.map(_._8.toDouble / 1000))}%.3fs " +
        f"schedDelay=${med(rows.map(_._9.toDouble / 1000))}%.3fs")
      for ((r, i) <- rows.zipWithIndex)
        println(f"[floor]   run$i build=${r._1}%.3f plan=${r._2}%.3f " +
          f"exec=${r._3}%.3f jobs=${r._4} tasks=${r._6} " +
          f"taskWall=${r._7 / 1000.0}%.3f execRun=${r._8 / 1000.0}%.3f " +
          f"sched=${r._9 / 1000.0}%.3f")
    }
    spark.stop()
  }
}

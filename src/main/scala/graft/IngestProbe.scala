package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Measurement harness for VERDICT r15 item 6: where does a
  * dedup_ingest / mm_ingest micro-batch's time go at x1 (the
  * overhead-dominated regime — 67 / 20 rows/s)? Runs the exact
  * StreamBench x1 fixture and logs every Spark JOB inside each
  * micro-batch (submit time, duration, job group) plus the micro-batch
  * wall time, so the split between executed-job time and the
  * BETWEEN-jobs driver time (planning, index metadata I/O, ledger
  * reads, checkpoint commits) is visible per batch.
  *
  * Usage: SPARK_GRAFT_CPUS=32 sbt "runMain graft.IngestProbe [dedup|mm]"
  */
object IngestProbe {
  def main(args: Array[String]): Unit = {
    val which = if (args.nonEmpty) args(0) else "dedup"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    spark.range(1000000L).selectExpr("sum(id)").collect()

    case class Job(id: Int, desc: String, t0: Long, var t1: Long = -1L)
    val jobs = new java.util.concurrent.ConcurrentHashMap[Int, Job]()
    val listener = new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = {
        val desc = Option(js.properties)
          .flatMap(p => Option(p.getProperty("spark.job.description")))
          .getOrElse("").take(60)
        jobs.put(js.jobId, Job(js.jobId, desc, js.time))
      }
      override def onJobEnd(je: SparkListenerJobEnd): Unit = {
        val j = jobs.get(je.jobId); if (j != null) j.t1 = je.time
      }
    }
    spark.sparkContext.addSparkListener(listener)

    def text(i: Int): String =
      (0 until 12).map(j => s"w${(i * 7 + j * 13) % 5000}").mkString(" ")
    def body(i: Int): String =
      (0 until 24).map(j => s"w${(i * 7 + j * 13) % 5000}").mkString(" ")

    val nBatches = 3
    val (q, in, inMm, perBatch) =
      if (which == "dedup") {
        val indexDir = TempDirs.create("ip-lsh-idx")
        graft.ops.Dedup.persistLshIndex(
          (0 until 50).map(i => (100000L + i, text(i * 37))).toDF("doc_id", "text"),
          indexDir)
        val in = MemoryStream[(Long, String)]
        val q = graft.streaming.StreamOps.dedupIngest(
          in.toDS().toDF("doc_id", "text"), indexDir, TempDirs.create("ip-lsh-out"))
          .option("checkpointLocation", TempDirs.create("ip-lsh-ckpt"))
          .start()
        (q, Some(in), None, 400)
      } else {
        val indexDir = TempDirs.create("ip-mm-idx")
        graft.ops.Dedup.persistLshIndexElems(
          graft.ops.Multimodal.payloadGrams(
            (0 until 50).map(i => (100000L + i,
              Array.fill[Byte](29)(0) ++ body(i * 37).getBytes("UTF-8")))
              .toDF("doc_id", "payload")),
          indexDir)
        val in = MemoryStream[(Long, Array[Byte])]
        val q = graft.streaming.StreamOps.mmDedupIngest(
          in.toDS().toDF("doc_id", "payload"), indexDir, TempDirs.create("ip-mm-out"))
          .option("checkpointLocation", TempDirs.create("ip-mm-ckpt"))
          .start()
        (q, None, Some(in), 100)
      }
    try {
      for (b <- 0 until nBatches) {
        jobs.clear()
        val t0 = System.currentTimeMillis()
        if (which == "dedup")
          in.get.addData((0 until perBatch).map { i =>
            val g = b * perBatch + i
            val t = if (g % 5 == 4) text(g - 1).replaceFirst("\\bw", "x") else text(g)
            (g.toLong, t)
          }: _*)
        else
          inMm.get.addData((0 until perBatch).map { i =>
            val g = b * perBatch + i
            val s = if (g % 5 == 4) body(g - 1) + " xx" else body(g)
            (g.toLong, Array.fill[Byte](29)(0) ++ s.getBytes("UTF-8"))
          }: _*)
        q.processAllAvailable()
        val wall = System.currentTimeMillis() - t0
        Thread.sleep(400)
        import scala.jdk.CollectionConverters._
        val js = jobs.values.asScala.toSeq.sortBy(_.t0)
        val jobMs = js.filter(_.t1 > 0).map(j => j.t1 - j.t0).sum
        println(f"[ingest-probe] $which batch$b wall=${wall}ms " +
          f"jobs=${js.size} jobTime=${jobMs}ms betweenJobs=${wall - jobMs}ms")
        // per-job breakdown, slowest first
        for (j <- js.filter(_.t1 > 0).sortBy(j => -(j.t1 - j.t0)).take(12))
          println(f"[ingest-probe]   job${j.id}%-4d ${j.t1 - j.t0}%5dms ${j.desc}")
      }
    } finally q.stop()
    spark.stop()
  }
}

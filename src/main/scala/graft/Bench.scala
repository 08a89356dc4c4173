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
    // 4 = 1 warmup + 3 timed passes: the spread measurements in
    // PERF.md were taken at this setting; more passes cost driver
    // wall-time without materially tightening the min estimator
    val runsPerQuery = sys.env.getOrElse("SPARK_GRAFT_BENCH_RUNS", "4").toInt
    // pass 0 is untimed warmup — at least one timed pass must follow,
    // or every sample list (and calib) stays empty
    require(runsPerQuery >= 2,
      s"SPARK_GRAFT_BENCH_RUNS=$runsPerQuery: need >= 2 (1 warmup pass + timed passes)")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      // pinned like Verify/Soak/Explain so timezone-dependent groupings
      // benchmark the exact workload the oracle verifies
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // same fail-fast tripwire as Verify: a testdata layout drift should
    // cost one clear line here, not 100+ identical -1 markers
    try graft.ops.Tables.sanityCheck(spark, sfDir)
    catch { case e: Exception =>
      System.err.println(s"[bench] ${e.getMessage}")
      println(s"""{"metric":"total","value":-1,"unit":"sec","n":0,"failed":["SCHEMA TRIPWIRE"],"sf":"$sfDir"}""")
      spark.stop()
      sys.exit(2)
    }
    // One-time warmup (JIT, codegen, parquet footer/session init) so
    // the first timed query doesn't absorb initialization costs.
    spark.range(1000000L).selectExpr("sum(id)").collect()
    spark.read.parquet(s"$sfDir/region.parquet").count()
    // INTERLEAVED passes over the whole suite; per query the headline
    // number is the MIN of the post-warmup samples — load, GC and JIT
    // variance only ever INFLATE a sample, so the min is the robust
    // estimator of intrinsic plan cost and the one that makes a real
    // plan regression visible across sessions (medians still carry
    // 30-70% cross-session drift on this container). Pass 0 is untimed
    // warmup (one-time whole-stage-codegen compilation). A fixed
    // calibration job is timed once per pass; its min is reported so a
    // reader can detect a globally slow session. A failing query
    // reports -1 so a breakage can't masquerade as a fast run.
    // SPARK_GRAFT_BENCH_ONLY=a,b,c restricts the suite to the named
    // queries — the fast path for pinning one query's drift with idle
    // interleaved passes (the adjudication protocol in PERF.md) without
    // paying the full 150-query suite per sample. Unknown names fail
    // loudly: a typo must not silently measure an empty suite.
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    val queries = only match {
      case Some(names) =>
        val unknown = names.filterNot(SparkEntry.queries.contains)
        require(unknown.isEmpty,
          s"SPARK_GRAFT_BENCH_ONLY names unknown queries: ${unknown.mkString(",")}")
        SparkEntry.queries.toSeq.filter { case (n, _) => names(n) }
      case None => SparkEntry.queries.toSeq
    }
    val samples = scala.collection.mutable.Map[String, List[Double]]()
      .withDefaultValue(Nil)
    val failed = scala.collection.mutable.Set[String]()
    var calib = List.empty[Double]
    var calibIo = List.empty[Double]
    for (pass <- 0 until runsPerQuery) {
      val c0 = System.nanoTime()
      // double math: long id*id overflows under ANSI at this range
      spark.range(200000000L).selectExpr("sum(CAST(id AS DOUBLE) * id)").collect()
      if (pass > 0) calib ::= (System.nanoTime() - c0) / 1e9
      // WORKLOAD-SHAPED second probe: `calib` is pure CPU (a codegen'd
      // range-sum) and misses IO/memory-bandwidth contention, which is
      // exactly what shifted the per-calib-unit baseline 418→613 s
      // between the r12 and r13 sessions (PERF.md). This one is a real
      // parquet scan + hash-agg + one shuffle over a fixed table, so a
      // session whose drift is decode/bandwidth-shaped moves it while
      // the CPU probe sits still. Reported as `calib_io` beside
      // `calib`; benchdiff normalizes by whichever correlates.
      val i0 = System.nanoTime()
      spark.read.parquet(s"$sfDir/lineitem.parquet")
        .selectExpr("l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(Map("l_quantity" -> "sum", "l_extendedprice" -> "sum"))
        .collect()
      if (pass > 0) calibIo ::= (System.nanoTime() - i0) / 1e9
      // rotate execution order per pass so a query is not always
      // preceded by the same neighbor (GC/page-cache correlation);
      // a large stride moves each query to a very different position
      // in the session, not just one slot over. The stride must be
      // coprime with the registry size or passes silently repeat the
      // same order (e.g. 74 queries with stride 37 alternates two
      // orders) — pick the first stride >= 37 that is.
      val stride = Iterator.from(37)
        .find(s => BigInt(s).gcd(BigInt(queries.size)) == 1).get
      val shift = (pass * stride) % queries.size
      val rotated = queries.drop(shift) ++ queries.take(shift)
      for ((name, fn) <- rotated if !failed(name)) {
        val t0 = System.nanoTime()
        try {
          evaluateFully(fn(spark, sfDir))
          if (pass > 0) samples(name) ::= (System.nanoTime() - t0) / 1e9
        } catch {
          case e: Throwable =>
            System.err.println(s"[bench] $name failed: ${e.getMessage}")
            failed += name
        }
      }
    }
    val results = queries.map { case (name, _) =>
      name -> (if (failed(name) || samples(name).isEmpty) -1.0 else samples(name).min)
    }.toMap
    val medians = queries.map { case (name, _) =>
      name -> (if (failed(name) || samples(name).isEmpty) -1.0 else median(samples(name)))
    }.toMap
    def j(m: Map[String, Double]) =
      m.map { case (k, v) => s"\"" + k + "\":" + v }.mkString("{", ",", "}")
    // failed queries (-1 markers) must not subtract from the total
    val total = results.values.filter(_ >= 0).sum
    val fullLine = s"""{"metric":"total","value":$total,"unit":"sec","queries":${j(results)},"queries_median":${j(medians)},"calib":${calib.min},"calib_io":${calibIo.min},"sf":"$sfDir"}"""
    println(fullLine)
    // streaming-layer throughput (rows/sec per stateful op family,
    // RocksDB provider) — the regression surface batch plans can't
    // show (state store cost, timers, per-micro-batch overhead).
    // SPARK_GRAFT_STREAM_BENCH=0 skips it for batch-only iteration.
    // The compact batch summary is printed BEFORE the streaming leg
    // runs: the driver keeps only the output tail, and a streaming
    // hang must cost the streaming numbers, not the batch board.
    val slowest0 = results.filter(_._2 >= 0).toSeq.sortBy(-_._2).take(5)
    val failedNames0 = queries.collect { case (n, _) if failed(n) => "\"" + n + "\"" }
    println(s"""{"metric":"total","value":$total,"unit":"sec","n":${queries.size},"failed":${failedNames0.mkString("[", ",", "]")},"slowest5":${j(slowest0.toMap)},"streaming_rows_per_sec":"pending","calib":${calib.min},"calib_io":${calibIo.min},"sf":"$sfDir"}""")
    // INTERLEAVED min-of-N for the streaming families too (round 11):
    // the per-query protocol exists because single-pass numbers on a
    // shared container lie, and the streaming legs were the last
    // single-pass surface in the official record — BENCH_r10's
    // uv_dedup_tws/cep_pattern 8-9× "collapse" rode exactly that
    // exposure (unreproducible in idle interleaved passes). The
    // headline map keeps the SAME family keys (now min-of-passes) for
    // round-over-round comparability; the median map rides alongside.
    val passes = sys.env.getOrElse("SPARK_GRAFT_STREAM_PASSES", "2").toInt
    val (streaming, streamingMed) =
      if (sys.env.getOrElse("SPARK_GRAFT_STREAM_BENCH", "1") == "0") ("{}", "{}")
      else try {
        val (base, baseMed) = StreamBench.runInterleaved(spark, sfDir, 1, passes)
        // batch-size amortization curve (1×/4×/8× rows per micro-batch)
        // rides in the same tail maps; SPARK_GRAFT_STREAM_SCALING=0
        // drops it for quick streaming-only iteration
        val (scaling, scalingMed) =
          if (sys.env.getOrElse("SPARK_GRAFT_STREAM_SCALING", "1") == "0")
            (Seq.empty[(String, Long, Double)], Seq.empty[(String, Long, Double)])
          else StreamBench.runScalingInterleaved(spark, sfDir, passes)
        (StreamBench.rpsJson(base ++ scaling),
          StreamBench.rpsJson(baseMed ++ scalingMed))
      }
      catch { case e: Throwable =>
        System.err.println(s"[bench] streaming bench failed: ${e.getMessage}")
        ("""{"failed":-1}""", "{}")
      }
    // FULL-FIDELITY SUMMARY LAST (and nothing after it): the driver
    // parses the FINAL JSON line for its round-over-round per-query
    // comparison, so `queries`/`queries_median` must ride THIS line —
    // in rounds 12-15 they rode only the first line and
    // PERF_r{14,15}.json came back with an empty `per_query` map and a
    // null geomean (VERDICT r15 item 1: every per-query claim had to be
    // re-verified from builder-side records). The compact ~400-char
    // summary still prints ABOVE (it was the final line through r15;
    // kept so a tail-window reader always sees total/failed/slowest5
    // even if a long line is clipped), but the authoritative last line
    // now carries the complete per-query maps alongside the streaming
    // maps and calib probes.
    val slowest = results.filter(_._2 >= 0).toSeq.sortBy(-_._2).take(5)
    val failedNames = queries.collect { case (n, _) if failed(n) => "\"" + n + "\"" }
    val compactLine = s"""{"metric":"total","value":$total,"unit":"sec","n":${queries.size},"failed":${failedNames.mkString("[", ",", "]")},"slowest5":${j(slowest.toMap)},"stream_passes":$passes,"streaming_rows_per_sec":$streaming,"streaming_rows_per_sec_median":$streamingMed,"calib":${calib.min},"calib_io":${calibIo.min},"sf":"$sfDir"}"""
    println(compactLine)
    val finalLine = s"""{"metric":"total","value":$total,"unit":"sec","n":${queries.size},"failed":${failedNames.mkString("[", ",", "]")},"queries":${j(results)},"queries_median":${j(medians)},"slowest5":${j(slowest.toMap)},"stream_passes":$passes,"streaming_rows_per_sec":$streaming,"streaming_rows_per_sec_median":$streamingMed,"calib":${calib.min},"calib_io":${calibIo.min},"sf":"$sfDir"}"""
    println(finalLine)
    // FULL-FIDELITY RECORD, written by Bench itself: the committed
    // perf/ record (the benchdiff input, see perf/README.md) must not
    // depend on an operator remembering to copy the log. Format = the
    // first total line (full queries + queries_median maps) + the final
    // line (since r16 also full-fidelity, with the streaming maps),
    // exactly what tools/benchdiff.py::load recovers a full map from. SPARK_GRAFT_BENCH_RECORD overrides the path; ""
    // disables; the default lands next to the repo's perf/ directory
    // when one exists under the working directory (a non-repo cwd
    // skips quietly — record banking must never fail the bench).
    val recordPath = sys.env.get("SPARK_GRAFT_BENCH_RECORD").getOrElse(
      if (new java.io.File("perf").isDirectory) "perf/BENCH_last_full.json" else "")
    if (recordPath.nonEmpty) {
      try {
        java.nio.file.Files.write(java.nio.file.Paths.get(recordPath),
          (fullLine + "\n" + finalLine + "\n").getBytes("UTF-8"))
        System.err.println(s"[bench] full-fidelity record written to $recordPath")
      } catch { case e: Exception =>
        System.err.println(s"[bench] record write to $recordPath failed: ${e.getMessage}")
      }
    }
    spark.stop()
  }
}

package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import java.sql.Timestamp

/** Streaming-layer benchmark: end-to-end micro-batch THROUGHPUT
  * (rows/sec) of the stateful op families over MemoryStream sources on
  * the RocksDB state store provider — the state path a 100 TB
  * deployment runs. Batch Bench times the declared query plans; this
  * covers what that cannot see: state store put/get/TTL cost, timer
  * delivery, per-micro-batch planning overhead, and the foreachBatch
  * index round-trips of the ingest/serving loops. A state-store or
  * micro-batch-overhead regression moves these numbers round-over-round
  * while leaving the batch suite untouched.
  *
  * Four families, one per state shape:
  *   - `uv_dedup_tws`     — transformWithState keyed dedup (T2): value
  *     state per key, the highest-volume stateful op.
  *   - `cep_pattern`      — CepPattern match+timeout (T3): list state +
  *     event-time timers, watermark-driven eviction.
  *   - `dedup_ingest`     — self-building LSH near-dup ingest: per-batch
  *     index probe + delta append (foreachBatch, persisted index).
  *   - `ann_serve`        — streaming ANN serving: per-batch centroid
  *     assignment + pruned corpus probe against the persisted IVF index.
  *
  * Counts are fixed per family (scaled by SPARK_GRAFT_STREAM_SCALE) so
  * the rows/sec are comparable across rounds. Timing spans the whole
  * drive loop — addData is negligible against micro-batch execution. */
object StreamBench {

  private val Rocks =
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"

  // base test data at 2024-01-01: epoch-0 timestamps are dropped as
  // late rows by streaming watermarks
  private val baseSec =
    java.time.Instant.parse("2024-01-01T00:00:00Z").getEpochSecond

  private def ev(user: Long, id: Long, sec: Long, typ: String): graft.streaming.Ev =
    graft.streaming.Ev(user, id, new Timestamp((baseSec + sec) * 1000L), typ, 1.0, 1)

  /** The six family names, in suite order — the vocabulary
    * [[selectedFamilies]] validates `SPARK_GRAFT_STREAM_ONLY` against. */
  private val familyNames = Seq("uv_dedup_tws", "cep_pattern", "dedup_ingest",
    "ann_serve", "substring_ingest", "mm_ingest")

  /** `SPARK_GRAFT_STREAM_ONLY=fam1,fam2` restricts the streaming suite
    * to the named families — the streaming twin of Bench's
    * `SPARK_GRAFT_BENCH_ONLY` (same contract: the fast path for pinning
    * one family's drift with idle interleaved passes costs minutes, not
    * a full tail). Applies to BOTH the headline legs and the 1×/4×/8×
    * scaling legs (a scaling leg rides with its base family's name).
    * Unknown names fail loudly: a typo must not silently measure an
    * empty suite. */
  private[graft] def selectedFamilies(): Set[String] =
    parseStreamOnly(sys.env.get("SPARK_GRAFT_STREAM_ONLY"))

  private[graft] def parseStreamOnly(raw0: Option[String]): Set[String] =
    raw0 match {
      case Some(raw) =>
        val names = raw.split(",").map(_.trim).filter(_.nonEmpty).toSet
        val unknown = names.filterNot(familyNames.contains)
        require(unknown.isEmpty,
          s"SPARK_GRAFT_STREAM_ONLY names unknown families: ${unknown.toSeq.sorted.mkString(",")} " +
            s"(known: ${familyNames.mkString(",")})")
        require(names.nonEmpty, "SPARK_GRAFT_STREAM_ONLY is set but names no families")
        names
      case None => familyNames.toSet
    }

  /** (family, rows, seconds) per family; a family that fails reports
    * (-1, -1) instead of aborting the others (one broken state-store
    * path must not erase the whole streaming row). ONE pass — the
    * official record runs [[runInterleaved]] over this. */
  def run(spark: SparkSession, sfDir: String, scale: Int = 1): Seq[(String, Long, Double)] = {
    val on = selectedFamilies()
    def fam(name: String)(body: => (Long, Double)): Option[(String, Long, Double)] =
      if (on(name)) Some(safely(name)(body)) else None
    withRocks(spark)(Seq(
      fam("uv_dedup_tws")(benchUvDedup(spark, nEvents = 20000 * scale, nBatches = 4)),
      fam("cep_pattern")(benchCep(spark, keysPerBatch = 2000 * scale, nBatches = 4)),
      fam("dedup_ingest")(benchDedupIngest(spark, nDocs = 1200 * scale, nBatches = 3)),
      fam("ann_serve")(benchAnnServe(spark, sfDir, nQueries = 120 * scale, nBatches = 3)),
      fam("substring_ingest")(benchSubstringIngest(spark, nDocs = 1200 * scale, nBatches = 3)),
      fam("mm_ingest")(benchMmIngest(spark, nDocs = 300 * scale, nBatches = 3))).flatten)
  }

  /** INTERLEAVED multi-pass run — the streaming analog of Bench's
    * per-query protocol (CLAUDE.md's bench-noise gotcha): the full
    * family suite executes `passes` times end to end, so a single
    * contended container window taxes ONE pass instead of the official
    * record (exactly what happened to the r10 driver run's
    * uv_dedup_tws/cep_pattern tail — single-pass legs, 8-9× collapse,
    * unreproducible idle). Per family the headline is the FASTEST pass
    * (rows are fixed per family, so min seconds = max rows/s — load
    * only ever inflates a sample, the same argument as the batch min
    * estimator); the median rides alongside for spread. Returns
    * (best, median) rows, both in [[run]]'s (family, rows, sec) shape;
    * a family is -1 only if EVERY pass failed. */
  def runInterleaved(spark: SparkSession, sfDir: String, scale: Int = 1,
      passes: Int = 2): (Seq[(String, Long, Double)], Seq[(String, Long, Double)]) =
    summarizePasses((0 until math.max(1, passes)).map(_ => run(spark, sfDir, scale)))

  private[graft] def summarizePasses(all: Seq[Seq[(String, Long, Double)]])
      : (Seq[(String, Long, Double)], Seq[(String, Long, Double)]) = {
    val names = all.head.map(_._1)
    def pick(choose: Seq[(Long, Double)] => (Long, Double)) = names.map { n =>
      val ok = all.flatMap(_.collectFirst {
        case (`n`, rows, sec) if sec > 0 => (rows, sec)
      })
      if (ok.isEmpty) (n, -1L, -1.0)
      else { val (rows, sec) = choose(ok); (n, rows, sec) }
    }
    (pick(_.minBy(_._2)),
      pick { ok =>
        val s = ok.sortBy(_._2)
        (s.head._1, Bench.median(s.map(_._2)))
      })
  }

  /** Batch-size AMORTIZATION leg: the two foreachBatch index-loop
    * families at 1×/4×/8× rows per micro-batch with the batch COUNT
    * fixed, so the rows/sec curve measures how much of each
    * micro-batch is fixed overhead (planning + the ~20 index
    * round-trip jobs) versus per-row work — near-linear rows/sec
    * growth means overhead-bound (per-row cost amortizes as batches
    * grow, the production regime); a flat curve would mean per-row
    * state cost dominates and the headline rows/sec IS the ceiling.
    * Bases are smaller than the headline families' (the signal is the
    * RATIO across multipliers, not the absolute rows/sec) to bound the
    * leg's wall-clock. */
  def runScaling(spark: SparkSession, sfDir: String): Seq[(String, Long, Double)] = {
    val on = selectedFamilies()
    def fam(base: String, m: Int)(body: => (Long, Double)): Option[(String, Long, Double)] =
      if (on(base)) Some(safely(s"${base}_x$m")(body)) else None
    withRocks(spark)(Seq(1, 4, 8).flatMap { m =>
      Seq(
        fam("dedup_ingest", m)(
          benchDedupIngest(spark, nDocs = 400 * m, nBatches = 2)),
        fam("ann_serve", m)(
          benchAnnServe(spark, sfDir, nQueries = 80 * m, nBatches = 2)),
        // the RocksDB state-store families get the same amortization
        // curve as the index loops: a state-growth or compaction-stall
        // regression bends THESE multipliers while the one-shot
        // headline legs (overhead-dominated) sit still
        fam("uv_dedup_tws", m)(
          benchUvDedup(spark, nEvents = 5000 * m, nBatches = 2)),
        fam("cep_pattern", m)(
          benchCep(spark, keysPerBatch = 500 * m, nBatches = 2)),
        fam("substring_ingest", m)(
          benchSubstringIngest(spark, nDocs = 400 * m, nBatches = 2)),
        fam("mm_ingest", m)(
          benchMmIngest(spark, nDocs = 100 * m, nBatches = 2))).flatten
    })
  }

  /** [[runScaling]] under the same interleaved min-of-N protocol —
    * the amortization-curve legs ride in the official tail map too, so
    * they get the same one-contended-window protection. */
  def runScalingInterleaved(spark: SparkSession, sfDir: String,
      passes: Int = 2): (Seq[(String, Long, Double)], Seq[(String, Long, Double)]) =
    summarizePasses((0 until math.max(1, passes)).map(_ => runScaling(spark, sfDir)))

  private def withRocks[A](spark: SparkSession)(body: => A): A = {
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, Rocks)
    try body
    finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  private def safely(name: String)(body: => (Long, Double)): (String, Long, Double) =
    try { val (rows, sec) = body; (name, rows, sec) }
    catch {
      case e: Throwable =>
        System.err.println(s"[streambench] $name failed: ${e.getMessage}")
        (name, -1L, -1.0)
    }

  private def timed(body: => Long): (Long, Double) = {
    val t0 = System.nanoTime()
    val rows = body
    (rows, (System.nanoTime() - t0) / 1e9)
  }

  /** T2 dedup on transformWithState: nEvents over nEvents/10 keys and
    * 5 distinct UTC days per key — every event is a state read, ~half
    * are state writes. TTL off: the bench drains with
    * processAllAvailable, and a pending processing-time TTL clock
    * keeps no-data micro-batches spinning (the documented gotcha). */
  private def benchUvDedup(spark: SparkSession, nEvents: Int, nBatches: Int): (Long, Double) = {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val nKeys = math.max(1, nEvents / 10)
    val perBatch = nEvents / nBatches
    val in = MemoryStream[graft.streaming.Ev]
    val q = graft.streaming.StreamOps.uvDedupTws(in.toDS(), ttl = None)
      .writeStream.outputMode("append").format("noop").start()
    try timed {
      for (b <- 0 until nBatches) {
        in.addData((0 until perBatch).map { i =>
          val g = b * perBatch + i
          ev(g % nKeys, g, (g % 5) * 86400L, "view")
        }: _*)
        q.processAllAvailable()
      }
      (perBatch * nBatches).toLong
    } finally q.stop()
  }

  /** T3 CEP: every key opens a view run and purchases within the
    * window (match path); event time advances per batch so the
    * watermark continually evicts completed runs — list state, timer
    * registration and deletion all on the hot path. */
  private def benchCep(spark: SparkSession, keysPerBatch: Int, nBatches: Int): (Long, Double) = {
    import spark.implicits._
    import graft.streaming.{Cep, CepPattern}
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val in = MemoryStream[graft.streaming.Ev]
    val pat = CepPattern.begin("view", (e: graft.streaming.Ev) => e.event_type == "view")
      .followedByAny("purchase", (e: graft.streaming.Ev) => e.event_type == "purchase")
      .within(30000L)
    val out = Cep.patternTws[(String, Long)](in.toDS(), pat,
      m => ("match", m("purchase").head.event_id),
      p => Some(("timeout", p.head.event_id)), "1 second")
    val q = out.writeStream.outputMode("append").format("noop").start()
    try timed {
      for (b <- 0 until nBatches) {
        val t = b * 100L
        val keys = (0 until keysPerBatch).map(k => (b * keysPerBatch + k).toLong)
        in.addData(
          keys.map(k => ev(k, k * 10L, t + (k % 7), "view")) ++
            keys.map(k => ev(k, k * 10L + 1, t + (k % 7) + 1, "purchase")): _*)
        q.processAllAvailable()
      }
      (keysPerBatch * nBatches * 2).toLong
    } finally q.stop()
  }

  /** Self-building near-dup ingest against a persisted LSH index:
    * per batch one probe of the batch's own cells plus one delta
    * append. ~20% of docs are near-copies of their predecessor, so
    * both the flagged and the accepted routes run. */
  private def benchDedupIngest(spark: SparkSession, nDocs: Int, nBatches: Int): (Long, Double) = {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    def text(i: Int): String =
      (0 until 12).map(j => s"w${(i * 7 + j * 13) % 5000}").mkString(" ")
    val indexDir = TempDirs.create("sb-lsh-idx")
    graft.ops.Dedup.persistLshIndex(
      (0 until 50).map(i => (100000L + i, text(i * 37))).toDF("doc_id", "text"),
      indexDir)
    val outDir = TempDirs.create("sb-lsh-out")
    val perBatch = nDocs / nBatches
    val in = MemoryStream[(Long, String)]
    val q = graft.streaming.StreamOps.dedupIngest(
      in.toDS().toDF("doc_id", "text"), indexDir, outDir)
      .option("checkpointLocation", TempDirs.create("sb-lsh-ckpt"))
      .start()
    try timed {
      for (b <- 0 until nBatches) {
        in.addData((0 until perBatch).map { i =>
          val g = b * perBatch + i
          // every 5th doc is a near-copy of its predecessor
          val t = if (g % 5 == 4) text(g - 1).replaceFirst("\\bw", "x") else text(g)
          (g.toLong, t)
        }: _*)
        q.processAllAvailable()
      }
      (perBatch * nBatches).toLong
    } finally q.stop()
  }

  /** Streaming ExactSubstr ([[graft.streaming.StreamOps
    * .substringIngest]]): per batch one map-side window explode (~9
    * hashes per 16-token doc) through the per-hash repeat protocol —
    * value + list state on every key, RocksDB put-heavy (most windows
    * are first-seen and go to pending) — plus the b<id> event sink.
    * Every 5th doc is an exact copy of its predecessor, so the
    * pending-flush (retro-emission) path runs in every batch. */
  private def benchSubstringIngest(spark: SparkSession, nDocs: Int,
      nBatches: Int): (Long, Double) = {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    def text(i: Int): String =
      (0 until 16).map(j => s"w${(i * 7 + j * 13) % 5000}").mkString(" ")
    val outDir = TempDirs.create("sb-substr-out")
    val perBatch = nDocs / nBatches
    val in = MemoryStream[(Long, String)]
    val q = graft.streaming.StreamOps.substringIngest(
      in.toDS().toDF("doc_id", "text"), outDir)
      .option("checkpointLocation", TempDirs.create("sb-substr-ckpt"))
      .start()
    try {
      val r = timed {
        for (b <- 0 until nBatches) {
          in.addData((0 until perBatch).map { i =>
            val g = b * perBatch + i
            val t = if (g % 5 == 4) text(g - 1) else text(g)
            (g.toLong, t)
          }: _*)
          q.processAllAvailable()
        }
        (perBatch * nBatches).toLong
      }
      // STATE-SIZE instrumentation (the one stream-lifetime-unbounded
      // state surface — VERDICT r13): key count + RocksDB size metrics
      // from the last batch's progress, so every StreamBench window
      // banks a bytes-per-distinct-window reading alongside the
      // throughput (stderr — the JSON tail stays rows/sec-shaped)
      // lastProgress can be a trailing NO-DATA micro-batch with no
      // state operators — walk recentProgress backwards for the last
      // one that actually carries state metrics
      for (p <- q.recentProgress.reverseIterator
             .find(_.stateOperators.nonEmpty);
           so <- p.stateOperators.headOption) {
        import scala.jdk.CollectionConverters._
        val sizes = so.customMetrics.entrySet().asScala.toSeq
          .filter(_.getKey.toLowerCase.matches(".*(size|memory|bytes).*"))
          .sortBy(_.getKey)
          .map(e => s"${e.getKey}=${e.getValue}").mkString(" ")
        System.err.println(s"[streambench] substring_state nDocs=$nDocs " +
          s"keys=${so.numRowsTotal} updated=${so.numRowsUpdated} $sizes")
      }
      r
    } finally q.stop()
  }

  /** Multimodal near-dup ingest against a persisted byte-gram LSH
    * index ([[graft.streaming.StreamOps.mmDedupIngest]]): per batch
    * one exact payload-digest dedup, one gram probe of the batch's
    * own cells, one delta append — the text ingest's loop over the
    * payload modality (the gram pipeline is heavier per doc than
    * shingling, so the base doc count is half `dedup_ingest`'s).
    * Every 5th payload is a near-copy of its predecessor. */
  private def benchMmIngest(spark: SparkSession, nDocs: Int,
      nBatches: Int): (Long, Double) = {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    def body(i: Int): String =
      (0 until 24).map(j => s"w${(i * 7 + j * 13) % 5000}").mkString(" ")
    def pay(i: Int): Array[Byte] = {
      val b = if (i % 5 == 4) body(i - 1) + " xx" else body(i)
      Array.fill[Byte](29)(0) ++ b.getBytes("UTF-8")
    }
    val indexDir = TempDirs.create("sb-mm-idx")
    graft.ops.Dedup.persistLshIndexElems(
      graft.ops.Multimodal.payloadGrams(
        (0 until 50).map(i => (100000L + i,
          Array.fill[Byte](29)(0) ++ body(i * 37).getBytes("UTF-8")))
          .toDF("doc_id", "payload")),
      indexDir)
    val outDir = TempDirs.create("sb-mm-out")
    val perBatch = nDocs / nBatches
    val in = MemoryStream[(Long, Array[Byte])]
    val q = graft.streaming.StreamOps.mmDedupIngest(
      in.toDS().toDF("doc_id", "payload"), indexDir, outDir)
      .option("checkpointLocation", TempDirs.create("sb-mm-ckpt"))
      .start()
    try timed {
      for (b <- 0 until nBatches) {
        in.addData((0 until perBatch).map { i =>
          val g = b * perBatch + i
          (g.toLong, pay(g))
        }: _*)
        q.processAllAvailable()
      }
      (perBatch * nBatches).toLong
    } finally q.stop()
  }

  /** Streaming ANN serving against the persisted IVF index built from
    * the SF dir's embeddings: per batch one broadcast centroid
    * assignment + one pruned corpus probe + top-k window. */
  private def benchAnnServe(spark: SparkSession, sfDir: String,
      nQueries: Int, nBatches: Int): (Long, Double) = {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val indexDir = TempDirs.create("sb-ivf-idx")
    graft.ops.Similarity.persistIvfIndex(
      graft.ops.Similarity.buildIvfIndex(spark, sfDir), indexDir)
    val outDir = TempDirs.create("sb-ivf-out")
    def qvec(qid: Int): Seq[Float] =
      Seq.tabulate(64)(d => ((qid * 31 + d * 17) % 100) / 50f - 1f)
    val perBatch = nQueries / nBatches
    val in = MemoryStream[(Long, Seq[Float])]
    val q = graft.streaming.StreamOps.annServe(
      in.toDS().toDF("query_id", "qe"), indexDir, outDir)
      .option("checkpointLocation", TempDirs.create("sb-ivf-ckpt"))
      .start()
    try timed {
      for (b <- 0 until nBatches) {
        in.addData((0 until perBatch).map { i =>
          val g = b * perBatch + i
          (g.toLong, qvec(g))
        }: _*)
        q.processAllAvailable()
      }
      (perBatch * nBatches).toLong
    } finally q.stop()
  }

  /** One JSON object string `{"family":rows_per_sec,...}` — embedded
    * by Bench's tail line and printed standalone by [[main]]. */
  def rpsJson(results: Seq[(String, Long, Double)]): String =
    results.map { case (name, rows, sec) =>
      val rps = if (sec > 0) math.round(rows / sec) else -1L
      s"\"$name\":$rps"
    }.mkString("{", ",", "}")

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val scale = sys.env.getOrElse("SPARK_GRAFT_STREAM_SCALE", "1").toInt
    val passes = sys.env.getOrElse("SPARK_GRAFT_STREAM_PASSES", "2").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // one-time JIT/codegen warmup, then Bench's two container-health
    // probes ONCE PER PASS (CPU range-sum + lineitem scan/agg/shuffle)
    // interleaved with the family suite — a standalone StreamBench
    // record is now self-normalizing under both drift lenses, which is
    // what makes a same-container tree A/B of a streaming family
    // adjudicable without the full batch Bench around it.
    spark.range(1000000L).selectExpr("sum(id)").collect()
    var calib = List.empty[Double]
    var calibIo = List.empty[Double]
    def probes(): Unit = {
      val c0 = System.nanoTime()
      spark.range(200000000L).selectExpr("sum(CAST(id AS DOUBLE) * id)").collect()
      calib ::= (System.nanoTime() - c0) / 1e9
      val i0 = System.nanoTime()
      spark.read.parquet(s"$sfDir/lineitem.parquet")
        .selectExpr("l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(Map("l_quantity" -> "sum", "l_extendedprice" -> "sum"))
        .collect()
      calibIo ::= (System.nanoTime() - i0) / 1e9
    }
    val (best, med) = summarizePasses(
      (0 until math.max(1, passes)).map { _ => probes(); run(spark, sfDir, scale) })
    val (sBest, sMed) =
      if (sys.env.getOrElse("SPARK_GRAFT_STREAM_SCALING", "1") == "0")
        (Seq.empty, Seq.empty)
      else summarizePasses(
        (0 until math.max(1, passes)).map { _ => probes(); runScaling(spark, sfDir) })
    val results = best ++ sBest
    val detail = results.map { case (name, rows, sec) =>
      s"""\"$name\":{\"rows\":$rows,\"sec\":${math.round(sec * 1000) / 1000.0}}"""
    }.mkString("{", ",", "}")
    println(s"""{"metric":"streaming","unit":"rows_per_sec","passes":$passes,"rows_per_sec":${rpsJson(results)},"rows_per_sec_median":${rpsJson(med ++ sMed)},"detail":$detail,"calib":${calib.min},"calib_io":${calibIo.min},"sf":"$sfDir"}""")
    spark.stop()
  }
}

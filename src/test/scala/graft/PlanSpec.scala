package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Plan-shape regression gate for the flagship queries.
  *
  * Bench wall-time is ±30% container noise, so plan INVARIANTS are the
  * stable signal: a dropped broadcast hint, a lost semi-join rewrite or
  * an unpruned scan changes the executed plan deterministically long
  * before it shows up in seconds. Each test pins the operator-level
  * facts a 100 TB run depends on. The final test proves the gate bites:
  * deliberately de-optimizing (broadcast disabled) flips the very
  * assertion the gate checks.
  *
  * All assertions run against the POST-EXECUTION plan (AQE final), so
  * what's asserted is what actually ran, not the static estimate.
  */
class PlanSpec extends SparkSuite {

  private def finalPlan(name: String, sfDir: String = "sf0.001"): String = {
    val df = SparkEntry.queries(name)(spark, sf(sfDir))
    df.collect() // drive AQE to its final plan
    val full = df.queryExecution.executedPlan.toString
    // AdaptiveSparkPlan prints "== Final Plan ==" followed by
    // "== Initial Plan ==": keep only what actually ran, or scan
    // counts double
    full.indexOf("== Initial Plan ==") match {
      case -1 => full
      case i  => full.substring(0, i)
    }
  }

  private def occurrences(plan: String, token: String): Int =
    token.r.findAllIn(plan).size

  test("band rows: one aggregation pass, no join — the r14 shape ladder's winner stays pinned") {
    // the rejected shapes are structurally detectable: sig⋈sets adds a
    // join over fat array-carrying rows (11.6× slower at the ×100 soak
    // — PERF.md), min-inside-ObjectHashAggregate adds nothing a plan
    // string shows, but the join is the expensive regression to pin
    import spark.implicits._
    val elems = Seq((1L, "a"), (1L, "b"), (2L, "a")).toDF("doc_id", "s")
    val df = graft.ops.Dedup.bandRowsOfElems(elems, 1)
    df.collect()
    val full = df.queryExecution.executedPlan.toString
    val plan = full.indexOf("== Initial Plan ==") match {
      case -1 => full
      case i  => full.substring(0, i)
    }
    assert(!plan.contains("Join"),
      s"band rows re-grew a join over the fat element arrays:\n$plan")
    // one partial+final ObjectHashAggregate pair (collect_set), and no
    // second aggregate family (the old separate minhash HashAggregate)
    assert(occurrences(plan, "ObjectHashAggregate") == 2, plan)
    // prefix char class covers ARBITRARY tree-decoration depth (`:  +-`
    // under a multi-child branch, etc. — ADVICE r14), so a second
    // aggregate family regrowing inside a nested subtree still counts;
    // the preceding "Object" is excluded by requiring the H at a
    // non-letter boundary within the decoration-only prefix
    assert(occurrences(plan, "(?m)^[-+:* ()\\d]*HashAggregate") == 0, plan)
  }

  test("q2: no cartesian/nested-loop; dims broadcast; derived-ps materialized once") {
    val plan = finalPlan("q2_min_cost_supplier")
    assert(!plan.contains("CartesianProduct"), plan.linesIterator.take(25).mkString("\n"))
    assert(!plan.contains("BroadcastNestedLoopJoin"))
    assert(plan.contains("BroadcastHashJoin"))
    // derivedPs is materialized pre-plan: the final plan reads the
    // stored relation, never re-scanning lineitem (twice-referenced
    // CTE would otherwise double the biggest scan)
    assert(!plan.contains("lineitem.parquet"), "q2 re-scans lineitem")
    assert(plan.contains("ExistingRDD"))
  }

  test("q10: top-20 is TakeOrderedAndProject; nation broadcast; one lineitem scan") {
    val plan = finalPlan("q10_returned_items")
    assert(plan.contains("TakeOrderedAndProject"))
    assert(plan.contains("BroadcastHashJoin"))
    assert(occurrences(plan, "lineitem\\.parquet") == 1, plan)
  }

  test("q18: lineitem scan pruned to the two aggregation columns") {
    val plan = finalPlan("q18_large_volume")
    assert(occurrences(plan, "lineitem\\.parquet") == 1)
    // HAVING-before-join only pays off if the scan is pruned too
    assert(plan.contains("struct<l_orderkey:bigint,l_quantity:double>"),
      plan.linesIterator.filter(_.contains("ReadSchema")).mkString("\n"))
  }

  test("q20: nested IN chain collapses to semi joins") {
    val plan = finalPlan("q20_excess_availability")
    assert(occurrences(plan, "LeftSemi") >= 2, plan)
    assert(!plan.contains("CartesianProduct"))
  }

  test("q21: EXISTS/NOT EXISTS rewrite to semi + anti over one relation") {
    val plan = finalPlan("q21_waiting_supplier")
    assert(plan.contains("LeftSemi"), plan)
    assert(plan.contains("LeftAnti"), plan)
    assert(plan.contains("TakeOrderedAndProject"))
  }

  test("mm_decode_meta: one pruned documents scan, no Python/JVM round-trip, fully codegen'd") {
    val plan = finalPlan("mm_decode_meta")
    assert(occurrences(plan, "documents\\.parquet") == 1, plan)
    // payload construction + binary parse stay inside whole-stage
    // codegen: no UDF eval operators anywhere in the executed plan
    assert(!plan.contains("BatchEvalPython") && !plan.contains("ArrowEvalPython"))
    assert(!plan.contains("SerializeFromObject"), "decode fell out of codegen into objects")
    // executedPlan.toString marks whole-stage-codegen stages as *(n)
    assert(plan.contains("*(1)"), "no codegen stage in the decode plan")
    // scan reads only the two source columns, never a payload blob
    assert(plan.contains("struct<doc_id:bigint,text:string>"),
      plan.linesIterator.filter(_.contains("ReadSchema")).mkString("\n"))
  }

  test("sim_topk_ivf_rerank: sketch and exact stages are top-k sorts, no cartesian blowup") {
    val plan = finalPlan("sim_topk_ivf_rerank")
    assert(!plan.contains("CartesianProduct"), plan.linesIterator.take(25).mkString("\n"))
    // pool cut and final top-k are TakeOrderedAndProject (limit-pushed
    // sorts), never a global Sort+Exchange of the scored corpus
    assert(occurrences(plan, "TakeOrderedAndProject") >= 2, plan)
    // cell lists ride broadcast into the corpus side
    assert(plan.contains("BroadcastHashJoin"), plan)
  }

  test("sim_topk_ivf_rerank_pq: code and exact stages are top-k sorts, no cartesian blowup") {
    val plan = finalPlan("sim_topk_ivf_rerank_pq")
    assert(!plan.contains("CartesianProduct"), plan.linesIterator.take(25).mkString("\n"))
    assert(occurrences(plan, "TakeOrderedAndProject") >= 2, plan)
    assert(plan.contains("BroadcastHashJoin"), plan)
  }

  test("rerank stage 1 encodes AFTER the wide-cell restriction (both codecs)") {
    // The r9 inversion: the projection computing the stage-1 codes sat
    // BELOW the broadcast join on the wide-cell list, so every corpus
    // row paid the encode for an 8-of-k-cell pool. The optimizer never
    // moves a join below a computing projection (or vice versa), so
    // the logical shape here IS the executed cost order: the encode
    // Project must have the label-restricting join in its subtree.
    import org.apache.spark.sql.catalyst.expressions.Alias
    import org.apache.spark.sql.catalyst.plans.logical.{Join, Project}
    for ((name, alias) <- Seq("sim_topk_ivf_rerank" -> "q8",
                              "sim_topk_ivf_rerank_pq" -> "pqc")) {
      val df = SparkEntry.queries(name)(spark, sf("sf0.001"))
      val encoders = df.queryExecution.optimizedPlan.collect {
        case p: Project if p.projectList.exists {
          case a: Alias => a.name == alias
          case _ => false
        } => p
      }
      assert(encoders.nonEmpty,
        s"$name: no Project aliasing '$alias' — encode-stage shape changed, update this gate")
      for (p <- encoders) {
        val restricted = p.collect {
          case j: Join if j.condition.exists(_.references.exists(_.name == "label")) => j
        }
        assert(restricted.nonEmpty,
          s"$name: the '$alias' encode projection has NO label join beneath it — " +
            "stage 1 is encoding the whole corpus, not the probed cells")
      }
    }
  }

  test("j3: fixed dims ride broadcast joins") {
    val plan = finalPlan("j3_dim_enrich")
    assert(occurrences(plan, "BroadcastHashJoin") >= 2, plan)
  }

  test("a6: top-10 never global-sorts the aggregate") {
    val plan = finalPlan("a6_topn_brand_revenue")
    assert(plan.contains("TakeOrderedAndProject"), plan)
    assert(!plan.contains("GlobalLimit"), plan)
  }

  test("decontaminate_bloom: train side prefiltered by might_contain") {
    val plan = finalPlan("decontaminate_bloom")
    assert(plan.contains("might_contain"), plan.linesIterator.take(25).mkString("\n"))
  }

  test("dedup_embedding_lsh: candidate join keyed on bucket, no all-pairs") {
    val plan = finalPlan("dedup_embedding_lsh")
    assert(!plan.contains("CartesianProduct"), plan)
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
  }

  test("sim_topk_ivf_serve_only: probe plan is one cell-pruned scan, top-k without a shuffle") {
    val plan = finalPlan("sim_topk_ivf_serve_only")
    // the query literal folds into the projection, top-k is
    // TakeOrderedAndProject, and the whole probe runs shuffle-free —
    // serving cost is the probed cells' scan, nothing else
    assert(plan.contains("TakeOrderedAndProject"), plan)
    assert(!plan.contains("Exchange hashpartitioning"),
      plan.linesIterator.filter(_.contains("Exchange")).mkString("\n"))
    // every corpus location in the scan is a probed label directory —
    // no corpus-root (un-pruned) read
    val corpusLocs = plan.linesIterator
      .filter(l => l.contains("Location") && l.contains("corpus_g")).toSeq
    assert(corpusLocs.nonEmpty, "no corpus scan found in the probe plan")
    assert(corpusLocs.forall(_.contains("label=")),
      s"probe scanned the corpus root:\n${corpusLocs.mkString("\n")}")
  }

  test("dedup_against_index_serve_only: cell-pruned scans, no all-pairs join") {
    val plan = finalPlan("dedup_against_index_serve_only")
    assert(!plan.contains("CartesianProduct"), plan)
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
    // every index location in the scan is below a band cell directory
    // — the probe never lists the bands root. (The plan printer elides
    // long path lists, so only the first path's prefix is assertable
    // here; exact cell containment is OpsSpec's inputFiles check.)
    val bandLocs = plan.linesIterator
      .filter(l => l.contains("Location") && l.contains("bands_g")).toSeq
    assert(bandLocs.nonEmpty, "no index scan found in the probe plan")
    assert(bandLocs.forall(_.contains("band_id=")),
      s"probe scanned the bands root:\n${bandLocs.mkString("\n")}")
  }

  test("mm probe_only: the timed plan carries NO gram pipeline — pre-materialized probe relation only") {
    // the row exists to time the serving path alone (r15): its plan
    // must read the cached gram parquet + the index cells — any
    // Generate (gram explode) or documents scan means the probe-side
    // pipeline crept back into the slot
    val plan = finalPlan("mm_near_dup_against_index_probe_only")
    assert(!plan.contains("Generate"),
      s"gram explode inside the probe_only slot:\n${plan.linesIterator.take(25).mkString("\n")}")
    assert(!plan.contains("documents.parquet"),
      "probe_only re-read the documents table inside the slot")
    assert(!plan.contains("CartesianProduct"), plan)
    // still cell-pruned on the index side, like the text twin
    val bandLocs = plan.linesIterator
      .filter(l => l.contains("Location") && l.contains("bands_g")).toSeq
    assert(bandLocs.nonEmpty, "no index scan found in the probe plan")
    assert(bandLocs.forall(_.contains("band_id=")),
      s"probe scanned the bands root:\n${bandLocs.mkString("\n")}")
  }

  test("j8: LATERAL decorrelates to a ranked window, not a per-row rescan") {
    val plan = finalPlan("j8_lateral_topn")
    assert(plan.contains("Window"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
    assert(occurrences(plan, "supplier\\.parquet") == 1, plan)
  }

  test("f17: wide variant query parses JSON exactly once") {
    val plan = finalPlan("f17_variant_wide")
    assert(occurrences(plan, "parseJson") == 1,
      plan.linesIterator.filter(_.contains("parseJson")).mkString("\n"))
  }

  test("q11: derived-ps materialized once; scalar total rides a broadcast") {
    val plan = finalPlan("q11_important_stock")
    assert(!plan.contains("lineitem.parquet"), "q11 re-scans lineitem")
    assert(plan.contains("ExistingRDD"))
    // the (total, cnt) scalar joins in as a broadcast single row —
    // never a shuffle against the per-part relation
    assert(plan.contains("BroadcastNestedLoopJoin") || plan.contains("BroadcastHashJoin"), plan)
  }

  test("ads_trademark_stats: top-10 via TakeOrderedAndProject over a broadcast dim join") {
    val plan = finalPlan("ads_trademark_stats")
    assert(plan.contains("TakeOrderedAndProject"), plan)
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(occurrences(plan, "lineitem\\.parquet") == 1, plan)
  }

  test("ads_province_stats: serving path keeps dims broadcast, one fact scan") {
    val plan = finalPlan("ads_province_stats")
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(occurrences(plan, "orders\\.parquet") == 1, plan)
  }

  test("q19: OR'd predicate bands stay ONE join, never three unioned joins") {
    val plan = finalPlan("q19_disjunctive_bands")
    val joins = occurrences(plan, "Join")
    assert(joins <= 2, s"$joins join operators — disjunction exploded into unions:\n$plan")
    assert(!plan.contains("Union"), plan)
  }

  test("decontaminate_ngram: train side reaches the broadcast probe without shuffling") {
    val plan = finalPlan("decontaminate_ngram")
    // the train-side leg (scan → shingle explode → broadcast-join
    // probe) must carry no Exchange before the join; the only shuffle
    // in the whole plan is the per-(train,eval) count aggregation
    val joinIdx = plan.indexOf("BroadcastHashJoin")
    assert(joinIdx >= 0, plan)
    val belowJoin = plan.substring(joinIdx)
    val exchangesBelow = occurrences(belowJoin, "Exchange hashpartitioning")
    assert(exchangesBelow == 0,
      s"train-side shuffle before the contamination probe:\n$plan")
  }

  test("sample_budget: two-phase prefix sum — no unpartitioned Window anywhere") {
    val plan = finalPlan("sample_budget")
    // an unpartitioned running sum prints its FIRST windowspecdefinition
    // argument with a sort direction (no partition columns) — that is
    // the one-reducer global sort the two-phase rewrite removed
    val unpartitioned =
      "windowspecdefinition\\([^,()]* (ASC|DESC)".r.findFirstIn(plan)
    assert(unpartitioned.isEmpty,
      s"unpartitioned Window in sample_budget's final plan ($unpartitioned):\n$plan")
    // the bucket-local cumsum is still a Window (partitioned by bk),
    // the bucket-offset and scalar-total sides ride broadcast, and the
    // thrice-referenced token metadata is materialized once — the
    // final plan reads stored blocks, never re-scanning documents
    assert(plan.contains("Window"), plan)
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("documents.parquet"),
      "sample_budget re-scans documents instead of reusing the materialized metadata")
    assert(plan.contains("ExistingRDD"))
  }

  test("centroid assignment is one map-side projection: no shuffle, no expansion surviving the stage") {
    // the old plan crossJoined each vector with the k-row centroid
    // relation and regrouped via min_by — an Exchange on every
    // append/Lloyd/compaction. The kernel form must keep the whole
    // assignment inside the scan stage: broadcast one-row centroid
    // list, vec_nearest_idx projection, zero Exchanges.
    import graft.ops.Similarity
    val idx = Similarity.buildIvfIndex(spark, sf("sf0.001"))
    val assigned = Similarity.assignToCentroids(
      idx.centroids, idx.corpus.select("vec_id", "embedding"))
    assigned.collect()
    val full = assigned.queryExecution.executedPlan.toString
    val plan = full.indexOf("== Initial Plan ==") match {
      case -1 => full
      case i  => full.substring(0, i)
    }
    // the centroid-list aggregation may collapse its k rows to one
    // partition and broadcast it; the VECTOR side must never hash-
    // shuffle — a hashpartitioning Exchange means the per-vec_id
    // regroup (the min_by plan) came back
    assert(!plan.contains("hashpartitioning"),
      s"assignment plan shuffles the vector side:\n$plan")
    assert(!plan.contains("min_by"),
      "assignment still argmins relationally — the kernel is not in the plan")
  }

  test("decontaminate_embedding: train corpus rides broadcast joins only, no corpus-side shuffle") {
    val plan = finalPlan("decontaminate_embedding")
    // band-candidate join, candidate join-back and eval-embedding join
    // must ALL build on the broadcast (benchmark-sized) side — a
    // SortMergeJoin means the train corpus shuffled
    assert(!plan.contains("SortMergeJoin"), plan)
    assert(!plan.contains("CartesianProduct"))
    assert(occurrences(plan, "BroadcastHashJoin") >= 3, plan)
  }

  test("two-stage LSH probe: screen scan never reads the shingle column; exact scan pushes the survivor IN(sig) filter") {
    import graft.ops.Dedup
    import spark.implicits._
    val indexDir = java.nio.file.Files.createTempDirectory("lsh-2s-plan").toString
    val seeded = "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu"
    val other = "one two three four five six seven eight nine ten eleven twelve"
    Dedup.persistLshIndex(
      Seq(1L -> seeded, 2L -> other).toDF("doc_id", "text"), indexDir,
      exactFallback = false)
    val probe = Seq(11L -> seeded.replace(" mu", " nu")).toDF("doc_id", "text")
    // the screen's plan only exists inside the probe call (its
    // survivors collect) — capture every executed plan via listener
    val captured = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val listener = new org.apache.spark.sql.util.QueryExecutionListener {
      override def onSuccess(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          durationNs: Long): Unit = captured.add(qe.executedPlan.toString)
      override def onFailure(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          exception: Exception): Unit = ()
    }
    spark.listenerManager.register(listener)
    try {
      val out = Dedup.nearDupCheck(spark, indexDir, probe, twoStage = true)
      val pairs = out.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
      assert(pairs === Seq((11L, 1L)))
      // exact stage (the returned plan): the survivor filter reached
      // the band-cell scan as a pushed IN(sig) — with sig-sorted cell
      // files that is what page-skips the fat shingle column
      val full = out.queryExecution.executedPlan.toString
      val exact = full.indexOf("== Initial Plan ==") match {
        case -1 => full
        case i  => full.substring(0, i)
      }
      // a single-survivor IN collapses to EqualTo — both are the
      // pushed sargable form
      assert(exact.contains("PushedFilters") &&
        (exact.contains("In(sig") || exact.contains("EqualTo(sig")),
        s"exact-stage scan lost the pushed survivor filter:\n$exact")
      // screen stage: poll the async listener bus for the plan whose
      // band-cell scan is column-pruned to (doc_id, sig) — a ReadSchema
      // carrying ss means stage 1 paid the shingle I/O anyway
      def screenPlan: Option[String] = {
        import scala.jdk.CollectionConverters._
        captured.asScala.find(p =>
          p.contains("bands_g") &&
            p.contains("ReadSchema: struct<doc_id:bigint,sig:string>"))
      }
      val deadline = System.currentTimeMillis() + 20000
      while (screenPlan.isEmpty && System.currentTimeMillis() < deadline)
        Thread.sleep(100)
      assert(screenPlan.nonEmpty,
        "no column-pruned screen scan observed — stage 1 read the shingle column")
    } finally spark.listenerManager.unregister(listener)
  }

  test("events.ts is sargable: a time-range filter reaches the parquet scan as a pushed filter") {
    // The schema-adaptive loader reads the MICROS layout natively as
    // TimestampType (no cast above the scan), so event-time range
    // predicates — the dominant prune on an append-only 100 TB events
    // table — push into the parquet reader instead of filtering rows
    // post-scan. A cast-on-top loader regression would empty
    // PushedFilters for ts while the query still returns right answers.
    val df = ops.Tables.events(spark, sf("sf0.001"))
      .filter(col("ts") >= lit("2024-01-01 00:10:00").cast("timestamp"))
      .groupBy("event_type").count()
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    val scan = plan.linesIterator.find(_.contains("PushedFilters")).getOrElse("")
    assert(scan.contains("GreaterThanOrEqual(ts"),
      s"ts range filter not pushed to the events scan: $scan")
  }

  test("the gate bites: disabling broadcast flips j3's asserted shape") {
    val threshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    val aqeThreshold = spark.conf.getOption("spark.sql.adaptive.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
      // j3 with its hints stripped — the de-optimization a refactor
      // could silently introduce
      val o = ops.Tables.table(spark, sf("sf0.001"), "orders")
      val c = ops.Tables.table(spark, sf("sf0.001"), "customer")
      val n = ops.Tables.table(spark, sf("sf0.001"), "nation")
      val df: DataFrame = o.join(c, o("o_custkey") === c("c_custkey"))
        .join(n, c("c_nationkey") === n("n_nationkey"))
        .groupBy(n("n_name")).agg(count(lit(1)).as("n_orders"))
      df.collect()
      val plan = df.queryExecution.executedPlan.toString
      assert(!plan.contains("BroadcastHashJoin"),
        "broadcast disabled yet plan still broadcasts — gate can't detect the regression")
      assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"), plan)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", threshold)
      aqeThreshold.foreach(
        spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", _))
    }
  }

  test("transport flag swap changes ONLY the source: kafka and file topologies are node-identical above the seam (S1)") {
    // The production-swap claim behind TopicTransport: flipping
    // graft.topic.transport to `kafka` must change the SOURCE leg and
    // nothing else — same projections, same watermark (delay
    // included), same stateful aggregation. The kafka branch analyzes
    // against the test-classpath connector stub (FakeKafkaSource —
    // real connector schema, analysis-only), so this diff pins real
    // logical trees, not hand-written expectations. Both branches end
    // at the transport seam, the (offset, key, value, partition)
    // projection; the comparison walks each analyzed tree root-down
    // and collapses everything at/below that seam into one token.
    import graft.streaming.TopicTransport
    import org.apache.spark.sql.catalyst.plans.logical.{EventTimeWatermark, LogicalPlan}
    val seam = Set("offset", "key", "value", "partition")
    def shape(df: DataFrame): Seq[String] = {
      def walk(p: LogicalPlan): Seq[String] =
        if (p.output.map(_.name).toSet == seam) Seq("<transport>")
        else (p match {
          case e: EventTimeWatermark => s"EventTimeWatermark(${e.delay})"
          case _ => p.nodeName
        }) +: p.children.flatMap(walk)
      walk(df.queryExecution.analyzed)
    }
    // a representative DWS topology: JSON parse → event time →
    // watermark → windowed stateful aggregation
    def topo(src: DataFrame): DataFrame =
      src.select(col("key"),
          get_json_object(col("value"), "$.amount").cast("double").as("amount"),
          timestamp_seconds(get_json_object(col("value"), "$.ts").cast("long")).as("ts"))
        .withWatermark("ts", "10 seconds")
        .groupBy(window(col("ts"), "1 minute"), col("key"))
        .agg(sum(col("amount")).as("amount"))
    val broker = java.nio.file.Files.createTempDirectory("plan-broker").toString
    val fileShape = shape(topo(TopicTransport.readStream(spark, broker, "t_plan")))
    val kafkaShape =
      try {
        spark.conf.set(TopicTransport.ConfKey, "kafka")
        shape(topo(TopicTransport.readStream(spark, "broker:9092", "t_plan")))
      } finally spark.conf.unset(TopicTransport.ConfKey)
    assert(kafkaShape === fileShape,
      s"transport swap altered the topology above the seam:\nkafka: $kafkaShape\nfile:  $fileShape")
    assert(fileShape.count(_ == "<transport>") === 1, fileShape.toString)
    assert(fileShape.exists(_.startsWith("EventTimeWatermark")), fileShape.toString)
    assert(fileShape.contains("Aggregate"), fileShape.toString)
  }

  // the mm pipelines materialize intermediates (separate jobs), so
  // the exchanges to audit only exist inside those executions —
  // capture every one via listener (the two-stage-probe precedent)
  // and walk each tree STRUCTURALLY: any shuffle or broadcast whose
  // output carries the binary `payload` (or its payload-sized hex
  // body `h`) would ship megabytes per row at corpus scale; the
  // contract is that exchanges only ever carry (doc_id, 16-char
  // gram) and band signatures. Vacuity-guarded: at least
  // `minExchanges` must be captured or the gate fails.
  private def auditNoPayloadExchange(minExchanges: Int)(
      body: => Option[org.apache.spark.sql.execution.QueryExecution]): Unit = {
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.exchange.{Exchange, ReusedExchangeExec}
    val nExchanges = new java.util.concurrent.atomic.AtomicInteger()
    val violations = java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
    def walk(p: SparkPlan): Unit = {
      p match {
        case e: Exchange =>
          nExchanges.incrementAndGet()
          e.output.foreach { a =>
            if (a.name == "payload" || a.name == "h")
              violations.add(s"${a.name} crosses ${e.nodeName}")
          }
        case _ => ()
      }
      val kids = p match {
        case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
        case s: QueryStageExec => Seq(s.plan)
        case r: ReusedExchangeExec => Seq(r.child)
        case other => other.children
      }
      kids.foreach(walk)
    }
    val listener = new org.apache.spark.sql.util.QueryExecutionListener {
      override def onSuccess(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          durationNs: Long): Unit = walk(qe.executedPlan)
      override def onFailure(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          exception: Exception): Unit = ()
    }
    spark.listenerManager.register(listener)
    try {
      body.foreach(qe => walk(qe.executedPlan))
      // the listener bus is async: wait until the capture has seen the
      // gram pipeline's shuffles (distinct + signature groupBy at
      // minimum), then give stragglers a beat before judging
      val deadline = System.currentTimeMillis() + 20000
      while (nExchanges.get() < minExchanges && System.currentTimeMillis() < deadline)
        Thread.sleep(100)
      Thread.sleep(1000)
      assert(nExchanges.get() >= minExchanges,
        s"only ${nExchanges.get()} exchanges captured — the gate is vacuous")
      import scala.jdk.CollectionConverters._
      assert(violations.isEmpty, violations.asScala.mkString("; "))
    } finally spark.listenerManager.unregister(listener)
  }

  test("mm_near_dup: payload bytes never cross an exchange — grams are extracted map-side") {
    auditNoPayloadExchange(minExchanges = 2) {
      val out = SparkEntry.queries("mm_near_dup")(spark, sf("sf0.001"))
      assert(out.collect().length > 0)
      Some(out.queryExecution)
    }
  }

  test("mm near-dup SERVED form: no payload across an exchange in persist, probe, or ingest batch") {
    // the whole lifecycle under one audit: index persist from grams,
    // the against-index probe, and one mmDedupIngest micro-batch —
    // every exchange any of them runs is captured and checked
    auditNoPayloadExchange(minExchanges = 2) {
      val dir = sf("sf0.001")
      val pay = graft.ops.Multimodal.pngPayloads(spark, dir)
      val indexDir = java.nio.file.Files.createTempDirectory("mm-plan-idx").toString
      val outDir = java.nio.file.Files.createTempDirectory("mm-plan-out").toString
      graft.ops.Dedup.persistLshIndexElems(
        graft.ops.Multimodal.payloadGrams(
          pay.filter(col("doc_id") % 2 === 0)), indexDir, prefixLen = 1)
      val out = graft.ops.Dedup.nearDupCheckElems(spark, indexDir,
        graft.ops.Multimodal.payloadGrams(pay.filter(col("doc_id") % 2 === 1)),
        threshold = 0.5, broadcastProbe = false)
      assert(out.collect().length > 0, "served probe found nothing — vacuous")
      graft.streaming.StreamOps.mmDedupIngestBatch(
        pay.filter(col("doc_id") % 2 === 1).limit(50), indexDir, outDir,
        batchId = 1L, threshold = 0.5)
      Some(out.queryExecution)
    }
  }

  test("document samplers rank on the digest: text never crosses a sample/dedup exchange") {
    // sample_stratified / sample_mix order their per-source rank by
    // md5(text), and pipeline_clean_dedup_sample dedups on the cleaned
    // content — in every case the BODY is consumed map-side into a
    // 32-hex digest and only (ids, digest) cross the rank exchange.
    // Regrowing a text-carrying shuffle is the band ladder's
    // sort-spill shape on the corpus-sized table, invisible at bench
    // SF — pin it structurally.
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.exchange.{ReusedExchangeExec, ShuffleExchangeLike}
    for (q <- Seq("sample_stratified", "sample_mix", "pipeline_clean_dedup_sample")) {
      val df = SparkEntry.queries(q)(spark, sf("sf0.001"))
      assert(df.collect().length > 0, s"$q returned no rows — gate vacuous")
      var fat = List.empty[String]
      var nShuffles = 0
      def walk(p: SparkPlan): Unit = {
        p match {
          case e: ShuffleExchangeLike =>
            nShuffles += 1
            e.output.filter(a => a.name == "text" || a.name == "clean")
              .foreach(a => fat ::= s"$q: ${a.name} crosses ${e.nodeName}")
          case _ => ()
        }
        val kids = p match {
          case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
          case s: QueryStageExec => Seq(s.plan)
          case r: ReusedExchangeExec => Seq(r.child)
          case other => other.children
        }
        kids.foreach(walk)
      }
      walk(df.queryExecution.executedPlan)
      assert(nShuffles >= 1, s"$q: no shuffle captured — gate vacuous")
      assert(fat.isEmpty, fat.mkString("; "))
    }
  }

  test("ivf batch rerank: the centroid-rank sort is narrow — query payload never rides a d2 sort") {
    // batchRerankScaffold's per-query centroid rank runs on
    // (query_id, label, d2); the query payload (qe, qnorm, codec
    // columns) joins back onto the <= nprobeWide winners. The old
    // shape k-multiplied the payload through the rank exchange+sort —
    // a sort-spill once batches are table-sized and k tracks √N. The
    // precise pin: ANY sort ordering on d2 must not output a payload
    // column (the join-back's own sorts, if merge is chosen, never
    // involve d2).
    // the rank executes INSIDE the operator call (the pinned probes
    // relation's touched-label collect), so capture every execution
    // via a listener and poll — the two-stage-probe gate's pattern
    import org.apache.spark.sql.execution.{SortExec, SparkPlan}
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.columnar.InMemoryTableScanExec
    import org.apache.spark.sql.execution.exchange.ReusedExchangeExec
    val payload = Set("qe", "qnorm", "qamax", "q8q")
    val d2Sorts = new java.util.concurrent.atomic.AtomicInteger()
    val fat = java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
    def walk(p: SparkPlan): Unit = {
      p match {
        case s: SortExec
            if s.sortOrder.exists(_.child.references.exists(_.name == "d2")) =>
          d2Sorts.incrementAndGet()
          s.output.filter(a => payload(a.name))
            .foreach(a => fat.add(s"${a.name} rides a d2 sort"))
        // r16: the payload may never be an AGGREGATION KEY either — the
        // old `probes.select(..qe..).distinct()` hashed and exchanged
        // the query embedding ×nprobeWide per query just to collapse it
        // back to one row (qrel, the one-row-per-query relation, is the
        // sanctioned source for per-query payload joins)
        case a: org.apache.spark.sql.execution.aggregate.HashAggregateExec
            if a.groupingExpressions.exists(_.references.exists(r => payload(r.name))) =>
          fat.add(s"payload column is a HashAggregate grouping key: ${a.groupingExpressions.flatMap(_.references.map(_.name)).filter(payload).mkString(",")}")
        case a: org.apache.spark.sql.execution.aggregate.ObjectHashAggregateExec
            if a.groupingExpressions.exists(_.references.exists(r => payload(r.name))) =>
          fat.add("payload column is an ObjectHashAggregate grouping key")
        case a: org.apache.spark.sql.execution.aggregate.SortAggregateExec
            if a.groupingExpressions.exists(_.references.exists(r => payload(r.name))) =>
          fat.add("payload column is a SortAggregate grouping key")
        case _ => ()
      }
      val kids = p match {
        case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
        case st: QueryStageExec => Seq(st.plan)
        case r: ReusedExchangeExec => Seq(r.child)
        // the probes relation is pinned: the rank lives in the CACHED
        // plan behind the InMemoryTableScan boundary (no children)
        case m: InMemoryTableScanExec => Seq(m.relation.cachedPlan)
        case other => other.children
      }
      kids.foreach(walk)
    }
    val listener = new org.apache.spark.sql.util.QueryExecutionListener {
      override def onSuccess(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          durationNs: Long): Unit = walk(qe.executedPlan)
      override def onFailure(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          exception: Exception): Unit = ()
    }
    // the scaffold is the streaming batch-rerank spine (the batch
    // QueryDefs probe single vectors through TakeOrderedAndProject,
    // already narrow) — drive it directly on a small persisted index
    // with a multi-query batch, both codecs
    import spark.implicits._
    import graft.ops.Similarity
    val corpus = Seq.tabulate(90) { i =>
      (i.toLong, (i % 3).toLong,
        Array.tabulate(8)(d => ((i * 11 + d * 3) % 17).toFloat))
    }.toDF("vec_id", "label", "embedding")
    val indexDir = graft.TempDirs.create("plan-rerank-ivf")
    Similarity.persistIvfIndex(Similarity.buildIvfIndexFrom(corpus), indexDir)
    val batch = Seq.tabulate(6) { i =>
      (1000L + i, Seq.tabulate(8)(d => ((i * 7 + d) % 17).toFloat))
    }.toDF("query_id", "qe")
    spark.listenerManager.register(listener)
    try {
      for (pq <- Seq(false, true)) {
        val (out, release) =
          if (pq) Similarity.ivfProbeBatchRerankedServedPqReleasable(
            spark, indexDir, batch, k = 3, nprobeWide = 4, rerankCells = 2,
            poolSize = 20)
          else Similarity.ivfProbeBatchRerankedServedReleasable(
            spark, indexDir, batch, k = 3, nprobeWide = 4, rerankCells = 2,
            poolSize = 20)
        assert(out.collect().length > 0, s"rerank batch (pq=$pq) empty — gate vacuous")
        walk(out.queryExecution.executedPlan)
        release()
      }
      // async listener bus: wait for the rank stages, then a beat
      val deadline = System.currentTimeMillis() + 20000
      while (d2Sorts.get() < 2 && System.currentTimeMillis() < deadline)
        Thread.sleep(100)
      Thread.sleep(1000)
      assert(d2Sorts.get() >= 2, s"only ${d2Sorts.get()} d2 sorts captured — gate vacuous")
      import scala.jdk.CollectionConverters._
      assert(fat.isEmpty, fat.asScala.mkString("; "))
    } finally spark.listenerManager.unregister(listener)
  }

  test("ivf single-probe serving: no distance/score sort outputs the query payload") {
    // VERDICT r15 item 5 — the batch scaffold's narrow-rank contract,
    // extended to the SINGLE-probe served paths (ivfProbeVectorServed
    // and both re-ranked codecs): every sort/top-k keyed on a distance
    // or score column (d2, cos, ap) must run on narrow rows — the
    // query payload stays in broadcast relations, never rides a rank.
    // The re-ranked probes run control-plane collects inside the call,
    // so capture every execution via a listener (two-stage-probe gate
    // pattern) and also walk the returned frame's executed plan.
    import org.apache.spark.sql.execution.{SortExec, SparkPlan, TakeOrderedAndProjectExec}
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.columnar.InMemoryTableScanExec
    import org.apache.spark.sql.execution.exchange.ReusedExchangeExec
    val payload = Set("qe", "qnorm", "qamax", "q8q", "lut", "q8", "embedding")
    val rankCols = Set("d2", "cos", "ap")
    val rankSorts = new java.util.concurrent.atomic.AtomicInteger()
    val fat = java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
    def check(sortRefs: Seq[String], out: Seq[String], node: String): Unit =
      if (sortRefs.exists(rankCols)) {
        rankSorts.incrementAndGet()
        out.filter(payload).foreach(a =>
          fat.add(s"$a rides a ${sortRefs.mkString(",")} $node"))
      }
    def walk(p: SparkPlan): Unit = {
      p match {
        case s: SortExec =>
          check(s.sortOrder.flatMap(_.child.references.map(_.name)),
            s.output.map(_.name), "SortExec")
        case t: TakeOrderedAndProjectExec =>
          // the top-k form the single probes compile to: the sort
          // itself runs over the CHILD's rows, so the child's output
          // is what must stay narrow (projectList runs after)
          check(t.sortOrder.flatMap(_.child.references.map(_.name)),
            t.child.output.map(_.name), "TakeOrderedAndProject")
        case _ => ()
      }
      val kids = p match {
        case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
        case st: QueryStageExec => Seq(st.plan)
        case r: ReusedExchangeExec => Seq(r.child)
        case m: InMemoryTableScanExec => Seq(m.relation.cachedPlan)
        case other => other.children
      }
      kids.foreach(walk)
    }
    val listener = new org.apache.spark.sql.util.QueryExecutionListener {
      override def onSuccess(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          durationNs: Long): Unit = walk(qe.executedPlan)
      override def onFailure(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          exception: Exception): Unit = ()
    }
    import spark.implicits._
    import graft.ops.Similarity
    val corpus = Seq.tabulate(90) { i =>
      (i.toLong, (i % 3).toLong,
        Array.tabulate(8)(d => ((i * 11 + d * 3) % 17).toFloat))
    }.toDF("vec_id", "label", "embedding")
    val indexDir = graft.TempDirs.create("plan-single-probe-ivf")
    Similarity.persistIvfIndex(Similarity.buildIvfIndexFrom(corpus), indexDir)
    val qv = Seq.tabulate(8)(d => (d % 5).toFloat)
    spark.listenerManager.register(listener)
    try {
      val plain = Similarity.ivfProbeVectorServed(spark, indexDir, qv, k = 3)
      assert(plain.collect().nonEmpty, "plain probe empty — gate vacuous")
      walk(plain.queryExecution.executedPlan)
      val rr = Similarity.ivfProbeVectorRerankedServed(spark, indexDir, qv,
        k = 3, nprobeWide = 3, rerankCells = 2, poolSize = 20)
      assert(rr.collect().nonEmpty, "int8 reranked probe empty — gate vacuous")
      walk(rr.queryExecution.executedPlan)
      val pq = Similarity.ivfProbeVectorRerankedServedPq(spark, indexDir, qv,
        k = 3, nprobeWide = 3, rerankCells = 2, poolSize = 20)
      assert(pq.collect().nonEmpty, "pq reranked probe empty — gate vacuous")
      walk(pq.queryExecution.executedPlan)
      val deadline = System.currentTimeMillis() + 20000
      while (rankSorts.get() < 3 && System.currentTimeMillis() < deadline)
        Thread.sleep(100)
      Thread.sleep(1000)
      assert(rankSorts.get() >= 3,
        s"only ${rankSorts.get()} rank sorts captured — gate vacuous")
      import scala.jdk.CollectionConverters._
      assert(fat.isEmpty, fat.asScala.mkString("; "))
    } finally spark.listenerManager.unregister(listener)
  }

  test("ivf k-expansion seeds: the corpus rank shuffle is narrow; winner embeddings ride a broadcast join") {
    // the r13/r14 band-ladder lesson, pinned preemptively on the seed
    // pass: a per-label rank sort that carries the full vector payload
    // sort-spills at soak scale. The only exchange allowed to carry
    // `embedding` is the ≤(kTarget−k)-row fresh-label window
    // (control-plane, single partition); the corpus-sized label-hash
    // shuffle ships (label, vec_id, d2) and the winners' embeddings
    // come back via a broadcast hash join, map-side.
    import spark.implicits._
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.exchange.{ReusedExchangeExec, ShuffleExchangeLike}
    import org.apache.spark.sql.execution.joins.BroadcastHashJoinExec
    val corpus = Seq.tabulate(60) { i =>
      (i.toLong, (i % 3).toLong, Array.tabulate(4)(d => (i * 7 % 13 + d).toFloat))
    }.toDF("vec_id", "label", "embedding")
    val cents = Seq.tabulate(3)(b =>
      (b.toLong, Seq.fill(4)(b.toDouble))).toDF("label", "cent")
    val df = graft.ops.Similarity.expandCentroidSeeds(cents, corpus, 8)
    // collect() (not count()) so the walked plan is THIS df's own
    // AQE-final execution, not a separate aggregate QueryExecution
    assert(df.collect().length === 8, "seed widening did not reach kTarget")
    var shuffles = List.empty[ShuffleExchangeLike]
    var bhj = 0
    def walk(p: SparkPlan): Unit = {
      p match {
        case e: ShuffleExchangeLike => shuffles ::= e
        case _: BroadcastHashJoinExec => bhj += 1
        case _ => ()
      }
      val kids = p match {
        case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
        case s: QueryStageExec => Seq(s.plan)
        case r: ReusedExchangeExec => Seq(r.child)
        case other => other.children
      }
      kids.foreach(walk)
    }
    walk(df.queryExecution.executedPlan)
    val fat = shuffles.filter(_.output.exists(_.name == "embedding"))
    assert(shuffles.size > fat.size,
      "no narrow shuffle captured — the rank pass went missing entirely")
    assert(fat.forall(_.outputPartitioning.numPartitions == 1),
      "embedding crossed a corpus-sized exchange: " +
        fat.map(e => s"${e.nodeName}(${e.outputPartitioning})").mkString("; "))
    assert(bhj >= 1, "winner embeddings not fetched by a broadcast hash join")
  }
}

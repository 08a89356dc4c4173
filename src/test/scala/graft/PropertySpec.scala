package graft

import java.sql.Timestamp

import graft.ops.Similarity
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property-style tests (ScalaCheck generators, fixed seeds for
  * determinism): algebraic invariants the operator library must hold
  * regardless of data. */
case class PropEvent(user_id: Long, event_id: Long, ts: Timestamp,
    event_type: String, value: Double)

class PropertySpec extends SparkSuite {
  import spark.implicits._

  private val genEvents: Gen[List[PropEvent]] = {
    val base = 1704067200L
    val genE = for {
      u <- Gen.choose(0L, 5L)
      id <- Gen.choose(0L, 100000L)
      sec <- Gen.choose(0L, 7L * 86400)
      t <- Gen.oneOf("view", "click", "purchase", "signup", "error")
      v <- Gen.choose(0, 99999).map(_ / 100.0)
    } yield PropEvent(u, id, new Timestamp((base + sec) * 1000L), t, v)
    Gen.listOfN(300, genE)
  }

  private def sample(i: Int): List[PropEvent] =
    genEvents(Gen.Parameters.default, Seed(42L + i)).get
      // distinct event ids make window-function order deterministic
      .groupBy(_.event_id).map(_._2.head).toList

  test("zero-padded union aggregation equals direct conditional aggregation") {
    for (i <- 0 until 5) {
      val ev = sample(i).toDF()
      val branches = Seq("view", "click", "purchase").map { t =>
        ev.filter(col("event_type") === t)
          .select(
            col("ts"),
            (if (t == "view") lit(1L) else lit(0L)).as("pv"),
            (if (t == "click") lit(1L) else lit(0L)).as("ck"),
            (if (t == "purchase") lit(1L) else lit(0L)).as("oc"))
      }
      val viaUnion = branches.reduce(_ unionByName _)
        .groupBy(window(col("ts"), "1 day"))
        .agg(sum("pv").as("pv"), sum("ck").as("ck"), sum("oc").as("oc"))
        .select(col("window.start").as("w"), col("pv"), col("ck"), col("oc"))
      val direct = ev.filter(col("event_type").isin("view", "click", "purchase"))
        .groupBy(window(col("ts"), "1 day"))
        .agg(
          sum(when(col("event_type") === "view", 1L).otherwise(0L)).as("pv"),
          sum(when(col("event_type") === "click", 1L).otherwise(0L)).as("ck"),
          sum(when(col("event_type") === "purchase", 1L).otherwise(0L)).as("oc"))
        .select(col("window.start").as("w"), col("pv"), col("ck"), col("oc"))
      assert(viaUnion.orderBy("w").collect().toSeq ===
        direct.orderBy("w").collect().toSeq, s"sample $i")
    }
  }

  test("symmetric interval join commutes") {
    for (i <- 0 until 3) {
      val ev = sample(i).toDF()
      val l = ev.select(col("user_id").as("lu"), col("event_id").as("li"), col("ts").as("lts"))
      val r = ev.select(col("user_id").as("ru"), col("event_id").as("ri"), col("ts").as("rts"))
      val cond = col("lu") === col("ru") &&
        col("rts").between(col("lts") - expr("INTERVAL 1 HOUR"), col("lts") + expr("INTERVAL 1 HOUR"))
      val ab = l.join(r, cond).select(col("li"), col("ri"))
        .as[(Long, Long)].collect().toSet
      val ba = r.join(l, cond).select(col("li"), col("ri"))
        .as[(Long, Long)].collect().toSet
      assert(ab === ba, s"sample $i")
    }
  }

  test("first-per-day dedup is idempotent and never grows") {
    for (i <- 0 until 3) {
      val ev = sample(i).toDF()
      def dedup(df: org.apache.spark.sql.DataFrame) = {
        val w = Window.partitionBy(col("user_id"), to_date(col("ts")))
          .orderBy("ts", "event_id")
        df.withColumn("rn", row_number().over(w)).filter(col("rn") === 1).drop("rn")
      }
      val once = dedup(ev).cache()
      val twice = dedup(once)
      assert(once.count() <= ev.count())
      assert(twice.collect().toSet === once.collect().toSet, s"sample $i")
    }
  }

  test("vec_dot is commutative and matches scalar computation") {
    val genVec = Gen.listOfN(64, Gen.choose(-1000, 1000).map(_ / 100.0f))
    for (i <- 0 until 5) {
      val a = genVec(Gen.Parameters.default, Seed(7L + i)).get.toArray
      val b = genVec(Gen.Parameters.default, Seed(77L + i)).get.toArray
      val df = Seq((a, b)).toDF("a", "b").select(
        Similarity.dot(col("a"), col("b")).as("ab"),
        Similarity.dot(col("b"), col("a")).as("ba"))
      val row = df.head()
      val expected = a.zip(b).foldLeft(0.0) { case (acc, (x, y)) =>
        acc + x.toDouble * y.toDouble
      }
      assert(row.getDouble(0) === row.getDouble(1), s"sample $i")
      assert(row.getDouble(0) === expected, s"sample $i")
    }
  }

  test("connected components collapse one big adversarial cluster with O(V) state") {
    // Adversarial shape for clustering: ONE component spanning every
    // node (a web corpus with a shared boilerplate family). A
    // transitive-closure reach set would materialize ~V·depth pairs and
    // grow quadratically on denser graphs; min-label propagation keeps
    // exactly V label rows per iteration and converges in the tree
    // depth (~log V here). Two shifted trees also prove components
    // don't bleed into each other.
    val n = 4096L
    def tree(offset: Long) = spark.range(1, n)
      .select((col("id") + offset).as("doc_a"),
        ((col("id") / 2).cast("long") + offset).as("doc_b"))
    val edges = tree(0).unionByName(tree(1000000))
    val labels = graft.ops.Dedup.connectedComponents(edges).cache()
    assert(labels.count() === 2 * n)
    val reps = labels.select("label").distinct().as[Long].collect().sorted.toSeq
    assert(reps === Seq(0L, 1000000L))
    labels.unpersist()
  }

  test("connected components converge in O(log V) rounds on a worst-case path graph") {
    // A path is the diameter-maximizing shape (a chain of near-dup
    // docs, each one edit from the next). Edge-only propagation needs
    // ~V rounds — V driver-coordinated Spark jobs at corpus scale; the
    // label-star shortcuts must bring it to O(log V).
    val n = 2048L
    val path = spark.range(1, n)
      .select(col("id").as("doc_a"), (col("id") - 1).as("doc_b"))
    val (labels, iters) = graft.ops.Dedup.connectedComponentsIters(path)
    assert(labels.filter(col("label") =!= 0L).count() === 0L,
      "every node of the path must collapse to the minimum id")
    assert(labels.count() === n)
    // log2(2048) = 11; allow generous slack for the fixpoint-detection
    // round, but fail loudly if convergence degrades toward O(V)
    assert(iters <= 30, s"path of $n nodes took $iters rounds — O(log V) regressed")
  }

  test("HLL distinct sketch tracks the exact set-buffer aggregator within error bound") {
    import org.apache.spark.sql.functions.udaf
    val exact = udaf(new graft.functions.DistinctLongCount,
      org.apache.spark.sql.Encoders.scalaLong)
    val sketch = udaf(new graft.functions.HllDistinctLongCount(12),
      org.apache.spark.sql.Encoders.scalaLong)
    // p=12 → stderr ≈ 1.04/√4096 ≈ 1.6 %; assert within 5 % (≈3σ)
    // across cardinalities spanning the linear-counting and raw-HLL
    // estimator regimes, with duplicates and partition-order variance.
    for ((n, i) <- Seq(500L, 20000L, 200000L).zipWithIndex) {
      val ids = spark.range(n * 3).select(
        (org.apache.spark.sql.functions.pmod(
          org.apache.spark.sql.functions.hash(col("id") + (i * 1000)), lit(n.toInt))
          .cast("long")).as("v"))
      val row = ids.agg(exact(col("v")).as("ex"), sketch(col("v")).as("sk")).head()
      val (ex, sk) = (row.getLong(0), row.getLong(1))
      assert(math.abs(sk - ex).toDouble / ex <= 0.05, s"n=$n exact=$ex sketch=$sk")
    }
  }

  test("approx_percentile stays within rank-error bound of exact percentile") {
    // the quantile-sketch scale path mirrors HLL-for-distinct: exact
    // percentile is the oracle-checked form (a14), approx_percentile
    // (accuracy = 1/eps) is what a 100 TB aggregation would run.
    // Rank guarantee: |rank(approx) - target_rank| <= eps * n, which
    // we check directly through the empirical CDF.
    val acc = 1000 // eps = 1/1000
    for (i <- 0 until 3) {
      val n = 50000
      val vals = spark.range(n).select(
        (org.apache.spark.sql.functions.pmod(
          org.apache.spark.sql.functions.hash(col("id") + (i * 7717)), lit(100000))
          .cast("double") / 100.0).as("v"))
      for (q <- Seq(0.5, 0.95)) {
        val approx = vals
          .agg(org.apache.spark.sql.functions.percentile_approx(
            col("v"), lit(q), lit(acc)).as("a"))
          .head().getDouble(0)
        val rank = vals.filter(col("v") <= approx).count().toDouble / n
        assert(math.abs(rank - q) <= 1.0 / acc + 1e-9,
          s"sample $i q=$q approx=$approx rank=$rank")
      }
    }
  }

  test("salted aggregation equals plain aggregation on generated data") {
    for (i <- 0 until 3) {
      val ev = sample(i).toDF()
      val salted = graft.ops.ScaleOps.saltedSum(
        ev, col("event_type"), col("event_id"), 8,
        Map("s" -> col("value").cast("decimal(18,2)")))
        .select(col("k"), col("s").cast("double"))
      val plain = ev.groupBy(col("event_type").as("k"))
        .agg(sum(col("value").cast("decimal(18,2)")).cast("double").as("s"))
      assert(salted.orderBy("k").collect().toSeq ===
        plain.orderBy("k").collect().toSeq, s"sample $i")
    }
  }

  test("bloom prefilter has no false negatives on generated member sets") {
    import org.apache.spark.sql.GraftBridge
    import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
    import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
    import org.apache.spark.sql.types.BinaryType
    // the exactness contract decontaminate_bloom relies on: every
    // member of the build set must pass might_contain (false positives
    // are fine — the exact verify join removes them; a false negative
    // would silently drop contamination)
    val genStrings = Gen.listOfN(500,
      Gen.choose(0L, Long.MaxValue).map(n => s"shingle_$n"))
    for (i <- 0 until 5) {
      val members = genStrings(Gen.Parameters.default, Seed(7L + i)).get.distinct
      val df = members.toDF("h")
      val bloomBytes = df
        .select(GraftBridge.column(new BloomFilterAggregate(
          GraftBridge.expression(xxhash64(col("h"))), 100000L)
          .toAggregateExpression()).as("bf"))
        .head().getAs[Array[Byte]]("bf")
      val mightContain = GraftBridge.column(new BloomFilterMightContain(
        Literal(bloomBytes, BinaryType),
        GraftBridge.expression(xxhash64(col("h")))))
      val kept = df.filter(mightContain).count()
      assert(kept === members.size.toLong, s"sample $i: bloom dropped a member")
    }
  }

  test("decimal-sum queries survive 100 TB magnitudes (×10⁶ values) without ANSI overflow") {
    // Spark 4 runs ANSI mode: a decimal SUM that outgrows its width
    // RAISES instead of silently wrapping — which is the right
    // behavior, provided the widths are sized for the target scale.
    // This gate replays the decimal-sum queries over the sf0.001
    // tables with every money/quantity/value column multiplied by 10⁶,
    // so aggregate totals match what a ~100 TB corpus would produce.
    // A width narrowed in a refactor (e.g. a SUM cast back to
    // DECIMAL(18,2) too early) fails HERE, at test time, not in a
    // production run. q11's r3 widening is the pattern this
    // generalizes.
    import graft.ops.Tables
    val src = sf("sf0.001")
    val dir = java.nio.file.Files.createTempDirectory("sf-mag").toString
    val M = 1000000L
    Tables.table(spark, src, "lineitem")
      .withColumn("l_quantity", col("l_quantity") * M)
      .withColumn("l_extendedprice", col("l_extendedprice") * M)
      .write.parquet(s"$dir/lineitem.parquet")
    // dimension values stay unscaled: scaling e.g. p_retailprice too
    // would square the ×10⁶ factor in q9's cost product
    Seq("part", "supplier", "nation", "orders", "customer", "region")
      .foreach { t =>
        Tables.table(spark, src, t).write.parquet(s"$dir/$t.parquet")
      }
    Tables.events(spark, src)
      .withColumn("value", col("value") * M)
      .write.parquet(s"$dir/events.parquet")

    for (q <- Seq("q1_agg", "q9_product_profit", "q11_important_stock",
        "q15_top_supplier", "q17_small_qty_revenue", "a1_product_stats")) {
      val rows = SparkEntry.queries(q)(spark, dir).collect()
      assert(rows.nonEmpty, s"$q returned no rows at ×10⁶ magnitudes")
      // a silent TRY_CAST escape valve would surface as null/NaN
      // aggregates — every numeric cell must be a finite value
      rows.foreach { r =>
        (0 until r.length).foreach { i =>
          assert(!r.isNullAt(i), s"$q: null cell $i at ×10⁶ magnitudes in $r")
          r.get(i) match {
            case d: Double => assert(!d.isNaN && !d.isInfinite, s"$q: $r")
            case _ => ()
          }
        }
      }
    }
  }
}

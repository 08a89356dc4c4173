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

  /** recall@10 of one ANN probe against the brute-force exact top-10
    * for the same query vector (both computed over `corpus`). */
  private def recallAt10(corpus: org.apache.spark.sql.DataFrame,
      got: Seq[Long], qe: Seq[Float], exclude: Option[Long]): Double = {
    val q = spark.range(1).select(typedLit(qe).as("qe"))
      .withColumn("qnorm", sqrt(Similarity.dot(col("qe"), col("qe"))))
    val cos = Similarity.dot(col("embedding"), col("qe")) /
      (sqrt(Similarity.dot(col("embedding"), col("embedding"))) * col("qnorm"))
    val base = exclude.fold(corpus)(id => corpus.filter(col("vec_id") =!= id))
    val bf = base.crossJoin(broadcast(q))
      .select(col("vec_id"), cos.as("cos"))
      .orderBy(col("cos").desc, col("vec_id")).limit(10)
      .collect().map(_.getLong(0)).toSet
    got.toSet.intersect(bf).size.toDouble / bf.size
  }

  test("IVF recall@10 at nprobe=2 clears the floor over 20 sampled query vectors") {
    // The operational ANN metric the exact-agreement oracle checks
    // can't see: across a spread of query points, how much of the TRUE
    // top-10 does the 2-cell probe recover? The floor is gated on a
    // CLUSTERED corpus — the data shape IVF is for; tight clusters,
    // queries from every cluster including members near cell
    // boundaries. (A floor this high is unattainable on isotropic
    // vectors, by the geometry, not the index — see the second half.)
    val rnd = new scala.util.Random(31)
    def cv(c: Int): Seq[Float] =
      Seq.tabulate(16)(d =>
        ((if (d == c) 10.0 else 0.0) + rnd.nextGaussian() * 0.8).toFloat)
    val corpus = (0 until 400).map(i => (i.toLong, i % 4, cv(i % 4)))
      .toDF("vec_id", "label", "embedding").cache()
    val idx = Similarity.buildIvfIndexFrom(corpus)
    val qids = (0 until 20).map(i => (i * 20 + i % 4).toLong)
    val vecs = corpus.filter(col("vec_id").isin(qids: _*))
      .select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toSeq).toMap
    val recalls = qids.map { qid =>
      val got = Similarity.ivfProbe(idx, qid, k = 10, nprobe = 2)
        .collect().map(_.getLong(0)).toSeq
      recallAt10(corpus, got, vecs(qid), exclude = Some(qid))
    }
    val avg = recalls.sum / recalls.size
    assert(avg >= 0.9, s"IVF recall@10 floor broken: avg=$avg per-query=$recalls")
    corpus.unpersist()

    // On the driver-generated embeddings table the labels cluster only
    // weakly (near-isotropic vectors): the honest operational claims
    // are (a) a 2-of-10-cell probe still beats the random cell share,
    // and (b) recall is monotone in nprobe and exact at full probe —
    // the dial an operator actually turns.
    val emb = graft.ops.Tables.table(spark, sf("sf0.001"), "embeddings")
    val ridx = Similarity.buildIvfIndex(spark, sf("sf0.001"))
    val rids = emb.select("vec_id").orderBy("vec_id").collect().map(_.getLong(0))
    val rqids = (0 until 10).map(i => rids(i * rids.length / 10))
    val rvecs = emb.filter(col("vec_id").isin(rqids: _*))
      .select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toSeq).toMap
    def avgAt(nprobe: Int): Double = {
      val rs = rqids.map { qid =>
        val got = Similarity.ivfProbe(ridx, qid, k = 10, nprobe = nprobe)
          .collect().map(_.getLong(0)).toSeq
        recallAt10(emb, got, rvecs(qid), exclude = Some(qid))
      }
      rs.sum / rs.size
    }
    val (r2, r5, r10) = (avgAt(2), avgAt(5), avgAt(10))
    assert(r2 > 0.2, s"2-of-10-cell probe under the random share: $r2")
    assert(r2 <= r5 && r5 <= r10, s"recall not monotone in nprobe: $r2 $r5 $r10")
    assert(r10 === 1.0, s"full probe must be exact: $r10")
  }

  test("roundedRatio equals BigDecimal HALF_UP on randomized ratios, tie-dense denominators included") {
    // The exactness claim behind the round-tie sweep, held against
    // java.math's own HALF_UP over a generator biased toward the
    // denominators that terminate at the rounding digit (powers of
    // two/five times small factors — where Spark's string-round and
    // DuckDB's binary-round used to diverge).
    val tieDens = Seq(2L, 4L, 8L, 16L, 32L, 64L, 128L, 256L, 640L, 800L,
      1600L, 3200L, 2000L, 12500L)
    val gen = for {
      num <- Gen.choose(-2000000L, 2000000L)
      den <- Gen.oneOf(Gen.oneOf(tieDens), Gen.choose(1L, 99999L))
      n <- Gen.choose(0, 6)
    } yield (num, den, n)
    val cases = Gen.listOfN(300, gen)
      .apply(Gen.Parameters.default, Seed(7L)).get
    val out = cases.zipWithIndex.map { case ((num, den, n), i) => (i, num, den, n) }
      .toDF("i", "num", "den", "n")
    // one pass per distinct scale (the scale is a plan-time constant)
    val results = (0 to 6).flatMap { n =>
      out.filter(col("n") === n)
        .select(col("i"), QueryDef.roundedRatio(col("num"), col("den"), n).as("r"))
        .collect().map(r => r.getInt(0) -> r.getDouble(1))
    }.toMap
    for (((num, den, n), i) <- cases.zipWithIndex) {
      val want = new java.math.BigDecimal(num)
        .divide(new java.math.BigDecimal(den), n, java.math.RoundingMode.HALF_UP)
        .doubleValue()
      assert(results(i) === want, s"$num/$den @$n: got ${results(i)} want $want")
    }
  }

  test("a14 percentile re-rounding is tie-free at 6 decimals on cent grids (and scale 2 would NOT be)") {
    // The conventions note argues a14's interpolated percentiles are
    // safe to ROUND at 6 decimals: over cent-priced data the exact
    // value v_lo + f·(v_hi − v_lo) with f ∈ {k/20, k/4} terminates at
    // ≤ 4 decimal places, so the 7th digit can never be the tie digit
    // where Spark's shortest-decimal-string HALF_UP and DuckDB's
    // binary-value rounding diverge. This gate holds that argument
    // against Spark's REAL `round` over a tie-dense grid of cent
    // values, adjacent-cent gaps, and exactly the f denominators the
    // three percentiles (0.25/0.50/0.95) can produce — compared to
    // both binary models (full-expansion BigDecimal HALF_UP and the
    // C-style round(v·10⁶)/10⁶). The scale-2 leg proves the gate is
    // SHARP: the same grid shows real divergence at the old 2-place
    // display rounding (half-cent ties), so a regression back to
    // ROUND(x, 2) cannot pass silently.
    val gen = for {
      cents <- Gen.choose(1L, 100000000L) // lo price in cents (≤ $1M)
      gap <- Gen.oneOf(Gen.oneOf(1L, 2L, 5L, 25L, 50L, 100L), Gen.choose(1L, 100000L))
      fr <- Gen.oneOf((0 to 20).map(k => (k, 20)) ++ (0 to 4).map(k => (k, 4)))
    } yield (cents, gap, fr._1, fr._2)
    val cases = Gen.listOfN(400, gen).apply(Gen.Parameters.default, Seed(11L)).get
    val ds = cases.zipWithIndex.map { case ((c, g, k, q), i) =>
      val lo = c / 100.0
      val hi = (c + g) / 100.0
      (i, lo + (k.toDouble / q) * (hi - lo)) // Spark Percentile's interpolation arithmetic
    }
    val sparkRounded = ds.toDF("i", "d")
      .select(col("i"), round(col("d"), 6).as("r6"), round(col("d"), 2).as("r2"))
      .collect().map(r => r.getInt(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    var scale2Divergences = 0
    for ((i, d) <- ds) {
      val binary6 = new java.math.BigDecimal(d)
        .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
      val cstyle6 = math.round(d * 1e6).toDouble / 1e6
      assert(sparkRounded(i)._1 === binary6,
        s"round($d, 6): Spark ${sparkRounded(i)._1} vs binary $binary6 — 6-decimal tie found")
      assert(sparkRounded(i)._1 === cstyle6,
        s"round($d, 6): Spark ${sparkRounded(i)._1} vs C-style $cstyle6")
      val binary2 = new java.math.BigDecimal(d)
        .setScale(2, java.math.RoundingMode.HALF_UP).doubleValue()
      if (sparkRounded(i)._2 != binary2) scale2Divergences += 1
    }
    assert(scale2Divergences > 0,
      "grid produced no scale-2 ties — the gate lost its sharpness (regenerate the grid)")
  }

  test("re-ranked probe repairs the L2-quantizer/cosine mismatch at the same exact-read cell count") {
    // The geometry the plain probe cannot fix: a cluster angularly
    // aligned with the query but at a different magnitude is FAR from
    // every query by centroid L2 (the coarse quantizer's metric), so
    // nprobe=2 never reads its cell — yet its members dominate the
    // true cosine top-10. The sketch stage scores all cells' members
    // approximately and hands exact cosine the RIGHT 2 cells.
    val rnd = new scala.util.Random(47)
    def noisy(center: Seq[Double], s: Double): Seq[Float] =
      center.map(c => (c + rnd.nextGaussian() * s).toFloat)
    def axis(c: Int, mag: Double): Seq[Double] =
      Seq.tabulate(16)(d => if (d == c) mag else 0.0)
    // cells 0..8: magnitude-3 clusters on orthogonal axes (noise 0.5);
    // cell 9: magnitude-8 on AXIS 0 (tight, noise 0.2) — cosine-close
    // to cell 0's direction, L2-far from every centroid
    val rows =
      (0 until 360).map(i => (i.toLong, i % 9, noisy(axis(i % 9, 3.0), 0.5))) ++
        (360 until 400).map(i => (i.toLong, 9, noisy(axis(0, 8.0), 0.2)))
    val corpus = rows.toDF("vec_id", "label", "embedding").cache()
    val idx = Similarity.buildIvfIndexFrom(corpus)
    // queries: members of cluster 0 (axis-0 direction)
    val qids = Seq(0L, 9L, 18L, 27L, 36L)
    val vecs = corpus.filter(col("vec_id").isin(qids: _*))
      .select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toSeq).toMap
    def avgRecall(probe: Long => Seq[Long]): Double = {
      val rs = qids.map { qid =>
        recallAt10(corpus, probe(qid), vecs(qid), exclude = Some(qid))
      }
      rs.sum / rs.size
    }
    val plain = avgRecall(qid =>
      Similarity.ivfProbe(idx, qid, k = 10, nprobe = 2)
        .collect().map(_.getLong(0)).toSeq)
    val reranked = avgRecall(qid =>
      Similarity.ivfProbeReranked(idx, qid, k = 10, nprobeWide = 10,
        rerankCells = 2).collect().map(_.getLong(0)).toSeq)
    assert(plain <= 0.5,
      s"fixture broken: plain nprobe=2 recall $plain — no mismatch to repair")
    assert(reranked >= 0.95,
      s"re-ranked recall floor broken: $reranked (plain was $plain)")
    // the PQ codec must repair the same geometry: the misplaced
    // cluster's members reconstruct near themselves (its own centroid
    // is a codeword in every subspace), so their LUT scores top the
    // pool exactly as the int8 sketch's do
    val rerankedPq = avgRecall(qid =>
      Similarity.ivfProbeRerankedPq(idx, qid, k = 10, nprobeWide = 10,
        rerankCells = 2).collect().map(_.getLong(0)).toSeq)
    assert(rerankedPq >= 0.95,
      s"PQ re-ranked recall floor broken: $rerankedPq (plain was $plain)")

    // trained sub-codebooks must hold the same floor THROUGH THE
    // SERVED PATH on this adversarial geometry, and at least tie the
    // int8 sketch at equal rerankCells (the r9 VERDICT's gate for the
    // optional trained depth): Lloyd starts from the projection
    // codebook and refines on the data, so fidelity can only move
    // toward the sample's true subspace structure
    val dir = java.nio.file.Files.createTempDirectory("pqcb-geom").toString
    Similarity.persistIvfIndex(idx, dir, trainPqIters = 3)
    assert(graft.IndexFs.isDir(spark, s"$dir/pqcb_g0"))
    val servedInt8 = avgRecall(qid =>
      Similarity.ivfProbeVectorRerankedServed(spark, dir, vecs(qid),
        k = 10, nprobeWide = 10, rerankCells = 2, exclude = Some(qid))
        .collect().map(_.getLong(0)).toSeq)
    val servedTrainedPq = avgRecall(qid =>
      Similarity.ivfProbeVectorRerankedServedPq(spark, dir, vecs(qid),
        k = 10, nprobeWide = 10, rerankCells = 2, exclude = Some(qid))
        .collect().map(_.getLong(0)).toSeq)
    assert(servedTrainedPq >= 0.95,
      s"trained-PQ served recall floor broken: $servedTrainedPq")
    assert(servedTrainedPq >= servedInt8,
      s"trained PQ ($servedTrainedPq) below the int8 sketch ($servedInt8) at equal rerankCells")
    corpus.unpersist()
  }

  test("drifted index: off-cluster appends split across cells drop recall until compaction's Lloyd rebuild restores it") {
    // The drift→compact→recover arc on the PERSISTED serving path. An
    // appended semantic cluster that straddles two stored centroids'
    // boundary is SPLIT across both cells (nearest-centroid assignment
    // has no better choice), so an nprobe=1 query into that region
    // sees only half its true neighbors — the recall failure a stored
    // coarse quantizer cannot repair without re-clustering. Compaction
    // with Lloyd iterations moves a centroid onto the appended mass
    // and reunifies it in ONE cell; the same probe then recovers.
    val rnd = new scala.util.Random(7)
    def v(mean: Seq[Double], jitterFrom: Int): Seq[Float] =
      Seq.tabulate(16)(d =>
        ((if (d < mean.length) mean(d) else 0.0) +
          (if (d >= jitterFrom) rnd.nextGaussian() * 0.3 else 0.0)).toFloat)
    // base: big cluster 0 at 10·e1, SMALL cluster 1 at 10·e2 (so the
    // appended mass can out-pull it), big cluster 2 at 10·e3
    val base =
      (0 until 100).map(i => (i.toLong, 0, v(Seq(10.0, 0.0), 2))) ++
      (100 until 115).map(i => (i.toLong, 1, v(Seq(0.0, 10.0), 2))) ++
      (200 until 300).map(i => (i.toLong, 2, v(Seq(0.0, 0.0, 10.0), 3)))
    val indexDir = java.nio.file.Files.createTempDirectory("ivf-drift").toString
    Similarity.persistIvfIndex(
      Similarity.buildIvfIndexFrom(base.toDF("vec_id", "label", "embedding")), indexDir)

    // appended cloud at 10·(e1+e2) — equidistant from c0 and c1. The
    // ±0.5 parity offset along (e1−e2) makes the split DETERMINISTIC:
    // even ids land in cell 0, odd ids in cell 1, 40/40 (jitter lives
    // in dims ≥3, where c0 and c1 agree, so it cannot flip the
    // assignment).
    val cloud = (1000 until 1080).map { i =>
      val d = if (i % 2 == 0) 0.5 else -0.5
      (i.toLong, v(Seq(10.0 + d, 10.0 - d), 3))
    }
    Similarity.appendToPersistedIvfIndex(spark, indexDir,
      cloud.toDF("vec_id", "embedding"), batchId = 1L)

    // 20 query vectors in the cloud's region, symmetric in dims 0–1
    val queries = (0 until 20).map(_ => v(Seq(10.0, 10.0), 3))
    val corpus = (base.map(t => (t._1, t._3)) ++ cloud)
      .toDF("vec_id", "embedding")
    def avgRecall(): Double = {
      val rs = queries.map { qe =>
        val got = Similarity.ivfProbeVectorServed(spark, indexDir, qe, nprobe = 1)
          .collect().map(_.getLong(0)).toSeq
        recallAt10(corpus, got, qe, exclude = None)
      }
      rs.sum / rs.size
    }
    val dropped = avgRecall()
    assert(dropped < 0.8,
      s"straddling append did not split across cells (recall=$dropped) — the arc is untestable")

    // compaction WITH Lloyd re-clustering: the small cluster-1 centroid
    // is pulled onto the appended mass, the next assignment round hands
    // it the whole cloud, and the probe's one cell now holds every true
    // neighbor
    Similarity.compactIvfIndex(spark, indexDir, lloydIters = 4)
    val recovered = avgRecall()
    assert(recovered >= 0.9 && recovered > dropped,
      s"Lloyd rebuild did not restore recall: dropped=$dropped recovered=$recovered")
  }

  test("MinHash banding candidate recall follows the s-curve: high-overlap pairs collide, low-overlap pairs don't") {
    // The analytical property behind every LSH dedup operator: with 2
    // bands of 4 minhashes, a pair at shingle-Jaccard s collides with
    // probability 1-(1-s⁴)² — ≈0.88 at s≈0.9, ≈0.01 at s≈0.28. 40
    // generated pairs per regime (disjoint vocabularies, so cross-pair
    // collisions are impossible); the md5-backed minhash is
    // deterministic, so the measured fractions are fixed, not flaky.
    val nPairs = 40
    def pairDocs(changed: Int): Seq[(Long, String)] =
      (0 until nPairs).flatMap { i =>
        val base = (0 until 60).map(j => s"p${i}t$j")
        val edited = base.dropRight(changed) ++ (0 until changed).map(j => s"p${i}x$j")
        Seq((i * 2L, base.mkString(" ")), (i * 2L + 1, edited.mkString(" ")))
      }
    def detected(changed: Int): Double = {
      val pairs = graft.ops.Dedup.nearDupPairsLocal(
        pairDocs(changed).toDF("doc_id", "text"), threshold = 0.0)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      (0 until nPairs).count(i => pairs.contains((i * 2L, i * 2L + 1))).toDouble / nPairs
    }
    val hi = detected(1)  // tail-edit of 1 token: shingle Jaccard ≈ 0.90
    val lo = detected(30) // half the doc rewritten: ≈ 0.28
    assert(hi >= 0.6, s"high-overlap candidate recall broken: $hi")
    assert(lo <= 0.2, s"low-overlap pairs leaking into candidates: $lo")
    assert(hi > lo + 0.4, s"no s-curve separation: hi=$hi lo=$lo")
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

  test("StreamBench SPARK_GRAFT_STREAM_ONLY parser: subset honored, typo fails loudly") {
    // unset → the full six-family suite
    assert(StreamBench.parseStreamOnly(None).size == 6)
    assert(StreamBench.parseStreamOnly(Some(" uv_dedup_tws , cep_pattern ")) ==
      Set("uv_dedup_tws", "cep_pattern"))
    // a typo must not silently measure an empty suite
    val e = intercept[IllegalArgumentException] {
      StreamBench.parseStreamOnly(Some("uv_dedup_tws,cep_patern"))
    }
    assert(e.getMessage.contains("cep_patern"))
    intercept[IllegalArgumentException] {
      StreamBench.parseStreamOnly(Some(" , "))
    }
  }
}

package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.Materialize.Ops
import graft.ops.Dedup

/** The resilience switch: `.materialized` must produce identical
  * results in both modes, and must actually route through Spark's
  * reliable checkpoint when a checkpoint dir is configured (the
  * cluster deploy shape — recomputable blocks, not executor-local
  * ones). [[Materialize.releasable]] additionally hands the caller the
  * unpersist handle — the loop form (`connectedComponentsIters`) pins
  * the new round and frees the prior one, so its live storage is O(V)
  * regardless of round count; the tests below prove the handle's
  * contract (correct before AND after release, blocks actually freed,
  * partitioning metadata kept, reliable-mode no-op).
  */
class MaterializeSpec extends SparkSuite {

  // restore the shared session's local mode for later suites:
  // Option(null) is the documented None route through the public
  // setCheckpointDir — no reflection into SparkContext internals
  private def withCheckpointDir[A](prefix: String)(body: String => A): A = {
    assert(spark.sparkContext.getCheckpointDir.isEmpty,
      "test assumes the shared session starts without a checkpoint dir")
    val dir = Files.createTempDirectory(prefix).toString
    spark.sparkContext.setCheckpointDir(dir)
    try body(dir)
    finally {
      spark.sparkContext.setCheckpointDir(null)
      assert(spark.sparkContext.getCheckpointDir.isEmpty,
        "public checkpoint-dir reset failed — later suites would " +
          "silently run every .materialized through reliable mode")
      deleteRecursively(new java.io.File(dir))
    }
  }

  private def deleteRecursively(f: java.io.File): Unit = {
    Option(f.listFiles()).getOrElse(Array.empty).foreach(deleteRecursively)
    f.delete(): Unit
  }

  test("jaccard chain is identical under localCheckpoint and reliable checkpoint") {
    val run = () => Dedup.dedupJaccardNgram.fn(spark, sf("sf0.001"))
      .collect().map(_.toString).sorted.toSeq

    val local = run()

    withCheckpointDir("graft-ckpt") { dir =>
      val reliable = run()
      assert(reliable == local)
      // the chain's candidate-pair materialization must have landed in
      // the reliable checkpoint dir (rdd-* block dirs), proving the
      // switch actually flipped modes rather than silently staying local
      val wrote = Files.walk(java.nio.file.Paths.get(dir)).iterator()
      val sawRdd = Iterator.continually(wrote)
        .takeWhile(_.hasNext).map(_.next().getFileName.toString)
        .exists(_.startsWith("rdd-"))
      assert(sawRdd, s"no rdd-* checkpoint blocks under $dir")
    }
  }

  test("reliable mode leaves a caller-owned cache in place") {
    withCheckpointDir("graft-ckpt-cache") { _ =>
      val cached = spark.range(0, 100).toDF("id").cache()
      cached.count()
      val mat = cached.materialized
      assert(mat.count() == 100)
      // the helper's persist/unpersist pair must not drop the cache the
      // CALLER took — `.cache().materialized` chains own their release
      assert(cached.storageLevel != org.apache.spark.storage.StorageLevel.NONE,
        "materialized dropped the caller's cache")
      cached.unpersist()
    }
  }

  test("materialized is eager and truncates lineage in local mode") {
    val df = spark.range(0, 1000).toDF("id")
      .selectExpr("id", "id * 2 AS twice").materialized
    // a materialized frame re-plans as a scan of stored blocks: no
    // Range leaf remains in the physical plan
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Range"), plan)
    assert(df.count() == 1000)
  }

  test("releasable: correct while pinned, blocks freed on release, correct after release") {
    import spark.implicits._
    val before = spark.sparkContext.getPersistentRDDs.keySet
    val df = spark.range(0, 5000).toDF("id").selectExpr("id", "id * 3 AS thrice")
    val (mat, release) = Materialize.releasable(df)
    val pinned = spark.sparkContext.getPersistentRDDs.keySet -- before
    assert(pinned.size == 1, s"expected exactly one pinned RDD, got $pinned")
    val expected = (0L until 5000L).map(i => (i, i * 3))
    assert(mat.as[(Long, Long)].collect().sorted.toSeq == expected)

    release()
    // deregistered immediately…
    assert((spark.sparkContext.getPersistentRDDs.keySet & pinned).isEmpty,
      "release() left the RDD registered as persistent")
    // …and the stored blocks actually drain (unpersist is non-blocking)
    val id = pinned.head
    def liveBlocks() = org.apache.spark.SparkEnv.get.blockManager.master
      .getMatchingBlockIds(_.asRDDId.exists(_.rddId == id),
        askStorageEndpoints = true)
    val deadline = System.nanoTime() + 30L * 1000 * 1000 * 1000
    while (liveBlocks().nonEmpty && System.nanoTime() < deadline)
      Thread.sleep(50)
    assert(liveBlocks().isEmpty, "pinned blocks were not freed by release()")

    // lineage retained: a post-release read RECOMPUTES (localCheckpoint
    // would throw here — its lineage is truncated) and is still right
    assert(mat.as[(Long, Long)].collect().sorted.toSeq == expected)
  }

  test("releasable keeps the origin's partitioning metadata: no re-shuffle downstream") {
    val part = spark.range(0, 1000).toDF("id")
      .withColumn("k", pmod(col("id"), lit(10)))
      .repartition(8, col("k"))
    val (mat, release) = Materialize.releasable(part)
    try {
      val agg = mat.groupBy("k").count()
      assert(agg.count() == 10)
      // AQE prints final + initial plans; assert only on what ran
      val planFull = agg.queryExecution.executedPlan.toString
      val plan = planFull.indexOf("== Initial Plan ==") match {
        case -1 => planFull
        case i  => planFull.substring(0, i)
      }
      assert(!plan.contains("Exchange"),
        s"groupBy over a releasable frame re-shuffled — partitioning metadata lost:\n$plan")
    } finally release()
  }

  test("releasable in reliable mode: delegates to the checkpoint, release is a safe no-op") {
    withCheckpointDir("graft-ckpt-rel") { dir =>
      val before = spark.sparkContext.getPersistentRDDs.keySet
      val (mat, release) = Materialize.releasable(
        spark.range(0, 100).toDF("id"))
      assert(mat.count() == 100)
      // blocks live on the checkpoint dir, not as session-pinned storage
      val wrote = Files.walk(java.nio.file.Paths.get(dir)).iterator()
      val sawRdd = Iterator.continually(wrote)
        .takeWhile(_.hasNext).map(_.next().getFileName.toString)
        .exists(_.startsWith("rdd-"))
      assert(sawRdd, s"no rdd-* checkpoint blocks under $dir")
      assert((spark.sparkContext.getPersistentRDDs.keySet -- before).isEmpty,
        "reliable-mode releasable left a session-pinned RDD behind")
      release() // nothing to release — must not break the frame
      assert(mat.count() == 100)
    }
  }
}

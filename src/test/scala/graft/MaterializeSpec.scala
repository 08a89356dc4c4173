package graft

import java.nio.file.Files

import graft.Materialize.Ops
import graft.ops.Dedup

/** The resilience switch: `.materialized` must produce identical
  * results in both modes, and must actually route through Spark's
  * reliable checkpoint when a checkpoint dir is configured (the
  * cluster deploy shape — recomputable blocks, not executor-local
  * ones).
  */
class MaterializeSpec extends SparkSuite {

  test("jaccard chain is identical under localCheckpoint and reliable checkpoint") {
    assert(spark.sparkContext.getCheckpointDir.isEmpty,
      "test assumes the shared session starts without a checkpoint dir")

    val run = () => Dedup.dedupJaccardNgram.fn(spark, sf("sf0.001"))
      .collect().map(_.toString).sorted.toSeq

    val local = run()

    val dir = Files.createTempDirectory("graft-ckpt").toString
    spark.sparkContext.setCheckpointDir(dir)
    try {
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
    } finally {
      // no public unset — restore the shared session's local mode so
      // later suites' plan-shape assertions see the default
      val f = classOf[org.apache.spark.SparkContext].getDeclaredField("checkpointDir")
      f.setAccessible(true)
      f.set(spark.sparkContext, None)
    }
  }

  test("reliable mode leaves a caller-owned cache in place") {
    assert(spark.sparkContext.getCheckpointDir.isEmpty,
      "test assumes the shared session starts without a checkpoint dir")
    val dir = Files.createTempDirectory("graft-ckpt-cache").toString
    spark.sparkContext.setCheckpointDir(dir)
    try {
      val cached = spark.range(0, 100).toDF("id").cache()
      cached.count()
      val mat = cached.materialized
      assert(mat.count() == 100)
      // the helper's persist/unpersist pair must not drop the cache the
      // CALLER took — `.cache().materialized` chains own their release
      assert(cached.storageLevel != org.apache.spark.storage.StorageLevel.NONE,
        "materialized dropped the caller's cache")
      cached.unpersist()
    } finally {
      val f = classOf[org.apache.spark.SparkContext].getDeclaredField("checkpointDir")
      f.setAccessible(true)
      f.set(spark.sparkContext, None)
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
}

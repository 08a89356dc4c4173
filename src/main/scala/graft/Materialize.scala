package graft

import org.apache.spark.sql.DataFrame

/** Eager materialization with a cluster-resilience switch.
  *
  * Hot multi-pass pipelines (LSH candidate pairs, IVF centroids, the
  * twice-referenced derived-ps relation) materialize an intermediate
  * once so the expensive upstream never re-runs. `localCheckpoint()`
  * is the right local form — no external storage required — but its
  * blocks are executor-local, non-replicated, and the lineage is
  * truncated: on a real cluster one lost executor kills the job
  * instead of recomputing. The deploy-time fix is Spark's reliable
  * `checkpoint()` (blocks on the checkpoint dir, recomputable by any
  * executor), which requires only `sparkContext.setCheckpointDir`.
  *
  * `df.materialized` picks the form from the context: checkpoint dir
  * configured ⇒ reliable `checkpoint()`; otherwise `localCheckpoint()`.
  * Production swap = one `setCheckpointDir` call (or
  * `spark.checkpoint.dir` in the submit conf), zero code edits —
  * same seam discipline as the topic transport.
  *
  * Checkpoint-file lifecycle in reliable mode: Spark never deletes
  * rdd-* checkpoint dirs on its own (and loop users like
  * `connectedComponentsIters` materialize once per iteration), so a
  * deployment MUST set `spark.cleaner.referenceTracking.cleanCheckpoints=true`
  * in the submit conf — the ContextCleaner then removes a dataset's
  * checkpoint files when it is garbage-collected, bounding checkpoint
  * volume to the live working set. (A context conf, settable only at
  * startup — this helper cannot flip it for you.)
  *
  * Both forms are eager: callers rely on materialize-then-release
  * (`cache` → materialize downstream → `unpersist`) to keep the
  * storage pool bounded.
  */
object Materialize {

  /** [[apply]] plus an explicit release handle for the pinned blocks.
    *
    * `localCheckpoint()` pins its blocks for the SESSION: the only
    * reclaim path is the ContextCleaner noticing the driver-side RDD
    * object got garbage-collected (periodic, nondeterministic). A
    * loop that materializes per iteration — `connectedComponentsIters`
    * runs O(log V) rounds, each pinning an O(V) labels relation —
    * accumulates every round's blocks until session-wide storage
    * pressure squeezes the execution pool. This form hands the caller
    * the unpersist handle instead: pin the new round, release the
    * prior one, keeping the loop's live footprint at O(V) regardless
    * of round count.
    *
    * Local mode: the rows are copied (toRdd reuses per-partition
    * UnsafeRow buffers — same copy `Dataset.localCheckpoint` makes),
    * persisted MEMORY_AND_DISK, computed eagerly, and wrapped back
    * into a DataFrame that keeps the origin's partitioning metadata
    * (no re-shuffle downstream). Unlike localCheckpoint the RDD
    * lineage is retained, so a lost block recomputes instead of
    * killing the job — release only makes a later recompute walk
    * further back, never wrong.
    *
    * Reliable-checkpoint mode: delegates to [[apply]] — checkpoint
    * blocks live on the checkpoint dir, not in executor memory, so
    * there is nothing to release per-round; file GC stays the
    * documented `cleanCheckpoints` conf. */
  def releasable(df: DataFrame): (DataFrame, () => Unit) =
    if (df.sparkSession.sparkContext.getCheckpointDir.isDefined) {
      (apply(df), () => ())
    } else {
      val rows = df.queryExecution.toRdd.map(_.copy())
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      rows.count()
      (org.apache.spark.sql.GraftBridge.wrapRdd(rows, df),
        () => { rows.unpersist(blocking = false); (): Unit })
    }

  def apply(df: DataFrame): DataFrame =
    if (df.sparkSession.sparkContext.getCheckpointDir.isDefined) {
      // checkpoint() alone computes the plan TWICE: the eager count
      // job, then ReliableRDDCheckpointData's write job recomputes
      // every partition (Spark's scaladoc recommends persisting
      // first). Pin the partitions for the write, then release —
      // compute-once is this helper's whole purpose. A caller-owned
      // cache (`.cache().materialized`) stays the caller's to release:
      // only a persist WE took is unpersisted here.
      val callerPersisted =
        df.storageLevel != org.apache.spark.storage.StorageLevel.NONE
      val pinned =
        if (callerPersisted) df
        else df.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      try pinned.checkpoint()
      finally { if (!callerPersisted) { pinned.unpersist(); (): Unit } }
    } else df.localCheckpoint()

  implicit class Ops(private val df: DataFrame) extends AnyVal {
    /** Eagerly materialize; reliable iff a checkpoint dir is set. */
    def materialized: DataFrame = Materialize(df)
  }
}

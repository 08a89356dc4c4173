package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Write-path maintenance: the small-files compaction pass every
  * long-lived table needs. Streaming sinks and per-micro-batch writers
  * leave KB-scale files behind (one-plus per partition per batch); at
  * 100 TB scan cost becomes dominated by per-file open/footer/seek
  * overhead rather than bytes, so periodic compaction to near-target
  * file sizes is a standing job in any real warehouse (the reference
  * offloads this to ClickHouse's background merges; on raw parquet it
  * must be explicit).
  */
object Storage {

  /** Compact `inDir`'s parquet files into `outDir` with file sizes
    * near `targetBytes`. The target file count is computed from the
    * input's on-disk (compressed) size — listed RECURSIVELY, so a
    * partitioned layout's bytes are fully counted (Spark's read is
    * recursive too; a non-recursive listing would see 0 bytes and
    * silently collapse the table to one file). NOTE the output is a
    * FLAT directory: compacting a `partitionBy` layout in place means
    * calling this once per partition directory, which also keeps each
    * job's shuffle bounded. With `clusterBy`, rows are
    * range-partitioned and sorted on that column, so min/max row-group
    * skipping SURVIVES compaction (a plain `repartition` destroys any
    * clustered layout — the subtle regression this flag exists for);
    * range partitions of a low-cardinality cluster column can come out
    * empty, so the ACTUAL file count (returned, counted from the
    * written output) may be below the target count. Hadoop FS API
    * throughout, so the same code runs against HDFS/S3 on a
    * cluster. */
  def compact(spark: SparkSession, inDir: String, outDir: String,
      targetBytes: Long, clusterBy: Option[String] = None): Long = {
    require(targetBytes > 0, s"targetBytes=$targetBytes")
    def parquetFiles(dir: String): Seq[org.apache.hadoop.fs.LocatedFileStatus] = {
      val p = new org.apache.hadoop.fs.Path(dir)
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      val it = fs.listFiles(p, true) // recursive
      val buf = Seq.newBuilder[org.apache.hadoop.fs.LocatedFileStatus]
      while (it.hasNext) {
        val f = it.next()
        if (f.getPath.getName.endsWith(".parquet")) buf += f
      }
      buf.result()
    }
    val bytes = parquetFiles(inDir).map(_.getLen).sum
    val nFiles = math.max(1L, math.ceil(bytes.toDouble / targetBytes).toLong)
    val df = spark.read.parquet(inDir)
    val out = clusterBy match {
      case Some(c) =>
        df.repartitionByRange(nFiles.toInt, col(c)).sortWithinPartitions(c)
      case None => df.repartition(nFiles.toInt)
    }
    out.write.mode("overwrite").parquet(outDir)
    parquetFiles(outDir).size.toLong
  }

  /** Cell-clustered partitioned write with size-bound HOT-CELL
    * splitting — the shared write shape of both persisted index
    * families (LSH band cells, IVF label cells).
    *
    * Baseline: repartition on the cell columns before `partitionBy`,
    * so each cell is one task's single output file instead of one
    * fragment per (shuffle task × cell). Skew guard: a cell above
    * `maxCellRows` rows (a common shingle prefix, a hot IVF cluster)
    * would make that one task the job's straggler and its file
    * unboundedly large — so each row gets a slot key
    * `hash(hashCol) mod ceil(cell_rows / maxCellRows)` and the shuffle
    * clusters on (cell, slot): a hot cell's rows spread across its
    * slot count of tasks and land as that many bounded files INSIDE
    * the one cell directory. Probe-side path pruning is untouched —
    * the split never adds a partition column. Cold cells have one
    * slot, preserving the one-file-per-cell layout.
    *
    * The input is materialized releasably because the slot assignment
    * needs per-cell counts: one count pass over materialized rows
    * instead of running the (often expensive) producing pipeline
    * twice; the pin is released once the write completes. The count
    * relation is cell-cardinality (thousands of rows) and broadcasts.
    *
    * `sortCols` (optional) orders rows by `cellCols ++ sortCols`
    * within each write task, making parquet row-group/page statistics
    * on those columns tight — a reader pushing an equality/IN filter
    * on a sort column then skips whole pages (including pages of FAT
    * sibling columns, via the parquet column index) instead of
    * decoding every row of the cell. Near-free at write time: the
    * explicit sort's prefix is exactly the partition columns, so it
    * SATISFIES the ordering `partitionBy` would otherwise insert its
    * own sort for — one sort either way, ours just carries the extra
    * keys. Empty (the default) preserves the historical unordered
    * layout byte-for-byte.
    *
    * RETURNS the per-cell row counts (cell column values as
    * partition-path strings, count) — free to the caller: the slot
    * assignment needs them anyway, and they are now COLLECTED once
    * (a cell-cardinality relation) and replayed as a LocalRelation
    * into the slot join instead of re-evaluating the counts plan per
    * consumer. The LSH append rides them into its ledger entry,
    * which keeps the per-probe delta-mass decision input free of a
    * post-write read-back job.
    */
  private[graft] def writeCellClustered(rows: DataFrame,
      cellCols: Seq[String], hashCol: String, path: String,
      maxCellRows: Long, sortCols: Seq[String] = Nil): Seq[(Seq[String], Long)] = {
    require(maxCellRows > 0, s"maxCellRows=$maxCellRows")
    val (rawPinned, release) = graft.Materialize.releasable(rows)
    try {
      // a NULL cell value would be silently DROPPED by the equality
      // join against the counts relation — index incompleteness with
      // no error, in the one shared writer of both index families.
      // The in-plan assert fails the job loudly instead (NULL cells
      // are a producer bug: band/label assignment never emits them).
      val pinned = cellCols.foldLeft(rawPinned) { (df, c) =>
        df.where(assert_true(col(c).isNotNull,
          lit(s"writeCellClustered: NULL value in cell column '$c' — " +
            "refusing to drop the row silently")).isNull)
      }
      val counts = pinned.groupBy(cellCols.map(col): _*)
        .agg(count(lit(1)).as("_cell_n"))
        .withColumn("_slots", greatest(lit(1L),
          ceil(col("_cell_n").cast("double") / maxCellRows).cast("long")))
      val countRows = counts.collect()
      // the shuffle's partition count is pinned EXPLICITLY to the total
      // slot count (also the natural write parallelism): an adaptive
      // coalesce of small shuffle blocks would merge a hot cell's
      // slots back into one task — exactly the skew stall the slot key
      // exists to prevent. Hash collisions can still co-locate a few
      // slots of one cell in a task (a parallelism effect, bounding a
      // task at a small multiple of maxCellRows rows); the PER-FILE
      // bound is enforced independently and HARD by maxRecordsPerFile,
      // which rolls a task's output to a new file at the limit — so no
      // collision pattern can produce an unbounded file (StorageSpec's
      // skew soak measures this on a 95%-one-cell corpus).
      val totalSlots =
        countRows.map(_.getAs[Long]("_slots")).sum.toInt max 1
      val countsLocal = rows.sparkSession.createDataFrame(
        java.util.Arrays.asList(countRows: _*), counts.schema)
      val clustered = pinned.join(broadcast(countsLocal), cellCols)
        .withColumn("_slot", pmod(hash(col(hashCol)), col("_slots").cast("int")))
        .repartition(totalSlots, (cellCols :+ "_slot").map(col): _*)
        .drop("_cell_n", "_slots", "_slot")
      val ordered =
        if (sortCols.isEmpty) clustered
        else clustered.sortWithinPartitions((cellCols ++ sortCols).map(col): _*)
      ordered
        .write.mode("overwrite").option("maxRecordsPerFile", maxCellRows)
        .partitionBy(cellCols: _*).parquet(path)
      countRows.map(r =>
        (cellCols.map(c => String.valueOf(r.getAs[Any](c))),
          r.getAs[Long]("_cell_n"))).toSeq
    } finally release()
  }
}

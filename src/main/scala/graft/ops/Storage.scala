package graft.ops

import org.apache.spark.sql.SparkSession
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
}

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
    * near `targetBytes`. The output file count is computed from the
    * input's on-disk (compressed) size, so the target holds regardless
    * of row width or compression ratio. With `clusterBy`, rows are
    * range-partitioned and sorted on that column, so min/max row-group
    * skipping SURVIVES compaction (a plain `repartition` destroys any
    * clustered layout — the subtle regression this flag exists for).
    * Returns the output file count. Hadoop FS API throughout, so the
    * same code runs against HDFS/S3 on a cluster. */
  def compact(spark: SparkSession, inDir: String, outDir: String,
      targetBytes: Long, clusterBy: Option[String] = None): Long = {
    require(targetBytes > 0, s"targetBytes=$targetBytes")
    val in = new org.apache.hadoop.fs.Path(inDir)
    val fs = in.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val bytes = fs.listStatus(in)
      .filter(f => f.isFile && f.getPath.getName.endsWith(".parquet"))
      .map(_.getLen).sum
    val nFiles = math.max(1L, math.ceil(bytes.toDouble / targetBytes).toLong)
    val df = spark.read.parquet(inDir)
    val out = clusterBy match {
      case Some(c) =>
        df.repartitionByRange(nFiles.toInt, col(c)).sortWithinPartitions(c)
      case None => df.repartition(nFiles.toInt)
    }
    out.write.mode("overwrite").parquet(outDir)
    nFiles
  }
}

package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Parquet table loaders for the driver testdata (TESTDATA.md). */
object Tables {
  def table(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  /** `events.parquet` carries INT64 TIMESTAMP(NANOS), which Spark's
    * parquet reader rejects outright. Read the nanos as Long (legacy
    * flag) and truncate to microseconds — identical to DuckDB's
    * `CAST(ts AS TIMESTAMP)` (both floor for positive epochs).
    */
  def events(spark: SparkSession, sfDir: String): DataFrame =
    eventsRawNanos(spark, sfDir)
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))

  /** Raw form with `ts` as the nanos Long — for tooling (Soak) that
    * needs the on-disk shape; everything else uses `events`.
    *
    * NOTE this sets `spark.sql.legacy.parquet.nanosAsLong` SESSION-WIDE
    * (the flag is read at scan planning, not per-read, so a scoped
    * set/restore would be racy against lazy evaluation of the returned
    * plan). The engine's other tables carry no INT64-nanos columns, so
    * the only observable effect is the intended one; a session mixing
    * in foreign nanos-timestamp parquet should read it before first
    * touching `events`. */
  def eventsRawNanos(spark: SparkSession, sfDir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    table(spark, sfDir, "events")
  }
}

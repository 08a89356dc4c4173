package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Parquet table loaders for the driver testdata (TESTDATA.md). */
object Tables {
  def table(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  /** Schema-ADAPTIVE events loader. The driver has shipped
    * `events.parquet` in two layouts so far — `ts` as INT64
    * TIMESTAMP(NANOS) (rounds 1–4; Spark can only read it as a Long
    * under the legacy flag) and INT64 TIMESTAMP(MICROS,
    * isAdjustedToUTC=false) (round 5+; Spark reads it as
    * TIMESTAMP_NTZ). Branch on the type the scan actually resolves:
    *
    *   - `LongType`           → legacy nanos: truncate to micros
    *                            (`ts div 1000`), identical to DuckDB's
    *                            `CAST(ts AS TIMESTAMP)` floor.
    *   - `TimestampType`      → pass through untouched. The CURRENT
    *                            testdata lands here: [[eventsRaw]]
    *                            disables `inferTimestampNTZ`, so the
    *                            scan itself produces TimestampType and
    *                            `ts` predicates stay SARGABLE — pushed
    *                            to the parquet reader instead of
    *                            evaluated above a cast. Under the
    *                            engine-wide pinned-UTC session this is
    *                            value-identical to casting the NTZ
    *                            wall clock (and to DuckDB's no-op
    *                            `CAST(ts AS TIMESTAMP)`).
    *   - `TimestampNTZType`   → robustness branch (a session that
    *                            re-enabled the inference flag):
    *                            reinterpret the wall clock in the
    *                            session TZ via cast.
    *
    * Every query reads events ONLY through this method, so a future
    * layout change fails in exactly one place with a one-line
    * diagnosis instead of 100+ identical analysis errors.
    */
  def events(spark: SparkSession, sfDir: String): DataFrame = {
    val raw = eventsRaw(spark, sfDir)
    raw.schema("ts").dataType match {
      case LongType =>
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType =>
        raw.withColumn("ts", col("ts").cast(TimestampType))
      case TimestampType => raw
      case other =>
        throw new IllegalStateException(
          s"$sfDir/events.parquet: `ts` resolved to unsupported type " +
            s"${other.catalogString}; expected INT64 nanos (reads as bigint " +
            "under the legacy flag), TIMESTAMP(MICROS) NTZ, or timestamp")
    }
  }

  /** Raw on-disk form of events — `ts` keeps whatever type the parquet
    * footer declares (Long for the retired nanos layout, TIMESTAMP_NTZ
    * for the current micros layout). For tooling that must see the
    * disk shape; everything else uses [[events]].
    *
    * NOTE this sets two flags SESSION-WIDE (they are read at scan
    * planning, not per-read, so a scoped set/restore would be racy
    * against lazy evaluation of the returned plan):
    * `spark.sql.legacy.parquet.nanosAsLong` (legacy layout readable at
    * all; no-op on non-nanos files) and
    * `spark.sql.parquet.inferTimestampNTZ.enabled=false` (the MICROS
    * layout scans directly as session-TZ TimestampType — value-
    * identical to the NTZ wall clock under the engine's pinned-UTC
    * sessions, and it keeps `ts` predicates pushable at the scan). The
    * engine's other tables carry no INT64-nanos or NTZ columns, so the
    * only observable effects are the intended ones; a session mixing
    * in foreign NTZ parquet should read it before first touching
    * `events`. */
  def eventsRaw(spark: SparkSession, sfDir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
    table(spark, sfDir, "events")
  }

  /** All driver tables (TESTDATA.md). Used by the schema tripwire. */
  val allNames: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Fail-fast schema tripwire: every driver table must load (footer
    * schema resolves, non-empty) and `events.ts` must normalize to a
    * session-TZ timestamp through [[events]]. Throws ONE message
    * naming the file and the observed raw type instead of letting a
    * testdata layout drift surface as dozens of identical analysis
    * errors downstream (which is exactly how round 5 lost 34 queries).
    */
  def sanityCheck(spark: SparkSession, sfDir: String): Unit = {
    allNames.foreach { name =>
      val schema =
        try {
          if (name == "events") eventsRaw(spark, sfDir).schema
          else table(spark, sfDir, name).schema
        } catch {
          case e: Exception =>
            throw new IllegalStateException(
              s"SCHEMA TRIPWIRE: $sfDir/$name.parquet failed to load: " +
                e.getMessage.linesIterator.next(), e)
        }
      require(schema.nonEmpty, s"SCHEMA TRIPWIRE: $sfDir/$name.parquet has an empty schema")
    }
    val tsType = events(spark, sfDir).schema("ts").dataType // throws the one-liner on drift
    require(tsType == TimestampType,
      s"SCHEMA TRIPWIRE: $sfDir/events.parquet `ts` normalized to " +
        s"${tsType.catalogString}, expected timestamp")
  }
}

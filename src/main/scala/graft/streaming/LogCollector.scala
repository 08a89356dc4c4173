package graft.streaming

import java.nio.file.{Files, Paths, StandardCopyOption}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** S7 — HTTP log-ingest stand-in
  * (`gmall-logger/src/main/java/com/atguigu/gmalllogger/controller/LoggerController.java:37-52`):
  * the reference's collector accepts an applog JSON string over REST,
  * appends it to a local log file, and produces it to the Kafka topic
  * `ods_base_log`. The HTTP server itself is infrastructure, not engine
  * logic; what the engine sees is the contract downstream of it — an
  * append-only feed of raw JSON lines that becomes the ODS topic. That
  * contract is implemented here as a spool directory: `post` is the
  * `/applog` handler body (durable append), `stream` is the unbounded
  * reader, and `ingestToTopic` closes the loop into the [[FileTopics]]
  * broker so the existing DWD log-split consumes it unchanged.
  *
  * Each post lands as its own file via tmp+rename — the file source
  * lists only complete files, so a half-written post is never consumed
  * (the durability the reference gets from log4j's append + Kafka
  * acks). At scale the collector is a fleet of stateless writers into
  * object storage — exactly this layout, one file per flush interval.
  *
  * DELIBERATE SEAM BOUNDARY: `post` writes through `java.nio`, not
  * the Hadoop seam (`graft.IndexFs`), because it is the EDGE-CLIENT
  * half of the contract — the HTTP handler body runs in a collector
  * process that has no SparkSession (a production fleet would write
  * its local disk or an object-store SDK). Everything the ENGINE
  * touches — the spool read (`stream`, Spark's file source) and the
  * spool→topic leg (`ingestToTopic` → [[FileTopics]], fully on
  * `IndexFs` since round 8) — resolves any `file:`/`hdfs:`/`s3a:`
  * path identically.
  */
object LogCollector {

  /** `/applog?param=<json>` handler body: durably land one raw log
    * line in the spool. The bytes are fsynced (SYNC open option)
    * BEFORE the atomic rename publishes the file — an acknowledged
    * post survives power loss, matching the log4j-append + Kafka-acks
    * durability this mirrors. (The rename's directory entry itself is
    * not fsynced: on ext4/xfs a crash can lose the *name* but never
    * yield a partial file, and the poster's retry re-lands it — the
    * same at-least-once edge Kafka acks have.) */
  def post(spoolDir: String, jsonLine: String): Unit = {
    Files.createDirectories(Paths.get(spoolDir))
    val name = java.util.UUID.randomUUID().toString
    val tmp = Paths.get(spoolDir, s".$name.tmp")
    Files.write(tmp, (jsonLine + "\n").getBytes("UTF-8"),
      java.nio.file.StandardOpenOption.CREATE,
      java.nio.file.StandardOpenOption.WRITE,
      java.nio.file.StandardOpenOption.SYNC)
    Files.move(tmp, Paths.get(spoolDir, s"$name.log"),
      StandardCopyOption.ATOMIC_MOVE)
    (): Unit
  }

  /** Unbounded reader over the spool (schema: one `value` string per
    * posted line). Checkpointed consumption — restart neither loses
    * nor re-reads posts. */
  def stream(spark: SparkSession, spoolDir: String): DataFrame = {
    Files.createDirectories(Paths.get(spoolDir))
    spark.readStream.text(spoolDir).select(col("value"))
  }

  /** The collector→Kafka leg: spool lines → `ods_base_log` records in
    * the file-topic broker, keyed by the log's `mid` analog (`user_id`
    * in the testdata shape) so per-user order survives partitioning —
    * the same keying the downstream stateful consumers rely on. */
  def ingestToTopic(
      spark: SparkSession,
      spoolDir: String,
      brokerDir: String,
      topic: String = "ods_base_log"): org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    stream(spark, spoolDir)
      .select(
        lit(topic).as("topic"),
        get_json_object(col("value"), "$.user_id").as("key"),
        col("value"))
      .writeStream.outputMode("append").foreachBatch {
        // batchId threads through so a replayed micro-batch restores
        // its own produce instead of appending the posts twice
        (batch: DataFrame, batchId: Long) =>
          FileTopics.produce(batch, brokerDir, batchId = Some(batchId))
      }
}

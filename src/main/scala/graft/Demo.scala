package graft

import graft.streaming.{Ev, StreamOps}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** End-to-end demo of the layered streaming topology over the real
  * testdata: ODS (file "topic") → DWD split (dirty branch routed out,
  * page branch partitioned by day) → DWS watermarked windowed stats →
  * ADS batch ranking. Each layer is an independent streaming query
  * draining its upstream with Trigger.AvailableNow (the backfill mode);
  * layer boundaries are replayable directories, exactly the
  * reference's Kafka-topic contract.
  *
  * Usage: runMain graft.Demo [sfDir]
  */
object Demo {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val root = java.nio.file.Files.createTempDirectory("gmall-demo").toString
    println(s"[demo] layer root: $root")

    // ODS: land the raw events as the first replayable layer
    graft.ops.Tables.events(spark, sfDir)
      .withColumn("is_new", lit(1))
      .select("user_id", "event_id", "ts", "event_type", "value", "is_new")
      .write.parquet(s"$root/ods")

    def layer(name: String)(q: => org.apache.spark.sql.streaming.StreamingQuery): Unit = {
      val query = q
      assert(query.awaitTermination(120000L), s"$name did not drain")
      println(s"[demo] $name drained")
    }

    val odsSchema = Seq.empty[Ev].toDF().schema

    // DWD: split — dirty branch to its own sink, page branch
    // day-partitioned (the layout the ADS layer partition-prunes)
    val ods = spark.readStream.schema(odsSchema).parquet(s"$root/ods").as[Ev]
    layer("dwd-dirty")(
      ods.filter(col("event_type") === "error")
        .writeStream.format("parquet")
        .option("path", s"$root/dwd_dirty")
        .option("checkpointLocation", s"$root/ckpt_dirty")
        .trigger(Trigger.AvailableNow()).outputMode("append").start())
    layer("dwd-page")(
      ods.filter(col("event_type") =!= "error")
        .withColumn("day", date_format(col("ts"), "yyyy-MM-dd"))
        .writeStream.format("parquet").partitionBy("day")
        .option("path", s"$root/dwd_page")
        .option("checkpointLocation", s"$root/ckpt_page")
        .trigger(Trigger.AvailableNow()).outputMode("append").start())

    // DWS: watermarked hourly stats over the page layer
    val dwd = spark.readStream
      .schema(spark.read.parquet(s"$root/dwd_page").drop("day").schema)
      .parquet(s"$root/dwd_page").as[Ev]
    layer("dws")(
      StreamOps.windowedStats(dwd, window_ = "1 hour", watermark = "10 minutes")
        .writeStream.format("parquet")
        .option("path", s"$root/dws")
        .option("checkpointLocation", s"$root/ckpt_dws")
        .trigger(Trigger.AvailableNow()).outputMode("append").start())

    // ADS: batch ranking over the stats layer
    val dws = spark.read.parquet(s"$root/dws")
    println(s"[demo] ods=${spark.read.parquet(s"$root/ods").count()} " +
      s"dirty=${spark.read.parquet(s"$root/dwd_dirty").count()} " +
      s"page=${spark.read.parquet(s"$root/dwd_page").count()} " +
      s"dws_windows=${dws.count()}")
    println("[demo] top windows by events:")
    dws.orderBy(col("n").desc, col("stt"), col("event_type"))
      .limit(5).collect()
      .foreach(r => println(s"[demo]   $r"))
    spark.stop()
  }
}

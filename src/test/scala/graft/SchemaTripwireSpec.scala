package graft

import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths}

/** The fail-fast testdata tripwire (`Tables.sanityCheck`): a driver-side
  * layout regeneration must surface as ONE clear diagnosis naming the
  * file and observed type, not as dozens of identical per-query analysis
  * errors (round 5 lost 34 queries to a silent nanos→micros flip).
  */
class SchemaTripwireSpec extends SparkSuite {

  test("sanityCheck passes on the shipped testdata") {
    graft.ops.Tables.sanityCheck(spark, sf("sf0.001"))
  }

  test("an intentional ts type flip yields one failure naming file and type") {
    val dir = Files.createTempDirectory("tripwire").toString
    // all other tables: symlink the real sf0.001 files
    graft.ops.Tables.allNames.filter(_ != "events").foreach { t =>
      Files.createSymbolicLink(
        Paths.get(s"$dir/$t.parquet"),
        Paths.get(sf("sf0.001") + s"/$t.parquet"))
    }
    // events with ts flipped to a type no layout ever used
    graft.ops.Tables.eventsRaw(spark, sf("sf0.001"))
      .withColumn("ts", lit("not-a-timestamp"))
      .write.parquet(s"$dir/events.parquet")
    val e = intercept[IllegalStateException] {
      graft.ops.Tables.sanityCheck(spark, dir)
    }
    assert(e.getMessage.contains("events.parquet"))
    assert(e.getMessage.contains("string")) // the observed type, by name
  }

  test("the loader's layout branches agree: nanos-Long and timestamp files yield identical events") {
    import org.apache.spark.sql.types.TimestampType
    // same 50 logical instants written in BOTH layouts the driver has
    // shipped: a bigint nanos column (rounds 1-4; the LongType branch
    // truncates) and a native timestamp column (round 5+; scans as
    // TimestampType). The normalized outputs must be cell-identical —
    // the cross-engine floor semantics encoded once, not per branch.
    val src = graft.ops.Tables.events(spark, sf("sf0.001")).orderBy("event_id").limit(50)
      .select("event_id", "ts", "event_type")
    val asMicros = src.collect()
    val nanosDir = java.nio.file.Files.createTempDirectory("layout-nanos").toString
    val tsDir = java.nio.file.Files.createTempDirectory("layout-ts").toString
    // nanos layout: micros * 1000 + 999 — sub-micro jitter the
    // truncation must floor away, not round up
    src.withColumn("ts", expr("unix_micros(ts) * 1000L + 999L"))
      .write.parquet(s"$nanosDir/events.parquet")
    src.write.parquet(s"$tsDir/events.parquet")
    val fromNanos = graft.ops.Tables.events(spark, nanosDir)
    val fromTs = graft.ops.Tables.events(spark, tsDir)
    assert(fromNanos.schema("ts").dataType === TimestampType)
    assert(fromTs.schema("ts").dataType === TimestampType)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("event_id").collect().map(r => (r.getLong(0), r.getTimestamp(1), r.getString(2))).toSeq
    assert(rows(fromNanos) === rows(fromTs))
    assert(rows(fromTs) === asMicros.map(r => (r.getLong(0), r.getTimestamp(1), r.getString(2))).toSeq)
  }

  test("a type flip on a NON-events table yields one failure naming file and column") {
    // round-7 hardening: the contract pins every table's column:type
    // map, not just the events seam the r5 incident happened to hit
    val dir = Files.createTempDirectory("tripwire3").toString
    graft.ops.Tables.allNames.filter(_ != "customer").foreach { t =>
      Files.createSymbolicLink(
        Paths.get(s"$dir/$t.parquet"),
        Paths.get(sf("sf0.001") + s"/$t.parquet"))
    }
    graft.ops.Tables.table(spark, sf("sf0.001"), "customer")
      .withColumn("c_acctbal", col("c_acctbal").cast("string"))
      .write.parquet(s"$dir/customer.parquet")
    val e = intercept[IllegalArgumentException] {
      graft.ops.Tables.sanityCheck(spark, dir)
    }
    assert(e.getMessage.contains("customer.parquet"))
    assert(e.getMessage.contains("c_acctbal"))
    assert(e.getMessage.contains("string"))
  }

  test("a dropped column yields one failure naming the file") {
    val dir = Files.createTempDirectory("tripwire4").toString
    graft.ops.Tables.allNames.filter(_ != "part").foreach { t =>
      Files.createSymbolicLink(
        Paths.get(s"$dir/$t.parquet"),
        Paths.get(sf("sf0.001") + s"/$t.parquet"))
    }
    graft.ops.Tables.table(spark, sf("sf0.001"), "part").drop("p_size")
      .write.parquet(s"$dir/part.parquet")
    val e = intercept[IllegalArgumentException] {
      graft.ops.Tables.sanityCheck(spark, dir)
    }
    assert(e.getMessage.contains("part.parquet"))
  }

  test("a missing table yields one failure naming the file") {
    val dir = Files.createTempDirectory("tripwire2").toString
    val e = intercept[IllegalStateException] {
      graft.ops.Tables.sanityCheck(spark, dir)
    }
    assert(e.getMessage.contains("TRIPWIRE"))
    assert(e.getMessage.contains(".parquet"))
  }
}

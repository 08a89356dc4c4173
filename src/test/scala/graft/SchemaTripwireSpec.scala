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

  test("a missing table yields one failure naming the file") {
    val dir = Files.createTempDirectory("tripwire2").toString
    val e = intercept[IllegalStateException] {
      graft.ops.Tables.sanityCheck(spark, dir)
    }
    assert(e.getMessage.contains("TRIPWIRE"))
    assert(e.getMessage.contains(".parquet"))
  }
}

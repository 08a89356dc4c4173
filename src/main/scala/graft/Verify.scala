package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val (sfDir, outDir) = (args(0), args(1))
    // optional 3rd arg: comma-separated query names — local iteration
    // only (the driver always dumps the full surface). Unknown names
    // fail FAST: silently dumping nothing would make check.py pass
    // vacuously on a typo.
    val only: Option[Set[String]] =
      if (args.length > 2) {
        val asked = args(2).split(",").map(_.trim).filter(_.nonEmpty).toSet
        val unknown = asked -- SparkEntry.queries.keySet
        require(unknown.isEmpty,
          s"unknown queries: ${unknown.mkString(", ")}")
        Some(asked)
      } else None
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Fail-fast schema tripwire: if the driver regenerated testdata
    // with a new layout, die HERE with one line naming the file and
    // type — not 100+ identical per-query analysis errors (round 5
    // lost 34 queries to exactly that failure mode).
    try graft.ops.Tables.sanityCheck(spark, sfDir)
    catch { case e: Exception =>
      System.err.println(s"[verify] ${e.getMessage}")
      spark.stop()
      sys.exit(2)
    }
    new java.io.File(outDir).mkdirs()
    SparkEntry.queries
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .foreach { case (name, fn) =>
        try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
          .parquet(s"$outDir/$name")
        catch { case e: Throwable =>
          System.err.println(s"[verify] $name failed: ${e.getMessage}")
          // a previous run's parquet in the same outDir would make
          // check.py compare STALE (still-correct) results and pass a
          // query that now throws — remove any leftover output so the
          // regression fails the gate instead of hiding
          def rm(f: java.io.File): Unit = {
            Option(f.listFiles()).getOrElse(Array.empty).foreach(rm)
            f.delete(); ()
          }
          rm(new java.io.File(s"$outDir/$name"))
        }
      }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .filter { case (k, _) => only.forall(_.contains(k)) }
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}

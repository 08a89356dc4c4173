package graft

import org.apache.spark.sql.SparkSession

/** GraftExtensions must make vec_dot resolvable by SQL in a session
  * built with .withExtensions (same SparkContext, fresh session). */
class ExtensionsSpec extends SparkSuite {

  test("withExtensions(GraftExtensions) exposes vec_dot to SQL") {
    val shared = spark // force shared session/context init first
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val ext = SparkSession.builder()
        .master("local[2]")
        .config("spark.ui.enabled", "false")
        .withExtensions(new graft.functions.GraftExtensions)
        .getOrCreate()
      val d = ext.sql("SELECT vec_dot(array(CAST(1.0 AS FLOAT), CAST(2.0 AS FLOAT)), " +
          "array(CAST(3.0 AS FLOAT), CAST(4.0 AS FLOAT))) AS d")
        .head().getDouble(0)
      assert(d === 11.0)
      // vec_cosine of a vector with itself is exactly 1.0
      val c = ext.sql("SELECT vec_cosine(array(CAST(3.0 AS FLOAT), CAST(4.0 AS FLOAT)), " +
          "array(CAST(3.0 AS FLOAT), CAST(4.0 AS FLOAT))) AS c")
        .head().getDouble(0)
      assert(math.abs(c - 1.0) < 1e-12)
    } finally {
      SparkSession.setDefaultSession(shared)
      SparkSession.setActiveSession(shared)
    }
  }

  test("ParseOnceRule: a NAIVE variant query parses once under the extensions") {
    val shared = spark
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val ext = SparkSession.builder()
        .master("local[2]")
        .config("spark.ui.enabled", "false")
        .withExtensions(new graft.functions.GraftExtensions)
        .getOrCreate()
      import scala.jdk.CollectionConverters._
      // parquet-backed, not a literal LocalRelation — Catalyst would
      // constant-fold the latter to a LocalTableScan and there would be
      // no plan left to assert on
      val dir = java.nio.file.Files.createTempDirectory("parse-once").toString
      ext.createDataFrame(
        Seq(
          org.apache.spark.sql.Row(1L, """{"k": 6}"""),
          org.apache.spark.sql.Row(2L, """{"k": 7}"""),
          org.apache.spark.sql.Row(3L, "not json")).asJava,
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("id", org.apache.spark.sql.types.LongType),
          org.apache.spark.sql.types.StructField("props", org.apache.spark.sql.types.StringType))))
        .write.mode("overwrite").parquet(s"$dir/naive")
      ext.read.parquet(s"$dir/naive").createOrReplaceTempView("v_naive")
      // the naive form — NO graft_barrier; pushdown would normally
      // inline a second parse into the filter
      val df = ext.sql(
        """SELECT id, k, k % 2 AS k_even
          |FROM (SELECT id, try_variant_get(try_parse_json(props), '$.k', 'bigint') AS k
          |      FROM v_naive)
          |WHERE k IS NOT NULL AND k % 3 = 0""".stripMargin)
      val rows = df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(rows === Set((1L, 6L)))
      val plan = df.queryExecution.executedPlan.toString
      val parses = "parseJson".r.findAllIn(plan).size
      assert(parses == 1,
        s"$parses parseJson calls — ParseOnceRule did not deduplicate:\n$plan")
      assert(plan.contains("planbarrier"), plan)

      // control: the same query WITHOUT the extensions parses twice —
      // the rule, not some Spark default, is what deduplicates
      val dfShared = { // runs on the shared (extension-free) session
        SparkSession.setDefaultSession(shared)
        SparkSession.setActiveSession(shared)
        shared.read.parquet(s"$dir/naive").createOrReplaceTempView("v_naive_shared")
        shared.sql(
          """SELECT id, k, k % 2 AS k_even
            |FROM (SELECT id, try_variant_get(try_parse_json(props), '$.k', 'bigint') AS k
            |      FROM v_naive_shared)
            |WHERE k IS NOT NULL AND k % 3 = 0""".stripMargin)
      }
      dfShared.collect()
      val sharedParses = "parseJson".r
        .findAllIn(dfShared.queryExecution.executedPlan.toString).size
      assert(sharedParses >= 2,
        s"control query parsed $sharedParses times — pushdown no longer duplicates?")

      // the GROUP-BY-parsed-field form deduplicates the same way
      SparkSession.setDefaultSession(ext)
      SparkSession.setActiveSession(ext)
      val agg = ext.sql(
        """SELECT k % 2 AS bucket, COUNT(*) AS n
          |FROM (SELECT try_variant_get(try_parse_json(props), '$.k', 'bigint') AS k
          |      FROM v_naive)
          |WHERE k IS NOT NULL
          |GROUP BY k % 2""".stripMargin)
      assert(agg.collect().map(r => (r.getLong(0), r.getLong(1))).toSet ===
        Set((0L, 1L), (1L, 1L)))
      // AQE prints final + initial plans; count only what ran
      val aggPlan = agg.queryExecution.executedPlan.toString
      val aggFinal = aggPlan.indexOf("== Initial Plan ==") match {
        case -1 => aggPlan
        case i  => aggPlan.substring(0, i)
      }
      val aggParses = "parseJson".r.findAllIn(aggFinal).size
      assert(aggParses == 1,
        s"$aggParses parseJson calls in the aggregate plan:\n$aggFinal")
    } finally {
      SparkSession.setDefaultSession(shared)
      SparkSession.setActiveSession(shared)
    }
  }
}

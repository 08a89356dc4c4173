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

  test("ParseOnceRule: a guarded strict parse_json stays guarded (no ANSI throw)") {
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
      val dir = java.nio.file.Files.createTempDirectory("parse-once-guard").toString
      // row 3 is malformed AND flagged invalid: the CASE WHEN guard is
      // the only thing standing between it and MALFORMED_RECORD_IN_PARSING
      ext.createDataFrame(
        Seq(
          org.apache.spark.sql.Row(1L, """{"k": 6}""", true),
          org.apache.spark.sql.Row(2L, """{"k": 7}""", true),
          org.apache.spark.sql.Row(3L, "not json", false)).asJava,
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("id", org.apache.spark.sql.types.LongType),
          org.apache.spark.sql.types.StructField("props", org.apache.spark.sql.types.StringType),
          org.apache.spark.sql.types.StructField("valid", org.apache.spark.sql.types.BooleanType))))
        .write.mode("overwrite").parquet(s"$dir/guarded")
      ext.read.parquet(s"$dir/guarded").createOrReplaceTempView("v_guarded")
      // strict parse_json under a CASE WHEN guard, in both filter and
      // projection: hoisting it unconditionally would parse "not json"
      // and throw under ANSI — the rule must leave this query alone
      val df = ext.sql(
        """SELECT id,
          |       CASE WHEN valid THEN variant_get(parse_json(props), '$.k', 'bigint') END AS k
          |FROM v_guarded
          |WHERE CASE WHEN valid THEN variant_get(parse_json(props), '$.k', 'bigint') END % 3 = 0""".stripMargin)
      val rows = df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(rows === Set((1L, 6L)))
      assert(!df.queryExecution.executedPlan.toString.contains("planbarrier"),
        "guarded parse was extracted — conditional-context hoist regression")
    } finally {
      SparkSession.setDefaultSession(shared)
      SparkSession.setActiveSession(shared)
    }
  }

  test("ParseOnceRule: parse-free partition conjunct still prunes below the barrier") {
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
      val dir = java.nio.file.Files.createTempDirectory("parse-once-prune").toString
      ext.createDataFrame(
        Seq(
          org.apache.spark.sql.Row(1L, """{"k": 6}""", "2024-01-05"),
          org.apache.spark.sql.Row(2L, """{"k": 9}""", "2024-01-05"),
          org.apache.spark.sql.Row(3L, """{"k": 12}""", "2024-01-06")).asJava,
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("id", org.apache.spark.sql.types.LongType),
          org.apache.spark.sql.types.StructField("props", org.apache.spark.sql.types.StringType),
          org.apache.spark.sql.types.StructField("dt", org.apache.spark.sql.types.StringType))))
        .write.mode("overwrite").partitionBy("dt").parquet(s"$dir/bydt")
      ext.read.parquet(s"$dir/bydt").createOrReplaceTempView("v_bydt")
      // parse-dependent conjuncts AND a plain partition conjunct: the
      // rule must extract the parse yet leave `dt = ...` pushable
      val df = ext.sql(
        """SELECT id, k
          |FROM (SELECT id, try_variant_get(try_parse_json(props), '$.k', 'bigint') AS k, dt
          |      FROM v_bydt)
          |WHERE k IS NOT NULL AND k % 3 = 0 AND dt = '2024-01-05'""".stripMargin)
      assert(df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet ===
        Set((1L, 6L), (2L, 9L)))
      val plan = df.queryExecution.executedPlan
      val parses = "parseJson".r.findAllIn(plan.toString).size
      assert(parses == 1,
        s"$parses parseJson calls — extraction lost on the mixed-filter query:\n$plan")
      val scans = plan.collect {
        case f: org.apache.spark.sql.execution.FileSourceScanExec => f
      }
      assert(scans.nonEmpty, plan.toString)
      assert(scans.head.partitionFilters.exists(_.toString.contains("2024-01-05")),
        s"dt conjunct did not reach the scan as a partition filter — " +
          s"pruning lost above the barrier:\n${scans.head.partitionFilters}\n$plan")
    } finally {
      SparkSession.setDefaultSession(shared)
      SparkSession.setActiveSession(shared)
    }
  }
}

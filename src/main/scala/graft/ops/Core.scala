package graft.ops

import graft.QueryDef
import org.apache.spark.sql.functions._

import scala.jdk.CollectionConverters._

/** Projections, filters, row-level transforms and the scalar-function
  * layer (SURVEY §2.3 P1/P4/P5/P7, §2.9 F1–F14), re-expressed as batch
  * DataFrame pipelines over the driver testdata.
  *
  * Reference semantics (cited per query): JSON parse with dirty-data
  * side output (`app/dwd/BaseLogApp.java:57-70`), config-driven column
  * whitelist (`app/function/TableProcessFunction.java:160-175`), 3-way
  * log split (`app/dwd/BaseLogApp.java:103-141`), date/string scalar
  * surface (`utils/DateTimeUtil.java`, DWS SQL apps).
  */
object Core {

  /** Flagship pricing-summary aggregation (map + keyed agg heart of the
    * DWS layer, e.g. `app/dws/ProductStatsApp.java:216-261`). */
  val q1Agg = QueryDef(
    "q1_agg",
    Some("""SELECT l_returnflag, l_linestatus,
           |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
           |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
           |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
           |  COUNT(*) AS count_order
           |FROM lineitem
           |GROUP BY l_returnflag, l_linestatus
           |ORDER BY l_returnflag, l_linestatus""".stripMargin),
    (spark, dir) =>
      Tables.table(spark, dir, "lineitem")
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          expr("CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)").as("sum_qty"),
          expr("CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)").as("sum_base_price"),
          expr("CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE)").as("sum_disc_price"),
          count(lit(1)).as("count_order"))
        .orderBy(col("l_returnflag"), col("l_linestatus")))

  /** P1/P2/F14 — semi-structured JSON field extraction with null-on-bad
    * parse (the dirty-data contract of `app/dwd/BaseLogApp.java:57-70`:
    * unparseable rows yield NULL and are routed, parseable rows carry
    * the extracted field). */
  val p1JsonProps = QueryDef(
    "p1_json_props",
    Some("""SELECT event_id,
           |  CAST(json_extract_string(props, '$.k') AS BIGINT) AS k,
           |  CAST(CASE WHEN json_extract_string(props, '$.k') IS NULL THEN 1 ELSE 0 END AS BIGINT) AS is_dirty
           |FROM events
           |ORDER BY event_id""".stripMargin),
    (spark, dir) => {
      val parsed = Tables.events(spark, dir)
        .select(
          col("event_id"),
          get_json_object(col("props"), "$.k").cast("long").as("k"))
      parsed
        .withColumn("is_dirty", when(col("k").isNull, 1L).otherwise(0L))
        .orderBy("event_id")
    })

  /** P5 — config-driven column whitelist (sinkColumns CSV of
    * `app/function/TableProcessFunction.java:160-175`): project only the
    * configured columns. */
  val p5Whitelist = QueryDef(
    "p5_column_whitelist",
    Some("""SELECT event_id, event_type, value
           |FROM events
           |ORDER BY event_id""".stripMargin),
    (spark, dir) => {
      val sinkColumns = "event_id,event_type,value" // config row, CSV form
      val cols = sinkColumns.split(",").toIndexedSeq.map(c => col(c.trim))
      Tables.events(spark, dir).select(cols: _*).orderBy("event_id")
    })

  /** P4 + P7 — 3-way log split with per-branch stats: start logs, page
    * logs, dirty records (`app/dwd/BaseLogApp.java:103-141`); the
    * delete-filter P4 (`app/dwd/BaseDbApp.java:43`) is the dirty-branch
    * exclusion in the page/start branches. */
  val p7LogSplit = QueryDef(
    "p7_log_split",
    Some("""SELECT route,
           |  COUNT(*) AS n,
           |  COUNT(DISTINCT user_id) AS users,
           |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
           |FROM (
           |  SELECT CASE WHEN event_type = 'signup' THEN 'start'
           |              WHEN event_type = 'error' THEN 'dirty'
           |              ELSE 'page' END AS route,
           |         user_id, value
           |  FROM events)
           |GROUP BY route
           |ORDER BY route""".stripMargin),
    (spark, dir) => {
      val ev = Tables.events(spark, dir)
      // Side-output routing: each record goes to exactly one branch.
      val routed = ev.withColumn("route",
        when(col("event_type") === "signup", "start")
          .when(col("event_type") === "error", "dirty")
          .otherwise("page"))
      routed.groupBy("route")
        .agg(
          count(lit(1)).as("n"),
          countDistinct(col("user_id")).as("users"),
          expr("CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE)").as("total_value"))
        .orderBy("route")
    })

  /** F1–F12/F14 — the scalar date/time/string function surface
    * (TO_TIMESTAMP, FROM_UNIXTIME, DATE_FORMAT, UNIX_TIMESTAMP, hour,
    * concat — `app/dws/ProvinceStatsSqlApp.java:40-57`,
    * `app/dws/KeywordStatsApp.java:36`, `utils/DateTimeUtil.java`). */
  val fScalarDatetime = QueryDef(
    "f_scalar_datetime",
    Some("""SELECT event_id,
           |  strftime(CAST(ts AS TIMESTAMP), '%Y-%m-%d %H:%M:%S') AS ts_str,
           |  strftime(CAST(ts AS TIMESTAMP), '%Y-%m-%d') AS ts_date,
           |  CAST(EXTRACT(hour FROM CAST(ts AS TIMESTAMP)) AS BIGINT) AS hr,
           |  CAST(EXTRACT(day FROM CAST(ts AS TIMESTAMP)) AS BIGINT) AS dom,
           |  CAST(EXTRACT(month FROM CAST(ts AS TIMESTAMP)) AS BIGINT) AS mon,
           |  CAST(EXTRACT(year FROM CAST(ts AS TIMESTAMP)) AS BIGINT) AS yr,
           |  CAST(FLOOR(epoch(CAST(ts AS TIMESTAMP))) AS BIGINT) AS epoch_sec,
           |  strftime(make_timestamp(CAST(FLOOR(epoch(CAST(ts AS TIMESTAMP))) AS BIGINT) * 1000000), '%Y-%m-%d %H:%M:%S') AS ts_roundtrip,
           |  event_type || '_' || CAST(user_id AS VARCHAR) AS tagged
           |FROM events
           |ORDER BY event_id""".stripMargin),
    (spark, dir) =>
      Tables.events(spark, dir).select(
        col("event_id"),
        date_format(col("ts"), "yyyy-MM-dd HH:mm:ss").as("ts_str"),
        date_format(col("ts"), "yyyy-MM-dd").as("ts_date"),
        hour(col("ts")).cast("long").as("hr"),
        dayofmonth(col("ts")).cast("long").as("dom"),
        month(col("ts")).cast("long").as("mon"),
        year(col("ts")).cast("long").as("yr"),
        unix_timestamp(col("ts")).as("epoch_sec"),
        from_unixtime(unix_timestamp(col("ts"))).as("ts_roundtrip"),
        concat(col("event_type"), lit("_"), col("user_id")).as("tagged"))
      .orderBy("event_id"))

  /** F13 — age-from-date arithmetic
    * (`app/dwm/OrderWideApp.java:77-84`), anchored to a fixed date for
    * determinism, aggregated to an age histogram. */
  val f13Age = QueryDef(
    "f13_age_histogram",
    Some("""SELECT CAST(FLOOR(date_diff('day', CAST(l_shipdate AS DATE), DATE '2002-01-01') / 365.25) AS BIGINT) AS age_years,
           |  COUNT(*) AS n
           |FROM lineitem
           |GROUP BY age_years
           |ORDER BY age_years""".stripMargin),
    (spark, dir) =>
      Tables.table(spark, dir, "lineitem")
        .select(floor(datediff(lit("2002-01-01").cast("date"), col("l_shipdate")) / 365.25).as("age_years"))
        .groupBy("age_years")
        .agg(count(lit(1)).as("n"))
        .orderBy("age_years"))

  /** F5 — true MAP<STRING,STRING> access (the reference's `page['item']`
    * SQL map indexing, `app/dws/KeywordStatsApp.java:43-46`): props
    * parsed as a map column, element access + key introspection. */
  val f15MapOps = QueryDef(
    "f15_map_ops",
    Some("""SELECT event_id,
           |  CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_val,
           |  CAST(len(json_keys(props)) AS BIGINT) AS n_keys,
           |  array_to_string(json_keys(props), ',') AS keys
           |FROM events
           |ORDER BY event_id""".stripMargin),
    (spark, dir) => {
      val m = from_json(col("props"), "map<string,string>",
        Map.empty[String, String].asJava)
      Tables.events(spark, dir)
        .select(
          col("event_id"),
          element_at(m, "k").cast("long").as("k_val"),
          size(map_keys(m)).cast("long").as("n_keys"),
          array_join(map_keys(m), ",").as("keys"))
        .orderBy("event_id")
    })

  val defs: Seq[QueryDef] =
    Seq(q1Agg, p1JsonProps, p5Whitelist, p7LogSplit, fScalarDatetime,
      f13Age, f15MapOps)
}

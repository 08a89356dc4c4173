package graft.ops

import graft.QueryDef
import org.apache.spark.sql.functions._

/** Window-shape extensions beyond the reference's tumbling windows
  * (SURVEY §2.7 notes the reference has no sliding or session windows —
  * these complete the windowing surface a Flink-class engine offers):
  * sliding windows, session windows, and ROLLUP grouping sets.
  */
object WindowOps {

  /** Sliding (hopping) window: 30 min length, 10 min hop — each event
    * lands in exactly 3 windows. Oracle mirrors via 3 shifted
    * time_buckets. */
  val wSlidingWindow = QueryDef(
    "w_sliding_window",
    Some("""SELECT strftime(b, '%Y-%m-%d %H:%M:%S') AS stt,
           |  strftime(b + INTERVAL 30 MINUTE, '%Y-%m-%d %H:%M:%S') AS edt,
           |  COUNT(*) AS n,
           |  COUNT(DISTINCT user_id) AS users
           |FROM (SELECT time_bucket(INTERVAL '10 minutes', CAST(ts AS TIMESTAMP)) - k.k * INTERVAL 10 MINUTE AS b,
           |             user_id
           |      FROM events CROSS JOIN (SELECT unnest(generate_series(0, 2)) AS k) k)
           |GROUP BY b
           |ORDER BY stt""".stripMargin),
    (spark, dir) =>
      Tables.events(spark, dir)
        .groupBy(window(col("ts"), "30 minutes", "10 minutes"))
        .agg(count(lit(1)).as("n"), countDistinct(col("user_id")).as("users"))
        .select(
          date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss").as("stt"),
          date_format(col("window.end"), "yyyy-MM-dd HH:mm:ss").as("edt"),
          col("n"), col("users"))
        .orderBy("stt"))

  /** Session window with a 30 min inactivity gap per user: Spark's
    * session_window merges an event into the open session iff its time
    * is strictly before last_event + gap, and stamps end = last + gap.
    * Oracle mirrors with the lag/cumulative-sum islands pattern (new
    * session when the gap is >= 30 min). */
  val wSessionWindow = QueryDef(
    "w_session_window",
    Some("""WITH e AS (
           |  SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, value, event_id,
           |    CASE WHEN lag(CAST(ts AS TIMESTAMP)) OVER w IS NULL
           |           OR CAST(ts AS TIMESTAMP) - lag(CAST(ts AS TIMESTAMP)) OVER w >= INTERVAL 30 MINUTE
           |         THEN 1 ELSE 0 END AS new_s
           |  FROM events
           |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
           |s AS (
           |  SELECT *, SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
           |                             ROWS UNBOUNDED PRECEDING) AS sid
           |  FROM e)
           |SELECT user_id,
           |  strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
           |  strftime(max(ts) + INTERVAL 30 MINUTE, '%Y-%m-%d %H:%M:%S') AS session_end,
           |  COUNT(*) AS n_events,
           |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
           |FROM s
           |GROUP BY user_id, sid
           |ORDER BY user_id, session_start""".stripMargin),
    (spark, dir) =>
      Tables.events(spark, dir)
        .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
        .agg(
          count(lit(1)).as("n_events"),
          expr("CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE)").as("total_value"))
        .select(
          col("user_id"),
          date_format(col("session_window.start"), "yyyy-MM-dd HH:mm:ss").as("session_start"),
          date_format(col("session_window.end"), "yyyy-MM-dd HH:mm:ss").as("session_end"),
          col("n_events"), col("total_value"))
        .orderBy("user_id", "session_start"))

  /** ROLLUP grouping sets over the dim hierarchy (beyond the reference,
    * which has no grouping sets): per (region, nation), per region, and
    * grand total in one pass. */
  val a11Rollup = QueryDef(
    "a11_rollup",
    Some("""SELECT COALESCE(r.r_name, '(all)') AS region,
           |  COALESCE(n.n_name, '(all)') AS nation,
           |  COUNT(*) AS n_customers,
           |  CAST(SUM(CAST(c.c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_acctbal
           |FROM customer c
           |JOIN nation n ON c.c_nationkey = n.n_nationkey
           |JOIN region r ON n.n_regionkey = r.r_regionkey
           |GROUP BY ROLLUP(r.r_name, n.n_name)
           |ORDER BY region, nation""".stripMargin),
    (spark, dir) => {
      val c = Tables.table(spark, dir, "customer")
      val n = Tables.table(spark, dir, "nation")
      val r = Tables.table(spark, dir, "region")
      c.join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
        .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
        .rollup(col("r_name"), col("n_name"))
        .agg(
          count(lit(1)).as("n_customers"),
          expr("CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE)").as("total_acctbal"))
        .select(
          coalesce(col("r_name"), lit("(all)")).as("region"),
          coalesce(col("n_name"), lit("(all)")).as("nation"),
          col("n_customers"), col("total_acctbal"))
        .orderBy("region", "nation")
    })

  /** CUBE grouping sets: all combinations of (status, priority) plus
    * both marginals and the grand total in one pass. */
  val a11bCube = QueryDef(
    "a11b_cube",
    Some("""SELECT COALESCE(o_orderstatus, '(all)') AS status,
           |  COALESCE(o_orderpriority, '(all)') AS priority,
           |  COUNT(*) AS n,
           |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS gmv
           |FROM orders
           |GROUP BY CUBE(o_orderstatus, o_orderpriority)
           |ORDER BY status, priority""".stripMargin),
    (spark, dir) =>
      Tables.table(spark, dir, "orders")
        .cube(col("o_orderstatus"), col("o_orderpriority"))
        .agg(
          count(lit(1)).as("n"),
          expr("CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)").as("gmv"))
        .select(
          coalesce(col("o_orderstatus"), lit("(all)")).as("status"),
          coalesce(col("o_orderpriority"), lit("(all)")).as("priority"),
          col("n"), col("gmv"))
        .orderBy("status", "priority"))

  /** Time-RANGE window frame: per-user 7-day rolling purchase sum and
    * count, frame bounded by an event-time interval rather than a row
    * count — a distinct window execution shape (peer rows with equal
    * timestamps enter the frame together; frame membership is a pure
    * function of event time, so results are row-order-independent and
    * the decimal sum is engine-exact). Expressed in SQL on both sides
    * so the INTERVAL RANGE syntax itself is exercised. */
  val a23RollingRange = QueryDef(
    "a23_rolling_range",
    Some("""WITH e AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_id,
           |  CAST(value AS DECIMAL(18,2)) AS v FROM events WHERE event_type = 'purchase')
           |SELECT user_id, strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts_s, event_id,
           |  CAST(SUM(v) OVER (PARTITION BY user_id ORDER BY ts
           |    RANGE BETWEEN INTERVAL 7 DAY PRECEDING AND CURRENT ROW) AS DOUBLE) AS roll_7d,
           |  COUNT(*) OVER (PARTITION BY user_id ORDER BY ts
           |    RANGE BETWEEN INTERVAL 7 DAY PRECEDING AND CURRENT ROW) AS n_7d
           |FROM e
           |ORDER BY user_id, ts_s, event_id""".stripMargin),
    (spark, dir) => {
      Tables.events(spark, dir)
        .filter(col("event_type") === "purchase")
        .createOrReplaceTempView("v_purchases")
      spark.sql(
        """SELECT user_id, date_format(ts, 'yyyy-MM-dd HH:mm:ss') AS ts_s, event_id,
          |  CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER (PARTITION BY user_id ORDER BY ts
          |    RANGE BETWEEN INTERVAL 7 DAYS PRECEDING AND CURRENT ROW) AS DOUBLE) AS roll_7d,
          |  COUNT(*) OVER (PARTITION BY user_id ORDER BY ts
          |    RANGE BETWEEN INTERVAL 7 DAYS PRECEDING AND CURRENT ROW) AS n_7d
          |FROM v_purchases
          |ORDER BY user_id, ts_s, event_id""".stripMargin)
    })

  /** Day-level spike detection: flag days whose event count exceeds
    * twice the trailing-week average (the monitoring/anomaly shape —
    * current row EXCLUDED from its own baseline via a
    * `7 PRECEDING AND 1 PRECEDING` numeric RANGE frame on epoch-day).
    * Everything is integer arithmetic — the "2× average" test is
    * multiplied out to cnt·n_days > 2·roll_sum, so both engines flag
    * identically with no float anywhere; a ≥3-day warmup guard keeps
    * the first days unflagged rather than compared to a tiny baseline.
    * At 100 TB the daily pre-aggregation is the only data-sized
    * shuffle; the window runs over day-cardinality rows. */
  val a24SpikeDays = QueryDef(
    "a24_spike_days",
    Some("""WITH d AS (
           |  SELECT CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day, COUNT(*) AS cnt
           |  FROM events GROUP BY 1),
           |n AS (SELECT day, cnt,
           |  CAST(floor(epoch(CAST(day AS TIMESTAMP))/86400.0) AS BIGINT) AS dn FROM d),
           |r AS (SELECT day, cnt,
           |    SUM(cnt) OVER (ORDER BY dn RANGE BETWEEN 7 PRECEDING AND 1 PRECEDING) AS roll_sum,
           |    COUNT(cnt) OVER (ORDER BY dn RANGE BETWEEN 7 PRECEDING AND 1 PRECEDING) AS n_days
           |  FROM n)
           |SELECT strftime(day, '%Y-%m-%d') AS day_s, CAST(cnt AS BIGINT) AS cnt,
           |  CAST(coalesce(roll_sum, 0) AS BIGINT) AS roll_sum,
           |  CAST(n_days AS BIGINT) AS n_days,
           |  CAST(CASE WHEN n_days >= 3 AND cnt * n_days > 2 * roll_sum
           |       THEN 1 ELSE 0 END AS BIGINT) AS is_spike
           |FROM r ORDER BY day_s""".stripMargin),
    (spark, dir) => {
      Tables.events(spark, dir).createOrReplaceTempView("v_events_spike")
      spark.sql(
        """WITH d AS (
          |  SELECT to_date(ts) AS day, COUNT(*) AS cnt
          |  FROM v_events_spike GROUP BY 1),
          |n AS (SELECT day, cnt, CAST(unix_date(day) AS BIGINT) AS dn FROM d),
          |r AS (SELECT day, cnt,
          |    SUM(cnt) OVER (ORDER BY dn RANGE BETWEEN 7 PRECEDING AND 1 PRECEDING) AS roll_sum,
          |    COUNT(cnt) OVER (ORDER BY dn RANGE BETWEEN 7 PRECEDING AND 1 PRECEDING) AS n_days
          |  FROM n)
          |SELECT date_format(day, 'yyyy-MM-dd') AS day_s, CAST(cnt AS BIGINT) AS cnt,
          |  CAST(coalesce(roll_sum, 0) AS BIGINT) AS roll_sum,
          |  CAST(n_days AS BIGINT) AS n_days,
          |  CAST(CASE WHEN n_days >= 3 AND cnt * n_days > 2 * roll_sum
          |       THEN 1 ELSE 0 END AS BIGINT) AS is_spike
          |FROM r ORDER BY day_s""".stripMargin)
    })

  /** Explicit GROUPING SETS (the mixed-granularity report shape rollup
    * and cube can't express: per (type, day), per type, and a grand
    * total — but NOT per day). Group-key NULLs are coalesced to
    * sentinels and the GROUPING() flags are emitted as columns, which
    * also sidesteps the engines' opposite default NULL sort order.
    * Physically one Expand node feeds a single hash aggregate — three
    * granularities, ONE pass over the data, the reason GROUPING SETS
    * beats three unioned aggregations at any scale. */
  val a25GroupingSets = QueryDef(
    "a25_grouping_sets",
    Some("""SELECT coalesce(event_type, '(all)') AS etype,
           |  coalesce(strftime(CAST(ts AS TIMESTAMP), '%Y-%m-%d'), '(all)') AS day_s,
           |  CAST(GROUPING(event_type) AS BIGINT) AS g_type,
           |  CAST(GROUPING(strftime(CAST(ts AS TIMESTAMP), '%Y-%m-%d')) AS BIGINT) AS g_day,
           |  COUNT(*) AS n,
           |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
           |FROM events
           |GROUP BY GROUPING SETS (
           |  (event_type, strftime(CAST(ts AS TIMESTAMP), '%Y-%m-%d')),
           |  (event_type), ())
           |ORDER BY g_day, g_type, etype, day_s""".stripMargin),
    (spark, dir) => {
      Tables.events(spark, dir).createOrReplaceTempView("v_events_gs")
      spark.sql(
        """SELECT coalesce(event_type, '(all)') AS etype,
          |  coalesce(date_format(ts, 'yyyy-MM-dd'), '(all)') AS day_s,
          |  CAST(GROUPING(event_type) AS BIGINT) AS g_type,
          |  CAST(GROUPING(date_format(ts, 'yyyy-MM-dd')) AS BIGINT) AS g_day,
          |  COUNT(*) AS n,
          |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
          |FROM v_events_gs
          |GROUP BY GROUPING SETS (
          |  (event_type, date_format(ts, 'yyyy-MM-dd')),
          |  (event_type), ())
          |ORDER BY g_day, g_type, etype, day_s""".stripMargin)
    })

  val defs: Seq[QueryDef] = Seq(wSlidingWindow, wSessionWindow, a11Rollup,
    a11bCube, a23RollingRange, a24SpikeDays, a25GroupingSets)
}

package graft.ops

import graft.QueryDef
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Batch analogs of the reference's keyed-state record-at-a-time
  * operators (SURVEY §2.6 T1/T2/T3). The streaming forms live in
  * `graft.streaming` and are exercised by ScalaTest; these batch forms
  * are the DuckDB-checkable declarations of the same semantics.
  */
object Stateful {

  /** T1 — new-user correction (`app/dwd/BaseLogApp.java:72-101`): the
    * first record per key is the only one allowed to keep is_new=1;
    * later records are rewritten to 0. Batch analog: row_number over
    * (user, time). */
  val t1NewUserFix = QueryDef(
    "t1_new_user_fix",
    Some("""SELECT user_id, event_id,
           |  CAST(CASE WHEN ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) = 1
           |       THEN 1 ELSE 0 END AS BIGINT) AS is_new
           |FROM events
           |ORDER BY user_id, event_id""".stripMargin),
    (spark, dir) => {
      val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      Tables.events(spark, dir)
        .withColumn("is_new", when(row_number().over(w) === 1, 1L).otherwise(0L))
        .select("user_id", "event_id", "is_new")
        .orderBy("user_id", "event_id")
    })

  /** T2 — UV / first-visit-of-day dedup with 24 h state TTL
    * (`app/dwm/UniqueVisitApp.java:49-88`): keep only the first record
    * per (user, day). */
  val t2UvDedup = QueryDef(
    "t2_uv_dedup",
    Some("""SELECT user_id,
           |  strftime(CAST(ts AS TIMESTAMP), '%Y-%m-%d') AS visit_date,
           |  event_id AS first_event_id
           |FROM events
           |QUALIFY ROW_NUMBER() OVER (PARTITION BY user_id, CAST(CAST(ts AS TIMESTAMP) AS DATE) ORDER BY ts, event_id) = 1
           |ORDER BY user_id, visit_date""".stripMargin),
    (spark, dir) => {
      val w = Window.partitionBy(col("user_id"), to_date(col("ts")))
        .orderBy("ts", "event_id")
      Tables.events(spark, dir)
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(
          col("user_id"),
          date_format(col("ts"), "yyyy-MM-dd").as("visit_date"),
          col("event_id").as("first_event_id"))
        .orderBy("user_id", "visit_date")
    })

  /** T3 — CEP bounce detection (`app/dwm/UserJumpDetailApp.java:57-86`):
    * a session-start event is a bounce iff its immediate successor is
    * also a session-start within the window, OR no successor arrives
    * within the window (the CEP timeout branch). Here session-start :=
    * event_type='view', window = 30 min (the reference's 10 s scaled to
    * this dataset's inter-event gaps). Batch analog: lead() gap test.
    */
  val t3BounceDetect = QueryDef(
    "t3_bounce_detect",
    Some("""WITH e AS (
           |  SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts, event_type,
           |    LEAD(CAST(ts AS TIMESTAMP)) OVER w AS nxt_ts,
           |    LEAD(event_type) OVER w AS nxt_type
           |  FROM events
           |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
           |SELECT user_id, event_id
           |FROM e
           |WHERE event_type = 'view'
           |  AND (nxt_ts IS NULL OR nxt_ts > ts + INTERVAL 1800 SECOND OR nxt_type = 'view')
           |ORDER BY user_id, event_id""".stripMargin),
    (spark, dir) => {
      val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      Tables.events(spark, dir)
        .withColumn("nxt_ts", lead(col("ts"), 1).over(w))
        .withColumn("nxt_type", lead(col("event_type"), 1).over(w))
        .filter(
          col("event_type") === "view" && (
            col("nxt_ts").isNull ||
            col("nxt_ts") > col("ts") + expr("INTERVAL 1800 SECOND") ||
            col("nxt_type") === "view"))
        .select("user_id", "event_id")
        .orderBy("user_id", "event_id")
    })

  val defs: Seq[QueryDef] = Seq(t1NewUserFix, t2UvDedup, t3BounceDetect)
}

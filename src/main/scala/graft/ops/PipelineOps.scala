package graft.ops

import graft.QueryDef
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** End-to-end layered pipeline (SURVEY §3.1): the reference's
  * DWD → DWM → DWS → ADS topology composed as one declarative plan —
  * cleanse/split, stream dedup, windowed aggregation, and a final ADS
  * ranking — the full gmall query lifecycle in a single
  * Catalyst-optimized DAG (each layer a DataFrame → DataFrame function,
  * exactly the composition the streaming forms run micro-batch-wise).
  */
object PipelineOps {

  val pipelineDwsE2e = QueryDef(
    "pipeline_dws_e2e",
    Some("""WITH dwd AS (
           |  SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts, event_type, value
           |  FROM events WHERE event_type <> 'error'),
           |dwm_uv AS (
           |  SELECT user_id, ts FROM dwd
           |  QUALIFY ROW_NUMBER() OVER (PARTITION BY user_id, CAST(ts AS DATE)
           |                             ORDER BY ts, event_id) = 1),
           |dws AS (
           |  SELECT strftime(date_trunc('day', d.ts), '%Y-%m-%d') AS stt,
           |    COUNT(*) AS pv_ct,
           |    CAST(SUM(CASE WHEN d.event_type = 'purchase' THEN CAST(d.value AS DECIMAL(18,2))
           |              ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE) AS order_amount
           |  FROM dwd d GROUP BY 1),
           |dws_uv AS (
           |  SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS stt, COUNT(*) AS uv_ct
           |  FROM dwm_uv GROUP BY 1)
           |SELECT d.stt, u.uv_ct, d.pv_ct, d.order_amount,
           |  ROUND(CAST(d.pv_ct AS DOUBLE) / u.uv_ct, 2) AS pv_per_uv
           |FROM dws d JOIN dws_uv u ON d.stt = u.stt
           |ORDER BY d.stt""".stripMargin),
    (spark, dir) => {
      // DWD: cleanse/split — drop the dirty branch (BaseLogApp).
      val dwd = Tables.events(spark, dir).filter(col("event_type") =!= "error")
      // DWM: UV dedup — first event per (user, day) (UniqueVisitApp).
      val w = Window.partitionBy(col("user_id"), to_date(col("ts")))
        .orderBy("ts", "event_id")
      val dwmUv = dwd.withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("user_id"), col("ts"))
      // DWS: daily windowed stats from both layers (VisitorStatsApp).
      val dws = dwd.groupBy(date_format(col("ts"), "yyyy-MM-dd").as("stt"))
        .agg(
          count(lit(1)).as("pv_ct"),
          expr("""CAST(SUM(CASE WHEN event_type = 'purchase' THEN CAST(value AS DECIMAL(18,2))
                 |         ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE)""".stripMargin).as("order_amount"))
      val dwsUv = dwmUv.groupBy(date_format(col("ts"), "yyyy-MM-dd").as("stt"))
        .agg(count(lit(1)).as("uv_ct"))
      // ADS: join the stats and derive ratio metrics (publisher layer).
      dws.join(dwsUv, "stt")
        .select(
          col("stt"), col("uv_ct"), col("pv_ct"), col("order_amount"),
          round(col("pv_ct").cast("double") / col("uv_ct"), 2).as("pv_per_uv"))
        .orderBy("stt")
    })

  val defs: Seq[QueryDef] = Seq(pipelineDwsE2e)
}

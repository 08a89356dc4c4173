package graft.ops

import graft.QueryDef
import org.apache.spark.sql.functions._

/** ADS-analytics breadth beyond the reference's mapper SQL: pivot
  * tables, cohort retention, percentile profiles — the query shapes a
  * publisher/dashboard layer issues against the stats tables.
  */
object Analytics {

  /** Pivot (cross-tab): order counts by priority × status. Oracle is
    * the conditional-aggregation expansion — the two forms must agree
    * exactly. */
  val a12Pivot = QueryDef(
    "a12_pivot",
    Some("""SELECT o_orderpriority,
           |  CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS f_ct,
           |  CAST(SUM(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS o_ct,
           |  CAST(SUM(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END) AS BIGINT) AS p_ct
           |FROM orders
           |GROUP BY o_orderpriority
           |ORDER BY o_orderpriority""".stripMargin),
    (spark, dir) =>
      Tables.table(spark, dir, "orders")
        .groupBy("o_orderpriority")
        .pivot("o_orderstatus", Seq("F", "O", "P"))
        .agg(count(lit(1)))
        .select(
          col("o_orderpriority"),
          coalesce(col("F"), lit(0L)).as("f_ct"),
          coalesce(col("O"), lit(0L)).as("o_ct"),
          coalesce(col("P"), lit(0L)).as("p_ct"))
        .orderBy("o_orderpriority"))

  /** Cohort retention: users grouped by first-seen day; day-1 / day-7
    * return rates. */
  val a13Retention = QueryDef(
    "a13_retention",
    Some("""WITH act AS (
           |  SELECT DISTINCT user_id, CAST(CAST(ts AS TIMESTAMP) AS DATE) AS d FROM events),
           |first AS (
           |  SELECT user_id, min(d) AS cohort FROM act GROUP BY user_id)
           |SELECT strftime(f.cohort, '%Y-%m-%d') AS cohort_day,
           |  COUNT(DISTINCT f.user_id) AS cohort_size,
           |  COUNT(DISTINCT CASE WHEN a.d = f.cohort + 1 THEN f.user_id END) AS d1_retained,
           |  COUNT(DISTINCT CASE WHEN a.d = f.cohort + 7 THEN f.user_id END) AS d7_retained
           |FROM first f
           |JOIN act a ON a.user_id = f.user_id
           |GROUP BY 1
           |ORDER BY 1""".stripMargin),
    (spark, dir) => {
      val act = Tables.events(spark, dir)
        .select(col("user_id"), to_date(col("ts")).as("d")).distinct()
      val first = act.groupBy("user_id").agg(min(col("d")).as("cohort"))
      first.join(act, "user_id")
        .groupBy(date_format(col("cohort"), "yyyy-MM-dd").as("cohort_day"))
        .agg(
          countDistinct(col("user_id")).as("cohort_size"),
          countDistinct(when(col("d") === date_add(col("cohort"), 1), col("user_id"))).as("d1_retained"),
          countDistinct(when(col("d") === date_add(col("cohort"), 7), col("user_id"))).as("d7_retained"))
        .orderBy("cohort_day")
    })

  /** Percentile profile: interpolated quantiles of order value per
    * status (continuous-percentile semantics in both engines). */
  val a14Percentile = QueryDef(
    "a14_percentile",
    Some("""SELECT o_orderstatus,
           |  ROUND(quantile_cont(o_totalprice, 0.25), 2) AS p25,
           |  ROUND(quantile_cont(o_totalprice, 0.50), 2) AS p50,
           |  ROUND(quantile_cont(o_totalprice, 0.95), 2) AS p95
           |FROM orders
           |GROUP BY o_orderstatus
           |ORDER BY o_orderstatus""".stripMargin),
    (spark, dir) =>
      Tables.table(spark, dir, "orders")
        .groupBy("o_orderstatus")
        .agg(
          round(expr("percentile(o_totalprice, 0.25)"), 2).as("p25"),
          round(expr("percentile(o_totalprice, 0.50)"), 2).as("p50"),
          round(expr("percentile(o_totalprice, 0.95)"), 2).as("p95"))
        .orderBy("o_orderstatus"))

  val defs: Seq[QueryDef] = Seq(a12Pivot, a13Retention, a14Percentile)
}

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
    * status (continuous-percentile semantics in both engines).
    * Rounded at 6 decimals ON PURPOSE: the interpolated value over
    * cent-priced data is v_i + f·(v_{i+1} − v_i) with f a multiple of
    * 1/20 or 1/4, so its exact decimal expansion terminates at ≤ 4
    * places — rounding at 6 can never meet a tie digit, where the old
    * 2-place display landed ON the half-cent tie whenever p50 fell
    * between two prices (the cross-engine ROUND divergence). */
  val a14Percentile = QueryDef(
    "a14_percentile",
    Some("""SELECT o_orderstatus,
           |  ROUND(quantile_cont(o_totalprice, 0.25), 6) AS p25,
           |  ROUND(quantile_cont(o_totalprice, 0.50), 6) AS p50,
           |  ROUND(quantile_cont(o_totalprice, 0.95), 6) AS p95
           |FROM orders
           |GROUP BY o_orderstatus
           |ORDER BY o_orderstatus""".stripMargin),
    (spark, dir) =>
      Tables.table(spark, dir, "orders")
        .groupBy("o_orderstatus")
        .agg(
          round(expr("percentile(o_totalprice, 0.25)"), 6).as("p25"),
          round(expr("percentile(o_totalprice, 0.50)"), 6).as("p50"),
          round(expr("percentile(o_totalprice, 0.95)"), 6).as("p95"))
        .orderBy("o_orderstatus"))

  /** Analytic window functions (rank / dense_rank / lag) — supplier
    * revenue leaderboard within each nation. The reference has no
    * analytic functions; these complete the ADS surface. */
  val a15WindowRank = QueryDef(
    "a15_window_rank",
    Some("""WITH rev AS (
           |  SELECT s.s_suppkey, n.n_name,
           |    CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l.l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
           |  FROM lineitem l
           |  JOIN supplier s ON l.l_suppkey = s.s_suppkey
           |  JOIN nation n ON s.s_nationkey = n.n_nationkey
           |  GROUP BY s.s_suppkey, n.n_name)
           |SELECT n_name, s_suppkey, revenue,
           |  CAST(RANK() OVER w AS BIGINT) AS rnk,
           |  CAST(DENSE_RANK() OVER w AS BIGINT) AS drnk,
           |  ROUND(revenue - COALESCE(LAG(revenue) OVER w, revenue), 2) AS gap_to_prev
           |FROM rev
           |WINDOW w AS (PARTITION BY n_name ORDER BY revenue DESC, s_suppkey)
           |ORDER BY n_name, rnk, s_suppkey""".stripMargin),
    (spark, dir) => {
      import org.apache.spark.sql.expressions.Window
      val l = Tables.table(spark, dir, "lineitem")
      val s = Tables.table(spark, dir, "supplier")
      val n = Tables.table(spark, dir, "nation")
      // supplier scales with SF (unhinted — AQE broadcasts only while
      // genuinely small); nation is a fixed 25-row dim, hinted
      val rev = l.join(s, l("l_suppkey") === s("s_suppkey"))
        .join(broadcast(n), s("s_nationkey") === n("n_nationkey"))
        .groupBy(s("s_suppkey"), n("n_name"))
        .agg(expr("CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE)").as("revenue"))
      val w = Window.partitionBy("n_name").orderBy(col("revenue").desc, col("s_suppkey"))
      rev.select(
          col("n_name"), col("s_suppkey"), col("revenue"),
          rank().over(w).cast("long").as("rnk"),
          dense_rank().over(w).cast("long").as("drnk"),
          round(col("revenue") - coalesce(lag(col("revenue"), 1).over(w), col("revenue")), 2).as("gap_to_prev"))
        .orderBy("n_name", "rnk", "s_suppkey")
    })

  /** Running totals: monthly GMV per order status with a cumulative
    * frame — exact because the cumulative sum runs over decimal
    * partials. */
  val a16RunningTotal = QueryDef(
    "a16_running_total",
    Some("""WITH m AS (
           |  SELECT o_orderstatus, strftime(date_trunc('month', o_orderdate), '%Y-%m') AS mon,
           |    SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS gmv
           |  FROM orders GROUP BY 1, 2)
           |SELECT o_orderstatus, mon,
           |  CAST(gmv AS DOUBLE) AS gmv,
           |  CAST(SUM(gmv) OVER (PARTITION BY o_orderstatus ORDER BY mon
           |                      ROWS UNBOUNDED PRECEDING) AS DOUBLE) AS running_gmv
           |FROM m
           |ORDER BY o_orderstatus, mon""".stripMargin),
    (spark, dir) => {
      import org.apache.spark.sql.expressions.Window
      val m = Tables.table(spark, dir, "orders")
        .groupBy(col("o_orderstatus"),
          date_format(date_trunc("month", col("o_orderdate")), "yyyy-MM").as("mon"))
        .agg(sum(col("o_totalprice").cast("decimal(18,2)")).as("gmv"))
      val w = Window.partitionBy("o_orderstatus").orderBy("mon")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      m.select(
          col("o_orderstatus"), col("mon"),
          col("gmv").cast("double").as("gmv"),
          sum(col("gmv")).over(w).cast("double").as("running_gmv"))
        .orderBy("o_orderstatus", "mon")
    })

  /** INTERSECT — customers active in both 1995 and 1996 (set-op
    * surface beyond the reference's unions). */
  val u4Intersect = QueryDef(
    "u4_intersect",
    Some("""SELECT o_custkey FROM orders WHERE EXTRACT(year FROM o_orderdate) = 1995
           |INTERSECT
           |SELECT o_custkey FROM orders WHERE EXTRACT(year FROM o_orderdate) = 1996
           |ORDER BY o_custkey""".stripMargin),
    (spark, dir) => {
      val o = Tables.table(spark, dir, "orders")
      o.filter(year(col("o_orderdate")) === 1995).select("o_custkey")
        .intersect(o.filter(year(col("o_orderdate")) === 1996).select("o_custkey"))
        .orderBy("o_custkey")
    })

  /** EXCEPT — customers active in 1995 but gone in 1996 (churn). */
  val u5Except = QueryDef(
    "u5_except",
    Some("""SELECT o_custkey FROM orders WHERE EXTRACT(year FROM o_orderdate) = 1995
           |EXCEPT
           |SELECT o_custkey FROM orders WHERE EXTRACT(year FROM o_orderdate) = 1996
           |ORDER BY o_custkey""".stripMargin),
    (spark, dir) => {
      val o = Tables.table(spark, dir, "orders")
      o.filter(year(col("o_orderdate")) === 1995).select("o_custkey")
        .except(o.filter(year(col("o_orderdate")) === 1996).select("o_custkey"))
        .orderBy("o_custkey")
    })

  /** Statistical aggregates with cross-engine-exact results: mean /
    * population variance / stddev derived from decimal moment sums
    * (sum(x), sum(x²) exact and order-independent; the final double
    * arithmetic is written identically in both engines). */
  val a18Stats = QueryDef(
    "a18_stats",
    Some(s"""WITH m AS (
           |  SELECT event_type, COUNT(*) AS n,
           |    CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sx,
           |    CAST(SUM(CAST(value * value AS DECIMAL(38,12))) AS DOUBLE) AS sxx,
           |    CAST(SUM(CAST(value AS DECIMAL(18,2))) * 100 AS HUGEINT) AS sx100,
           |    CAST(SUM(CAST(value * value AS DECIMAL(38,12))) * 1000000000000 AS HUGEINT) AS sxx12
           |  FROM events GROUP BY event_type)
           |SELECT event_type, n,
           |  ${graft.QueryDef.roundedRatioSql("sx100", "n * 100", 6)} AS mean,
           |  ${graft.QueryDef.roundedRatioSql(
                "sxx12 * n - sx100 * sx100 * 100000000",
                "CAST(n AS HUGEINT) * n * 1000000000000", 6)} AS var_pop,
           |  ROUND(sqrt(sxx / n - (sx / n) * (sx / n)), 6) AS stddev_pop
           |FROM m
           |ORDER BY event_type""".stripMargin),
    (spark, dir) => {
      val m = Tables.events(spark, dir)
        .groupBy("event_type")
        .agg(
          count(lit(1)).as("n"),
          sum(col("value").cast("decimal(18,2)")).cast("double").as("sx"),
          sum((col("value") * col("value")).cast("decimal(38,12)")).cast("double").as("sxx"),
          expr("CAST(SUM(CAST(value AS DECIMAL(18,2))) * 100 AS DECIMAL(38,0))").as("_sx100"),
          expr("CAST(SUM(CAST(value * value AS DECIMAL(38,12))) * 1000000000000 AS DECIMAL(38,0))").as("_sxx12"))
      // mean and var_pop via exact integer moments (HALF_UP on the true
      // rational, cross-engine identical); stddev stays on the shared
      // double expression — sqrt output is irrational off the zero case,
      // so its shortest decimal form cannot land on a rounding tie
      val meanD = col("sx") / col("n")
      val varD = col("sxx") / col("n") - meanD * meanD
      val varNum = col("_sxx12") * col("n") -
        col("_sx100") * col("_sx100") * lit(100000000L)
      val varDen = col("n").cast("decimal(38,0)") * col("n") * lit(1000000000000L)
      m.select(
          col("event_type"), col("n"),
          graft.QueryDef.roundedRatio(col("_sx100"), col("n") * 100, 6).as("mean"),
          graft.QueryDef.roundedRatio(varNum, varDen, 6).as("var_pop"),
          round(sqrt(varD), 6).as("stddev_pop"))
        .orderBy("event_type")
    })

  /** Scalar + IN subqueries (Catalyst subquery rewriting): customers
    * above the global average balance who ordered in 1995. */
  val a19Subquery = QueryDef(
    "a19_subquery",
    Some("""SELECT c_custkey, c_mktsegment
           |FROM customer
           |WHERE c_acctbal > (SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) FROM customer)
           |  AND c_custkey IN (SELECT o_custkey FROM orders WHERE EXTRACT(year FROM o_orderdate) = 1995)
           |ORDER BY c_custkey""".stripMargin),
    (spark, dir) => {
      Tables.table(spark, dir, "customer").createOrReplaceTempView("v_customer")
      Tables.table(spark, dir, "orders").createOrReplaceTempView("v_orders")
      spark.sql(
        """SELECT c_custkey, c_mktsegment
          |FROM v_customer
          |WHERE c_acctbal > (SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) FROM v_customer)
          |  AND c_custkey IN (SELECT o_custkey FROM v_orders WHERE year(o_orderdate) = 1995)
          |ORDER BY c_custkey""".stripMargin)
    })

  /** Calendar gap-filling: a generated date spine left-joined to daily
    * activity, so quiet days appear as explicit zeros (dashboards and
    * training-data audits both need the dense series). */
  val a20GapFill = QueryDef(
    "a20_gap_fill",
    Some("""WITH spine AS (
           |  SELECT unnest(generate_series(DATE '2024-01-01', DATE '2024-01-31', INTERVAL 1 DAY))::DATE AS day),
           |daily AS (
           |  SELECT CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day,
           |    COUNT(*) AS n,
           |    CAST(SUM(CASE WHEN event_type = 'purchase' THEN CAST(value AS DECIMAL(18,2))
           |              ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE) AS purchases
           |  FROM events GROUP BY 1)
           |SELECT strftime(s.day, '%Y-%m-%d') AS day,
           |  COALESCE(d.n, 0) AS n,
           |  COALESCE(d.purchases, 0.0) AS purchases
           |FROM spine s LEFT JOIN daily d ON d.day = s.day
           |ORDER BY day""".stripMargin),
    (spark, dir) => {
      val spine = spark.range(1)
        .select(explode(expr(
          "sequence(DATE '2024-01-01', DATE '2024-01-31', INTERVAL 1 DAY)")).as("day"))
      val daily = Tables.events(spark, dir)
        .groupBy(to_date(col("ts")).as("day"))
        .agg(
          count(lit(1)).as("n"),
          expr("""CAST(SUM(CASE WHEN event_type = 'purchase' THEN CAST(value AS DECIMAL(18,2))
                 |         ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE)""".stripMargin).as("purchases"))
      spine.join(daily, Seq("day"), "left")
        .select(
          date_format(col("day"), "yyyy-MM-dd").as("day"),
          coalesce(col("n"), lit(0L)).as("n"),
          coalesce(col("purchases"), lit(0.0)).as("purchases"))
        .orderBy("day")
    })

  /** Native recursive CTE (`WITH RECURSIVE`, new SQL surface in
    * Spark 4): the a20 date spine built by RECURSION instead of
    * `sequence()`, left-joined to daily counts. Recursion depth = the
    * fixed 31-day calendar (SF-independent, far under the recursion
    * limit); each level is one tiny row. Spark's recursive CTEs are
    * UNION ALL-only (no UNION-dedup cycle safety yet), so the engine
    * reserves the surface for ACYCLIC recursions like this spine —
    * cyclic graph walks stay on the iterative min-label operator
    * (`dedup_clusters`), which is also the scale-correct shape. */
  val g1RecursiveSpine = QueryDef(
    "g1_recursive_spine",
    Some("""WITH RECURSIVE spine(day) AS (
           |  SELECT DATE '2024-01-01'
           |  UNION ALL
           |  SELECT day + 1 FROM spine WHERE day < DATE '2024-01-31'),
           |daily AS (
           |  SELECT CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day, COUNT(*) AS n
           |  FROM events GROUP BY 1)
           |SELECT strftime(s.day, '%Y-%m-%d') AS day,
           |  CAST(COALESCE(d.n, 0) AS BIGINT) AS n
           |FROM spine s LEFT JOIN daily d ON d.day = s.day
           |ORDER BY day""".stripMargin),
    (spark, dir) => {
      Tables.events(spark, dir).createOrReplaceTempView("v_events_g1")
      spark.sql(
        """WITH RECURSIVE spine(day) AS (
          |  SELECT DATE '2024-01-01' AS day
          |  UNION ALL
          |  SELECT date_add(day, 1) FROM spine WHERE day < DATE '2024-01-31'),
          |daily AS (
          |  SELECT to_date(ts) AS day, COUNT(*) AS n
          |  FROM v_events_g1 GROUP BY 1)
          |SELECT date_format(s.day, 'yyyy-MM-dd') AS day,
          |  CAST(COALESCE(d.n, 0) AS BIGINT) AS n
          |FROM spine s LEFT JOIN daily d ON d.day = s.day
          |ORDER BY day""".stripMargin)
    })

  /** Schema-evolving union: two corpus generations with different
    * columns merged by name, missing columns null-padded (the
    * `unionByName(allowMissingColumns)` ingestion pattern; DuckDB
    * mirror is UNION ALL BY NAME). */
  val u6UnionEvolved = QueryDef(
    "u6_union_evolved",
    Some("""SELECT doc_id, lang, COUNT(*) AS n
           |FROM (
           |  SELECT doc_id, lang FROM documents WHERE doc_id % 2 = 0
           |  UNION ALL BY NAME
           |  SELECT doc_id FROM documents WHERE doc_id % 2 = 1)
           |GROUP BY doc_id, lang
           |ORDER BY doc_id""".stripMargin),
    (spark, dir) => {
      val d = Tables.table(spark, dir, "documents")
      val gen1 = d.filter(col("doc_id") % 2 === 0).select("doc_id", "lang")
      val gen2 = d.filter(col("doc_id") % 2 === 1).select("doc_id")
      gen1.unionByName(gen2, allowMissingColumns = true)
        .groupBy("doc_id", "lang")
        .agg(count(lit(1)).as("n"))
        .orderBy("doc_id")
    })

  /** Window-function long tail: ntile quartiles, first/last/nth value
    * frames — on a top-100 slice so the unpartitioned window is
    * bounded (an unpartitioned window over an unbounded relation is
    * the anti-pattern; here the TakeOrdered top-k bounds it first). */
  val a21WindowExtras = QueryDef(
    "a21_window_extras",
    Some("""WITH f AS (
           |  SELECT o_orderkey, o_totalprice FROM orders WHERE o_orderstatus = 'F'
           |  ORDER BY o_totalprice DESC, o_orderkey LIMIT 100)
           |SELECT o_orderkey, o_totalprice,
           |  CAST(NTILE(4) OVER w AS BIGINT) AS quartile,
           |  FIRST_VALUE(o_orderkey) OVER w AS top_key,
           |  LAST_VALUE(o_orderkey) OVER (ORDER BY o_totalprice DESC, o_orderkey
           |    ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS bottom_key,
           |  NTH_VALUE(o_orderkey, 3) OVER (ORDER BY o_totalprice DESC, o_orderkey
           |    ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS third_key
           |FROM f
           |WINDOW w AS (ORDER BY o_totalprice DESC, o_orderkey)
           |ORDER BY o_totalprice DESC, o_orderkey""".stripMargin),
    (spark, dir) => {
      import org.apache.spark.sql.expressions.Window
      val f = Tables.table(spark, dir, "orders")
        .filter(col("o_orderstatus") === "F")
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .limit(100)
      val w = Window.orderBy(col("o_totalprice").desc, col("o_orderkey"))
      val wFull = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      f.select(
          col("o_orderkey"), col("o_totalprice"),
          ntile(4).over(w).cast("long").as("quartile"),
          first(col("o_orderkey")).over(w).as("top_key"),
          last(col("o_orderkey")).over(wFull).as("bottom_key"),
          nth_value(col("o_orderkey"), 3).over(wFull).as("third_key"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    })

  /** Batch conversion funnel (the batch analog of the streaming CEP
    * funnel in `Cep`): users who viewed, then clicked after their
    * first view, then purchased after that click — ordered-sequence
    * semantics via staged conditional mins. Three aggregations, all
    * shuffling on user_id (one co-partitioned exchange chain, reused
    * by AQE). */
  val a22Funnel = QueryDef(
    "a22_funnel",
    Some("""WITH ev AS (
           |  SELECT user_id, event_type, CAST(ts AS TIMESTAMP) AS ts FROM events),
           |v AS (
           |  SELECT user_id, min(ts) AS t1 FROM ev WHERE event_type = 'view' GROUP BY user_id),
           |c AS (
           |  SELECT e.user_id, min(e.ts) AS t2
           |  FROM ev e JOIN v ON e.user_id = v.user_id
           |  WHERE e.event_type = 'click' AND e.ts > v.t1 GROUP BY e.user_id),
           |p AS (
           |  SELECT e.user_id, min(e.ts) AS t3
           |  FROM ev e JOIN c ON e.user_id = c.user_id
           |  WHERE e.event_type = 'purchase' AND e.ts > c.t2 GROUP BY e.user_id)
           |SELECT
           |  (SELECT COUNT(*) FROM v) AS n_viewed,
           |  (SELECT COUNT(*) FROM c) AS n_clicked,
           |  (SELECT COUNT(*) FROM p) AS n_purchased""".stripMargin),
    (spark, dir) => {
      val e = Tables.events(spark, dir)
      val v = e.filter(col("event_type") === "view")
        .groupBy("user_id").agg(min(col("ts")).as("t1"))
      val c = e.filter(col("event_type") === "click").as("e")
        .join(v.as("v"), col("e.user_id") === col("v.user_id"))
        .filter(col("e.ts") > col("v.t1"))
        .groupBy(col("e.user_id")).agg(min(col("e.ts")).as("t2"))
      val p = e.filter(col("event_type") === "purchase").as("e")
        .join(c.as("c"), col("e.user_id") === col("c.user_id"))
        .filter(col("e.ts") > col("c.t2"))
        .groupBy(col("e.user_id")).agg(min(col("e.ts")).as("t3"))
      v.agg(count(lit(1)).as("n_viewed"))
        .crossJoin(c.agg(count(lit(1)).as("n_clicked")))
        .crossJoin(p.agg(count(lit(1)).as("n_purchased")))
    })

  /** Native UNPIVOT — the inverse of a12's pivot: a wide per-source
    * language matrix melts back to long (source, lang, n) rows. Both
    * engines run their own UNPIVOT operator (Spark ≥3.4 relational
    * unpivot; DuckDB's ON/INTO form), not a hand-rolled stack of
    * UNION ALLs — the wide→long reshape is a projection-time Expand,
    * no shuffle beyond the wide aggregate's own. */
  val a12bUnpivot = QueryDef(
    "a12b_unpivot",
    Some("""WITH wide AS (
           |  SELECT source,
           |    CAST(SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT) AS en,
           |    CAST(SUM(CASE WHEN lang = 'de' THEN 1 ELSE 0 END) AS BIGINT) AS de,
           |    CAST(SUM(CASE WHEN lang = 'zh' THEN 1 ELSE 0 END) AS BIGINT) AS zh
           |  FROM documents GROUP BY source)
           |SELECT source, lang, n
           |FROM (UNPIVOT wide ON en, de, zh INTO NAME lang VALUE n)
           |ORDER BY source, lang""".stripMargin),
    (spark, dir) => {
      Tables.table(spark, dir, "documents").createOrReplaceTempView("v_docs_unp")
      spark.sql(
        """WITH wide AS (
          |  SELECT source,
          |    CAST(SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT) AS en,
          |    CAST(SUM(CASE WHEN lang = 'de' THEN 1 ELSE 0 END) AS BIGINT) AS de,
          |    CAST(SUM(CASE WHEN lang = 'zh' THEN 1 ELSE 0 END) AS BIGINT) AS zh
          |  FROM v_docs_unp GROUP BY source)
          |SELECT source, lang, n
          |FROM wide UNPIVOT (n FOR lang IN (en, de, zh))
          |ORDER BY source, lang""".stripMargin)
    })

  val defs: Seq[QueryDef] = Seq(
    a12Pivot, a12bUnpivot, a13Retention, a14Percentile, a15WindowRank,
    a16RunningTotal, a18Stats, a19Subquery, a20GapFill, g1RecursiveSpine,
    u4Intersect, u5Except, u6UnionEvolved, a21WindowExtras, a22Funnel)
}

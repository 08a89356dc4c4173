package graft.ops

import graft.QueryDef
import org.apache.spark.sql.functions._

/** Aggregation surface (SURVEY §2.5 A1–A10, §2.7 windows, §2.8 unions,
  * §2.10 UDTF): windowed multi-metric union aggregation, SQL windowed
  * agg with count(distinct), word-split UDTF analog, ADS top-N /
  * conditional / weighted / ratio queries.
  */
object Aggregates {

  /** A1 + P6/P10 + U1 + A5 + W1 — the ProductStats pattern
    * (`app/dws/ProductStatsApp.java:82-261`): per-metric branches
    * zero-padded to a union schema, unioned, then windowed keyed
    * aggregation with distinct-count accumulators and stt/edt window
    * stamps. Window = 1 day of event time. */
  val a1ProductStats = QueryDef(
    "a1_product_stats",
    Some("""SELECT strftime(date_trunc('day', CAST(ts AS TIMESTAMP)), '%Y-%m-%d %H:%M:%S') AS stt,
           |  strftime(date_trunc('day', CAST(ts AS TIMESTAMP)) + INTERVAL 1 DAY, '%Y-%m-%d %H:%M:%S') AS edt,
           |  CAST(SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS pv_ct,
           |  CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS click_ct,
           |  CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS order_ct,
           |  CAST(SUM(CASE WHEN event_type = 'purchase' THEN CAST(value AS DECIMAL(18,2)) ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE) AS order_amount,
           |  COUNT(DISTINCT CASE WHEN event_type IN ('view','click','purchase') THEN user_id END) AS uniq_users
           |FROM events
           |WHERE event_type IN ('view', 'click', 'purchase')
           |GROUP BY 1, 2
           |ORDER BY 1""".stripMargin),
    (spark, dir) => {
      val ev = Tables.events(spark, dir)
      // Zero-padded branches (P10) unioned by name (U1) — each source
      // stream contributes its one metric set, others 0.
      val pv = ev.filter(col("event_type") === "view").select(
        col("ts"), col("user_id"),
        lit(1L).as("pv_ct"), lit(0L).as("click_ct"), lit(0L).as("order_ct"),
        lit(0.0).cast("decimal(18,2)").as("order_amount"))
      val clicks = ev.filter(col("event_type") === "click").select(
        col("ts"), col("user_id"),
        lit(0L).as("pv_ct"), lit(1L).as("click_ct"), lit(0L).as("order_ct"),
        lit(0.0).cast("decimal(18,2)").as("order_amount"))
      val orders = ev.filter(col("event_type") === "purchase").select(
        col("ts"), col("user_id"),
        lit(0L).as("pv_ct"), lit(0L).as("click_ct"), lit(1L).as("order_ct"),
        col("value").cast("decimal(18,2)").as("order_amount"))
      pv.unionByName(clicks).unionByName(orders)
        .groupBy(window(col("ts"), "1 day"))
        .agg(
          sum("pv_ct").as("pv_ct"),
          sum("click_ct").as("click_ct"),
          sum("order_ct").as("order_ct"),
          sum("order_amount").cast("double").as("order_amount"),
          countDistinct(col("user_id")).as("uniq_users"))
        .select(
          date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss").as("stt"),
          date_format(col("window.end"), "yyyy-MM-dd HH:mm:ss").as("edt"),
          col("pv_ct"), col("click_ct"), col("order_ct"),
          col("order_amount"), col("uniq_users"))
        .orderBy("stt")
    })

  /** A2 + W1 — VisitorStats keyed tumble
    * (`app/dws/VisitorStatsApp.java:94-117`): window × dimension-tuple
    * sums. Window = 1 hour, key = event_type (vc/ch/ar/is_new analog).
    */
  val a2VisitorStats = QueryDef(
    "a2_visitor_stats",
    Some("""SELECT strftime(date_trunc('hour', CAST(ts AS TIMESTAMP)), '%Y-%m-%d %H:%M:%S') AS stt,
           |  strftime(date_trunc('hour', CAST(ts AS TIMESTAMP)) + INTERVAL 1 HOUR, '%Y-%m-%d %H:%M:%S') AS edt,
           |  event_type,
           |  COUNT(*) AS n,
           |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
           |FROM events
           |GROUP BY 1, 2, 3
           |ORDER BY 1, 3""".stripMargin),
    (spark, dir) =>
      Tables.events(spark, dir)
        .groupBy(window(col("ts"), "1 hour"), col("event_type"))
        .agg(
          count(lit(1)).as("n"),
          expr("CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE)").as("total_value"))
        .select(
          date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss").as("stt"),
          date_format(col("window.end"), "yyyy-MM-dd HH:mm:ss").as("edt"),
          col("event_type"), col("n"), col("total_value"))
        .orderBy("stt", "event_type"))

  /** A3 + S4 + W2 — the ProvinceStats SQL app
    * (`app/dws/ProvinceStatsSqlApp.java:47-65`): declared-table SQL with
    * TUMBLE + count(distinct). Runs as Spark SQL text over temp views —
    * the reference's Table-API surface. Month window over orders,
    * nation = province analog. */
  val a3ProvinceStats = QueryDef(
    "a3_province_stats",
    Some("""SELECT strftime(date_trunc('month', o.o_orderdate), '%Y-%m') AS stt,
           |  n.n_name,
           |  CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS order_amount,
           |  COUNT(DISTINCT o.o_orderkey) AS order_count
           |FROM orders o
           |JOIN customer c ON o.o_custkey = c.c_custkey
           |JOIN nation n ON c.c_nationkey = n.n_nationkey
           |GROUP BY 1, 2
           |ORDER BY 1, 2""".stripMargin),
    (spark, dir) => {
      Tables.table(spark, dir, "orders").createOrReplaceTempView("v_orders")
      Tables.table(spark, dir, "customer").createOrReplaceTempView("v_customer")
      Tables.table(spark, dir, "nation").createOrReplaceTempView("v_nation")
      spark.sql(
        """SELECT date_format(date_trunc('month', o.o_orderdate), 'yyyy-MM') AS stt,
          |  n.n_name,
          |  CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS order_amount,
          |  COUNT(DISTINCT o.o_orderkey) AS order_count
          |FROM v_orders o
          |JOIN v_customer c ON o.o_custkey = c.c_custkey
          |JOIN v_nation n ON c.c_nationkey = n.n_nationkey
          |GROUP BY 1, 2
          |ORDER BY 1, 2""".stripMargin)
    })

  /** A4 + D1/D2 — KeywordStats (`app/dws/KeywordStatsApp.java:40-66`,
    * `app/function/MyUDTF.java`): UDTF word split via split+explode,
    * then counted. Top-100 by count for a bounded result. The split
    * goes through the pluggable [[graft.functions.Tokenizers]] seam
    * (the reference's IK-analyzer plug point). */
  val a4KeywordStats = QueryDef(
    "a4_keyword_stats",
    Some("""SELECT word, COUNT(*) AS ct, COUNT(DISTINCT doc_id) AS docs
           |FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents)
           |WHERE length(word) > 0
           |GROUP BY word
           |ORDER BY ct DESC, word
           |LIMIT 100""".stripMargin),
    (spark, dir) =>
      Tables.table(spark, dir, "documents")
        .select(col("doc_id"),
          explode(graft.functions.Tokenizers.whitespace(col("text"))).as("word"))
        .filter(length(col("word")) > 0)
        .groupBy("word")
        .agg(count(lit(1)).as("ct"), countDistinct(col("doc_id")).as("docs"))
        .orderBy(col("ct").desc, col("word"))
        .limit(100))

  /** D2, second strategy through the same seam — regex word
    * extraction (lowercased `[a-z0-9]+` runs), the robust tokenizer
    * for punctuation-glued text; proves swapping tokenizers changes
    * one expression, not the query. */
  val a4cKeywordStatsTokenized = QueryDef(
    "a4c_keyword_stats_tokenized",
    Some("""SELECT word, COUNT(*) AS ct, COUNT(DISTINCT doc_id) AS docs
           |FROM (SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS word FROM documents)
           |GROUP BY word
           |ORDER BY ct DESC, word
           |LIMIT 100""".stripMargin),
    (spark, dir) =>
      Tables.table(spark, dir, "documents")
        .select(col("doc_id"),
          explode(graft.functions.Tokenizers.words(col("text"))).as("word"))
        .groupBy("word")
        .agg(count(lit(1)).as("ct"), countDistinct(col("doc_id")).as("docs"))
        .orderBy(col("ct").desc, col("word"))
        .limit(100))

  /** D1 SQL surface — the UDTF used through SQL, Flink's
    * `LATERAL TABLE(splitFunction(...))` (`app/dws/KeywordStatsApp.java:50-54`)
    * as Spark SQL `LATERAL VIEW explode(split(...))`. */
  val a4bLateralView = QueryDef(
    "a4b_lateral_view",
    Some("""SELECT word, COUNT(*) AS ct
           |FROM (SELECT unnest(string_split(text, ' ')) AS word FROM documents)
           |WHERE length(word) > 0
           |GROUP BY word
           |ORDER BY ct DESC, word
           |LIMIT 50""".stripMargin),
    (spark, dir) => {
      Tables.table(spark, dir, "documents").createOrReplaceTempView("v_documents")
      spark.sql(
        """SELECT word, COUNT(*) AS ct
          |FROM v_documents
          |LATERAL VIEW explode(split(text, ' ')) t AS word
          |WHERE length(word) > 0
          |GROUP BY word
          |ORDER BY ct DESC, word
          |LIMIT 50""".stripMargin)
    })

  /** D1 full parity — the word split as a REAL custom Catalyst
    * Generator (`graft.functions.SplitWords`) invoked through SQL
    * LATERAL VIEW, the exact shape of Flink's
    * `LATERAL TABLE(splitFunction(full_word))`. */
  val d1CustomUdtf = QueryDef(
    "d1_custom_udtf",
    Some("""SELECT word, COUNT(DISTINCT doc_id) AS docs
           |FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents)
           |WHERE length(word) > 0
           |GROUP BY word
           |ORDER BY docs DESC, word
           |LIMIT 30""".stripMargin),
    (spark, dir) => {
      graft.functions.SplitWords.register(spark)
      Tables.table(spark, dir, "documents").createOrReplaceTempView("v_documents")
      spark.sql(
        """SELECT word, COUNT(DISTINCT doc_id) AS docs
          |FROM v_documents
          |LATERAL VIEW split_words(text) t AS word
          |GROUP BY word
          |ORDER BY docs DESC, word
          |LIMIT 30""".stripMargin)
    })

  /** A6 — ADS top-N ranking (`ProductStatsMapper.java:23-26`): GROUP BY
    * + HAVING + ORDER BY DESC + LIMIT over brand revenue. */
  val a6TopN = QueryDef(
    "a6_topn_brand_revenue",
    Some("""SELECT p.p_brand,
           |  CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l.l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
           |  COUNT(*) AS n_items
           |FROM lineitem l
           |JOIN part p ON l.l_partkey = p.p_partkey
           |GROUP BY p.p_brand
           |HAVING SUM(CAST(l.l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l.l_discount AS DECIMAL(18,2)))) > 0
           |ORDER BY revenue DESC, p.p_brand
           |LIMIT 10""".stripMargin),
    (spark, dir) => {
      val l = Tables.table(spark, dir, "lineitem")
      val p = Tables.table(spark, dir, "part")
      // part scales with SF — unhinted, AQE decides (q8/q9 convention)
      l.join(p, l("l_partkey") === p("p_partkey"))
        .groupBy(p("p_brand"))
        .agg(
          expr("CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE)").as("revenue"),
          count(lit(1)).as("n_items"))
        .filter(col("revenue") > 0)
        .orderBy(col("revenue").desc, col("p_brand"))
        .limit(10)
    })

  /** A7 — conditional aggregation (`VisitorStatsMapper.java:22-25`):
    * sum(if(cond, x, 0)) per hour-of-day. */
  val a7ConditionalAgg = QueryDef(
    "a7_conditional_agg",
    Some("""SELECT CAST(EXTRACT(hour FROM CAST(ts AS TIMESTAMP)) AS BIGINT) AS hr,
           |  CAST(SUM(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS BIGINT) AS new_users,
           |  CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS purchases,
           |  COUNT(*) AS total
           |FROM events
           |GROUP BY hr
           |ORDER BY hr""".stripMargin),
    (spark, dir) =>
      Tables.events(spark, dir)
        .groupBy(hour(col("ts")).cast("long").as("hr"))
        .agg(
          sum(when(col("event_type") === "signup", 1L).otherwise(0L)).as("new_users"),
          sum(when(col("event_type") === "purchase", 1L).otherwise(0L)).as("purchases"),
          count(lit(1)).as("total"))
        .orderBy("hr"))

  /** A8 — weighted scoring aggregation (`KeywordStatsMapper.java:15-20`
    * multiIf weights): per-user engagement score, top 20. */
  val a8WeightedScore = QueryDef(
    "a8_weighted_score",
    Some("""SELECT user_id,
           |  CAST(SUM(CASE event_type WHEN 'purchase' THEN 10 WHEN 'click' THEN 3
           |           WHEN 'view' THEN 2 WHEN 'signup' THEN 1 ELSE 0 END) AS BIGINT) AS score,
           |  COUNT(*) AS n_events
           |FROM events
           |GROUP BY user_id
           |ORDER BY score DESC, user_id
           |LIMIT 20""".stripMargin),
    (spark, dir) =>
      Tables.events(spark, dir)
        .groupBy("user_id")
        .agg(
          sum(
            when(col("event_type") === "purchase", 10L)
              .when(col("event_type") === "click", 3L)
              .when(col("event_type") === "view", 2L)
              .when(col("event_type") === "signup", 1L)
              .otherwise(0L)).as("score"),
          count(lit(1)).as("n_events"))
        .orderBy(col("score").desc, col("user_id"))
        .limit(20))

  /** A9 — grand-total aggregate with date filter
    * (`ProductStatsMapper.java:17-18` GMV). */
  val a9GrandTotal = QueryDef(
    "a9_grand_total",
    Some("""SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS gmv,
           |  COUNT(*) AS n_orders
           |FROM orders
           |WHERE EXTRACT(year FROM o_orderdate) = 1998""".stripMargin),
    (spark, dir) =>
      Tables.table(spark, dir, "orders")
        .filter(year(col("o_orderdate")) === 1998)
        .agg(
          expr("CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)").as("gmv"),
          count(lit(1)).as("n_orders")))

  /** A10 — derived ratio metrics (`gmall-publisher/.../VisitorStats.java:35-64`
    * bounce rate / per-visit averages): the average is an exact
    * HALF_UP integer-ratio round (cent-scaled sum over the count, via
    * [[graft.QueryDef.roundedRatio]]) — a cell count of 8/16/32 rows
    * would otherwise land the quotient on a cross-engine ROUND tie. */
  val a10RatioMetrics = QueryDef(
    "a10_ratio_metrics",
    Some(s"""SELECT event_type,
            |  COUNT(*) AS n,
            |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value,
            |  ${graft.QueryDef.roundedRatioSql(
                 "SUM(CAST(value AS DECIMAL(18,2))) * 100", "COUNT(*)", 2)} AS avg_value
            |FROM events
            |GROUP BY event_type
            |ORDER BY event_type""".stripMargin),
    (spark, dir) =>
      Tables.events(spark, dir)
        .groupBy("event_type")
        .agg(
          count(lit(1)).as("n"),
          expr("CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE)").as("total_value"),
          expr("CAST(SUM(CAST(value AS DECIMAL(18,2))) * 100 AS DECIMAL(38,0))").as("_tv100"))
        .withColumn("avg_value", graft.QueryDef.roundedRatio(col("_tv100"), col("n"), 2))
        .drop("_tv100")
        .orderBy("event_type"))

  /** A5 typed form — the distinct-set accumulator as a custom
    * `Aggregator` (graft.functions.DistinctLongCount), checked against
    * the relational COUNT(DISTINCT) oracle. */
  val a5TypedDistinct = QueryDef(
    "a5_typed_distinct",
    Some("""SELECT o_orderstatus,
           |  COUNT(DISTINCT o_custkey) AS n_customers,
           |  COUNT(*) AS n_orders
           |FROM orders
           |GROUP BY o_orderstatus
           |ORDER BY o_orderstatus""".stripMargin),
    (spark, dir) => {
      val distinctCustomers =
        udaf(new graft.functions.DistinctLongCount, org.apache.spark.sql.Encoders.scalaLong)
      Tables.table(spark, dir, "orders")
        .groupBy("o_orderstatus")
        .agg(
          distinctCustomers(col("o_custkey")).as("n_customers"),
          count(lit(1)).as("n_orders"))
        .orderBy("o_orderstatus")
    })

  val defs: Seq[QueryDef] = Seq(
    a1ProductStats, a2VisitorStats, a3ProvinceStats, a4KeywordStats,
    a4cKeywordStatsTokenized,
    a4bLateralView, a5TypedDistinct, a6TopN, a7ConditionalAgg,
    a8WeightedScore, a9GrandTotal, a10RatioMetrics, d1CustomUdtf)
}

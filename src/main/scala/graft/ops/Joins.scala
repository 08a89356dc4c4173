package graft.ops

import graft.QueryDef
import org.apache.spark.sql.functions._

/** Join surface (SURVEY §2.4 J1–J5): interval joins, broadcast
  * dimension enrichment, dynamic config routing, outer joins.
  *
  * Scale notes: the interval joins are equi-joins on the order key with
  * a residual time-range predicate — at cluster scale they shuffle both
  * sides on the key (no cross product). Dimension enrichment broadcasts
  * only the fixed-cardinality dims (`nation` = 25 rows, `region` = 5 —
  * size-invariant under SF). `customer` SCALES with SF (~15 M rows /
  * multi-GB at sf100), so it is deliberately left unhinted: AQE
  * broadcasts it while its runtime size is under the threshold and
  * falls back to a shuffle join beyond — the same treatment as q3/q5.
  */
object Joins {

  /** J1 — symmetric interval join (`app/dwm/OrderWideApp.java:59-66`,
    * [-5, +5] scaled to days): lineitem shipped within ±5 days of its
    * order's date. */
  val j1IntervalJoin = QueryDef(
    "j1_interval_join",
    Some("""SELECT o.o_orderpriority,
           |  COUNT(*) AS n_pairs,
           |  CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l.l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
           |FROM orders o
           |JOIN lineitem l
           |  ON l.l_orderkey = o.o_orderkey
           | AND l.l_shipdate BETWEEN o.o_orderdate - INTERVAL 5 DAY AND o.o_orderdate + INTERVAL 5 DAY
           |GROUP BY o.o_orderpriority
           |ORDER BY o.o_orderpriority""".stripMargin),
    (spark, dir) => {
      val o = Tables.table(spark, dir, "orders")
      val l = Tables.table(spark, dir, "lineitem")
      o.join(l,
          l("l_orderkey") === o("o_orderkey") &&
          l("l_shipdate").between(
            o("o_orderdate") - expr("INTERVAL 5 DAY"),
            o("o_orderdate") + expr("INTERVAL 5 DAY")))
        .groupBy(o("o_orderpriority"))
        .agg(
          count(lit(1)).as("n_pairs"),
          expr("CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE)").as("revenue"))
        .orderBy("o_orderpriority")
    })

  /** J2 — asymmetric interval join (`app/dwm/PaymentWideApp.java:75-83`,
    * [0, +15 min] scaled to days): ship AT-OR-AFTER order (the [0,+15]
    * lower bound is inclusive — BETWEEN is closed at 0), within 15
    * days. */
  val j2IntervalJoinAsym = QueryDef(
    "j2_interval_join_asym",
    Some("""SELECT o.o_orderstatus,
           |  COUNT(*) AS n_pairs,
           |  CAST(SUM(CAST(l.l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS total_qty
           |FROM orders o
           |JOIN lineitem l
           |  ON l.l_orderkey = o.o_orderkey
           | AND l.l_shipdate BETWEEN o.o_orderdate AND o.o_orderdate + INTERVAL 15 DAY
           |GROUP BY o.o_orderstatus
           |ORDER BY o.o_orderstatus""".stripMargin),
    (spark, dir) => {
      val o = Tables.table(spark, dir, "orders")
      val l = Tables.table(spark, dir, "lineitem")
      o.join(l,
          l("l_orderkey") === o("o_orderkey") &&
          l("l_shipdate").between(
            o("o_orderdate"),
            o("o_orderdate") + expr("INTERVAL 15 DAY")))
        .groupBy(o("o_orderstatus"))
        .agg(
          count(lit(1)).as("n_pairs"),
          expr("CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)").as("total_qty"))
        .orderBy("o_orderstatus")
    })

  /** J3 — dimension-enrichment chain, broadcast-join form of the
    * reference's async Phoenix/Redis lookups
    * (`app/function/DimAsyncFunction.java:20-56`,
    * `app/dwm/OrderWideApp.java:69-171`): fact orders enriched with
    * customer → nation → region. */
  val j3DimEnrich = QueryDef(
    "j3_dim_enrich",
    Some("""SELECT r.r_name, n.n_name,
           |  COUNT(*) AS n_orders,
           |  COUNT(DISTINCT c.c_custkey) AS n_customers,
           |  CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_spent
           |FROM orders o
           |JOIN customer c ON o.o_custkey = c.c_custkey
           |JOIN nation n ON c.c_nationkey = n.n_nationkey
           |JOIN region r ON n.n_regionkey = r.r_regionkey
           |GROUP BY r.r_name, n.n_name
           |ORDER BY r.r_name, n.n_name""".stripMargin),
    (spark, dir) => {
      val o = Tables.table(spark, dir, "orders")
      val c = Tables.table(spark, dir, "customer")
      val n = Tables.table(spark, dir, "nation")
      val r = Tables.table(spark, dir, "region")
      // customer unhinted: it scales with SF, so forcing a broadcast
      // would OOM at sf100 — AQE picks broadcast vs shuffle from the
      // measured size. nation/region stay hinted (fixed 25/5 rows).
      o.join(c, o("o_custkey") === c("c_custkey"))
        .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
        .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
        .groupBy(r("r_name"), n("n_name"))
        .agg(
          count(lit(1)).as("n_orders"),
          countDistinct(c("c_custkey")).as("n_customers"),
          expr("CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)").as("total_spent"))
        .orderBy("r_name", "n_name")
    })

  /** J4 — dynamic routing via broadcast config join
    * (`app/dwd/BaseDbApp.java:61-72`,
    * `app/function/TableProcessFunction.java:131-158`): a small config
    * table maps source record type → sink table/type; unmatched records
    * are dropped (no routing entry). */
  val j4DynamicRoute = QueryDef(
    "j4_dynamic_route",
    Some("""SELECT c.sink_type, c.sink_table, COUNT(*) AS n
           |FROM events e
           |JOIN (VALUES ('click', 'dwd_click_log', 'kafka'),
           |             ('view', 'dwd_page_log', 'kafka'),
           |             ('purchase', 'dwd_order_info', 'hbase'),
           |             ('signup', 'dwd_user_info', 'hbase')) AS c(event_type, sink_table, sink_type)
           |  ON e.event_type = c.event_type
           |GROUP BY c.sink_type, c.sink_table
           |ORDER BY c.sink_type, c.sink_table""".stripMargin),
    (spark, dir) => {
      import spark.implicits._
      val config = Seq(
        ("click", "dwd_click_log", "kafka"),
        ("view", "dwd_page_log", "kafka"),
        ("purchase", "dwd_order_info", "hbase"),
        ("signup", "dwd_user_info", "hbase"))
        .toDF("event_type", "sink_table", "sink_type")
      Tables.events(spark, dir)
        .join(broadcast(config), "event_type")
        .groupBy("sink_type", "sink_table")
        .agg(count(lit(1)).as("n"))
        .orderBy("sink_type", "sink_table")
    })

  /** J5 — outer join with null-side handling
    * (`gmall-flink-cdc/.../TestFlinkSQLJoin.java:17-44`): customers left
    * joined to their orders; customers with no orders keep a zero row.
    */
  val j5OuterJoin = QueryDef(
    "j5_outer_join",
    Some("""SELECT c.c_custkey,
           |  COUNT(o.o_orderkey) AS n_orders,
           |  CAST(COALESCE(SUM(CAST(o.o_totalprice AS DECIMAL(18,2))), 0) AS DOUBLE) AS spent
           |FROM customer c
           |LEFT JOIN orders o ON o.o_custkey = c.c_custkey
           |GROUP BY c.c_custkey
           |ORDER BY c.c_custkey""".stripMargin),
    (spark, dir) => {
      val c = Tables.table(spark, dir, "customer")
      val o = Tables.table(spark, dir, "orders")
      c.join(o, o("o_custkey") === c("c_custkey"), "left")
        .groupBy(c("c_custkey"))
        .agg(
          count(o("o_orderkey")).as("n_orders"),
          expr("CAST(COALESCE(SUM(CAST(o_totalprice AS DECIMAL(18,2))), 0) AS DOUBLE)").as("spent"))
        .orderBy("c_custkey")
    })

  /** Anti join (beyond the reference surface; NOT EXISTS): customers
    * with no orders in 1995. */
  val j5AntiJoin = QueryDef(
    "j5_anti_join",
    Some("""SELECT c.c_custkey, c.c_name
           |FROM customer c
           |WHERE NOT EXISTS (SELECT 1 FROM orders o
           |                  WHERE o.o_custkey = c.c_custkey
           |                    AND EXTRACT(year FROM o.o_orderdate) = 1995)
           |ORDER BY c.c_custkey""".stripMargin),
    (spark, dir) => {
      val c = Tables.table(spark, dir, "customer")
      val o = Tables.table(spark, dir, "orders")
        .filter(year(col("o_orderdate")) === 1995)
      c.join(o, o("o_custkey") === c("c_custkey"), "left_anti")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    })

  /** Semi join (EXISTS): customers that ordered in 1995, with no
    * duplication from the order side. */
  val j5SemiJoin = QueryDef(
    "j5_semi_join",
    Some("""SELECT c.c_custkey, c.c_mktsegment
           |FROM customer c
           |WHERE EXISTS (SELECT 1 FROM orders o
           |              WHERE o.o_custkey = c.c_custkey
           |                AND EXTRACT(year FROM o.o_orderdate) = 1995)
           |ORDER BY c.c_custkey""".stripMargin),
    (spark, dir) => {
      val c = Tables.table(spark, dir, "customer")
      val o = Tables.table(spark, dir, "orders")
        .filter(year(col("o_orderdate")) === 1995)
      c.join(o, o("o_custkey") === c("c_custkey"), "left_semi")
        .select("c_custkey", "c_mktsegment")
        .orderBy("c_custkey")
    })

  /** As-of join (beyond the reference; the temporal-lookup shape its
    * dim enrichment approximates): each purchase matched to the user's
    * latest view at-or-before it (time-to-conversion). Spark has no
    * native as-of join — implemented as the union + carry-forward
    * window technique: tag both sides, sort per key by (ts, side),
    * carry the last view forward, keep purchase rows. One shuffle on
    * the key, no per-key quadratic blowup. The oracle is DuckDB's
    * native ASOF LEFT JOIN — an independent implementation the
    * rewrite must agree with exactly. */
  val j6AsofJoin = QueryDef(
    "j6_asof_join",
    Some("""WITH views AS (
           |  SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_id AS view_id
           |  FROM events WHERE event_type = 'view'
           |  QUALIFY ROW_NUMBER() OVER (PARTITION BY user_id, CAST(ts AS TIMESTAMP) ORDER BY event_id) = 1),
           |p AS (
           |  SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_id
           |  FROM events WHERE event_type = 'purchase')
           |SELECT p.event_id, v.view_id,
           |  CASE WHEN v.view_id IS NULL THEN NULL
           |       ELSE date_diff('second', v.ts, p.ts) END AS gap_sec
           |FROM p ASOF LEFT JOIN views v
           |  ON p.user_id = v.user_id AND v.ts <= p.ts
           |ORDER BY p.event_id""".stripMargin),
    (spark, dir) => {
      import org.apache.spark.sql.expressions.Window
      val ev = Tables.events(spark, dir)
      // dedupe same-(user, ts) views so the as-of pick is unambiguous
      val vw = Window.partitionBy("user_id", "ts").orderBy("view_id")
      val views = ev.filter(col("event_type") === "view")
        .select(col("user_id"), col("ts"), col("event_id").as("view_id"))
        .withColumn("rn", row_number().over(vw)).filter(col("rn") === 1).drop("rn")
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("ts"), col("event_id"))
      val tagged = views.select(
          col("user_id"), col("ts"), lit(0).as("tag"),
          col("view_id"), col("ts").as("view_ts"),
          lit(null).cast("long").as("event_id"))
        .unionByName(purchases.select(
          col("user_id"), col("ts"), lit(1).as("tag"),
          lit(null).cast("long").as("view_id"),
          lit(null).cast("timestamp").as("view_ts"),
          col("event_id")))
      // views sort before purchases at equal ts (ASOF <= includes ties)
      val w = Window.partitionBy("user_id")
        .orderBy(col("ts"), col("tag"), coalesce(col("view_id"), col("event_id")))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      tagged
        .withColumn("asof_view", last(col("view_id"), ignoreNulls = true).over(w))
        .withColumn("asof_ts", last(col("view_ts"), ignoreNulls = true).over(w))
        .filter(col("tag") === 1)
        .select(
          col("event_id"),
          col("asof_view").as("view_id"),
          when(col("asof_view").isNull, lit(null).cast("long"))
            .otherwise(unix_timestamp(col("ts")) - unix_timestamp(col("asof_ts"))).as("gap_sec"))
        .orderBy("event_id")
    })

  /** Typed cogroup reconciliation: the orders and events relations
    * meet per key WITHOUT a join product — each side is shuffled once
    * on its key and the merge function sees both groups whole. This is
    * the Dataset shape for per-key logic a join can't express
    * (sequence alignment, custom conflation); a full-outer join of two
    * aggregates is the trivially-SQL case and therefore the oracle.
    * Each value is rounded to DECIMAL(18,2) scale (HALF_UP — the same
    * rounding both engines' decimal casts apply) BEFORE summing, so the
    * merge mirrors the QueryDef decimal-routing convention structurally
    * rather than depending on fixture values happening to be 2-decimal.
    * Object-serialized, not codegen'd — use real joins when SQL can
    * express the merge. */
  val j7CogroupReconcile = QueryDef(
    "j7_cogroup_reconcile",
    Some("""WITH o AS (
           |  SELECT o_custkey AS k, COUNT(*) AS n_orders,
           |    SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS spend
           |  FROM orders GROUP BY 1),
           |e AS (
           |  SELECT user_id AS k, COUNT(*) AS n_events,
           |    SUM(CAST(value AS DECIMAL(18,2))) AS val
           |  FROM events GROUP BY 1)
           |SELECT COALESCE(o.k, e.k) AS k,
           |  COALESCE(o.n_orders, 0) AS n_orders,
           |  CAST(COALESCE(o.spend, 0) AS DOUBLE) AS total_spend,
           |  COALESCE(e.n_events, 0) AS n_events,
           |  CAST(COALESCE(e.val, 0) AS DOUBLE) AS total_value
           |FROM o FULL OUTER JOIN e ON o.k = e.k
           |ORDER BY k""".stripMargin),
    (spark, dir) => {
      import spark.implicits._
      val orders = Tables.table(spark, dir, "orders")
        .select(col("o_custkey"), col("o_totalprice"))
        .as[(Long, Double)].groupByKey(_._1)
      val events = Tables.events(spark, dir)
        .select(col("user_id"), col("value"))
        .as[(Long, Double)].groupByKey(_._1)
      def dec(vs: Iterator[(Long, Double)]): (Long, java.math.BigDecimal) = {
        var n = 0L
        var s = java.math.BigDecimal.ZERO
        vs.foreach { v =>
          n += 1
          s = s.add(java.math.BigDecimal.valueOf(v._2)
            .setScale(2, java.math.RoundingMode.HALF_UP))
        }
        (n, s)
      }
      orders.cogroup(events) { (k, os, es) =>
        val (no, so) = dec(os)
        val (ne, se) = dec(es)
        Iterator((k, no, so.doubleValue, ne, se.doubleValue))
      }.toDF("k", "n_orders", "total_spend", "n_events", "total_value")
        .orderBy("k")
    })

  /** Correlated LATERAL derived table with ORDER BY + LIMIT — per-key
    * top-N expressed the relational way (`FROM nation, LATERAL
    * (... WHERE correlated ORDER BY ... LIMIT 3)`). Catalyst
    * DECORRELATES the lateral into a ranked window over supplier
    * partitioned by nationkey — one shuffle of the supplier table,
    * never a per-nation rescan — which is exactly the plan a
    * hand-written window top-N would get; the query proves the SQL
    * surface compiles to the scale-safe shape. Ties broken on s_name
    * so both engines agree exactly. */
  val j8LateralTopn = QueryDef(
    "j8_lateral_topn",
    Some("""SELECT n.n_name, l.s_name, l.bal
           |FROM nation n, LATERAL (
           |  SELECT s_name, CAST(CAST(s_acctbal AS DECIMAL(18,2)) AS DOUBLE) AS bal
           |  FROM supplier s
           |  WHERE s.s_nationkey = n.n_nationkey
           |  ORDER BY CAST(s_acctbal AS DECIMAL(18,2)) DESC, s_name
           |  LIMIT 3) l
           |ORDER BY n_name, bal DESC, s_name""".stripMargin),
    (spark, dir) => {
      Tables.table(spark, dir, "nation").createOrReplaceTempView("v_nation")
      Tables.table(spark, dir, "supplier").createOrReplaceTempView("v_supplier")
      spark.sql(
        """SELECT n.n_name, l.s_name, l.bal
          |FROM v_nation n, LATERAL (
          |  SELECT s_name, CAST(CAST(s_acctbal AS DECIMAL(18,2)) AS DOUBLE) AS bal
          |  FROM v_supplier s
          |  WHERE s.s_nationkey = n.n_nationkey
          |  ORDER BY CAST(s_acctbal AS DECIMAL(18,2)) DESC, s_name
          |  LIMIT 3) l
          |ORDER BY n_name, bal DESC, s_name""".stripMargin)
    })

  val defs: Seq[QueryDef] = Seq(
    j1IntervalJoin, j2IntervalJoinAsym, j3DimEnrich, j4DynamicRoute,
    j5OuterJoin, j5AntiJoin, j5SemiJoin, j6AsofJoin, j7CogroupReconcile,
    j8LateralTopn)
}

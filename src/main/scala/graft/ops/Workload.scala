package graft.ops

import graft.Materialize.Ops
import graft.QueryDef
import org.apache.spark.sql.functions._

/** Analytic-workload depth beyond the reference (TPC-H-shaped plans
  * adapted to the synthetic star schema): scan-heavy single-table
  * aggregation, join+top-k reporting, conditional ratios, scalar- and
  * anti-join subqueries, disjunctive multi-predicate joins. Each is a
  * distinct physical-plan shape the engine must get right at 100 TB —
  * filter pushdown, broadcast-vs-shuffle join choice, partial
  * aggregation, TakeOrdered top-k.
  *
  * Cross-engine exactness follows QueryDef.scala's conventions:
  * decimal-routed double sums, BIGINT-cast counts, string-formatted
  * dates, full ORDER BY on both sides.
  */
object Workload {

  /** The decimal-exact revenue term used by all revenue queries
    * (shared with the second workload tranche). */
  private[ops] val revSql =
    "CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE)"

  /** Q6-style forecast-revenue delta: single-table scan with three
    * pushable predicates and one global sum — the purest
    * pushdown+map-side-partial-agg plan (no shuffle beyond the final
    * single-row exchange). */
  val q6RevenueDelta = QueryDef(
    "q6_revenue_delta",
    Some("""SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
           |  COUNT(*) AS n_items
           |FROM lineitem
           |WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
           |  AND l_discount BETWEEN 0.05 AND 0.07
           |  AND l_quantity < 24""".stripMargin),
    (spark, dir) =>
      Tables.table(spark, dir, "lineitem")
        .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1997-01-01").cast("timestamp") &&
          col("l_discount").between(0.05, 0.07) &&
          col("l_quantity") < 24)
        .agg(
          expr("CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE)").as("revenue"),
          count(lit(1)).as("n_items")))

  /** Q10-style returned-item reporting: 4-table join, date-bounded,
    * revenue per customer, top 20 — the canonical "which customers
    * returned things" operational report. customer/orders/lineitem all
    * scale with SF (unhinted, AQE chooses); nation is a fixed dim and
    * stays broadcast. */
  val q10ReturnedItems = QueryDef(
    "q10_returned_items",
    Some(s"""SELECT c.c_custkey, c.c_name, n.n_name, $revSql AS revenue
            |FROM customer c
            |JOIN orders o ON c.c_custkey = o.o_custkey
            |JOIN lineitem l ON l.l_orderkey = o.o_orderkey
            |JOIN nation n ON c.c_nationkey = n.n_nationkey
            |WHERE l.l_returnflag = 'R'
            |  AND o.o_orderdate >= TIMESTAMP '1996-01-01' AND o.o_orderdate < TIMESTAMP '1996-07-01'
            |GROUP BY c.c_custkey, c.c_name, n.n_name
            |ORDER BY revenue DESC, c.c_custkey
            |LIMIT 20""".stripMargin),
    (spark, dir) => {
      val c = Tables.table(spark, dir, "customer")
      val o = Tables.table(spark, dir, "orders")
        .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
          col("o_orderdate") < lit("1996-07-01").cast("timestamp"))
      val l = Tables.table(spark, dir, "lineitem")
        .filter(col("l_returnflag") === "R")
      val n = Tables.table(spark, dir, "nation")
      c.join(o, c("c_custkey") === o("o_custkey"))
        .join(l, l("l_orderkey") === o("o_orderkey"))
        .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
        .groupBy(c("c_custkey"), c("c_name"), n("n_name"))
        .agg(expr(revSql).as("revenue"))
        .orderBy(col("revenue").desc, col("c_custkey"))
        .limit(20)
    })

  /** Q14-style promo effect: conditional revenue ratio over a
    * lineitem⋈part month window — the conditional-aggregation-inside-
    * a-join plan. Both numerator and denominator run over exact
    * decimal partials; the single division happens once, in double,
    * identically in both engines. */
  val q14PromoEffect = QueryDef(
    "q14_promo_effect",
    Some(s"""WITH s AS (
            |  SELECT
            |    CAST(SUM(CASE WHEN p.p_type = 'PROMO'
            |          THEN CAST(l.l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l.l_discount AS DECIMAL(18,2)))
            |          ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE) AS promo,
            |    CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l.l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS total,
            |    CAST(SUM(CASE WHEN p.p_type = 'PROMO'
            |          THEN CAST(l.l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l.l_discount AS DECIMAL(18,2)))
            |          ELSE CAST(0 AS DECIMAL(18,2)) END) * 10000 AS HUGEINT) AS p4,
            |    CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l.l_discount AS DECIMAL(18,2)))) * 10000 AS HUGEINT) AS t4
            |  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
            |  WHERE l.l_shipdate >= TIMESTAMP '1996-03-01' AND l.l_shipdate < TIMESTAMP '1996-04-01')
            |SELECT ${graft.QueryDef.roundedRatioSql("p4 * 100", "t4", 4)} AS promo_pct, promo, total FROM s""".stripMargin),
    (spark, dir) => {
      val l = Tables.table(spark, dir, "lineitem")
        .filter(col("l_shipdate") >= lit("1996-03-01").cast("timestamp") &&
          col("l_shipdate") < lit("1996-04-01").cast("timestamp"))
      val p = Tables.table(spark, dir, "part")
      val s = l.join(p, l("l_partkey") === p("p_partkey"))
        .agg(
          expr("""CAST(SUM(CASE WHEN p_type = 'PROMO'
                 |      THEN CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))
                 |      ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE)""".stripMargin).as("promo"),
          expr("CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE)").as("total"),
          expr("""CAST(SUM(CASE WHEN p_type = 'PROMO'
                 |      THEN CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))
                 |      ELSE CAST(0 AS DECIMAL(18,2)) END) * 10000 AS DECIMAL(38,0))""".stripMargin).as("_p4"),
          expr("CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) * 10000 AS DECIMAL(38,0))").as("_t4"))
      s.select(
        graft.QueryDef.roundedRatio(col("_p4") * 100, col("_t4"), 4).as("promo_pct"),
        col("promo"), col("total"))
    })

  /** Q15-style top supplier: quarterly revenue per supplier, filtered
    * to the maximum by an exact-decimal scalar subquery (the equality
    * runs on the DECIMAL sum, never the double projection, so ties are
    * engine-independent). */
  val q15TopSupplier = QueryDef(
    "q15_top_supplier",
    Some("""WITH rev AS (
           |  SELECT l_suppkey,
           |    SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS total_rev
           |  FROM lineitem
           |  WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1996-04-01'
           |  GROUP BY l_suppkey)
           |SELECT s.s_suppkey, s.s_name, CAST(r.total_rev AS DOUBLE) AS total_rev
           |FROM supplier s JOIN rev r ON s.s_suppkey = r.l_suppkey
           |WHERE r.total_rev = (SELECT MAX(total_rev) FROM rev)
           |ORDER BY s.s_suppkey""".stripMargin),
    (spark, dir) => {
      // Catalyst inlines a CTE referenced twice, which would run the
      // heavy lineitem aggregation once for the join input and again
      // for the scalar MAX — materialize `rev` once (it is
      // supplier-cardinality, tiny next to lineitem) and derive both
      // from it. DuckDB materializes the CTE once on its own.
      val rev = Tables.table(spark, dir, "lineitem")
        .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1996-04-01").cast("timestamp"))
        .groupBy("l_suppkey")
        .agg(expr("SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2))))").as("total_rev"))
        .materialized
      val mx = rev.agg(max(col("total_rev")).as("mx"))
      val s = Tables.table(spark, dir, "supplier")
      s.join(rev, s("s_suppkey") === rev("l_suppkey"))
        .crossJoin(broadcast(mx))
        // decimal-exact equality on the DECIMAL sums, never the
        // double projection, so ties are engine-independent
        .filter(col("total_rev") === col("mx"))
        .select(col("s_suppkey"), col("s_name"),
          col("total_rev").cast("double").as("total_rev"))
        .orderBy("s_suppkey")
    })

  /** Q18-style large-volume customers: HAVING over a lineitem
    * aggregation, then joined back to orders+customer — the
    * aggregate-then-join plan where the heavy groupBy runs FIRST and
    * the join fans in, not out (at 100 TB the HAVING prunes before any
    * wide row is built). */
  val q18LargeVolume = QueryDef(
    "q18_large_volume",
    Some("""SELECT c.c_custkey, o.o_orderkey,
           |  strftime(o.o_orderdate, '%Y-%m-%d') AS orderdate,
           |  CAST(big.sum_qty AS DOUBLE) AS sum_qty
           |FROM (SELECT l_orderkey, SUM(CAST(l_quantity AS DECIMAL(18,2))) AS sum_qty
           |      FROM lineitem GROUP BY l_orderkey
           |      HAVING SUM(CAST(l_quantity AS DECIMAL(18,2))) > 300) big
           |JOIN orders o ON o.o_orderkey = big.l_orderkey
           |JOIN customer c ON c.c_custkey = o.o_custkey
           |ORDER BY sum_qty DESC, o.o_orderkey""".stripMargin),
    (spark, dir) => {
      val big = Tables.table(spark, dir, "lineitem")
        .groupBy("l_orderkey")
        .agg(sum(col("l_quantity").cast("decimal(18,2)")).as("sum_qty"))
        .filter(col("sum_qty") > 300)
      val o = Tables.table(spark, dir, "orders")
      val c = Tables.table(spark, dir, "customer")
      big.join(o, o("o_orderkey") === big("l_orderkey"))
        .join(c, c("c_custkey") === o("o_custkey"))
        .select(
          c("c_custkey"), o("o_orderkey"),
          date_format(o("o_orderdate"), "yyyy-MM-dd").as("orderdate"),
          col("sum_qty").cast("double").as("sum_qty"))
        .orderBy(col("sum_qty").desc, col("o_orderkey"))
    })

  /** Q19-style disjunctive predicates: three OR'd brand/size/quantity
    * bands over lineitem⋈part. The join key is shared across all
    * branches so Catalyst keeps ONE join and evaluates the disjunction
    * as a post-join filter (vs three unioned joins — the plan
    * difference that matters at scale). */
  val q19DisjunctiveBands = QueryDef(
    "q19_disjunctive_bands",
    Some(s"""SELECT $revSql AS revenue, COUNT(*) AS n_items
            |FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
            |WHERE (p.p_brand = 'Brand#12' AND p.p_size BETWEEN 1 AND 5  AND l.l_quantity BETWEEN 1 AND 11)
            |   OR (p.p_brand = 'Brand#23' AND p.p_size BETWEEN 1 AND 10 AND l.l_quantity BETWEEN 10 AND 20)
            |   OR (p.p_brand = 'Brand#34' AND p.p_size BETWEEN 1 AND 15 AND l.l_quantity BETWEEN 20 AND 30)""".stripMargin),
    (spark, dir) => {
      val l = Tables.table(spark, dir, "lineitem")
      val p = Tables.table(spark, dir, "part")
      val band = (brand: String, szLo: Int, szHi: Int, qLo: Int, qHi: Int) =>
        col("p_brand") === brand && col("p_size").between(szLo, szHi) &&
          col("l_quantity").between(qLo, qHi)
      l.join(p, l("l_partkey") === p("p_partkey"))
        .filter(band("Brand#12", 1, 5, 1, 11) ||
          band("Brand#23", 1, 10, 10, 20) ||
          band("Brand#34", 1, 15, 20, 30))
        .agg(expr(revSql).as("revenue"), count(lit(1)).as("n_items"))
    })

  /** Q22-style lapsed high-value customers: above-average balance
    * (scalar subquery) with no recent orders (anti join on a filtered
    * stream) — every customer has SOME order in this data, so the
    * anti-join is against the recent window, which keeps it selective
    * rather than vacuous. */
  val q22LapsedCustomers = QueryDef(
    "q22_lapsed_customers",
    Some("""WITH ab AS (
           |  SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_bal
           |  FROM customer WHERE c_acctbal > 0)
           |SELECT c.c_mktsegment,
           |  COUNT(*) AS n_cust,
           |  CAST(SUM(CAST(c.c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_bal
           |FROM customer c, ab
           |WHERE c.c_acctbal > ab.avg_bal
           |  AND NOT EXISTS (
           |    SELECT 1 FROM orders o
           |    WHERE o.o_custkey = c.c_custkey
           |      AND o.o_orderdate >= TIMESTAMP '1999-01-01')
           |GROUP BY c.c_mktsegment
           |ORDER BY c.c_mktsegment""".stripMargin),
    (spark, dir) => {
      Tables.table(spark, dir, "customer").createOrReplaceTempView("v_customer")
      Tables.table(spark, dir, "orders").createOrReplaceTempView("v_orders")
      spark.sql(
        """WITH ab AS (
          |  SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_bal
          |  FROM v_customer WHERE c_acctbal > 0)
          |SELECT c.c_mktsegment,
          |  COUNT(*) AS n_cust,
          |  CAST(SUM(CAST(c.c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_bal
          |FROM v_customer c, ab
          |WHERE c.c_acctbal > ab.avg_bal
          |  AND NOT EXISTS (
          |    SELECT 1 FROM v_orders o
          |    WHERE o.o_custkey = c.c_custkey
          |      AND o.o_orderdate >= TIMESTAMP '1999-01-01')
          |GROUP BY c.c_mktsegment
          |ORDER BY c.c_mktsegment""".stripMargin)
    })

  val defs: Seq[QueryDef] = Seq(
    q6RevenueDelta, q10ReturnedItems, q14PromoEffect, q15TopSupplier,
    q18LargeVolume, q19DisjunctiveBands, q22LapsedCustomers)
}

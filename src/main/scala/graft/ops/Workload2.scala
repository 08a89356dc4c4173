package graft.ops

import graft.QueryDef
import org.apache.spark.sql.functions._

/** Second tranche of TPC-H-shaped workload plans (Q7/Q8/Q9/Q12/Q13/
  * Q16/Q17/Q21 analogs adapted to the synthetic star schema — there is
  * no partsupp table and lineitem carries no commit/receipt dates, so
  * Q16's supplier relation per part comes from lineitem and Q12/Q21
  * replace the receipt-lateness predicate with an orderdate→shipdate
  * delay; Q2/Q11/Q20 live in [[Workload3]] on a lineitem-derived
  * partsupp).
  * Each exercises a distinct physical-plan shape the engine must get
  * right at 100 TB:
  *   - q7: 6-way join with two roles of the same dim (supplier nation
  *     vs customer nation) — dim filters pushed before the fact join;
  *   - q8: conditional market-share ratio inside a region-filtered
  *     7-way join;
  *   - q9: arithmetic-heavy profit aggregation over a LIKE-filtered
  *     part join;
  *   - q12: derived-column banding with conditional counts (the
  *     CASE-heavy single-shuffle shape);
  *   - q13: outer join with an ON-clause filter feeding a two-level
  *     aggregation (groupBy of a groupBy);
  *   - q17: self-aggregation join — lineitem joined to its own per-key
  *     aggregate, the "compare each row to its group average" shape,
  *     with the threshold multiplied out so the comparison stays
  *     decimal-exact (no division, no float ties);
  *   - q21: correlated EXISTS + NOT EXISTS over the same fact table,
  *     which Catalyst rewrites to semi/anti joins (three passes over
  *     lineitem at order granularity).
  *
  * Cross-engine exactness follows QueryDef.scala's conventions.
  */
object Workload2 {

  private val revSql = Workload.revSql

  /** Q7-style volume shipping between nation sets: revenue per
    * (supplier nation, customer nation, ship year). The nation filters
    * are applied to the two dim copies BEFORE the fact joins, so the
    * broadcast hash joins also act as the row filter (supplier-set
    * semijoin effect) — at 100 TB the 6-way join only shuffles rows
    * that survive both nation filters. Nation sets chosen to be
    * non-empty at every SF (sf0.001 has only 10 suppliers). */
  val q7NationVolume = QueryDef(
    "q7_nation_volume",
    Some("""SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
           |  strftime(l.l_shipdate,'%Y') AS l_year,
           |  CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))*(1-CAST(l.l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
           |FROM lineitem l
           |JOIN supplier s ON s.s_suppkey = l.l_suppkey
           |JOIN orders o ON o.o_orderkey = l.l_orderkey
           |JOIN customer c ON c.c_custkey = o.o_custkey
           |JOIN nation sn ON sn.n_nationkey = s.s_nationkey
           |JOIN nation cn ON cn.n_nationkey = c.c_nationkey
           |WHERE sn.n_name IN ('NATION_3','NATION_8')
           |  AND cn.n_name IN ('NATION_1','NATION_2')
           |GROUP BY 1, 2, 3
           |ORDER BY 1, 2, 3""".stripMargin),
    (spark, dir) => {
      val l = Tables.table(spark, dir, "lineitem")
      val s = Tables.table(spark, dir, "supplier")
      val o = Tables.table(spark, dir, "orders")
      val c = Tables.table(spark, dir, "customer")
      // two filtered copies of the fixed-size nation dim, one per role
      val sn = Tables.table(spark, dir, "nation")
        .filter(col("n_name").isin("NATION_3", "NATION_8"))
        .select(col("n_nationkey").as("sn_key"), col("n_name").as("supp_nation"))
      val cn = Tables.table(spark, dir, "nation")
        .filter(col("n_name").isin("NATION_1", "NATION_2"))
        .select(col("n_nationkey").as("cn_key"), col("n_name").as("cust_nation"))
      l.join(s, s("s_suppkey") === l("l_suppkey"))
        .join(broadcast(sn), col("sn_key") === s("s_nationkey"))
        .join(o, o("o_orderkey") === l("l_orderkey"))
        .join(c, c("c_custkey") === o("o_custkey"))
        .join(broadcast(cn), col("cn_key") === c("c_nationkey"))
        .groupBy(col("supp_nation"), col("cust_nation"),
          date_format(l("l_shipdate"), "yyyy").as("l_year"))
        .agg(expr(revSql).as("revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    })

  /** Q8-style market share: one supplier nation's fraction of a
    * region's PROMO-part order volume per year. Numerator and
    * denominator are both exact decimal sums computed in ONE pass
    * (conditional aggregation, not two joins); the single double
    * division happens once per year row. */
  val q8MarketShare = QueryDef(
    "q8_market_share",
    Some(s"""WITH base AS (
           |  SELECT strftime(o.o_orderdate,'%Y') AS o_year,
           |    CAST(l.l_extendedprice AS DECIMAL(18,2))*(1-CAST(l.l_discount AS DECIMAL(18,2))) AS vol,
           |    sn.n_name AS supp_nation
           |  FROM lineitem l
           |  JOIN part p ON p.p_partkey = l.l_partkey AND p.p_type = 'PROMO'
           |  JOIN supplier s ON s.s_suppkey = l.l_suppkey
           |  JOIN orders o ON o.o_orderkey = l.l_orderkey
           |  JOIN customer c ON c.c_custkey = o.o_custkey
           |  JOIN nation cn ON cn.n_nationkey = c.c_nationkey
           |  JOIN region r ON r.r_regionkey = cn.n_regionkey AND r.r_name = 'EUROPE'
           |  JOIN nation sn ON sn.n_nationkey = s.s_nationkey)
           |SELECT o_year,
           |  ${graft.QueryDef.roundedRatioSql(
                "CAST(SUM(CASE WHEN supp_nation='NATION_3' THEN vol ELSE CAST(0 AS DECIMAL(18,2)) END) * 10000 AS HUGEINT) * 100",
                "CAST(SUM(vol) * 10000 AS HUGEINT)", 4)} AS mkt_share_pct,
           |  CAST(SUM(vol) AS DOUBLE) AS total_vol
           |FROM base GROUP BY 1 ORDER BY 1""".stripMargin),
    (spark, dir) => {
      val l = Tables.table(spark, dir, "lineitem")
      // part scales with SF: the PROMO filter is pushed to the scan but
      // the join stays unhinted so AQE picks broadcast only while the
      // filtered side is genuinely small (same treatment as q3/q5)
      val p = Tables.table(spark, dir, "part").filter(col("p_type") === "PROMO")
      val s = Tables.table(spark, dir, "supplier")
      val o = Tables.table(spark, dir, "orders")
      val c = Tables.table(spark, dir, "customer")
      val cn = Tables.table(spark, dir, "nation")
        .select(col("n_nationkey").as("cn_key"), col("n_regionkey").as("cn_region"))
      val r = Tables.table(spark, dir, "region").filter(col("r_name") === "EUROPE")
      val sn = Tables.table(spark, dir, "nation")
        .select(col("n_nationkey").as("sn_key"), col("n_name").as("supp_nation"))
      val base = l
        .join(p, p("p_partkey") === l("l_partkey"))
        .join(s, s("s_suppkey") === l("l_suppkey"))
        .join(o, o("o_orderkey") === l("l_orderkey"))
        .join(c, c("c_custkey") === o("o_custkey"))
        .join(broadcast(cn), col("cn_key") === c("c_nationkey"))
        .join(broadcast(r), r("r_regionkey") === col("cn_region"))
        .join(broadcast(sn), col("sn_key") === s("s_nationkey"))
        .select(
          date_format(o("o_orderdate"), "yyyy").as("o_year"),
          expr("CAST(l_extendedprice AS DECIMAL(18,2))*(1-CAST(l_discount AS DECIMAL(18,2)))").as("vol"),
          col("supp_nation"))
      base.groupBy("o_year")
        .agg(
          expr("CAST(SUM(CASE WHEN supp_nation='NATION_3' THEN vol ELSE CAST(0 AS DECIMAL(18,2)) END) * 10000 AS DECIMAL(38,0))").as("_n4"),
          expr("CAST(SUM(vol) * 10000 AS DECIMAL(38,0))").as("_d4"),
          expr("CAST(SUM(vol) AS DOUBLE)").as("total_vol"))
        .select(col("o_year"),
          graft.QueryDef.roundedRatio(col("_n4") * 100, col("_d4"), 4).as("mkt_share_pct"),
          col("total_vol"))
        .orderBy("o_year")
    })

  /** Q9-style product-type profit by supplier nation and year. The
    * schema has no partsupp/supplycost, so cost is modeled as 10% of
    * retail price per unit — kept decimal-exact by multiplying with a
    * DECIMAL(2,1) literal (0.1 is exactly representable at scale 1, so
    * both engines compute identical products; no float cost term). */
  val q9ProductProfit = QueryDef(
    "q9_product_profit",
    Some("""SELECT sn.n_name AS nation, strftime(o.o_orderdate,'%Y') AS o_year,
           |  CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))*(1-CAST(l.l_discount AS DECIMAL(18,2)))
           |    - CAST(p.p_retailprice AS DECIMAL(18,2))*CAST(l.l_quantity AS DECIMAL(18,2))*CAST(0.1 AS DECIMAL(2,1))) AS DOUBLE) AS profit
           |FROM lineitem l
           |JOIN part p ON p.p_partkey = l.l_partkey AND p.p_name LIKE '%red%'
           |JOIN supplier s ON s.s_suppkey = l.l_suppkey
           |JOIN orders o ON o.o_orderkey = l.l_orderkey
           |JOIN nation sn ON sn.n_nationkey = s.s_nationkey
           |GROUP BY 1, 2
           |ORDER BY 1, 2""".stripMargin),
    (spark, dir) => {
      val l = Tables.table(spark, dir, "lineitem")
      val p = Tables.table(spark, dir, "part").filter(col("p_name").like("%red%"))
      val s = Tables.table(spark, dir, "supplier")
      val o = Tables.table(spark, dir, "orders")
      val sn = Tables.table(spark, dir, "nation")
      l.join(p, p("p_partkey") === l("l_partkey"))
        .join(s, s("s_suppkey") === l("l_suppkey"))
        .join(o, o("o_orderkey") === l("l_orderkey"))
        .join(broadcast(sn), sn("n_nationkey") === s("s_nationkey"))
        .groupBy(sn("n_name").as("nation"),
          date_format(o("o_orderdate"), "yyyy").as("o_year"))
        .agg(expr(
          """CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))*(1-CAST(l_discount AS DECIMAL(18,2)))
            |  - CAST(p_retailprice AS DECIMAL(18,2))*CAST(l_quantity AS DECIMAL(18,2))*CAST(0.1 AS DECIMAL(2,1))) AS DOUBLE)""".stripMargin).as("profit"))
        .orderBy("nation", "o_year")
    })

  /** Q12-style delay banding: order→ship delay in whole days (explicit
    * floor(epoch/86400) on BOTH sides — Spark's integer `div` truncates
    * toward zero while DuckDB's `//` floors, which diverges on
    * pre-1970 timestamps, so neither engine's native integer division
    * is used; the double division is exact below 2^53 seconds. The
    * synthetic data ships some lines BEFORE the order date, hence the
    * 'early' band) with conditional high/low-priority line counts per
    * band. One join, one shuffle, CASE evaluation entirely map-side. */
  val q12ShipDelayBands = QueryDef(
    "q12_ship_delay_bands",
    Some("""WITH d AS (
           |  SELECT (CAST(floor(epoch(l.l_shipdate)/86400.0) AS BIGINT)
           |          - CAST(floor(epoch(o.o_orderdate)/86400.0) AS BIGINT)) AS dd,
           |    o.o_orderpriority AS prio
           |  FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey)
           |SELECT CASE WHEN dd < 0 THEN 'early' WHEN dd < 30 THEN 'fast'
           |            WHEN dd < 90 THEN 'normal' ELSE 'slow' END AS band,
           |  CAST(SUM(CASE WHEN prio IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           |  CAST(SUM(CASE WHEN prio IN ('1-URGENT','2-HIGH') THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
           |FROM d GROUP BY 1 ORDER BY 1""".stripMargin),
    (spark, dir) => {
      val l = Tables.table(spark, dir, "lineitem")
      val o = Tables.table(spark, dir, "orders")
      l.join(o, o("o_orderkey") === l("l_orderkey"))
        .select(
          // parquet timestamps surface as TIMESTAMP_NTZ; the session is
          // pinned to UTC so the cast to TIMESTAMP is an identity
          expr("""CAST(floor(unix_seconds(CAST(l_shipdate AS TIMESTAMP)) / 86400.0) AS BIGINT)
                 | - CAST(floor(unix_seconds(CAST(o_orderdate AS TIMESTAMP)) / 86400.0) AS BIGINT)""".stripMargin).as("dd"),
          o("o_orderpriority").as("prio"))
        .select(
          when(col("dd") < 0, "early").when(col("dd") < 30, "fast")
            .when(col("dd") < 90, "normal").otherwise("slow").as("band"),
          col("prio"))
        .groupBy("band")
        .agg(
          sum(when(col("prio").isin("1-URGENT", "2-HIGH"), 1L).otherwise(0L)).as("high_line_count"),
          sum(when(col("prio").isin("1-URGENT", "2-HIGH"), 0L).otherwise(1L)).as("low_line_count"))
        .orderBy("band")
    })

  /** Q13-style customer order-count distribution: LEFT join with the
    * filter in the ON clause (customers with zero qualifying orders
    * must survive with count 0), then a second aggregation over the
    * first's output — the histogram-of-group-sizes shape. The inner
    * aggregate is custkey-partitioned (big shuffle); the outer one is
    * tiny (distinct counts ≤ max orders per customer). */
  val q13CustOrderDist = QueryDef(
    "q13_cust_order_dist",
    Some("""WITH c_orders AS (
           |  SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count
           |  FROM customer c
           |  LEFT JOIN orders o ON c.c_custkey = o.o_custkey AND o.o_orderpriority <> '1-URGENT'
           |  GROUP BY c.c_custkey)
           |SELECT c_count, COUNT(*) AS custdist
           |FROM c_orders GROUP BY c_count
           |ORDER BY custdist DESC, c_count DESC""".stripMargin),
    (spark, dir) => {
      val c = Tables.table(spark, dir, "customer")
      val o = Tables.table(spark, dir, "orders")
        .filter(col("o_orderpriority") =!= "1-URGENT")
      c.join(o, c("c_custkey") === o("o_custkey"), "left")
        .groupBy(c("c_custkey"))
        .agg(count(o("o_orderkey")).as("c_count"))
        .groupBy("c_count")
        .agg(count(lit(1)).as("custdist"))
        .orderBy(col("custdist").desc, col("c_count").desc)
    })

  /** Q17-style small-quantity revenue: lineitems under 20% of their
    * part's average quantity, for one brand. The threshold comparison
    * is multiplied out (5·qty·cnt < Σqty) so it runs entirely on exact
    * decimals/integers — an avg-based float comparison could tie-break
    * differently across engines. Plan shape: the per-part aggregate is
    * built once (shuffle on partkey) and joined back to the fact —
    * never a correlated per-row subquery. */
  val q17SmallQtyRevenue = QueryDef(
    "q17_small_qty_revenue",
    Some("""WITH pq AS (
           |  SELECT l_partkey, SUM(CAST(l_quantity AS DECIMAL(18,2))) AS qty_sum, COUNT(*) AS cnt
           |  FROM lineitem GROUP BY l_partkey)
           |SELECT CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)/7.0 AS avg_yearly,
           |  COUNT(*) AS n_items
           |FROM lineitem l
           |JOIN part p ON p.p_partkey = l.l_partkey AND p.p_brand = 'Brand#23'
           |JOIN pq ON pq.l_partkey = l.l_partkey
           |WHERE CAST(l.l_quantity AS DECIMAL(18,2))*5*pq.cnt < pq.qty_sum""".stripMargin),
    (spark, dir) => {
      val l = Tables.table(spark, dir, "lineitem")
      val p = Tables.table(spark, dir, "part").filter(col("p_brand") === "Brand#23")
      // the brand restriction commutes BELOW the per-part aggregate:
      // pq groups on l_partkey and is consumed only through the inner
      // join with the brand-filtered fact rows, so semi-joining the
      // aggregate's input against the brand's partkeys first keeps
      // every surviving part's (qty_sum, cnt) identical while the
      // corpus-sized shuffle carries only that brand's rows (~1/|brands|).
      // The explicit broadcast hint is SF-bounded (ADVICE r15): one
      // brand's partkeys ≈ SF×8k longs, which approaches the 512M-row
      // broadcast cap only near SF ~64k (i.e. the ~100 TB corner) —
      // there, drop the hint and let AQE pick from measured sizes
      // (a Bloom pre-filter per guide §3.2 is the replacement shape).
      // At bench/cluster SFs the hint only removes a wrong
      // estimate-driven SMJ. Same bound applies to the q2 EUROPE
      // supplier and q20 red-part hints (both strictly smaller sides).
      val pq = Tables.table(spark, dir, "lineitem")
        .join(broadcast(p.select(col("p_partkey").as("pq_sel"))),
          col("pq_sel") === col("l_partkey"), "left_semi")
        .groupBy(col("l_partkey").as("pq_partkey"))
        .agg(
          sum(col("l_quantity").cast("decimal(18,2)")).as("qty_sum"),
          count(lit(1)).as("cnt"))
      l.join(p, p("p_partkey") === l("l_partkey"))
        .join(pq, col("pq_partkey") === l("l_partkey"))
        .filter(expr("CAST(l_quantity AS DECIMAL(18,2))*5*cnt < qty_sum"))
        .agg(
          expr("CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)/7.0").as("avg_yearly"),
          count(lit(1)).as("n_items"))
    })

  /** Q21-style waiting-supplier report: lineitems shipped >60 days
    * after the order date on finished multi-supplier orders where NO
    * other supplier on the order was also late — correlated EXISTS +
    * NOT EXISTS that Catalyst rewrites to one semi and one anti join
    * over lineitem at order granularity (expressed via spark.sql so
    * the subquery-to-join rewrite itself is exercised). */
  val q21WaitingSupplier = QueryDef(
    "q21_waiting_supplier",
    Some("""SELECT s.s_name, COUNT(*) AS numwait
           |FROM supplier s
           |JOIN lineitem l1 ON s.s_suppkey = l1.l_suppkey
           |JOIN orders o ON o.o_orderkey = l1.l_orderkey
           |WHERE o.o_orderstatus = 'F'
           |  AND l1.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
           |  AND EXISTS (SELECT 1 FROM lineitem l2
           |              WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey)
           |  AND NOT EXISTS (SELECT 1 FROM lineitem l3
           |                  WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
           |                    AND l3.l_shipdate > o.o_orderdate + INTERVAL 60 DAY)
           |GROUP BY s.s_name
           |ORDER BY numwait DESC, s.s_name
           |LIMIT 20""".stripMargin),
    (spark, dir) => {
      Tables.table(spark, dir, "supplier").createOrReplaceTempView("v_supplier")
      Tables.table(spark, dir, "lineitem").createOrReplaceTempView("v_lineitem")
      Tables.table(spark, dir, "orders").createOrReplaceTempView("v_orders")
      spark.sql(
        """SELECT s.s_name, COUNT(*) AS numwait
          |FROM v_supplier s
          |JOIN v_lineitem l1 ON s.s_suppkey = l1.l_suppkey
          |JOIN v_orders o ON o.o_orderkey = l1.l_orderkey
          |WHERE o.o_orderstatus = 'F'
          |  AND l1.l_shipdate > o.o_orderdate + INTERVAL '60' DAY
          |  AND EXISTS (SELECT 1 FROM v_lineitem l2
          |              WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey)
          |  AND NOT EXISTS (SELECT 1 FROM v_lineitem l3
          |                  WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
          |                    AND l3.l_shipdate > o.o_orderdate + INTERVAL '60' DAY)
          |GROUP BY s.s_name
          |ORDER BY numwait DESC, s.s_name
          |LIMIT 20""".stripMargin)
    })

  /** Q16-style supplier diversity per part group: multi-column groupBy
    * with COUNT(DISTINCT) — the distinct-aggregate plan shape (partial
    * distinct on (group, suppkey) then final count), which at 100 TB
    * must keep the distinct expansion map-side rather than shipping
    * raw rows. No partsupp table, so the supplier relation per part
    * comes from lineitem. */
  val q16PartsSuppliers = QueryDef(
    "q16_parts_suppliers",
    Some("""SELECT p.p_brand, p.p_type, p.p_size, COUNT(DISTINCT l.l_suppkey) AS supplier_cnt
           |FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
           |WHERE p.p_brand <> 'Brand#45' AND p.p_type <> 'PROMO'
           |  AND p.p_size IN (1, 4, 9, 14, 19, 23, 36, 45)
           |GROUP BY 1, 2, 3
           |ORDER BY supplier_cnt DESC, p.p_brand, p.p_type, p.p_size""".stripMargin),
    (spark, dir) => {
      val l = Tables.table(spark, dir, "lineitem")
      val p = Tables.table(spark, dir, "part")
        .filter(col("p_brand") =!= "Brand#45" && col("p_type") =!= "PROMO" &&
          col("p_size").isin(1, 4, 9, 14, 19, 23, 36, 45))
      l.join(p, p("p_partkey") === l("l_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
        .orderBy(col("supplier_cnt").desc, col("p_brand"), col("p_type"), col("p_size"))
    })

  val defs: Seq[QueryDef] = Seq(
    q7NationVolume, q8MarketShare, q9ProductProfit, q12ShipDelayBands,
    q13CustOrderDist, q16PartsSuppliers, q17SmallQtyRevenue,
    q21WaitingSupplier)
}

package graft.ops

import graft.Materialize.Ops
import graft.QueryDef
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Third workload tranche: the TPC-H shapes that need a part-supplier
  * relation (Q2/Q11/Q20 analogs). The synthetic schema has no partsupp
  * table, so one is DERIVED deterministically from lineitem —
  * `ps_availqty` = total quantity ever shipped per (part, supplier),
  * `ps_supplycost` = the minimum extended price that pair ever sold at
  * (an exact decimal MIN, so both engines agree to the cent). The
  * derivation itself is the warehouse-idiomatic "build a dim from the
  * fact" pattern: one shuffle on the composite key, reusable by every
  * downstream query.
  *
  * Plan shapes these add (none covered elsewhere):
  *   - q2: EQUALITY-CORRELATED SCALAR SUBQUERY (min per outer part) —
  *     Catalyst must decorrelate it to an aggregate + join, never a
  *     per-row re-scan;
  *   - q11: HAVING against a GLOBAL scalar aggregate of the same
  *     derived relation (fraction-of-total), threshold multiplied out
  *     so the comparison stays decimal-exact;
  *   - q20: a two-level nested IN-subquery chain (suppliers ⊇ parts ⊇
  *     name filter) that must collapse to semi joins.
  *
  * Cross-engine exactness follows QueryDef.scala's conventions.
  */
object Workload3 {

  /** The shared derived-partsupp SQL (identical text in both engines —
    * plain ANSI). */
  private val psSql =
    """SELECT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS ps_availqty,
      |  MIN(CAST(l_extendedprice AS DECIMAL(18,2))) AS ps_supplycost
      |FROM lineitem GROUP BY 1, 2""".stripMargin

  /** The Spark-side mirror of [[psSql]] — ONE definition, shared by
    * q2/q11/q20, so the decimal casts cannot drift from the oracle in
    * just one query. Callers that drop `ps_supplycost` get the MIN
    * pruned out of the aggregate by Catalyst (ColumnPruning rewrites
    * Aggregate expression lists), so sharing costs nothing. */
  private def derivedPs(lineitem: DataFrame): DataFrame =
    lineitem.groupBy(
        col("l_partkey").as("ps_partkey"), col("l_suppkey").as("ps_suppkey"))
      .agg(
        sum(col("l_quantity").cast("decimal(18,2)")).cast("decimal(18,2)").as("ps_availqty"),
        min(col("l_extendedprice").cast("decimal(18,2)")).as("ps_supplycost"))

  /** Q2-style minimum-cost supplier: for each STANDARD small part, the
    * EUROPE supplier(s) selling it at the part's minimum European
    * supply cost. Expressed through spark.sql so the correlated scalar
    * subquery itself is exercised: Catalyst decorrelates it into a
    * per-part MIN aggregate joined back (one extra shuffle over the
    * derived ps — never a per-outer-row rescan). The nation/region
    * dims stay broadcast-size forever; ps scales with the fact table
    * and shuffles on its own keys. */
  val q2MinCostSupplier = QueryDef(
    "q2_min_cost_supplier",
    Some(s"""WITH ps AS ($psSql)
            |SELECT p.p_partkey, p.p_name, s.s_name, n.n_name,
            |  CAST(ps.ps_supplycost AS DOUBLE) AS supplycost
            |FROM ps
            |JOIN part p ON p.p_partkey = ps.ps_partkey
            |  AND p.p_type = 'STANDARD' AND p.p_size <= 15
            |JOIN supplier s ON s.s_suppkey = ps.ps_suppkey
            |JOIN nation n ON n.n_nationkey = s.s_nationkey
            |JOIN region r ON r.r_regionkey = n.n_regionkey AND r.r_name = 'EUROPE'
            |WHERE ps.ps_supplycost = (
            |  SELECT MIN(ps2.ps_supplycost) FROM ps ps2
            |  JOIN supplier s2 ON s2.s_suppkey = ps2.ps_suppkey
            |  JOIN nation n2 ON n2.n_nationkey = s2.s_nationkey
            |  JOIN region r2 ON r2.r_regionkey = n2.n_regionkey AND r2.r_name = 'EUROPE'
            |  WHERE ps2.ps_partkey = p.p_partkey)
            |ORDER BY supplycost, p.p_partkey, s.s_name, s.s_suppkey
            |LIMIT 100""".stripMargin),
    (spark, dir) => {
      // ps is referenced twice (outer + correlated ps2) and Spark
      // inlines CTEs — materialize it ONCE (Materialize) so the
      // lineitem scan + composite-key shuffle don't run twice; the
      // correlated scalar subquery still decorrelates over the
      // checkpointed relation, which is the shape the query exists
      // to prove. BOTH references restrict ps to EUROPE suppliers
      // (outer joins s⋈n⋈r, the subquery s2⋈n2⋈r2), and suppkey is a
      // ps group key, so the region restriction commutes below the
      // aggregation: the lineitem semi join keeps every surviving
      // pair's MIN identical while the corpus shuffle AND the
      // materialized relation shrink to the EUROPE share (~1/5). The
      // SQL's own region joins remain as written (now a no-op
      // re-verification), keeping the decorrelation shape intact.
      val sup = Tables.table(spark, dir, "supplier")
      val nat = Tables.table(spark, dir, "nation")
      val reg = Tables.table(spark, dir, "region")
        .filter(col("r_name") === "EUROPE")
      val eligible = sup
        .join(broadcast(nat), nat("n_nationkey") === sup("s_nationkey"))
        .join(broadcast(reg), reg("r_regionkey") === nat("n_regionkey"))
        .select(col("s_suppkey"))
      derivedPs(Tables.table(spark, dir, "lineitem")
          .join(broadcast(eligible),
            col("s_suppkey") === col("l_suppkey"), "left_semi"))
        .materialized.createOrReplaceTempView("v_ps")
      Tables.table(spark, dir, "part").createOrReplaceTempView("v_part")
      Tables.table(spark, dir, "supplier").createOrReplaceTempView("v_supplier")
      Tables.table(spark, dir, "nation").createOrReplaceTempView("v_nation")
      Tables.table(spark, dir, "region").createOrReplaceTempView("v_region")
      spark.sql(
        s"""WITH ps AS (SELECT * FROM v_ps)
           |SELECT p.p_partkey, p.p_name, s.s_name, n.n_name,
           |  CAST(ps.ps_supplycost AS DOUBLE) AS supplycost
           |FROM ps
           |JOIN v_part p ON p.p_partkey = ps.ps_partkey
           |  AND p.p_type = 'STANDARD' AND p.p_size <= 15
           |JOIN v_supplier s ON s.s_suppkey = ps.ps_suppkey
           |JOIN v_nation n ON n.n_nationkey = s.s_nationkey
           |JOIN v_region r ON r.r_regionkey = n.n_regionkey AND r.r_name = 'EUROPE'
           |WHERE ps.ps_supplycost = (
           |  SELECT MIN(ps2.ps_supplycost) FROM ps ps2
           |  JOIN v_supplier s2 ON s2.s_suppkey = ps2.ps_suppkey
           |  JOIN v_nation n2 ON n2.n_nationkey = s2.s_nationkey
           |  JOIN v_region r2 ON r2.r_regionkey = n2.n_regionkey AND r2.r_name = 'EUROPE'
           |  WHERE ps2.ps_partkey = p.p_partkey)
           |ORDER BY supplycost, p.p_partkey, s.s_name, s.s_suppkey
           |LIMIT 100""".stripMargin)
    })

  /** Q11-style important stock: per-part stock value held by two
    * nations' suppliers, kept only where the part exceeds TWICE the
    * average per-part value (TPC-H's fixed fraction is SF-dependent —
    * total/2000 passes ~40% of parts at sf0.01 and none at sf0.1; the
    * above-2×-average form selects the same "disproportionately
    * valuable" tail at every scale). The value relation is built ONCE
    * (Materialize — Spark inlines CTEs, and both the threshold
    * scalar and the filter read it), the global (total, count) rides
    * in as a broadcast single row, and the fraction test is multiplied
    * out (v·cnt > total·2 on exact decimals) so no engine ever
    * divides. Widths are the widest LOSSLESS forms (Spark keeps a
    * decimal multiply exact iff p1+p2+1 ≤ 38): DECIMAL(27,4)·
    * DECIMAL(10,0) → DECIMAL(38,4), i.e. ~1e23 of per-part stock value
    * × 1e10 parts — nine orders above SF 100k needs. Past that the
    * ANSI overflow error is the intended guard: fail loudly rather
    * than TRY_CAST-dropping the largest parts silently. At 100 TB: one
    * shuffle for ps, one for the per-part sum; the scalar total is a
    * tree-reduce to one row. */
  val q11ImportantStock = QueryDef(
    "q11_important_stock",
    Some(s"""WITH ps AS ($psSql),
            |v AS (
            |  SELECT ps.ps_partkey,
            |    SUM(ps.ps_supplycost * ps.ps_availqty) AS stock_val
            |  FROM ps
            |  JOIN supplier s ON s.s_suppkey = ps.ps_suppkey
            |  JOIN nation n ON n.n_nationkey = s.s_nationkey
            |  WHERE n.n_name IN ('NATION_3', 'NATION_8')
            |  GROUP BY ps.ps_partkey),
            |t AS (
            |  SELECT CAST(SUM(stock_val) AS DECIMAL(33,4)) AS total_val,
            |    COUNT(*) AS cnt FROM v)
            |SELECT ps_partkey, CAST(stock_val AS DOUBLE) AS stock_value
            |FROM v CROSS JOIN t
            |WHERE CAST(stock_val AS DECIMAL(27,4)) * CAST(cnt AS DECIMAL(10,0)) >
            |  total_val * 2
            |ORDER BY stock_value DESC, ps_partkey""".stripMargin),
    (spark, dir) => {
      val l = Tables.table(spark, dir, "lineitem")
      val s = Tables.table(spark, dir, "supplier")
      val n = Tables.table(spark, dir, "nation")
        .filter(col("n_name").isin("NATION_3", "NATION_8"))
      // the nation restriction commutes BELOW the ps aggregation:
      // suppkey IS a ps group key, so semi-joining lineitem against
      // the two nations' suppliers FIRST leaves every surviving
      // (part, supplier) pair's aggregates untouched while the
      // corpus-sized shuffle carries only qualifying rows (~2/25 of
      // suppliers) instead of all of lineitem. supplier is a primary
      // key, so semi ≡ the old inner join on the restriction.
      val eligible = s
        .join(broadcast(n), n("n_nationkey") === s("s_nationkey"))
        .select(col("s_suppkey"))
      val v = derivedPs(
          l.join(broadcast(eligible),
            col("s_suppkey") === col("l_suppkey"), "left_semi"))
        .groupBy("ps_partkey")
        .agg(expr("SUM(ps_supplycost * ps_availqty)").as("stock_val"))
        .materialized // read twice: total + filter (Spark inlines CTEs)
      val total = v.agg(
        expr("CAST(SUM(stock_val) AS DECIMAL(33,4))").as("total_val"),
        count(lit(1)).as("cnt"))
      v.crossJoin(broadcast(total))
        .filter(expr(
          "CAST(stock_val AS DECIMAL(27,4)) * CAST(cnt AS DECIMAL(10,0)) > total_val * 2"))
        .select(col("ps_partkey"), col("stock_val").cast("double").as("stock_value"))
        .orderBy(col("stock_value").desc, col("ps_partkey"))
    })

  /** Q20-style concentrated availability: EUROPE suppliers holding a
    * red-named part whose 1995 shipments exceed two thirds of that
    * pair's all-time quantity (3·q95 > 2·availqty, exact decimals —
    * a region filter and a 2/3 share keep the result non-degenerate
    * AND selective at every SF, where a nation pair selects nothing
    * from sf0.001's ten suppliers). Spark side: the oracle's two CTEs
    * (`ps` all-time qty, `shipped` 1995 qty) group on the SAME
    * (partkey, suppkey) key, so they collapse into ONE conditional
    * aggregation over a single red-part-presemi'd lineitem scan — the
    * all-time sum and a 1995-window conditional sum side by side in
    * one groupBy, no separate ps relation and no shipped⋈ps join; the
    * final supplier probe is a semi join against the tiny
    * qualifying-supplier set. */
  val q20ExcessAvailability = QueryDef(
    "q20_excess_availability",
    Some(s"""WITH ps AS ($psSql),
            |shipped AS (
            |  SELECT l_partkey, l_suppkey,
            |    SUM(CAST(l_quantity AS DECIMAL(18,2))) AS q95
            |  FROM lineitem
            |  WHERE l_shipdate >= TIMESTAMP '1995-01-01'
            |    AND l_shipdate < TIMESTAMP '1996-01-01'
            |  GROUP BY 1, 2)
            |SELECT s.s_name, n.n_name
            |FROM supplier s
            |JOIN nation n ON n.n_nationkey = s.s_nationkey
            |JOIN region r ON r.r_regionkey = n.n_regionkey AND r.r_name = 'EUROPE'
            |WHERE s.s_suppkey IN (
            |    SELECT sh.l_suppkey FROM shipped sh
            |    JOIN ps ON ps.ps_partkey = sh.l_partkey AND ps.ps_suppkey = sh.l_suppkey
            |    WHERE sh.l_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE '%red%')
            |      AND sh.q95 * 3 > ps.ps_availqty * 2)
            |ORDER BY s.s_name, n.n_name""".stripMargin),
    (spark, dir) => {
      val l = Tables.table(spark, dir, "lineitem")
      val redParts = Tables.table(spark, dir, "part")
        .filter(col("p_name").like("%red%")).select(col("p_partkey"))
      // ONE conditional aggregation computes both `ps` (all-time qty)
      // and `shipped` (1995 qty) — the two CTEs group on the SAME
      // (partkey, suppkey) key, so the oracle's shipped⋈ps join is a
      // per-group zip: two lineitem scans + two corpus shuffles
      // collapse to one scan + one shuffle. The red-part restriction
      // commutes below the aggregate because p_partkey IS a group key
      // (a broadcast semi join at the scan, so non-red rows never
      // reach the exchange). A pair absent from `shipped` (no 1995
      // rows) gets q95 = NULL here and the share predicate NULL-drops
      // it — the same rows the oracle's inner join drops.
      val qualifying = l
        .join(broadcast(redParts),
          col("p_partkey") === col("l_partkey"), "left_semi")
        .groupBy(col("l_partkey"), col("l_suppkey"))
        .agg(
          sum(col("l_quantity").cast("decimal(18,2)"))
            .cast("decimal(18,2)").as("ps_availqty"),
          sum(when(
            col("l_shipdate") >= lit("1995-01-01").cast("timestamp") &&
              col("l_shipdate") < lit("1996-01-01").cast("timestamp"),
            col("l_quantity").cast("decimal(18,2)"))).as("q95"))
        .filter(expr("q95 * 3 > ps_availqty * 2"))
        .select(col("l_suppkey")).distinct()
      val s = Tables.table(spark, dir, "supplier")
      val n = Tables.table(spark, dir, "nation")
      val r = Tables.table(spark, dir, "region").filter(col("r_name") === "EUROPE")
      s.join(broadcast(n), n("n_nationkey") === s("s_nationkey"))
        .join(broadcast(r), r("r_regionkey") === n("n_regionkey"))
        .join(qualifying, col("l_suppkey") === s("s_suppkey"), "left_semi")
        .select(col("s_name"), col("n_name"))
        .orderBy("s_name", "n_name")
    })

  val defs: Seq[QueryDef] = Seq(
    q2MinCostSupplier, q11ImportantStock, q20ExcessAvailability)
}

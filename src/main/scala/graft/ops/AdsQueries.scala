package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** ADS serving façade — the publisher's REST→SQL surface
  * (`gmall-publisher/src/main/java/com/atguigu/gmallpublisher/controller/SugarController.java:403-436`
  * routing into the four mapper interfaces) re-expressed as a registry
  * of parameterized DataFrame functions over the DWS stats relations.
  *
  * Each entry mirrors one mapper `@Select` 1:1 (same grouping, same
  * HAVING, same ordering, including quirks like the keyword query
  * ORDERING by the unweighted count while RETURNING the weighted one).
  * `date` is the reference's `toYYYYMMDD(stt)=#{date}` partition-day
  * filter (`yyyyMMdd` string here); `limit` is the row cap the REST
  * layer passes through.
  *
  * Serving queries run over already-aggregated DWS tables (thousands
  * of rows per day, not fact-table scale) — at 100 TB these relations
  * are date-partitioned parquet and the `stt` filter prunes to one
  * partition before any aggregation, which is the only scale property
  * that matters on this layer.
  *
  * Expected input columns (the DWS analogs produced by
  * a2/a3/a4/a6/pipeline_dws_e2e):
  *   - visitor_stats: stt TIMESTAMP, is_new STRING, uv_ct, pv_ct,
  *     sv_ct, uj_ct, dur_sum
  *   - product_stats: stt, tm_id, tm_name, category3_id,
  *     category3_name, spu_id, spu_name, order_amount, order_ct
  *   - province_stats: stt, province_id, province_name, order_amount
  *   - keyword_stats: stt, keyword, source, ct
  */
object AdsQueries {

  private def onDay(df: DataFrame, date: String) = {
    // SARGABLE day-range form of the mapper's toYYYYMMDD(stt)=#{date}:
    // a function over stt (date_format) would block partition pruning
    // and min/max skipping on a date-partitioned DWS table — the one
    // scale property this layer depends on. A half-open range on the
    // raw column gives parquet min/max skipping; when the relation
    // carries the `dt` PARTITION column (the statsMergePartitioned
    // layout), an equality on it is added too so the scan is partition
    // pruning, not data filtering — StreamingSpec asserts the
    // PartitionFilters on the served table.
    val day = to_date(lit(date), "yyyyMMdd")
    val ranged = df.filter(col("stt") >= day && col("stt") < date_add(day, 1))
    if (df.columns.contains("dt")) ranged.filter(col("dt") === day) else ranged
  }

  /** `KeywordStatsMapper.selectKeywordStats`: source-weighted keyword
    * score (SEARCH 10 / ORDER 3 / CART 2 / CLICK 1), ordered by the
    * RAW count like the reference. */
  def keywordStats(keyword_stats: DataFrame, date: String, limit: Int): DataFrame =
    onDay(keyword_stats, date)
      .groupBy("keyword")
      .agg(
        sum(col("ct") *
          when(col("source") === "SEARCH", 10)
            .when(col("source") === "ORDER", 3)
            .when(col("source") === "CART", 2)
            .when(col("source") === "CLICK", 1)
            .otherwise(0)).as("ct"),
        sum(col("ct")).as("raw_ct"))
      .orderBy(col("raw_ct").desc, col("keyword"))
      .select("keyword", "ct")
      .limit(limit)

  /** `ProductStatsMapper.getGMV`: one-row daily gross merchandise
    * value. */
  def gmv(product_stats: DataFrame, date: String): DataFrame =
    onDay(product_stats, date)
      .agg(sum(col("order_amount")).as("gmv"))

  private def productStatsBy(product_stats: DataFrame, date: String,
      limit: Int, keys: Seq[String], withCt: Boolean): DataFrame = {
    val base = onDay(product_stats, date)
      .groupBy(keys.map(col): _*)
    val agged =
      if (withCt) base.agg(sum(col("order_amount")).as("order_amount"),
        sum(col("order_ct")).as("order_ct"))
      else base.agg(sum(col("order_amount")).as("order_amount"))
    agged.filter(col("order_amount") > 0)
      .orderBy(col("order_amount").desc +: keys.map(col): _*)
      .limit(limit)
  }

  /** `ProductStatsMapper.getProductStatsByTrademark`. */
  def productStatsByTrademark(product_stats: DataFrame, date: String, limit: Int): DataFrame =
    productStatsBy(product_stats, date, limit, Seq("tm_id", "tm_name"), withCt = false)

  /** `ProductStatsMapper.getProductStatsByCategory3`. */
  def productStatsByCategory3(product_stats: DataFrame, date: String, limit: Int): DataFrame =
    productStatsBy(product_stats, date, limit, Seq("category3_id", "category3_name"), withCt = false)

  /** `ProductStatsMapper.getProductStatsBySPU` (adds order_ct). */
  def productStatsBySpu(product_stats: DataFrame, date: String, limit: Int): DataFrame =
    productStatsBy(product_stats, date, limit, Seq("spu_id", "spu_name"), withCt = true)

  /** `ProvinceStatsMapper.selectProvinceStats`: per-province daily
    * order amount (grouped by id+name like the reference). */
  def provinceStats(province_stats: DataFrame, date: String): DataFrame =
    onDay(province_stats, date)
      .groupBy("province_id", "province_name")
      .agg(sum(col("order_amount")).as("order_amount"))
      .orderBy("province_id")

  /** `VisitorStatsMapper.selectVisitorStatsByNewFlag`. */
  def visitorStatsByNewFlag(visitor_stats: DataFrame, date: String): DataFrame =
    onDay(visitor_stats, date)
      .groupBy("is_new")
      .agg(
        sum(col("uv_ct")).as("uv_ct"),
        sum(col("pv_ct")).as("pv_ct"),
        sum(col("sv_ct")).as("sv_ct"),
        sum(col("uj_ct")).as("uj_ct"),
        sum(col("dur_sum")).as("dur_sum"))
      .orderBy("is_new")

  /** `VisitorStatsMapper.selectVisitorStatsByHr`: hourly traffic with
    * the new-visitor share split out. */
  def visitorStatsByHr(visitor_stats: DataFrame, date: String): DataFrame =
    onDay(visitor_stats, date)
      .groupBy(hour(col("stt")).as("hr"))
      .agg(
        sum(when(col("is_new") === "1", col("uv_ct")).otherwise(0)).as("new_uv"),
        sum(col("uv_ct")).as("uv_ct"),
        sum(col("pv_ct")).as("pv_ct"),
        sum(col("uj_ct")).as("uj_ct"))
      .select("new_uv", "hr", "uv_ct", "pv_ct", "uj_ct")
      .orderBy("hr")

  // ---------------------------------------------------------------
  // Oracle-checked end-to-end forms: DWS stats derived from the fact
  // tables, then served through the façade functions above — the full
  // publisher path (stats build → REST query) under the driver's
  // correctness gate. Month-bucket stt keeps the date filters
  // SF-independent (a whole month of facts at every SF).
  // ---------------------------------------------------------------

  import graft.QueryDef

  /** orders×customer×nation → province_stats (nation = the province
    * analog of this schema), served by [[provinceStats]] for 1996-03. */
  val adsProvinceStats = QueryDef(
    "ads_province_stats",
    Some("""WITH ps AS (
           |  SELECT date_trunc('month', o.o_orderdate) AS stt,
           |    n.n_nationkey AS province_id, n.n_name AS province_name,
           |    CAST(o.o_totalprice AS DECIMAL(18,2)) AS order_amount
           |  FROM orders o
           |  JOIN customer c ON o.o_custkey = c.c_custkey
           |  JOIN nation n ON c.c_nationkey = n.n_nationkey)
           |SELECT CAST(province_id AS BIGINT) AS province_id, province_name,
           |  CAST(SUM(order_amount) AS DOUBLE) AS order_amount
           |FROM ps WHERE strftime(stt, '%Y%m%d') = '19960301'
           |GROUP BY province_id, province_name
           |ORDER BY province_id""".stripMargin),
    (spark, dir) => {
      val o = Tables.table(spark, dir, "orders")
      val c = Tables.table(spark, dir, "customer")
      val n = Tables.table(spark, dir, "nation")
      val stats = o
        .join(c, o("o_custkey") === c("c_custkey"))
        .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
        .select(
          date_trunc("month", col("o_orderdate")).as("stt"),
          col("n_nationkey").cast("long").as("province_id"),
          col("n_name").as("province_name"),
          col("o_totalprice").cast("decimal(18,2)").as("order_amount"))
      provinceStats(stats, "19960301")
        .select(col("province_id"), col("province_name"),
          col("order_amount").cast("double").as("order_amount"))
    })

  /** lineitem×part → product_stats keyed by brand (the trademark
    * analog), served by [[productStatsByTrademark]] for 1996-03. */
  val adsTrademarkStats = QueryDef(
    "ads_trademark_stats",
    Some("""WITH ps AS (
           |  SELECT date_trunc('month', l.l_shipdate) AS stt,
           |    TRY_CAST(regexp_extract(p.p_brand, '[0-9]+') AS BIGINT) AS tm_id,
           |    p.p_brand AS tm_name,
           |    CAST(l.l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l.l_discount AS DECIMAL(18,2))) AS order_amount
           |  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey)
           |SELECT tm_id, tm_name, CAST(order_amount AS DOUBLE) AS order_amount FROM (
           |  SELECT tm_id, tm_name, SUM(order_amount) AS order_amount
           |  FROM ps WHERE strftime(stt, '%Y%m%d') = '19960301'
           |  GROUP BY tm_id, tm_name
           |  HAVING SUM(order_amount) > 0
           |  ORDER BY order_amount DESC, tm_id, tm_name
           |  LIMIT 10)
           |ORDER BY order_amount DESC, tm_id, tm_name""".stripMargin),
    (spark, dir) => {
      val l = Tables.table(spark, dir, "lineitem")
      val p = Tables.table(spark, dir, "part")
      // part scales with SF — UNHINTED: AQE broadcasts it only while
      // it is genuinely small (a forced hint would collect SF*200k
      // rows to the driver at scale, the q8/q9 convention)
      val stats = l.join(p, l("l_partkey") === p("p_partkey"))
        .select(
          date_trunc("month", col("l_shipdate")).as("stt"),
          expr("TRY_CAST(regexp_extract(p_brand, '[0-9]+', 0) AS BIGINT)").as("tm_id"),
          col("p_brand").as("tm_name"),
          (col("l_extendedprice").cast("decimal(18,2)") *
            (lit(1) - col("l_discount").cast("decimal(18,2)"))).as("order_amount"))
      productStatsByTrademark(stats, "19960301", 10)
        .select(col("tm_id"), col("tm_name"),
          col("order_amount").cast("double").as("order_amount"))
    })

  /** The same product_stats through [[gmv]] — the one-row daily GMV
    * endpoint. */
  val adsGmv = QueryDef(
    "ads_gmv",
    Some("""SELECT CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l.l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS gmv
           |FROM lineitem l
           |WHERE strftime(date_trunc('month', l.l_shipdate), '%Y%m%d') = '19960301'""".stripMargin),
    (spark, dir) => {
      val stats = Tables.table(spark, dir, "lineitem")
        .select(
          date_trunc("month", col("l_shipdate")).as("stt"),
          (col("l_extendedprice").cast("decimal(18,2)") *
            (lit(1) - col("l_discount").cast("decimal(18,2)"))).as("order_amount"))
      gmv(stats, "19960301")
        .select(col("gmv").cast("double").as("gmv"))
    })

  /** events → visitor_stats at hour grain (is_new from the signup
    * event type), served by [[visitorStatsByHr]] for 2024-01-05. */
  val adsVisitorStatsByHr = QueryDef(
    "ads_visitor_stats_by_hr",
    Some("""WITH vs AS (
           |  SELECT date_trunc('hour', CAST(ts AS TIMESTAMP)) AS stt,
           |    CASE WHEN event_type = 'signup' THEN '1' ELSE '0' END AS is_new,
           |    COUNT(DISTINCT user_id) AS uv_ct,
           |    COUNT(*) AS pv_ct,
           |    CAST(SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS sv_ct,
           |    CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS uj_ct
           |  FROM events
           |  GROUP BY 1, 2)
           |SELECT CAST(SUM(CASE WHEN is_new = '1' THEN uv_ct ELSE 0 END) AS BIGINT) AS new_uv,
           |  CAST(EXTRACT(hour FROM stt) AS BIGINT) AS hr,
           |  CAST(SUM(uv_ct) AS BIGINT) AS uv_ct,
           |  CAST(SUM(pv_ct) AS BIGINT) AS pv_ct,
           |  CAST(SUM(uj_ct) AS BIGINT) AS uj_ct
           |FROM vs WHERE strftime(stt, '%Y%m%d') = '20240105'
           |GROUP BY hr
           |ORDER BY hr""".stripMargin),
    (spark, dir) => {
      val stats = Tables.events(spark, dir)
        .groupBy(
          date_trunc("hour", col("ts")).as("stt"),
          when(col("event_type") === "signup", "1").otherwise("0").as("is_new"))
        .agg(
          countDistinct(col("user_id")).as("uv_ct"),
          count(lit(1)).as("pv_ct"),
          sum(when(col("event_type") === "view", 1L).otherwise(0L)).as("sv_ct"),
          sum(when(col("event_type") === "error", 1L).otherwise(0L)).as("uj_ct"))
      visitorStatsByHr(stats, "20240105")
        .select(col("new_uv").cast("long"), col("hr").cast("long").as("hr"),
          col("uv_ct").cast("long"), col("pv_ct").cast("long"),
          col("uj_ct").cast("long"))
    })

  /** lineitem×part → product_stats keyed by p_type (the category3
    * analog; id derived deterministically from the name on BOTH
    * engines: ascii(first char)·100 + length), served by
    * [[productStatsByCategory3]] for 1996-03. */
  val adsCategory3Stats = QueryDef(
    "ads_category3_stats",
    Some("""WITH ps AS (
           |  SELECT date_trunc('month', l.l_shipdate) AS stt,
           |    CAST(ascii(p.p_type) * 100 + length(p.p_type) AS BIGINT) AS category3_id,
           |    p.p_type AS category3_name,
           |    CAST(l.l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l.l_discount AS DECIMAL(18,2))) AS order_amount
           |  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey)
           |SELECT category3_id, category3_name, CAST(order_amount AS DOUBLE) AS order_amount FROM (
           |  SELECT category3_id, category3_name, SUM(order_amount) AS order_amount
           |  FROM ps WHERE stt >= TIMESTAMP '1996-03-01' AND stt < TIMESTAMP '1996-03-02'
           |  GROUP BY category3_id, category3_name
           |  HAVING SUM(order_amount) > 0
           |  ORDER BY order_amount DESC, category3_id, category3_name
           |  LIMIT 5)
           |ORDER BY order_amount DESC, category3_id, category3_name""".stripMargin),
    (spark, dir) => {
      val l = Tables.table(spark, dir, "lineitem")
      val p = Tables.table(spark, dir, "part")
      // part scales with SF — unhinted, AQE decides (see
      // ads_trademark_stats)
      val stats = l.join(p, l("l_partkey") === p("p_partkey"))
        .select(
          date_trunc("month", col("l_shipdate")).as("stt"),
          (ascii(col("p_type")) * 100 + length(col("p_type"))).cast("long").as("category3_id"),
          col("p_type").as("category3_name"),
          (col("l_extendedprice").cast("decimal(18,2)") *
            (lit(1) - col("l_discount").cast("decimal(18,2)"))).as("order_amount"))
      productStatsByCategory3(stats, "19960301", 5)
        .select(col("category3_id"), col("category3_name"),
          col("order_amount").cast("double").as("order_amount"))
    })

  /** lineitem → product_stats keyed by a part-range SPU (ten parts per
    * SPU), with per-group distinct-order counts, served by
    * [[productStatsBySpu]] for 1996-03. */
  val adsSpuStats = QueryDef(
    "ads_spu_stats",
    Some("""WITH base AS (
           |  SELECT date_trunc('month', l_shipdate) AS stt,
           |    l_partkey // 10 AS spu_id,
           |    'SPU_' || CAST(l_partkey // 10 AS VARCHAR) AS spu_name,
           |    CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2))) AS amt,
           |    l_orderkey
           |  FROM lineitem),
           |ps AS (
           |  SELECT stt, spu_id, spu_name, SUM(amt) AS order_amount,
           |    COUNT(DISTINCT l_orderkey) AS order_ct
           |  FROM base GROUP BY stt, spu_id, spu_name)
           |SELECT spu_id, spu_name, CAST(order_amount AS DOUBLE) AS order_amount,
           |  CAST(order_ct AS BIGINT) AS order_ct
           |FROM (
           |  SELECT spu_id, spu_name, SUM(order_amount) AS order_amount,
           |    SUM(order_ct) AS order_ct
           |  FROM ps WHERE stt >= TIMESTAMP '1996-03-01' AND stt < TIMESTAMP '1996-03-02'
           |  GROUP BY spu_id, spu_name
           |  HAVING SUM(order_amount) > 0
           |  ORDER BY order_amount DESC, spu_id, spu_name
           |  LIMIT 10)
           |ORDER BY order_amount DESC, spu_id, spu_name""".stripMargin),
    (spark, dir) => {
      val stats = Tables.table(spark, dir, "lineitem")
        .groupBy(
          date_trunc("month", col("l_shipdate")).as("stt"),
          expr("l_partkey div 10").as("spu_id"),
          concat(lit("SPU_"), expr("l_partkey div 10")).as("spu_name"))
        .agg(
          sum(col("l_extendedprice").cast("decimal(18,2)") *
            (lit(1) - col("l_discount").cast("decimal(18,2)"))).as("order_amount"),
          countDistinct(col("l_orderkey")).as("order_ct"))
      productStatsBySpu(stats, "19960301", 10)
        .select(col("spu_id"), col("spu_name"),
          col("order_amount").cast("double").as("order_amount"),
          col("order_ct").cast("long").as("order_ct"))
    })

  /** events → visitor_stats (hour grain, integer cent-dur), served by
    * [[visitorStatsByNewFlag]] for 2024-01-05. */
  val adsVisitorNewFlag = QueryDef(
    "ads_visitor_new_flag",
    Some("""WITH vs AS (
           |  SELECT date_trunc('hour', CAST(ts AS TIMESTAMP)) AS stt,
           |    CASE WHEN event_type = 'signup' THEN '1' ELSE '0' END AS is_new,
           |    COUNT(DISTINCT user_id) AS uv_ct,
           |    COUNT(*) AS pv_ct,
           |    CAST(SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS sv_ct,
           |    CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS uj_ct,
           |    CAST(SUM(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)) AS BIGINT) AS dur_sum
           |  FROM events GROUP BY 1, 2)
           |SELECT is_new,
           |  CAST(SUM(uv_ct) AS BIGINT) AS uv_ct, CAST(SUM(pv_ct) AS BIGINT) AS pv_ct,
           |  CAST(SUM(sv_ct) AS BIGINT) AS sv_ct, CAST(SUM(uj_ct) AS BIGINT) AS uj_ct,
           |  CAST(SUM(dur_sum) AS BIGINT) AS dur_sum
           |FROM vs WHERE stt >= TIMESTAMP '2024-01-05' AND stt < TIMESTAMP '2024-01-06'
           |GROUP BY is_new
           |ORDER BY is_new""".stripMargin),
    (spark, dir) => {
      val stats = Tables.events(spark, dir)
        .groupBy(
          date_trunc("hour", col("ts")).as("stt"),
          when(col("event_type") === "signup", "1").otherwise("0").as("is_new"))
        .agg(
          countDistinct(col("user_id")).as("uv_ct"),
          count(lit(1)).as("pv_ct"),
          sum(when(col("event_type") === "view", 1L).otherwise(0L)).as("sv_ct"),
          sum(when(col("event_type") === "error", 1L).otherwise(0L)).as("uj_ct"),
          // duration analog as exact integer cents so re-summing in the
          // serving layer stays order-independent
          sum((col("value").cast("decimal(18,2)") * 100).cast("long")).as("dur_sum"))
      visitorStatsByNewFlag(stats, "20240105")
        .select(col("is_new"), col("uv_ct").cast("long"), col("pv_ct").cast("long"),
          col("sv_ct").cast("long"), col("uj_ct").cast("long"),
          col("dur_sum").cast("long"))
    })

  /** events → keyword_stats (keyword = event type, source bucketed from
    * the value magnitude), served by [[keywordStats]] for 2024-01-05 —
    * the weighted-score-ordered-by-raw-count mapper quirk under the
    * oracle. */
  val adsKeywordStats = QueryDef(
    "ads_keyword_stats",
    Some("""WITH ks AS (
           |  SELECT date_trunc('day', CAST(ts AS TIMESTAMP)) AS stt, event_type AS keyword,
           |    CASE WHEN value < 20 THEN 'SEARCH' WHEN value < 40 THEN 'ORDER'
           |         WHEN value < 60 THEN 'CART' WHEN value < 80 THEN 'CLICK'
           |         ELSE 'DISPLAY' END AS source,
           |    COUNT(*) AS ct
           |  FROM events GROUP BY 1, 2, 3)
           |SELECT keyword, CAST(ct AS BIGINT) AS ct FROM (
           |  SELECT keyword,
           |    SUM(ct * CASE source WHEN 'SEARCH' THEN 10 WHEN 'ORDER' THEN 3
           |                         WHEN 'CART' THEN 2 WHEN 'CLICK' THEN 1 ELSE 0 END) AS ct,
           |    SUM(ct) AS raw_ct
           |  FROM ks WHERE stt >= TIMESTAMP '2024-01-05' AND stt < TIMESTAMP '2024-01-06'
           |  GROUP BY keyword
           |  ORDER BY raw_ct DESC, keyword
           |  LIMIT 3)
           |ORDER BY keyword""".stripMargin),
    (spark, dir) => {
      val stats = Tables.events(spark, dir)
        .groupBy(
          date_trunc("day", col("ts")).as("stt"),
          col("event_type").as("keyword"),
          when(col("value") < 20, "SEARCH").when(col("value") < 40, "ORDER")
            .when(col("value") < 60, "CART").when(col("value") < 80, "CLICK")
            .otherwise("DISPLAY").as("source"))
        .agg(count(lit(1)).as("ct"))
      keywordStats(stats, "20240105", 3)
        .select(col("keyword"), col("ct").cast("long").as("ct"))
        .orderBy("keyword")
    })

  val defs: Seq[QueryDef] = Seq(
    adsProvinceStats, adsTrademarkStats, adsGmv, adsVisitorStatsByHr,
    adsCategory3Stats, adsSpuStats, adsVisitorNewFlag, adsKeywordStats)

  /** name → (statsTable, date, limit) => result — the REST routing
    * table (`SugarController`'s path → mapper dispatch). */
  val registry: Map[String, (DataFrame, String, Int) => DataFrame] = Map(
    "keyword_stats" -> ((df, d, l) => keywordStats(df, d, l)),
    "gmv" -> ((df, d, _) => gmv(df, d)),
    "product_stats_by_trademark" -> ((df, d, l) => productStatsByTrademark(df, d, l)),
    "product_stats_by_category3" -> ((df, d, l) => productStatsByCategory3(df, d, l)),
    "product_stats_by_spu" -> ((df, d, l) => productStatsBySpu(df, d, l)),
    "province_stats" -> ((df, d, _) => provinceStats(df, d)),
    "visitor_stats_by_new_flag" -> ((df, d, _) => visitorStatsByNewFlag(df, d)),
    "visitor_stats_by_hr" -> ((df, d, _) => visitorStatsByHr(df, d)))
}

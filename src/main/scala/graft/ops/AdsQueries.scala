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

  private def onDay(df: DataFrame, date: String) =
    df.filter(date_format(col("stt"), "yyyyMMdd") === date)

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

package graft

import java.sql.Timestamp

import graft.ops.AdsQueries
import org.apache.spark.sql.functions._

/** The ADS serving façade: each registry entry must reproduce its
  * mapper SQL's semantics (grouping, HAVING, ordering quirks, weight
  * table) on hand-checkable stats rows, and the façade must serve
  * straight off the DWS pipeline's real output. */
class AdsSpec extends SparkSuite {
  import spark.implicits._

  private def ts(day: String, hr: Int): Timestamp =
    Timestamp.valueOf(s"$day $hr:00:00")

  test("keywordStats weights sources but orders by the raw count (mapper quirk)") {
    val ks = Seq(
      // kw_a: raw 3+1=4, weighted 3*10+1*1=31 ; kw_b: raw 5, weighted 5*2=10
      ("2024-01-01", "kw_a", "SEARCH", 3L), ("2024-01-01", "kw_a", "CLICK", 1L),
      ("2024-01-01", "kw_b", "CART", 5L),
      // unknown source weights 0 but still counts toward raw order
      ("2024-01-01", "kw_c", "DISPLAY", 9L),
      // other-day row must be filtered out
      ("2024-01-02", "kw_a", "SEARCH", 100L))
      .map { case (d, k, s, c) => (ts(d, 10), k, s, c) }
      .toDF("stt", "keyword", "source", "ct")
    val out = AdsQueries.keywordStats(ks, "20240101", 2)
      .as[(String, Long)].collect()
    // raw order: kw_c 9, kw_b 5 — kw_a's weighted 31 doesn't outrank
    assert(out === Seq(("kw_c", 0L), ("kw_b", 10L)))
  }

  test("product stats: GMV, trademark/category3/spu groupings with HAVING+limit") {
    val ps = Seq(
      (ts("2024-01-01", 9), 1L, "tmA", 31L, "c3A", 7L, "spuA", 100.0, 2L),
      (ts("2024-01-01", 11), 1L, "tmA", 32L, "c3B", 7L, "spuA", 50.0, 1L),
      (ts("2024-01-01", 12), 2L, "tmB", 31L, "c3A", 8L, "spuB", 0.0, 0L),
      (ts("2024-01-02", 9), 9L, "tmX", 99L, "c3X", 9L, "spuX", 999.0, 9L))
      .toDF("stt", "tm_id", "tm_name", "category3_id", "category3_name",
        "spu_id", "spu_name", "order_amount", "order_ct")

    assert(AdsQueries.gmv(ps, "20240101").as[Double].head() === 150.0)

    val byTm = AdsQueries.productStatsByTrademark(ps, "20240101", 10)
      .as[(Long, String, Double)].collect()
    assert(byTm === Seq((1L, "tmA", 150.0))) // tmB zeroed out by HAVING

    val byC3 = AdsQueries.productStatsByCategory3(ps, "20240101", 1)
      .as[(Long, String, Double)].collect()
    assert(byC3 === Seq((31L, "c3A", 100.0))) // limit 1 keeps the top

    val bySpu = AdsQueries.productStatsBySpu(ps, "20240101", 10)
      .as[(Long, String, Double, Long)].collect()
    assert(bySpu === Seq((7L, "spuA", 150.0, 3L)))
  }

  test("province and visitor stats: groupings, hourly new-uv split") {
    val prov = Seq(
      (ts("2024-01-01", 9), 1L, "P1", 10.0), (ts("2024-01-01", 10), 1L, "P1", 5.0),
      (ts("2024-01-01", 9), 2L, "P2", 7.0), (ts("2024-01-02", 9), 1L, "P1", 99.0))
      .toDF("stt", "province_id", "province_name", "order_amount")
    val byProv = AdsQueries.provinceStats(prov, "20240101")
      .as[(Long, String, Double)].collect()
    assert(byProv === Seq((1L, "P1", 15.0), (2L, "P2", 7.0)))

    val vs = Seq(
      (ts("2024-01-01", 9), "1", 3L, 10L, 2L, 1L, 60L),
      (ts("2024-01-01", 9), "0", 5L, 20L, 4L, 0L, 120L),
      (ts("2024-01-01", 10), "1", 2L, 8L, 1L, 1L, 30L),
      (ts("2024-01-02", 9), "1", 99L, 99L, 99L, 99L, 99L))
      .toDF("stt", "is_new", "uv_ct", "pv_ct", "sv_ct", "uj_ct", "dur_sum")
    val byFlag = AdsQueries.visitorStatsByNewFlag(vs, "20240101")
      .as[(String, Long, Long, Long, Long, Long)].collect()
    assert(byFlag === Seq(("0", 5L, 20L, 4L, 0L, 120L), ("1", 5L, 18L, 3L, 2L, 90L)))

    val byHr = AdsQueries.visitorStatsByHr(vs, "20240101")
      .as[(Long, Long, Long, Long, Long)].collect()
    assert(byHr === Seq((3L, 9L, 8L, 30L, 1L), (2L, 10L, 2L, 8L, 1L)))
  }

  test("the façade serves off the real DWS pipeline output") {
    // pipeline_dws_e2e's ADS rows (stt string day, pv_ct, order_amount)
    // are a product_stats analog: GMV for one day through the façade
    // must equal that day's order_amount from the pipeline itself
    val dws = graft.ops.PipelineOps.pipelineDwsE2e.fn(spark, sf("sf0.001"))
      .select(to_timestamp(col("stt")).as("stt"), col("order_amount"))
    val rows = dws.collect()
    assert(rows.nonEmpty)
    val day = rows.head.getTimestamp(0).toLocalDateTime.toLocalDate
    val dayKey = day.format(java.time.format.DateTimeFormatter.BASIC_ISO_DATE)
    val want = rows.filter(_.getTimestamp(0).toLocalDateTime.toLocalDate == day)
      .map(_.getDouble(1)).sum
    val got = AdsQueries.gmv(dws, dayKey).as[Double].head()
    assert(math.abs(got - want) < 1e-9)
  }
}

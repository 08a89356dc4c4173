package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One driver-checkable query: a Spark builder plus (optionally) the
  * equivalent ANSI SQL the driver runs in DuckDB over the same parquet
  * tables. Conventions that keep the hash-compare exact across engines:
  *   - every SUM over a double column goes through DECIMAL(18,2) (or
  *     wider) so the result is order-independent, then is CAST back to
  *     DOUBLE in both engines;
  *   - integer SUMs are CAST to BIGINT in the oracle (DuckDB widens to
  *     INT128 otherwise, Spark stays LongType);
  *   - temporal outputs are formatted as strings (Spark writes
  *     tz-adjusted parquet timestamps, DuckDB writes naive ones);
  *   - both sides ORDER BY the full output key.
  *
  * ROUND-TIE HAZARD, now engineered away for every ratio of exact
  * (integer / fixed-point) quantities: `ROUND(double, n)` diverges
  * cross-engine exactly ON tie-shaped values (Spark rounds the
  * double's shortest decimal string HALF_UP — `round(0.07125, 4) =
  * 0.0713` — while DuckDB rounds the binary value `0.071249999… →
  * 0.0712`). Every query whose rounded output is a ratio of
  * integer-valued quantities (counts, token counts, cent-scaled
  * decimal sums) routes through [[QueryDef.roundedRatio]] /
  * [[QueryDef.roundedRatioSql]]: exact HALF_UP of the true rational
  * in integer arithmetic on BOTH sides, so no regenerated dataset can
  * roll a divergent tie. Remaining `ROUND(double, n)` sites are over
  * float/irrational-derived doubles (cosines of float dot products,
  * sqrt-derived stddev, interpolated percentiles re-scaled so their
  * exact values terminate before the rounding digit) whose shortest
  * decimal representations cannot land on an (n+1)-digit tie —
  * **none known** beyond that.
  */
final case class QueryDef(
    name: String,
    oracle: Option[String],
    fn: (SparkSession, String) => DataFrame)

object QueryDef {
  import org.apache.spark.sql.Column
  import org.apache.spark.sql.functions._

  /** Exact HALF_UP rounding of the ratio `num/den` to `n` decimals,
    * computed entirely in integer arithmetic:
    * `sign(num) · floor((|num|·2·10ⁿ + den) / (2·den)) / 10ⁿ`
    * (HALF_UP = away from zero on ties, matching `ROUND`). Both inputs
    * must be integer-VALUED (scale fixed-point inputs up first, e.g. a
    * DECIMAL(18,2) sum × 100) and `den > 0`. The intermediate runs in
    * DECIMAL(38,0) (no ANSI long overflow); the integral quotient is
    * produced as `(a − a mod b) / b`, whose decimal division is exact
    * because the numerator is an exact multiple. The final value is
    * the nearest double to an exact n-decimal rational — bit-identical
    * to the oracle's [[roundedRatioSql]] result, immune to the
    * Spark-shortest-string vs DuckDB-binary ROUND divergence. */
  def roundedRatio(num: Column, den: Column, n: Int): Column = {
    val p = math.pow(10, n).toLong
    val big = "decimal(38,0)"
    val a = abs(num).cast(big) * lit(2L * p) + den.cast(big)
    val b = den.cast(big) * lit(2L)
    val q = (a - pmod(a, b)) / b
    val sign = when(num < 0, lit(-1L)).otherwise(lit(1L))
    (sign * q.cast(big) / lit(p)).cast("double")
  }

  /** DuckDB mirror of [[roundedRatio]] (HUGEINT `//`, same formula;
    * the quotient is < 2^53 for every declared ratio, so the final
    * double cast is exact). */
  def roundedRatioSql(num: String, den: String, n: Int): String = {
    val p = math.pow(10, n).toLong
    s"((CASE WHEN ($num) < 0 THEN -1 ELSE 1 END) * " +
      s"CAST((CAST(abs($num) AS HUGEINT) * ${2 * p} + CAST($den AS HUGEINT)) // " +
      s"(2 * CAST($den AS HUGEINT)) AS DOUBLE) / $p)"
  }

  /** Oracle derivation by substitution that FAILS FAST when the base
    * text drifts: several lifecycle queries (the takedown gates)
    * derive their oracle from another query's SQL via a targeted
    * replace — if the base oracle is ever reworded, a plain
    * `String.replace` silently no-ops and the derived oracle loses
    * its delete filter, turning the gate into a false-pass. This
    * helper requires the substitution to have actually happened, so
    * oracle drift costs one loud assertion instead of a silently
    * weakened check. */
  def replacedOracle(base: Option[String], from: String, to: String): Option[String] =
    base.map { sql =>
      val replaced = sql.replace(from, to)
      require(replaced != sql,
        s"oracle derivation no-op: anchor text not found —\n  anchor: $from\n" +
          "the base oracle was reworded; update the derived query's anchor")
      replaced
    }
}

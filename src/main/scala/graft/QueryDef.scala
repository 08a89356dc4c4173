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
  * KNOWN RESIDUAL HAZARD — `ROUND(double, n)` on TIE-shaped values:
  * Spark rounds the double's shortest decimal string HALF_UP
  * (`round(0.07125, 4) = 0.0713`) while DuckDB rounds the binary
  * value (`0.071249999... → 0.0712`), so a ratio whose exact decimal
  * expansion lands on a rounding boundary (57/800 = 0.07125) would
  * hash-mismatch even though both engines are "correct". The current
  * fixtures contain no such quotient (the full board is green at
  * sf0.001/0.01/0.1); if a regenerated dataset ever trips one query
  * on a single near-boundary ratio cell, this — not a logic bug — is
  * the first thing to check. The exact-everywhere fix is integer
  * rounding (`(a*2*10^n + b) div (2*b)` over the count columns on
  * both sides); it is deliberately NOT applied preemptively across
  * the ~10 passing ratio queries because decimal-division scale rules
  * differ between the engines and a mechanical sweep risks more than
  * it protects.
  */
final case class QueryDef(
    name: String,
    oracle: Option[String],
    fn: (SparkSession, String) => DataFrame)

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
  */
final case class QueryDef(
    name: String,
    oracle: Option[String],
    fn: (SparkSession, String) => DataFrame)

package graft

import graft.ops._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every operator from SURVEY §2 is declared as a named query (batch
  * form, DuckDB-oracle-checkable); streaming forms of the stateful
  * operators live in `graft.streaming` and are exercised by ScalaTest.
  */
object SparkEntry {

  /** Registry of all declared queries. */
  val allDefs: Seq[QueryDef] =
    Core.defs ++ Stateful.defs ++ Joins.defs ++ Aggregates.defs ++
      Dedup.defs ++ Similarity.defs ++ TextOps.defs ++ Multimodal.defs ++
      Cdc.defs ++ WindowOps.defs ++ PipelineOps.defs ++ ScaleOps.defs ++
      Analytics.defs ++ Workload.defs ++ Workload2.defs ++ Workload3.defs ++
      AdsQueries.defs

  require(allDefs.map(_.name).distinct.size == allDefs.size,
    "duplicate query names in registry")

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks
    * rows>0. The layered DWD→DWM→DWS→ADS pipeline is the engine's
    * signature shape. */
  def entry(spark: SparkSession): DataFrame =
    PipelineOps.pipelineDwsE2e.fn(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    allDefs.map(d => d.name -> d.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    allDefs.flatMap(d => d.oracle.map(d.name -> _)).toMap
}

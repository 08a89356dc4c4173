package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}

/** K5 — config-driven auto-DDL
  * (`gmall-realtime/src/main/java/com/atguigu/app/function/TableProcessFunction.java:82-129`):
  * when a routing-config row targeting the dim store arrives, the
  * reference issues
  * `create table if not exists SCHEMA.<sinkTable>(c varchar [primary key], ...) <sinkExtend>`
  * against Phoenix before any data is routed to that table. Here the
  * catalog is Spark's session catalog (the in-env stand-in for an
  * external Phoenix/HBase catalog): every config column becomes a
  * STRING column (Phoenix `varchar`), the primary key and the extend
  * clause — which carry no meaning for a parquet-backed Spark table —
  * are preserved as table properties so the routing layer (and a
  * production swap to a PK-aware catalog) can read them back.
  *
  * Semantics matched to the reference:
  *   - `sinkPk` defaults to `id`, `sinkExtend` to empty (`:84-91`);
  *   - DDL is `IF NOT EXISTS` — config replay or duplicate rows are
  *     idempotent (`:96`);
  *   - only configs routed to the dim store get DDL; topic-routed
  *     configs don't (`processBroadcastElement` gates on sink type).
  *
  * Scale note: DDL volume is config-table cardinality (tens of rows),
  * driver-side by nature — catalog mutation is not a data-path
  * operation.
  */
object AutoDdl {

  /** `bean/TableProcess.java:14-33` — the config row. */
  final case class TableConfig(
      sourceTable: String,
      sinkType: String, // "dim" (HBASE analog) | "topic" (KAFKA analog)
      sinkTable: String,
      sinkColumns: String, // CSV whitelist
      sinkPk: Option[String],
      sinkExtend: Option[String])

  private val Ident = "^[A-Za-z_][A-Za-z0-9_]*$".r

  /** Config-row sanity gate: the DDL below is a raw string build, so a
    * blank column list (`CREATE TABLE t ()`) or a quote/backtick in an
    * identifier would raise a ParseException inside foreachBatch and
    * kill the whole config stream. Malformed rows are the config
    * analog of dirty data — they must route to a side channel, never
    * terminate DDL for every other table. */
  def isValid(cfg: TableConfig): Boolean = {
    // null fields first (a half-written CDC config row): any string op
    // on them would NPE inside foreachBatch — the exact stream-killing
    // failure this gate exists to prevent. Option fields hold
    // Option(null) never null itself (built via Option(getString)).
    cfg.sinkTable != null && cfg.sinkColumns != null &&
      cfg.sinkPk.forall(_ != null) && cfg.sinkExtend.forall(_ != null) && {
        val cols = cfg.sinkColumns.split(",").map(_.trim).filter(_.nonEmpty)
        cols.nonEmpty &&
          (cols :+ cfg.sinkTable).forall(Ident.matches) &&
          cfg.sinkPk.forall(Ident.matches) &&
          cfg.sinkExtend.forall(e => !e.contains("'") && !e.contains("\\"))
      }
  }

  /** The generated DDL, mirroring `createTable`'s string build
    * (`TableProcessFunction.java:92-116`) onto Spark SQL. */
  def createTableSql(db: String, cfg: TableConfig): String = {
    val pk = cfg.sinkPk.getOrElse("id")
    val extend = cfg.sinkExtend.getOrElse("")
    val cols = cfg.sinkColumns.split(",").map(_.trim).filter(_.nonEmpty)
    val colDefs = cols.map { c =>
      if (c == pk) s"`$c` STRING COMMENT 'primary key'" else s"`$c` STRING"
    }.mkString(", ")
    s"""CREATE TABLE IF NOT EXISTS `$db`.`${cfg.sinkTable}` ($colDefs)
       |USING PARQUET
       |TBLPROPERTIES ('graft.pk' = '$pk', 'graft.extend' = '$extend')""".stripMargin
  }

  /** Ensure the sink table for one config row exists (idempotent). */
  def ensureTable(spark: SparkSession, db: String, cfg: TableConfig): Unit = {
    spark.sql(s"CREATE DATABASE IF NOT EXISTS `$db`")
    spark.sql(createTableSql(db, cfg))
    (): Unit
  }

  /** Dead-letter producer for malformed config rows: lands the batch's
    * rejects on a [[FileTopics]] topic (default `dlq_table_config`) as
    * JSON values keyed by source table — a CONSUMABLE side output a
    * monitor can subscribe to, same convention as the dirty-data
    * branches in the DWD layer. One produce per micro-batch, not one
    * write job per bad row. The foreachBatch batchId threads through
    * into the produce (the [[LogCollector.ingestToTopic]] discipline),
    * so a replayed micro-batch restores its own DLQ records instead of
    * appending duplicates. */
  def deadLetterTo(spark: SparkSession, brokerDir: String,
      topic: String = "dlq_table_config"): (Seq[TableConfig], Option[Long]) => Unit = {
    (cfgs, batchId) =>
      if (cfgs.nonEmpty) {
        import spark.implicits._
        import org.apache.spark.sql.functions.{col, lit, to_json, struct}
        val rows = cfgs.map(c => (c.sourceTable, c.sinkType, c.sinkTable,
            c.sinkColumns, c.sinkPk.orNull, c.sinkExtend.orNull))
          .toDF("sourceTable", "sinkType", "sinkTable", "sinkColumns", "sinkPk", "sinkExtend")
        FileTopics.produce(
          rows.select(
            lit(topic).as("topic"),
            col("sourceTable").as("key"),
            to_json(struct(rows.columns.map(col): _*)).as("value")),
          brokerDir, batchId = batchId)
      }
  }

  private lazy val log = org.apache.log4j.Logger.getLogger(getClass)

  /** Default reject channel: WARN per row (never a bare stderr
    * println). */
  val logRejects: (Seq[TableConfig], Option[Long]) => Unit = (cfgs, _) => cfgs.foreach { cfg =>
    log.warn(
      s"[autoddl] skipping malformed config row for source '${cfg.sourceTable}': " +
        s"sinkTable='${cfg.sinkTable}' sinkColumns='${cfg.sinkColumns}'")
  }

  /** foreachBatch body for a config stream (the broadcast-state
    * `processBroadcastElement` analog): each arriving dim-routed config
    * row triggers DDL before data can be routed to the table. The
    * config batch is tiny (bounded by config-table cardinality), so
    * the collect is the same non-hot-path driver step the reference's
    * broadcast-state update is. Malformed rows route to `onReject` —
    * wire [[deadLetterTo]] for a consumable DLQ topic. */
  def applyConfigBatch(spark: SparkSession, db: String, batch: DataFrame,
      onReject: (Seq[TableConfig], Option[Long]) => Unit = logRejects,
      batchId: Option[Long] = None): Unit = {
    val rows = batch
      .select("sourceTable", "sinkType", "sinkTable", "sinkColumns", "sinkPk", "sinkExtend")
      .collect()
    val rejected = Seq.newBuilder[TableConfig]
    rows.foreach { r =>
      val cfg = TableConfig(
        r.getString(0), r.getString(1), r.getString(2), r.getString(3),
        Option(r.getString(4)), Option(r.getString(5)))
      if (cfg.sinkType == "dim") {
        if (isValid(cfg)) ensureTable(spark, db, cfg)
        else rejected += cfg
      } else if (cfg.sinkType == null || cfg.sinkType.trim.isEmpty) {
        // a half-written config row (null/blank sinkType) is MALFORMED,
        // not merely non-dim: silently skipping it leaves no evidence
        // when data later routes to its sinkTable and fails — route it
        // to the side channel like any other invalid row. (Recognized
        // non-dim types, e.g. kafka-routed configs, are legitimately
        // not this DDL layer's concern and pass through untouched.)
        rejected += cfg
      }
    }
    onReject(rejected.result(), batchId)
  }
}

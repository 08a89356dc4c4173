package graft.ops

import graft.QueryDef
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** CDC surface (SURVEY §2.1 S2/S3/S5): the reference captures MySQL
  * binlog rows, wraps them in a JSON envelope
  * `{tableName, type: insert|update|delete, data, before}`
  * (`app/function/MyDeserializationSchema.java:23-73`) and downstream
  * consumers parse + apply them. Here a deterministic change stream is
  * derived from `orders` (insert for every row, update for open orders,
  * delete for every 97th key), serialized through a JSON `data` payload
  * exactly like the envelope, then compacted to final table state:
  * latest-per-key wins, deletes drop the row.
  *
  * Scale: changelog compaction is one shuffle on the primary key
  * (row_number over pk) — the standard CDC-merge shape that scales
  * linearly with the log and is AQE-skew-splittable.
  */
object Cdc {

  /** The synthesized change stream shared by every CDC query (ONE
    * definition; s3 compacts it, s4 builds history from it): insert
    * for every order, update for open orders, delete for every 97th
    * key — serialized through the reference's JSON `data` envelope. */
  private val cdcCtes =
    """WITH ins AS (
      |  SELECT o_orderkey AS pk, 1 AS seq, 'insert' AS op,
      |    to_json(struct_pack(status := o_orderstatus, total := o_totalprice)) AS data
      |  FROM orders),
      |upd AS (
      |  SELECT o_orderkey AS pk, 2 AS seq, 'update' AS op,
      |    to_json(struct_pack(status := 'P', total := o_totalprice)) AS data
      |  FROM orders WHERE o_orderstatus = 'O'),
      |del AS (
      |  SELECT o_orderkey AS pk, 3 AS seq, 'delete' AS op, NULL AS data
      |  FROM orders WHERE o_orderkey % 97 = 0),
      |cdc AS (SELECT * FROM ins UNION ALL SELECT * FROM upd UNION ALL SELECT * FROM del)""".stripMargin

  /** Spark twin of [[cdcCtes]]. */
  private def changeStream(spark: org.apache.spark.sql.SparkSession, dir: String) = {
    val o = Tables.table(spark, dir, "orders")
    val ins = o.select(
      col("o_orderkey").as("pk"), lit(1).as("seq"), lit("insert").as("op"),
      to_json(struct(col("o_orderstatus").as("status"), col("o_totalprice").as("total"))).as("data"))
    val upd = o.filter(col("o_orderstatus") === "O").select(
      col("o_orderkey").as("pk"), lit(2).as("seq"), lit("update").as("op"),
      to_json(struct(lit("P").as("status"), col("o_totalprice").as("total"))).as("data"))
    val del = o.filter(col("o_orderkey") % 97 === 0).select(
      col("o_orderkey").as("pk"), lit(3).as("seq"), lit("delete").as("op"),
      lit(null).cast("string").as("data"))
    ins.unionByName(upd).unionByName(del)
  }

  /** Debezium-envelope adapter: raw connector JSON (flattened payload
    * `{before, after, source:{db,table}, op: c|u|d|r, ts_ms}`) → the
    * reference deserializer's output
    * `{databaseName, tableName, type, data, before}`
    * (`app/function/MyDeserializationSchema.java:23-73`), byte-compatible
    * with every downstream consumer of the synthesized stream:
    * topic-derived db/table naming, op-code mapping with Debezium's
    * `create`→`insert` rewrite (`u`→update, `d`→delete, `r`→read —
    * snapshot reads keep their own type, as in the reference), and
    * null before/after images materialized as `{}` exactly like the
    * reference's empty JSONObjects. The MySQL connector itself cannot
    * run here (no MySQL, zero egress); this pins the envelope schema
    * so the production swap is source-config only. `ts_ms` rides along
    * as the change-sequence key the compaction orders on. */
  def fromDebezium(raw: org.apache.spark.sql.DataFrame,
      valueCol: String = "value",
      passthrough: Seq[String] = Nil): org.apache.spark.sql.DataFrame = {
    // json_tuple = ONE parse of the full record (object fields come
    // back as raw JSON text); six independent get_json_object calls
    // would re-parse the value six times per row — the N-parse
    // anti-pattern the VARIANT work eliminates. Only the tiny `source`
    // object is re-read for its two fields.
    val parsed = raw.select(
      (passthrough.map(col) :+
        json_tuple(col(valueCol), "before", "after", "source", "op", "ts_ms")
          .as(Seq("j_before", "j_after", "j_source", "j_op", "j_ts"))): _*)
    val op = col("j_op")
    parsed.select(
      (passthrough.map(col) ++ Seq(
        get_json_object(col("j_source"), "$.db").as("databaseName"),
        get_json_object(col("j_source"), "$.table").as("tableName"),
        // unmapped op codes (Debezium 't' truncate, 'm' message) keep
        // their raw code instead of collapsing to NULL — a NULL type
        // could shadow a real change in downstream compaction
        when(op === "c", "insert").when(op === "u", "update")
          .when(op === "d", "delete").when(op === "r", "read")
          .otherwise(op).as("type"),
        coalesce(col("j_after"), lit("{}")).as("data"),
        coalesce(col("j_before"), lit("{}")).as("before"),
        col("j_ts").cast("long").as("ts_ms"))): _*)
  }

  /** Envelope → table state: latest change per key wins (ordered by
    * `seqCol` then `tieBreak` — Debezium's ts_ms is MILLISECOND
    * transaction time, so an insert+update inside one transaction
    * share it; when no tieBreak is given an `offset` column is used
    * automatically if present, and otherwise an in-plan guard fails
    * the job on an actual same-`seqCol` collision rather than letting
    * row_number pick a run-dependent winner), deletes drop the
    * row — the same compaction `s3_cdc_apply` proves under the oracle,
    * exposed for the Debezium-shaped stream (snapshot `read` rows
    * apply like inserts; unmapped op codes — truncate/message — are
    * excluded BEFORE windowing so they can never shadow a real
    * change). */
  def applyEnvelope(env: org.apache.spark.sql.DataFrame, pkJsonPath: String,
      seqCol: String = "ts_ms",
      tieBreak: Seq[String] = Nil): org.apache.spark.sql.DataFrame = {
    val known = env.filter(
      col("type").isin("insert", "update", "read", "delete"))
    val keyed = known.withColumn("pk",
      coalesce(get_json_object(col("data"), pkJsonPath),
        get_json_object(col("before"), pkJsonPath)))
    // Make the per-key order TOTAL: an explicit tieBreak wins;
    // otherwise the log offset when the stream carries one; otherwise
    // seqCol alone is only sound if it never collides within a key, so
    // an in-plan guard fails the job on a real collision instead of
    // returning a run-dependent winner (Debezium ts_ms is millisecond
    // transaction time — an insert+update committed together share it).
    val effectiveTieBreak: Seq[org.apache.spark.sql.Column] =
      if (tieBreak.nonEmpty) tieBreak.map(col(_).desc)
      else if (env.columns.contains("offset"))
        // the auto-adopted offset must order NUMERICALLY: a
        // string-typed offset (offsets replayed through JSON/file
        // envelopes) would sort lexicographically ('9' > '10') and —
        // because a tie-break disables the collision guard — hand the
        // OLDER change the win with no error. The long cast makes the
        // order numeric, and under ANSI a non-numeric offset fails
        // loudly instead of mis-ordering silently.
        Seq(col("offset").cast("long").desc)
      else Nil
    val w = Window.partitionBy("pk")
      .orderBy(col(seqCol).desc +: effectiveTieBreak: _*)
    val ranked = keyed.withColumn("rn", row_number().over(w))
    val guarded =
      if (effectiveTieBreak.nonEmpty) ranked
      else ranked
        // lead over the SAME window spec reuses the pk shuffle+sort: a
        // winner whose runner-up carries the same seq is a tie. The
        // assert column is referenced by the filter, so the optimizer
        // cannot prune the check away; it returns NULL when the guard
        // holds, passing every row.
        .withColumn("_next_seq", lead(col(seqCol), 1).over(w))
        .where(assert_true(
          col("rn") =!= 1 || col("_next_seq").isNull ||
            col("_next_seq") =!= col(seqCol),
          lit(s"applyEnvelope: multiple changes share '$seqCol' for one key and " +
            "no tie-break is available — pass tieBreak explicitly or include " +
            "an 'offset' column in the envelope (Debezium ts_ms collides " +
            "within a transaction)")).isNull)
    guarded.filter(col("rn") === 1 && col("type") =!= "delete")
      .select(col("pk"), col("type"), col("data"))
  }

  val s3CdcApply = QueryDef(
    "s3_cdc_apply",
    Some(s"""$cdcCtes,
           |latest AS (
           |  SELECT * FROM cdc
           |  QUALIFY ROW_NUMBER() OVER (PARTITION BY pk ORDER BY seq DESC) = 1)
           |SELECT pk,
           |  json_extract_string(data, '$$.status') AS status,
           |  CAST(json_extract_string(data, '$$.total') AS DOUBLE) AS total
           |FROM latest
           |WHERE op <> 'delete'
           |ORDER BY pk""".stripMargin),
    (spark, dir) => {
      // S2: the synthesized change stream (stand-in for binlog capture).
      val cdc = changeStream(spark, dir)
      // S3 + apply: parse the JSON envelope payload, keep latest per
      // key, drop deletes.
      val w = Window.partitionBy("pk").orderBy(col("seq").desc)
      // json_tuple = ONE parse of the payload for both fields where
      // get_json_object ×2 parsed it twice per row (the
      // Cdc.fromDebezium / VARIANT parse-once discipline); flat-key
      // extraction is identical, including NULL on missing/invalid
      cdc.withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1 && col("op") =!= "delete")
        .select(col("pk"), json_tuple(col("data"), "status", "total"))
        .select(
          col("pk"),
          col("c0").as("status"),
          col("c1").cast("double").as("total"))
        .orderBy("pk")
    })

  /** SCD-2 history build from the same change stream: every non-delete
    * change opens a version; the NEXT change (update or delete) closes
    * it. `valid_to` is NULL on the current version; a trailing delete
    * leaves the key with no current version. Both windows partition on
    * the primary key, so the whole history build is ONE shuffle — the
    * warehouse-standard dimension-history shape at any scale. */
  val s4CdcScd2 = QueryDef(
    "s4_cdc_scd2",
    Some(s"""$cdcCtes,
           |seqd AS (
           |  SELECT pk, seq, op, data,
           |    LEAD(seq) OVER (PARTITION BY pk ORDER BY seq) AS valid_to
           |  FROM cdc)
           |SELECT pk,
           |  CAST(ROW_NUMBER() OVER (PARTITION BY pk ORDER BY seq) AS BIGINT) AS version,
           |  json_extract_string(data, '$$.status') AS status,
           |  CAST(json_extract_string(data, '$$.total') AS DOUBLE) AS total,
           |  CAST(seq AS BIGINT) AS valid_from,
           |  CAST(valid_to AS BIGINT) AS valid_to,
           |  CASE WHEN valid_to IS NULL THEN CAST(1 AS BIGINT) ELSE CAST(0 AS BIGINT) END AS is_current
           |FROM seqd
           |WHERE op <> 'delete'
           |ORDER BY pk, version""".stripMargin),
    (spark, dir) => {
      val cdc = changeStream(spark, dir)
      val w = Window.partitionBy("pk").orderBy("seq")
      // version ranks the FILTERED (non-delete) rows, like the
      // oracle's outer ROW_NUMBER after its WHERE; json_tuple parses
      // the payload once for both fields (s3's discipline)
      cdc
        .withColumn("valid_to", lead(col("seq"), 1).over(w))
        .filter(col("op") =!= "delete")
        .withColumn("version", row_number()
          .over(Window.partitionBy("pk").orderBy("seq")).cast("long"))
        .select(col("pk"), col("version"), col("seq"), col("valid_to"),
          json_tuple(col("data"), "status", "total"))
        .select(
          col("pk"),
          col("version"),
          col("c0").as("status"),
          col("c1").cast("double").as("total"),
          col("seq").cast("long").as("valid_from"),
          col("valid_to").cast("long").as("valid_to"),
          when(col("valid_to").isNull, 1L).otherwise(0L).as("is_current"))
        .orderBy("pk", "version")
    })

  /** Time-travel snapshot over the SCD-2 history: reconstruct the
    * table AS OF a past log position (here max(seq)−1 — after the
    * updates, before the trailing deletes, so the result visibly
    * differs from both the insert-only state and s3's compacted final
    * state: deleted-at-3 keys are still present). A key's state at cut
    * s is the version with valid_from ≤ s < valid_to (NULL-open
    * versions qualify) — version intervals are disjoint per key, so
    * this picks at most one row per pk with no aggregation. Same
    * single pk-shuffle as the history build; the cut rides in as a
    * broadcast scalar. This is the K4 dim-lookup semantics at a point
    * in time (what the reference's Redis-cached Phoenix lookup can
    * never answer once a row is overwritten). */
  val s5CdcSnapshot = QueryDef(
    "s5_cdc_snapshot",
    Some(s"""$cdcCtes,
           |seqd AS (
           |  SELECT pk, seq, op, data,
           |    LEAD(seq) OVER (PARTITION BY pk ORDER BY seq) AS valid_to
           |  FROM cdc),
           |cut AS (SELECT MAX(seq) - 1 AS s FROM cdc)
           |SELECT pk,
           |  json_extract_string(data, '$$.status') AS status,
           |  CAST(json_extract_string(data, '$$.total') AS DOUBLE) AS total,
           |  CAST(seq AS BIGINT) AS valid_from
           |FROM seqd CROSS JOIN cut
           |WHERE op <> 'delete' AND seq <= s AND (valid_to IS NULL OR valid_to > s)
           |ORDER BY pk""".stripMargin),
    (spark, dir) => {
      val cdc = changeStream(spark, dir)
      val w = Window.partitionBy("pk").orderBy("seq")
      val seqd = cdc.withColumn("valid_to", lead(col("seq"), 1).over(w))
      val cut = cdc.agg((max(col("seq")) - 1).as("s"))
      seqd.crossJoin(broadcast(cut))
        .filter(col("op") =!= "delete" && col("seq") <= col("s") &&
          (col("valid_to").isNull || col("valid_to") > col("s")))
        .select(col("pk"), col("seq"),
          json_tuple(col("data"), "status", "total"))
        .select(
          col("pk"),
          col("c0").as("status"),
          col("c1").cast("double").as("total"),
          col("seq").cast("long").as("valid_from"))
        .orderBy("pk")
    })

  val defs: Seq[QueryDef] = Seq(s3CdcApply, s4CdcScd2, s5CdcSnapshot)
}

package graft.ops

import graft.QueryDef
import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column operators (north-star surface): media payloads are
  * opaque `binary` columns with typed metadata travelling alongside.
  * The real-decode step (image/audio libs) is STUBBED with a
  * deterministic fake — the Spark-side plumbing (schema, batch-shaped
  * partition processing, metadata extraction) is real and tested.
  *
  * At cluster scale the payload column stays columnar in parquet, the
  * decode runs per-partition (batch-at-a-time, the `mapInPandas` shape),
  * and metadata-only queries never touch the payload bytes thanks to
  * parquet column pruning.
  */
object Multimodal {

  /** One media record: payload plus typed metadata. */
  case class MediaRecord(doc_id: Long, media_type: String, payload: Array[Byte])

  /** Fake-decoded frame metadata (what a real decoder would emit). */
  case class DecodedMeta(
      doc_id: Long,
      media_type: String,
      n_bytes: Long,
      width: Long,
      height: Long,
      n_frames: Long)

  /** STUB decode: a real implementation would hand each partition's
    * batch of payloads to an image/audio codec (the `mapInPandas`
    * pattern); this one derives deterministic fake dimensions from the
    * byte length so the pipeline shape — per-partition batch iteration
    * over binary payloads — is exercised end-to-end without the codec
    * dependency. */
  def decodeStub(records: Iterator[MediaRecord]): Iterator[DecodedMeta] =
    records.map { r =>
      val n = r.payload.length.toLong
      DecodedMeta(r.doc_id, r.media_type, n,
        width = 16 + n % 624,
        height = 16 + (n * 7) % 464,
        n_frames = 1 + n % 16)
    }

  /** documents → Dataset[MediaRecord]: text bytes stand in for media
    * payloads (binary column + metadata columns). */
  def mediaRecords(spark: SparkSession, dir: String): Dataset[MediaRecord] = {
    import spark.implicits._
    Tables.table(spark, dir, "documents")
      .select(
        col("doc_id"),
        when(col("doc_id") % 2 === 0, "image").otherwise("audio").as("media_type"),
        encode(col("text"), "UTF-8").as("payload"))
      .as[MediaRecord]
  }

  /** Typed per-partition decode pipeline (the mapPartitions path —
    * exercised by ScalaTest; the declared query below is the
    * expression-only equivalent the oracle can check). */
  def decodePipeline(spark: SparkSession, dir: String): Dataset[DecodedMeta] = {
    import spark.implicits._
    mediaRecords(spark, dir).mapPartitions(decodeStub)
  }

  /** Declared query: binary payload metadata + fake-decode fields,
    * expression form (bit-identical to the stub). */
  val mmBinaryMeta = QueryDef(
    "mm_binary_meta",
    Some("""SELECT doc_id,
           |  CASE WHEN doc_id % 2 = 0 THEN 'image' ELSE 'audio' END AS media_type,
           |  CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
           |  CAST(16 + octet_length(encode(text)) % 624 AS BIGINT) AS width,
           |  CAST(16 + (octet_length(encode(text)) * 7) % 464 AS BIGINT) AS height,
           |  CAST(1 + octet_length(encode(text)) % 16 AS BIGINT) AS n_frames
           |FROM documents
           |ORDER BY doc_id""".stripMargin),
    (spark, dir) => {
      val n = octet_length(encode(col("text"), "UTF-8")).cast("long")
      Tables.table(spark, dir, "documents")
        .select(
          col("doc_id"),
          when(col("doc_id") % 2 === 0, "image").otherwise("audio").as("media_type"),
          n.as("n_bytes"),
          (lit(16) + n % 624).as("width"),
          (lit(16) + (n * 7) % 464).as("height"),
          (lit(1) + n % 16).as("n_frames"))
        .orderBy("doc_id")
    })

  /** Metadata-only aggregate over the media table: per media_type byte
    * totals — the query shape that must prune the payload column at
    * scan time. */
  val mmMetaAgg = QueryDef(
    "mm_meta_agg",
    Some("""SELECT media_type, COUNT(*) AS n,
           |  CAST(SUM(CAST(octet_length(encode(text)) AS BIGINT)) AS BIGINT) AS total_bytes
           |FROM (SELECT text, CASE WHEN doc_id % 2 = 0 THEN 'image' ELSE 'audio' END AS media_type
           |      FROM documents)
           |GROUP BY media_type
           |ORDER BY media_type""".stripMargin),
    (spark, dir) =>
      Tables.table(spark, dir, "documents")
        .select(
          when(col("doc_id") % 2 === 0, "image").otherwise("audio").as("media_type"),
          octet_length(encode(col("text"), "UTF-8")).cast("long").as("nb"))
        .groupBy("media_type")
        .agg(count(lit(1)).as("n"), sum(col("nb")).as("total_bytes"))
        .orderBy("media_type"))

  /** Frame sampling: every 4th frame index of each (fake-decoded) video
    * payload — one output row per sampled frame, generated row-locally
    * (the shape that feeds frame batches to a downstream vision
    * encoder). */
  val mmFrameSample = QueryDef(
    "mm_frame_sample",
    Some("""WITH m AS (
           |  SELECT doc_id, CAST(1 + octet_length(encode(text)) % 16 AS BIGINT) AS n_frames
           |  FROM documents WHERE doc_id % 2 = 0)
           |SELECT doc_id, unnest(generate_series(0, n_frames - 1, 4)) AS frame_idx, n_frames
           |FROM m
           |ORDER BY doc_id, frame_idx""".stripMargin),
    (spark, dir) => {
      val n = (lit(1) + octet_length(encode(col("text"), "UTF-8")) % 16).cast("long")
      Tables.table(spark, dir, "documents")
        .filter(col("doc_id") % 2 === 0) // the 'image/video' half
        .select(col("doc_id"), n.as("n_frames"))
        .select(col("doc_id"),
          explode(expr("sequence(0, n_frames - 1, 4)")).as("frame_idx"),
          col("n_frames"))
        .orderBy("doc_id", "frame_idx")
    })

  /** Resize planning: aspect-preserving fit of each (fake-decoded)
    * image into a 224×224 training box, computed with integer
    * arithmetic only (output dims + letterbox padding) — the
    * deterministic planning half of a resize op; the pixel work
    * belongs to the stubbed codec. Pure map-side expressions. */
  val mmResizePlan = QueryDef(
    "mm_resize_plan",
    Some("""WITH m AS (
           |  SELECT doc_id,
           |    CAST(16 + octet_length(encode(text)) % 624 AS BIGINT) AS w,
           |    CAST(16 + (octet_length(encode(text)) * 7) % 464 AS BIGINT) AS h
           |  FROM documents WHERE doc_id % 2 = 0)
           |SELECT doc_id, w, h,
           |  w * 224 // greatest(w, h) AS out_w,
           |  h * 224 // greatest(w, h) AS out_h,
           |  (224 - w * 224 // greatest(w, h)) // 2 AS pad_x,
           |  (224 - h * 224 // greatest(w, h)) // 2 AS pad_y
           |FROM m
           |ORDER BY doc_id""".stripMargin),
    (spark, dir) => {
      val n = octet_length(encode(col("text"), "UTF-8")).cast("long")
      Tables.table(spark, dir, "documents")
        .filter(col("doc_id") % 2 === 0)
        .select(col("doc_id"),
          (lit(16) + n % 624).as("w"),
          (lit(16) + (n * 7) % 464).as("h"))
        .select(col("doc_id"), col("w"), col("h"),
          expr("w * 224 div greatest(w, h)").as("out_w"),
          expr("h * 224 div greatest(w, h)").as("out_h"),
          expr("(224 - w * 224 div greatest(w, h)) div 2").as("pad_x"),
          expr("(224 - h * 224 div greatest(w, h)) div 2").as("pad_y"))
        .orderBy("doc_id")
    })

  /** Checksum dedup on the BINARY payload column (the standard first
    * pass over a crawled media corpus: byte-identical files collapse
    * by content digest before any decode runs). Digests each payload
    * map-side and reports, per media type, how many payloads are
    * byte-identical replicas (count − count-distinct of the digest)
    * plus the byte volume. (DuckDB's md5 takes no BLOB, so the oracle
    * hashes the VARCHAR — identical bytes, since the payload IS the
    * text's UTF-8 encoding; the Spark side hashes the binary column
    * itself.) The distinct-aggregate shuffle carries the 32-char
    * digest, never the payload bytes — at 100 TB the payload column
    * feeds only the map-side hash and is never shipped. */
  val mmDedupPayload = QueryDef(
    "mm_dedup_payload",
    Some("""WITH m AS (
           |  SELECT doc_id,
           |    CASE WHEN doc_id % 2 = 0 THEN 'image' ELSE 'audio' END AS media_type,
           |    md5(text) AS payload_md5,
           |    octet_length(encode(text)) AS n_bytes
           |  FROM documents)
           |SELECT media_type,
           |  COUNT(*) AS n_payloads,
           |  COUNT(DISTINCT payload_md5) AS n_distinct,
           |  CAST(COUNT(*) - COUNT(DISTINCT payload_md5) AS BIGINT) AS n_dup_payloads,
           |  CAST(SUM(n_bytes) AS BIGINT) AS total_bytes
           |FROM m
           |GROUP BY media_type
           |ORDER BY media_type""".stripMargin),
    (spark, dir) => {
      Tables.table(spark, dir, "documents")
        .select(
          col("doc_id"),
          when(col("doc_id") % 2 === 0, "image").otherwise("audio").as("media_type"),
          md5(encode(col("text"), "UTF-8")).as("payload_md5"),
          octet_length(encode(col("text"), "UTF-8")).as("n_bytes"))
        .groupBy("media_type")
        .agg(
          count(lit(1)).as("n_payloads"),
          countDistinct(col("payload_md5")).as("n_distinct"),
          (count(lit(1)) - countDistinct(col("payload_md5"))).cast("long").as("n_dup_payloads"),
          sum(col("n_bytes")).cast("long").as("total_bytes"))
        .orderBy("media_type")
    })

  val defs: Seq[QueryDef] = Seq(mmBinaryMeta, mmMetaAgg, mmFrameSample,
    mmResizePlan, mmDedupPayload)
}

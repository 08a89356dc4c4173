package graft.ops

import graft.Materialize.Ops
import graft.QueryDef
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** End-to-end layered pipeline (SURVEY §3.1): the reference's
  * DWD → DWM → DWS → ADS topology composed as one declarative plan —
  * cleanse/split, stream dedup, windowed aggregation, and a final ADS
  * ranking — the full gmall query lifecycle in a single
  * Catalyst-optimized DAG (each layer a DataFrame → DataFrame function,
  * exactly the composition the streaming forms run micro-batch-wise).
  */
object PipelineOps {

  val pipelineDwsE2e = QueryDef(
    "pipeline_dws_e2e",
    Some(s"""WITH dwd AS (
           |  SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts, event_type, value
           |  FROM events WHERE event_type <> 'error'),
           |dwm_uv AS (
           |  SELECT user_id, ts FROM dwd
           |  QUALIFY ROW_NUMBER() OVER (PARTITION BY user_id, CAST(ts AS DATE)
           |                             ORDER BY ts, event_id) = 1),
           |dws AS (
           |  SELECT strftime(date_trunc('day', d.ts), '%Y-%m-%d') AS stt,
           |    COUNT(*) AS pv_ct,
           |    CAST(SUM(CASE WHEN d.event_type = 'purchase' THEN CAST(d.value AS DECIMAL(18,2))
           |              ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE) AS order_amount
           |  FROM dwd d GROUP BY 1),
           |dws_uv AS (
           |  SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS stt, COUNT(*) AS uv_ct
           |  FROM dwm_uv GROUP BY 1)
           |SELECT d.stt, u.uv_ct, d.pv_ct, d.order_amount,
           |  ${graft.QueryDef.roundedRatioSql("d.pv_ct", "u.uv_ct", 2)} AS pv_per_uv
           |FROM dws d JOIN dws_uv u ON d.stt = u.stt
           |ORDER BY d.stt""".stripMargin),
    (spark, dir) => {
      // DWD: cleanse/split — drop the dirty branch (BaseLogApp).
      val dwd = Tables.events(spark, dir).filter(col("event_type") =!= "error")
      // DWM: UV dedup — first event per (user, day) (UniqueVisitApp).
      val w = Window.partitionBy(col("user_id"), to_date(col("ts")))
        .orderBy("ts", "event_id")
      val dwmUv = dwd.withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("user_id"), col("ts"))
      // DWS: daily windowed stats from both layers (VisitorStatsApp).
      val dws = dwd.groupBy(date_format(col("ts"), "yyyy-MM-dd").as("stt"))
        .agg(
          count(lit(1)).as("pv_ct"),
          expr("""CAST(SUM(CASE WHEN event_type = 'purchase' THEN CAST(value AS DECIMAL(18,2))
                 |         ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE)""".stripMargin).as("order_amount"))
      val dwsUv = dwmUv.groupBy(date_format(col("ts"), "yyyy-MM-dd").as("stt"))
        .agg(count(lit(1)).as("uv_ct"))
      // ADS: join the stats and derive ratio metrics (publisher layer).
      dws.join(dwsUv, "stt")
        .select(
          col("stt"), col("uv_ct"), col("pv_ct"), col("order_amount"),
          graft.QueryDef.roundedRatio(col("pv_ct"), col("uv_ct"), 2).as("pv_per_uv"))
        .orderBy("stt")
    })

  /** The canonical training-data prep chain as ONE declarative plan:
    * clean (lowercase, strip non-alphanumerics) → quality gate (≥ 30
    * tokens) → exact dedup on cleaned content (min-doc_id survivor) →
    * deterministic content-hash split → per-(lang, split) corpus
    * stats. Every stage is a narrow transform except the dedup
    * (one shuffle on the content key) and the final agg — at 100 TB
    * the exact-dedup stage swaps for the fingerprint/MinHash stages
    * (`dedup_*`) without touching the rest of the chain. Content-hash
    * splits are partition-independent and auditable (same property as
    * `sample_split`). */
  val pipelineCleanDedupSample = QueryDef(
    "pipeline_clean_dedup_sample",
    Some("""WITH c AS (
           |  SELECT doc_id, lang,
           |    trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g'), ' +', ' ', 'g')) AS clean
           |  FROM documents),
           |q AS (
           |  SELECT *, len(list_filter(string_split(clean, ' '), w -> length(w) > 0)) AS n_tok
           |  FROM c
           |  WHERE len(list_filter(string_split(clean, ' '), w -> length(w) > 0)) >= 30),
           |d AS (
           |  SELECT *, ROW_NUMBER() OVER (PARTITION BY clean ORDER BY doc_id) AS rn FROM q),
           |s AS (
           |  SELECT lang, n_tok,
           |    CASE WHEN substr(md5(clean), 1, 2) < '1a' THEN 'test'
           |         WHEN substr(md5(clean), 1, 2) < '34' THEN 'val'
           |         ELSE 'train' END AS split
           |  FROM d WHERE rn = 1)
           |SELECT lang, split, COUNT(*) AS n_docs,
           |  CAST(SUM(n_tok) AS BIGINT) AS total_tokens
           |FROM s
           |GROUP BY lang, split
           |ORDER BY lang, split""".stripMargin),
    (spark, dir) => {
      val clean = trim(regexp_replace(
        regexp_replace(lower(col("text")), "[^a-z0-9 ]", ""), " +", " "))
      val nTok = size(filter(split(col("clean"), " "), w => length(w) > 0))
      // dedup identity AND split bucket both ride the 128-bit digest,
      // computed map-side — the cleaned text itself never crosses the
      // dedup exchange (`dedup_exact`'s digest-groupBy discipline: at
      // corpus scale the rank shuffle ships 32 hex chars per row, not
      // the document body). The oracle partitions by the clean text —
      // identical groups absent an md5 collision.
      val bucket = substring(col("h"), 1, 2)
      Tables.table(spark, dir, "documents")
        .select(col("doc_id"), col("lang"), clean.as("clean"))
        .withColumn("n_tok", nTok)
        .filter(col("n_tok") >= 30)
        .select(col("doc_id"), col("lang"), col("n_tok"),
          md5(col("clean")).as("h"))
        .withColumn("rn", row_number().over(
          Window.partitionBy("h").orderBy("doc_id")))
        .filter(col("rn") === 1)
        .withColumn("split",
          when(bucket < "1a", "test").when(bucket < "34", "val").otherwise("train"))
        .groupBy("lang", "split")
        .agg(count(lit(1)).as("n_docs"), sum(col("n_tok")).cast("long").as("total_tokens"))
        .orderBy("lang", "split")
    })

  /** Distinct md5-hashed 4-token shingle relation `(doc_id, h)` —
    * the contamination key shared by the batch decontamination forms
    * and the streaming leg ([[graft.streaming.StreamOps
    * .decontaminateIngest]]). In-row `array_distinct` instead of a
    * corpus-wide `distinct()`: the relation reaches its consumer with
    * zero exchanges. */
  private[graft] def shingleHashes(docs: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
    docs
      .select(col("doc_id"),
        filter(split(col("text"), " "), x => length(x) > 0).as("ws"))
      .filter(size(col("ws")) >= 4)
      .select(col("doc_id"), explode(array_distinct(expr(
        "transform(sequence(1, size(ws) - 3), i -> md5(concat_ws(' ', slice(ws, i, 4))))"))).as("h"))

  /** Bloom filter bytes over a shingle relation's `h` column (None for
    * an empty relation — `BloomFilterAggregate` over zero rows yields
    * SQL null). Built once, shipped as a literal into every consumer
    * plan. */
  private[graft] def shingleBloom(sh: org.apache.spark.sql.DataFrame,
      expectedItems: Long = 100000L): Option[Array[Byte]] = {
    import org.apache.spark.sql.GraftBridge
    import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
    Option(sh
      .select(GraftBridge.column(new BloomFilterAggregate(
        GraftBridge.expression(xxhash64(col("h"))), expectedItems)
        .toAggregateExpression()).as("bf"))
      .head().getAs[Array[Byte]]("bf"))
  }

  /** `might_contain(bloomBytes, xxhash64(h))` as a Column — the
    * map-side prefilter (no false negatives, so prefilter + exact
    * verify ≡ the unfiltered exact overlap). */
  private[graft] def bloomMightContain(bloomBytes: Array[Byte],
      h: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.GraftBridge
    import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
    import org.apache.spark.sql.types.BinaryType
    GraftBridge.column(new BloomFilterMightContain(
      Literal(bloomBytes, BinaryType), GraftBridge.expression(xxhash64(h))))
  }

  /** Eval-set decontamination: training docs sharing an n-token
    * shingle with any benchmark/eval doc are flagged with the overlap
    * count — the step that keeps test sets out of training corpora.
    * The eval set here is the deterministic doc_id % 23 slice (a
    * stand-in for an external benchmark table); 4-token shingles are
    * tuned to these short synthetic docs (real pipelines use 8–13).
    *
    * Scale design: shingles are md5-hashed to fixed 32-char keys
    * before the join so shuffle rows stay narrow; the eval side is
    * benchmark-sized (thousands of docs, not corpus-sized) and is
    * broadcast — the training corpus is never shuffled at all, the
    * contamination check is a map-side hash probe per shingle. */
  val decontaminateNgram = QueryDef(
    "decontaminate_ngram",
    Some("""WITH w AS (SELECT doc_id, list_filter(string_split(text, ' '), x -> length(x) > 0) AS ws FROM documents),
           |g AS (SELECT doc_id, ws, unnest(generate_series(1, len(ws) - 3)) AS i FROM w WHERE len(ws) >= 4),
           |sh AS (SELECT DISTINCT doc_id, md5(array_to_string(ws[i:i+3], ' ')) AS h FROM g)
           |SELECT t.doc_id AS train_doc, e.doc_id AS eval_doc, COUNT(*) AS n_shared
           |FROM sh t JOIN sh e ON t.h = e.h
           |WHERE t.doc_id % 23 <> 0 AND e.doc_id % 23 = 0
           |GROUP BY t.doc_id, e.doc_id
           |ORDER BY train_doc, eval_doc""".stripMargin),
    (spark, dir) => {
      // ONE shingle definition ([[shingleHashes]]) shared with the
      // bloom and streaming forms — shingle width or hash changes land
      // in one place, and the three decontamination legs cannot drift
      val sh = shingleHashes(Tables.table(spark, dir, "documents"))
      val train = sh.filter(col("doc_id") % 23 =!= 0).as("t")
      val eval_ = sh.filter(col("doc_id") % 23 === 0).as("e")
      train.join(broadcast(eval_), col("t.h") === col("e.h"))
        .select(col("t.doc_id").as("train_doc"), col("e.doc_id").as("eval_doc"))
        .groupBy("train_doc", "eval_doc")
        .agg(count(lit(1)).as("n_shared"))
        .orderBy("train_doc", "eval_doc")
    })

  /** Bloom-prefiltered eval-set decontamination — the 100 TB form of
    * `decontaminate_ngram`. A bloom filter is built ONCE over the
    * eval-set shingle hashes (Catalyst's `BloomFilterAggregate`, the
    * same machinery Spark's runtime row-group filters use) and shipped
    * as a literal to every train-side task, which discards ~all clean
    * rows before the exact broadcast-join verify. Because a bloom
    * filter has no false negatives, prefilter + exact verify returns
    * EXACTLY the unfiltered overlap — so the DuckDB oracle is the plain
    * exact computation, and any bloom bug fails the hash compare.
    * The driver-side `head` materializes one aggregated row (the
    * filter bytes — an index-build artifact, same precedent as
    * `buildIvfIndex`), not data rows. */
  val decontaminateBloom = QueryDef(
    "decontaminate_bloom",
    Some("""WITH w AS (SELECT doc_id, list_filter(string_split(text, ' '), x -> length(x) > 0) AS ws FROM documents),
           |g AS (SELECT doc_id, ws, unnest(generate_series(1, len(ws) - 3)) AS i FROM w WHERE len(ws) >= 4),
           |sh AS (SELECT DISTINCT doc_id, md5(array_to_string(ws[i:i+3], ' ')) AS h FROM g),
           |tr AS (SELECT * FROM sh WHERE doc_id % 23 <> 0),
           |ev AS (SELECT * FROM sh WHERE doc_id % 23 = 0)
           |SELECT tr.doc_id AS train_doc,
           |  CAST(COUNT(DISTINCT tr.h) AS BIGINT) AS n_shingles,
           |  CAST(COUNT(DISTINCT ev.doc_id) AS BIGINT) AS n_eval_docs
           |FROM tr JOIN ev ON tr.h = ev.h
           |GROUP BY tr.doc_id
           |ORDER BY train_doc""".stripMargin),
    (spark, dir) => {
      val sh = shingleHashes(Tables.table(spark, dir, "documents"))
      val train = sh.filter(col("doc_id") % 23 =!= 0).as("t")
      // eval side is read twice (bloom build + exact verify): pin it
      val eval_ = sh.filter(col("doc_id") % 23 === 0).materialized.as("e")
      val bloomBytes = shingleBloom(eval_).getOrElse(
        throw new IllegalStateException("empty eval slice"))
      train.filter(bloomMightContain(bloomBytes, col("t.h")))
        .join(broadcast(eval_), col("t.h") === col("e.h"))
        .groupBy(col("t.doc_id").as("train_doc"))
        .agg(
          countDistinct(col("t.h")).as("n_shingles"),
          countDistinct(col("e.doc_id")).as("n_eval_docs"))
        .orderBy("train_doc")
    })

  /** One slim `(id, band_id, sig)` row per (vector, sign-band) — the
    * candidate key of `decontaminate_embedding`, shared with the
    * streaming leg ([[graft.streaming.StreamOps
    * .decontaminateEmbeddingIngest]]) so the band family cannot drift
    * between the batch oracle and the stream. */
  private[graft] def signBandRows(vecs: org.apache.spark.sql.DataFrame,
      idCol: String): org.apache.spark.sql.DataFrame =
    vecs.select(col("vec_id").as(idCol), posexplode(array(
        (0 until 4).map(b => Similarity.sparkBand(col("embedding"), b)): _*)))
      .select(col(idCol), col("pos").as("band_id"), col("col").as("sig"))

  /** `(vec_id, embedding, norm)` with the deterministic fold-order
    * norm — the verify side of both decontamination legs. */
  private[graft] def normedVecs(vecs: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
    vecs.select(col("vec_id"), col("embedding"),
      sqrt(Similarity.dot(col("embedding"), col("embedding"))).as("norm"))

  /** SEMANTIC eval-set decontamination: training vectors whose
    * embedding is cosine-close to any benchmark/eval vector — the
    * paraphrase-contamination check the n-gram forms cannot see
    * (reworded eval questions share no 4-token shingle but sit next to
    * the original in embedding space). Eval set = the deterministic
    * `vec_id % 23` slice, mirroring `decontaminate_ngram`'s split.
    *
    * Candidates come from an OR-AMPLIFIED 4-band sign-LSH: band b is
    * the 8 sign bits of dimensions 8b+1..8b+8, and a (train, eval)
    * pair colliding in ANY band is a candidate — the recall direction
    * of the band trick (the dedup family's single bucket is the
    * precision direction; decontamination must not miss a
    * contaminated doc because one of 8 leading signs flipped). The
    * exact-cosine verify then keeps pairs at ≥ 0.30, so band recall
    * only ever ADDS candidates, never changes a confirmed score.
    *
    * Scale shape: ONE train scan exploded to 4 slim band rows per
    * vector, broadcast-joined against the benchmark-sized eval band
    * relation (the train corpus never shuffles); the distinct
    * candidate set — bounded by |eval| × per-eval collision mass, the
    * decontamination working set — broadcasts back onto the train
    * scan for the exact verify, and the eval embeddings ride a second
    * broadcast. Zero corpus-side exchanges end to end. */
  val decontaminateEmbedding = QueryDef(
    "decontaminate_embedding",
    Some(s"""WITH e AS (SELECT vec_id, embedding,
            |    ${Similarity.bandExpr("embedding", 0)} AS band0,
            |    ${Similarity.bandExpr("embedding", 1)} AS band1,
            |    ${Similarity.bandExpr("embedding", 2)} AS band2,
            |    ${Similarity.bandExpr("embedding", 3)} AS band3
            |  FROM embeddings),
            |tr AS (SELECT * FROM e WHERE vec_id % 23 <> 0),
            |ev AS (SELECT * FROM e WHERE vec_id % 23 = 0),
            |cand AS (SELECT DISTINCT t.vec_id AS tv, ev.vec_id AS evv
            |  FROM tr t JOIN ev ON t.band0 = ev.band0 OR t.band1 = ev.band1
            |    OR t.band2 = ev.band2 OR t.band3 = ev.band3),
            |j AS (SELECT c.tv, c.evv,
            |  ${Similarity.dd("a.embedding", "b.embedding")}
            |    / (sqrt(${Similarity.dd("a.embedding", "a.embedding")})
            |     * sqrt(${Similarity.dd("b.embedding", "b.embedding")})) AS cos
            |  FROM cand c JOIN tr a ON a.vec_id = c.tv JOIN ev b ON b.vec_id = c.evv)
            |SELECT tv AS train_vec, evv AS eval_vec, ROUND(cos, 6) AS cos_sim
            |FROM j WHERE cos >= 0.30
            |ORDER BY train_vec, eval_vec""".stripMargin),
    (spark, dir) => {
      val e = Tables.table(spark, dir, "embeddings")
      // eval side is benchmark-sized and read three times (band rows,
      // verify embeddings) — pin it once
      val evSide = normedVecs(e.filter(col("vec_id") % 23 === 0)).materialized
      semContamPairs(e.filter(col("vec_id") % 23 =!= 0), evSide, 0.30)
        .orderBy("train_vec", "eval_vec")
    })

  /** The shared candidate+verify chain of both `decontaminate_embedding`
    * legs: OR-amplified band candidates (train scan broadcast-joined
    * against the pinned eval band rows), distinct pair set broadcast
    * back onto the train side, exact-cosine verify ≥ `minCos`. `evSide`
    * must be the PINNED [[normedVecs]] relation (it is read twice).
    * Output: `(train_vec, eval_vec, cos_sim)` unordered. */
  private[graft] def semContamPairs(train: org.apache.spark.sql.DataFrame,
      evSide: org.apache.spark.sql.DataFrame,
      minCos: Double): org.apache.spark.sql.DataFrame =
    semContamPairsPre(train, signBandRows(evSide, "evv"), evSide, minCos)

  /** [[semContamPairs]] over a PRE-BANDED eval side — `evBands` =
    * `(evv, band_id, sig)`, `evVecs` = `(vec_id, embedding, norm)` —
    * so a caller holding the eval artifact on disk (the persisted
    * index below) never re-bands the benchmark per micro-batch. Both
    * eval relations are benchmark-sized and ride broadcasts; the
    * train side's shape is unchanged (zero corpus-side exchanges). */
  private[graft] def semContamPairsPre(train: org.apache.spark.sql.DataFrame,
      evBands: org.apache.spark.sql.DataFrame,
      evVecs: org.apache.spark.sql.DataFrame,
      minCos: Double): org.apache.spark.sql.DataFrame = {
    val cands = signBandRows(train, "tv")
      .join(broadcast(evBands), Seq("band_id", "sig"))
      .select("tv", "evv").distinct()
    val cos = Similarity.dot(col("embedding"), col("ee")) /
      (col("tnorm") * col("enorm"))
    normedVecs(train)
      .select(col("vec_id").as("tv"), col("embedding"),
        col("norm").as("tnorm"))
      .join(broadcast(cands), Seq("tv"))
      .join(broadcast(evVecs.select(col("vec_id").as("evv"),
        col("embedding").as("ee"), col("norm").as("enorm"))), Seq("evv"))
      .filter(cos >= minCos)
      .select(col("tv").as("train_vec"), col("evv").as("eval_vec"),
        round(cos, 6).as("cos_sim"))
  }

  /** PERSISTED eval-side artifact for semantic decontamination — the
    * per-stream in-memory pin ([[graft.streaming.StreamOps
    * .buildEvalSemIndex]]) promoted to an on-disk index many streams
    * and restarts SHARE, with eval-set updates as one atomic manifest
    * swap (the [[graft.GenManifest]] discipline of the LSH/IVF
    * indexes, sign-LSH flavor). Layout per generation — eval sets are
    * benchmark-sized (broadcast side by construction), so plain
    * unpartitioned parquet: `evvec_g<gen>` holds the normed vectors
    * `(vec_id, embedding, norm)` and `evband_g<gen>` their
    * OR-amplified 4-band sign rows `(evv, band_id, sig)`, precomputed
    * once at publish so serving never re-bands the benchmark. Both
    * directories land fully BEFORE the manifest commit (a torn
    * publish is invisible); keep-two GC retires superseded eval sets
    * two updates later, never under a reader pinned to the previous
    * manifest. */
  private val evalSemPrefixes = Seq("evvec", "evband")
  private val evBandReadSchema = org.apache.spark.sql.types.StructType.fromDDL(
    "evv BIGINT, band_id INT, sig STRING")
  private val evVecReadSchema = org.apache.spark.sql.types.StructType.fromDDL(
    "vec_id BIGINT, embedding ARRAY<FLOAT>, norm DOUBLE")

  private def writeEvalSemGen(evalVecs: org.apache.spark.sql.DataFrame,
      indexDir: String, gen: Long): Unit = {
    normedVecs(evalVecs).select("vec_id", "embedding", "norm")
      .write.mode("overwrite").parquet(s"$indexDir/evvec_g$gen")
    signBandRows(evalVecs, "evv")
      .write.mode("overwrite").parquet(s"$indexDir/evband_g$gen")
    // the uniform identity token (graft.GenLifecycle): persistEvalSem
    // resets the chain and re-uses gen 0, so any driver-local cache of
    // eval content must key on this, never on (dir, gen)
    graft.GenLifecycle.writeGenId(evalVecs.sparkSession,
      s"$indexDir/evvec_g$gen")
  }

  def persistEvalSemIndex(evalVecs: org.apache.spark.sql.DataFrame,
      indexDir: String): Unit = {
    val spark = evalVecs.sparkSession
    graft.GenManifest.reset(spark, indexDir, evalSemPrefixes)
    writeEvalSemGen(evalVecs, indexDir, gen = 0)
    graft.GenManifest.commit(spark, indexDir, seq = 0, gen = 0, floor = -1)
  }

  /** Replace the eval set: the next generation lands fully, one
    * atomic manifest rename swaps every serving stream to it at its
    * NEXT micro-batch (each batch resolves the manifest — O(1)), and
    * keep-two GC retires the superseded artifact safely later. */
  def updateEvalSemIndex(evalVecs: org.apache.spark.sql.DataFrame,
      indexDir: String): Unit = {
    val spark = evalVecs.sparkSession
    val st = graft.GenLifecycle.resolveOrThrow(spark, indexDir,
      "eval", "persistEvalSemIndex")
    writeEvalSemGen(evalVecs, indexDir, st.gen + 1)
    graft.GenManifest.commit(spark, indexDir, st.seq + 1, st.gen + 1, st.floor)
    graft.GenManifest.gc(spark, indexDir, evalSemPrefixes)
  }

  /** The LIVE generation's `(evBands, evVecs)` relations — explicit
    * read schemas (an EMPTY eval set writes only `_SUCCESS`;
    * inference would throw). One manifest resolve per call. */
  private[graft] def resolveEvalSemIndex(spark: org.apache.spark.sql.SparkSession,
      indexDir: String): (org.apache.spark.sql.DataFrame, org.apache.spark.sql.DataFrame) = {
    val st = graft.GenLifecycle.resolveOrThrow(spark, indexDir,
      "eval", "persistEvalSemIndex")
    (spark.read.schema(evBandReadSchema).parquet(s"$indexDir/evband_g${st.gen}"),
      spark.read.schema(evVecReadSchema).parquet(s"$indexDir/evvec_g${st.gen}"))
  }

  /** Incremental aggregation maintenance (the foreachBatch pattern as
    * a provable batch query): a "materialized" aggregate over the
    * history (days before the cut) is merged with a fresh delta
    * aggregate (days at/after the cut) by re-aggregating the two
    * partial states — the oracle is the DIRECT aggregation over all
    * events, so the check proves partial-state merge ≡ full recompute.
    * This is the algebra every streaming DWS sink relies on when it
    * folds each micro-batch into a stats table (sum/count merge; avg
    * is derived, never merged). Decimal-routed sums make the merge
    * order-independent — the partition/batch boundary cannot change
    * the result, which is precisely the property being certified.
    * At 100 TB the base side reads a compacted stats table, not the
    * raw history; the shape (union of partials → one small groupBy) is
    * identical. */
  val pipelineIncrAgg = QueryDef(
    "pipeline_incr_agg",
    Some("""SELECT event_type,
           |  COUNT(*) AS n_events,
           |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value,
           |  COUNT(DISTINCT user_id) AS n_users
           |FROM events
           |GROUP BY event_type
           |ORDER BY event_type""".stripMargin),
    (spark, dir) => {
      val ev = Tables.events(spark, dir)
        .select(col("event_type"), col("user_id"),
          col("value").cast("decimal(18,2)").as("v"),
          to_date(col("ts")).as("day"))
      val cut = "2024-01-20"
      // partial state per side: additive counters + the distinct-merge
      // carrier (collect_set is the mergeable form of count-distinct;
      // a production stats table would hold an HLL sketch — same
      // algebra, see HllDistinctLongCount)
      def partial(df: org.apache.spark.sql.DataFrame) =
        df.groupBy("event_type")
          .agg(count(lit(1)).as("n"), sum(col("v")).as("sv"),
            collect_set(col("user_id")).as("users"))
      val base = partial(ev.filter(col("day") < lit(cut)))
      val delta = partial(ev.filter(col("day") >= lit(cut)))
      base.unionByName(delta)
        .groupBy("event_type")
        .agg(
          sum(col("n")).as("n_events"),
          expr("CAST(SUM(sv) AS DOUBLE)").as("total_value"),
          size(array_distinct(flatten(collect_list(col("users"))))).cast("long").as("n_users"))
        .orderBy("event_type")
    })

  val defs: Seq[QueryDef] =
    Seq(pipelineDwsE2e, pipelineCleanDedupSample, decontaminateNgram,
      decontaminateBloom, decontaminateEmbedding, pipelineIncrAgg)
}

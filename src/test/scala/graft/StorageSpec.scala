package graft

import org.apache.spark.sql.functions._

/** Storage-layout behaviors the engine depends on at 100 TB: partition
  * pruning on partitioned output, and schema evolution across file
  * generations. */
class StorageSpec extends SparkSuite {
  import spark.implicits._

  test("date-partitioned output is partition-pruned on read") {
    val dir = java.nio.file.Files.createTempDirectory("part").toString
    graft.ops.Tables.events(spark, sf("sf0.001"))
      .withColumn("day", date_format(col("ts"), "yyyy-MM-dd"))
      .write.partitionBy("day").mode("overwrite").parquet(s"$dir/events_by_day")
    val read = spark.read.parquet(s"$dir/events_by_day")
      .filter(col("day") === "2024-01-05")
    assert(read.collect().nonEmpty)
    // pruning proof: the predicate became a partition filter AND the
    // executed scan touched exactly one file (runtime metric, not just
    // plan text)
    val plan = read.queryExecution.executedPlan
    assert(plan.toString.matches("(?s).*PartitionFilters: \\[[^\\]]*2024-01-05[^\\]]*\\].*"),
      plan.toString)
    val scans = plan.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }
    assert(scans.head.metrics("numFiles").value === 1L)
  }

  test("IVF corpus written partitionBy(label): a probe reads only nprobe partitions") {
    import graft.ops.Similarity
    // the cluster-scale layout the IVF scaladoc promises: corpus
    // partitioned by coarse-cluster label on disk, so a probe touching
    // nprobe clusters is partition pruning, not a full scan
    val dir = java.nio.file.Files.createTempDirectory("ivf-layout").toString
    val idx = Similarity.buildIvfIndex(spark, sf("sf0.001"))
    idx.corpus.write.partitionBy("label").mode("overwrite")
      .parquet(s"$dir/corpus")
    val labels = idx.corpus.select("label").distinct()
      .collect().map(_.getInt(0)).sorted
    assert(labels.length > 2, s"need >2 coarse clusters, got ${labels.length}")
    val nprobe = labels.take(2)
    val disk = spark.read.parquet(s"$dir/corpus")
    val probe = disk.filter(col("label").isin(nprobe: _*))
    val got = probe.collect()
    assert(got.nonEmpty)
    assert(got.map(_.getAs[Int]("label")).toSet === nprobe.toSet)
    val plan = probe.queryExecution.executedPlan
    assert(plan.toString.contains("PartitionFilters"), plan.toString)
    // runtime proof: files touched = files under the two label dirs,
    // strictly fewer than the table's total file count
    val scans = plan.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }
    val touched = scans.head.metrics("numFiles").value
    val all = disk.inputFiles.length.toLong
    assert(touched < all, s"probe touched $touched of $all files — no pruning")
  }

  test("mergeSchema reads across file generations with evolved schemas") {
    val dir = java.nio.file.Files.createTempDirectory("evolve").toString
    Seq((1L, "alpha")).toDF("doc_id", "text")
      .write.parquet(s"$dir/gen/v1")
    Seq((2L, "beta", "en")).toDF("doc_id", "text", "lang")
      .write.parquet(s"$dir/gen/v2")
    val merged = spark.read.option("mergeSchema", "true").parquet(s"$dir/gen/*")
    assert(merged.columns.toSet === Set("doc_id", "text", "lang"))
    val rows = merged.select("doc_id", "lang")
      .as[(Long, Option[String])].collect().toMap
    assert(rows === Map(1L -> None, 2L -> Some("en")))
  }

  test("sort-clustered layout skips parquet row groups on a selective filter") {
    // the Z-order/clustering principle at 100 TB: laying data out
    // sorted by a filter column lets parquet min/max row-group stats
    // discard non-matching groups at scan time. Same rows, same
    // query — the sorted layout reads fewer rows off disk.
    val dir = java.nio.file.Files.createTempDirectory("cluster").toString
    val ev = graft.ops.Tables.events(spark, sf("sf0.01")).select("event_id", "event_type", "value")
    val rg = Map("parquet.block.size" -> "65536") // small row groups so sf0.01 has many
    ev.repartition(1)
      .write.options(rg).mode("overwrite").parquet(s"$dir/unsorted")
    ev.repartition(1).sortWithinPartitions("event_type")
      .write.options(rg).mode("overwrite").parquet(s"$dir/sorted")
    def rowsRead(path: String): Long = {
      val df = spark.read.parquet(path).filter(col("event_type") === "purchase")
      df.collect()
      val scan = df.queryExecution.executedPlan.collect {
        case f: org.apache.spark.sql.execution.FileSourceScanExec => f
      }.head
      scan.metrics("numOutputRows").value
    }
    val (unsorted, sorted) = (rowsRead(s"$dir/unsorted"), rowsRead(s"$dir/sorted"))
    // both return identical query results; the sorted layout's scan
    // emits far fewer rows because whole row groups are skipped
    assert(sorted < unsorted / 2, s"sorted=$sorted unsorted=$unsorted")
  }

  test("z-order layout skips row groups on filters over EITHER clustered column") {
    // single-column sort gives min/max skipping only on the leading
    // column; interleaving the bits of two columns (Z-order) makes a
    // range filter on EITHER column land in a bounded region of the
    // sort key, so both filters skip row groups. This is the layout
    // decision for a 100 TB fact table with two independent selective
    // filter dimensions.
    import org.apache.spark.sql.Column
    def bitInterleave(x: Column, y: Column, bits: Int): Column =
      (0 until bits).map { i =>
        shiftleft(shiftright(x, i).bitwiseAND(lit(1L)), 2 * i) +
          shiftleft(shiftright(y, i).bitwiseAND(lit(1L)), 2 * i + 1)
      }.reduce(_ + _)
    val dir = java.nio.file.Files.createTempDirectory("zorder").toString
    // sf0.1 (1 M events): all-long rows encode small, so the sf0.01
    // slice fits one row group and nothing could ever skip
    val ev = graft.ops.Tables.events(spark, sf("sf0.1"))
      .select(col("event_id"),
        pmod(col("user_id"), lit(1024L)).as("x"),
        pmod((col("value") * 100).cast("long"), lit(1024L)).as("y"))
    val rg = Map("parquet.block.size" -> "65536")
    ev.repartition(1).sortWithinPartitions("x")
      .write.options(rg).mode("overwrite").parquet(s"$dir/xsorted")
    ev.withColumn("z", bitInterleave(col("x"), col("y"), 10))
      .repartition(1).sortWithinPartitions("z").drop("z")
      .write.options(rg).mode("overwrite").parquet(s"$dir/zorder")
    def rowsRead(path: String, filter: Column): Long = {
      val df = spark.read.parquet(path).filter(filter)
      df.collect()
      df.queryExecution.executedPlan.collect {
        case f: org.apache.spark.sql.execution.FileSourceScanExec => f
      }.head.metrics("numOutputRows").value
    }
    // the y filter on the x-sorted layout hits every row group (y is
    // uniform within each group) — the no-skipping baseline
    val xsortedOnY = rowsRead(s"$dir/xsorted", col("y") < 32)
    val zorderOnY = rowsRead(s"$dir/zorder", col("y") < 32)
    val zorderOnX = rowsRead(s"$dir/zorder", col("x") < 32)
    assert(zorderOnY < xsortedOnY / 2, s"z=$zorderOnY xsorted=$xsortedOnY")
    assert(zorderOnX < xsortedOnY / 2, s"z=$zorderOnX xsorted=$xsortedOnY")
  }

  test("skew soak: one cell holding ~all rows writes bounded files and probe pruning survives") {
    // the writeCellClustered worst case (single-shingle corpus / one
    // hot IVF cluster): 95% of 300k rows land in ONE cell with a 10k
    // per-cell bound. The per-file row bound is HARD (maxRecordsPerFile
    // rolls files at the limit, so slot-hash collisions can never
    // produce an unbounded file — a measured 3-slot collision used to
    // breach the old ~2× soft bound exactly here); the write must also
    // conserve every row, keep cold cells one file each, and leave
    // path-level pruning untouched on both sides of the split.
    val dir = java.nio.file.Files.createTempDirectory("skew-soak").toString + "/cells"
    val n = 300000L
    val hotRows = 285000L
    val maxCell = 10000L
    val df = spark.range(n).select(
      when(col("id") < hotRows, lit("hot"))
        .otherwise(concat(lit("c"), pmod(col("id"), lit(50L)))).as("cell"),
      col("id").as("k"))
    graft.ops.Storage.writeCellClustered(df, Seq("cell"), "k", dir, maxCell)
    assert(spark.read.parquet(dir).count() === n, "rows lost or duplicated")
    // measured per-file row counts inside the hot cell
    val perFile = spark.read.parquet(s"$dir/cell=hot")
      .groupBy(input_file_name().as("f")).count()
      .collect().map(r => r.getLong(1))
    assert(perFile.sum === hotRows)
    assert(perFile.max <= maxCell,
      s"hot-cell file of ${perFile.max} rows breaches the hard bound (files: ${perFile.sorted.reverse.take(5).toSeq})")
    // genuinely split: at least half the ideal slot count of files
    val idealSlots = math.ceil(hotRows.toDouble / maxCell).toLong
    assert(perFile.length >= idealSlots / 2,
      s"hot cell wrote only ${perFile.length} files for $idealSlots slots — AQE re-coalesced the split")
    // cold cells keep the one-file-per-cell layout
    val coldFiles = spark.read.parquet(s"$dir/cell=c7").inputFiles
    assert(coldFiles.length === 1, s"cold cell fragmented: ${coldFiles.length} files")
    // pruning: a probe of either side touches only its own directory
    val probeCold = spark.read.option("basePath", dir).parquet(s"$dir/cell=c7")
    assert(probeCold.count() > 0 && probeCold.inputFiles.forall(_.contains("/cell=c7/")))
    val probeHot = spark.read.option("basePath", dir).parquet(s"$dir/cell=hot")
    assert(probeHot.count() === hotRows && probeHot.inputFiles.forall(_.contains("/cell=hot/")))
  }

  test("small-files compaction hits the size target and preserves rows and clustering") {
    val dir = java.nio.file.Files.createTempDirectory("compact").toString
    val ev = graft.ops.Tables.events(spark, sf("sf0.01"))
      .select("event_id", "event_type", "value")
    // a streaming sink's aftermath: 64 KB-scale files
    ev.repartition(64).write.mode("overwrite").parquet(s"$dir/small")
    def files(p: String) = new java.io.File(p).listFiles()
      .filter(_.getName.endsWith(".parquet"))
    assert(files(s"$dir/small").length === 64)
    val totalBytes = files(s"$dir/small").map(_.length).sum
    val target = totalBytes / 4 // expect ~4-5 output files
    val n = graft.ops.Storage.compact(spark, s"$dir/small", s"$dir/big", target)
    assert(files(s"$dir/big").length === n)
    assert(n <= 6, s"expected ~5 files, got $n")
    // row multiset identical
    assert(spark.read.parquet(s"$dir/big").exceptAll(ev).count() === 0L)
    assert(ev.exceptAll(spark.read.parquet(s"$dir/big")).count() === 0L)
    // clusterBy variant: each output file covers a disjoint range of
    // the cluster column (range partitioning), so min/max row-group /
    // file skipping survives compaction
    graft.ops.Storage.compact(spark, s"$dir/small", s"$dir/clustered",
      target, clusterBy = Some("event_type"))
    val perFileTypes = files(s"$dir/clustered").map { f =>
      spark.read.parquet(f.getPath)
        .select("event_type").distinct().as[String].collect().toSet
    }
    for (Seq(a, b) <- perFileTypes.toSeq.combinations(2))
      assert((a intersect b).size <= 1, // adjacent files may share a boundary value
        s"cluster ranges overlap: $a vs $b")
  }
}

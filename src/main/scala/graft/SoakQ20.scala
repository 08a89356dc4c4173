package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** VERDICT r15 item 4: the q20 restrict-below-aggregate rewrite (one
  * conditional aggregation over a red-part-presemi'd lineitem scan,
  * replacing two scans + two corpus shuffles) was proven at sf0.1 only;
  * the repo's r14 rule says pipeline-SHAPE changes must be re-measured
  * at soak scale before their magnitude is believed. This probe blows
  * lineitem up ×factor (part is NOT blown up, so the red-part
  * selectivity and the broadcast side stay SF-realistic: lineitem rows
  * per part grow, which is exactly the 100 TB direction), re-expresses
  * BOTH shapes over the blown-up table, proves them row-identical, and
  * times them interleaved (3 alternating pairs, min + median reported).
  *
  * Usage: SPARK_GRAFT_CPUS=32 sbt "runMain graft.SoakQ20 [factor]"
  */
object SoakQ20 {
  def main(args: Array[String]): Unit = {
    val factor = if (args.nonEmpty) args(0).toInt else 100
    val baseDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", math.max(cpus.toInt, factor))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000L).selectExpr("sum(id)").collect()

    // lineitem ×factor: replicas keep their (partkey, suppkey) pair —
    // per-pair row mass grows ×factor, the conditional aggregation's
    // group count stays fixed (the skew-free 100 TB direction); orderkey
    // jittered so rows aren't byte-identical.
    val out = s"/tmp/graft-soak-q20-x$factor"
    val l = graft.ops.Tables.table(spark, baseDir, "lineitem")
    l.crossJoin(spark.range(factor.toLong).toDF("r"))
      .select(
        (col("l_orderkey") * factor + col("r")).as("l_orderkey"),
        col("l_partkey"), col("l_suppkey"), col("l_linenumber"),
        col("l_quantity"), col("l_extendedprice"), col("l_discount"),
        col("l_tax"), col("l_returnflag"), col("l_linestatus"),
        col("l_shipdate"))
      .write.mode("overwrite").parquet(s"$out/lineitem.parquet")
    for (t <- Seq("part", "supplier", "nation", "region"))
      graft.ops.Tables.table(spark, baseDir, t)
        .write.mode("overwrite").parquet(s"$out/$t.parquet")
    graft.ops.Tables.invalidate(out)

    def redParts = graft.ops.Tables.table(spark, out, "part")
      .filter(col("p_name").like("%red%")).select(col("p_partkey"))
    def supProbe(qualifying: DataFrame): DataFrame = {
      val s = graft.ops.Tables.table(spark, out, "supplier")
      val n = graft.ops.Tables.table(spark, out, "nation")
      val r = graft.ops.Tables.table(spark, out, "region")
        .filter(col("r_name") === "EUROPE")
      s.join(broadcast(n), n("n_nationkey") === s("s_nationkey"))
        .join(broadcast(r), r("r_regionkey") === n("n_regionkey"))
        .join(qualifying, col("l_suppkey") === s("s_suppkey"), "left_semi")
        .select(col("s_name"), col("n_name"))
        .orderBy("s_name", "n_name")
    }

    // NEW shape (the committed q20): one conditional aggregation over a
    // presemi'd scan
    def newShape: DataFrame = {
      val qualifying = graft.ops.Tables.table(spark, out, "lineitem")
        .join(broadcast(redParts),
          col("p_partkey") === col("l_partkey"), "left_semi")
        .groupBy(col("l_partkey"), col("l_suppkey"))
        .agg(
          sum(col("l_quantity").cast("decimal(18,2)"))
            .cast("decimal(18,2)").as("ps_availqty"),
          sum(when(
            col("l_shipdate") >= lit("1995-01-01").cast("timestamp") &&
              col("l_shipdate") < lit("1996-01-01").cast("timestamp"),
            col("l_quantity").cast("decimal(18,2)"))).as("q95"))
        .filter(expr("q95 * 3 > ps_availqty * 2"))
        .select(col("l_suppkey")).distinct()
      supProbe(qualifying)
    }

    // OLD shape (pre-d80fd69): two lineitem scans — all-time `ps` and
    // 1995 `shipped` as separate aggregations joined on the pair key,
    // red-part semi applied to the JOINED result (above the aggregates)
    def oldShape: DataFrame = {
      val li = graft.ops.Tables.table(spark, out, "lineitem")
      val ps = li.groupBy(col("l_partkey").as("ps_partkey"),
          col("l_suppkey").as("ps_suppkey"))
        .agg(sum(col("l_quantity").cast("decimal(18,2)"))
          .cast("decimal(18,2)").as("ps_availqty"))
      val shipped = li
        .filter(col("l_shipdate") >= lit("1995-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1996-01-01").cast("timestamp"))
        .groupBy(col("l_partkey"), col("l_suppkey"))
        .agg(sum(col("l_quantity").cast("decimal(18,2)")).as("q95"))
      // faithful to the pre-d80fd69 code: the red-part semi had no
      // broadcast hint and sat ABOVE the two aggregations
      val qualifying = shipped
        .join(ps, col("ps_partkey") === col("l_partkey") &&
          col("ps_suppkey") === col("l_suppkey"))
        .join(redParts, col("p_partkey") === col("l_partkey"), "left_semi")
        .filter(expr("q95 * 3 > ps_availqty * 2"))
        .select(col("l_suppkey")).distinct()
      supProbe(qualifying)
    }

    val newRows = newShape.collect().map(_.toString).sorted
    val oldRows = oldShape.collect().map(_.toString).sorted
    require(newRows.sameElements(oldRows),
      s"shapes disagree: new=${newRows.length} old=${oldRows.length} rows")
    println(s"[soak-q20] shapes row-identical (${newRows.length} rows) at x$factor")

    def t(df: => DataFrame): Double = {
      val t0 = System.nanoTime()
      Bench.evaluateFully(df)
      (System.nanoTime() - t0) / 1e9
    }
    // interleaved pairs, min + median per shape
    var tNew = List.empty[Double]; var tOld = List.empty[Double]
    t(newShape); t(oldShape) // warmup
    for (_ <- 1 to 3) { tNew ::= t(newShape); tOld ::= t(oldShape) }
    def stats(xs: List[Double]) = f"min=${xs.min}%.2fs med=${Bench.median(xs)}%.2fs"
    println(s"[soak-q20] x$factor NEW one-pass conditional agg: ${stats(tNew)}")
    println(s"[soak-q20] x$factor OLD two-scan ps join shipped:  ${stats(tOld)}")
    println(f"[soak-q20] ratio new/old (min) = ${tNew.min / tOld.min}%.2f")
    spark.stop()
  }
}

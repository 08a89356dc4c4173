package graft

import graft.streaming.JdbcBatchSink
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Recording mock of the minimal JDBC surface the sink touches
  * (prepareStatement / setObject / addBatch / executeBatch / close),
  * built on dynamic proxies so no JDBC driver is needed. Local-mode
  * executors share the JVM, so the static log observes executor-side
  * calls. */
object MockJdbc {
  import java.lang.reflect.{InvocationHandler, Method, Proxy}
  val log = new java.util.concurrent.ConcurrentLinkedQueue[String]()
  def clear(): Unit = log.clear()
  def entries: Seq[String] = { val it = log.iterator(); Iterator.continually(it).takeWhile(_.hasNext).map(_.next()).toSeq }

  private def default(t: Class[_]): AnyRef = t match {
    case java.lang.Boolean.TYPE => java.lang.Boolean.FALSE
    case java.lang.Integer.TYPE => Integer.valueOf(0)
    case java.lang.Long.TYPE => java.lang.Long.valueOf(0L)
    case java.lang.Void.TYPE => null
    case _ => null
  }

  private def pstmt(): java.sql.PreparedStatement = {
    val binds = scala.collection.mutable.TreeMap[Int, Any]()
    var pending = 0
    val h = new InvocationHandler {
      override def invoke(p: AnyRef, m: Method, args: Array[AnyRef]): AnyRef = m.getName match {
        case "setObject" =>
          binds(args(0).asInstanceOf[Integer].intValue()) = args(1); null
        case "addBatch" =>
          log.add("row " + binds.toSeq.map { case (k, v) => s"$k=$v" }.mkString(","))
          pending += 1; null
        case "executeBatch" =>
          log.add(s"flush $pending"); val r = new Array[Int](pending); pending = 0; r
        case "close" => null
        case _ => default(m.getReturnType)
      }
    }
    Proxy.newProxyInstance(getClass.getClassLoader,
      Array(classOf[java.sql.PreparedStatement]), h)
      .asInstanceOf[java.sql.PreparedStatement]
  }

  def connection(): java.sql.Connection = {
    val h = new InvocationHandler {
      override def invoke(p: AnyRef, m: Method, args: Array[AnyRef]): AnyRef = m.getName match {
        case "prepareStatement" => log.add(s"prepare ${args(0)}"); pstmt()
        case "close" => null
        case _ => default(m.getReturnType)
      }
    }
    Proxy.newProxyInstance(getClass.getClassLoader,
      Array(classOf[java.sql.Connection]), h).asInstanceOf[java.sql.Connection]
  }
}

/** Stateful mock of a transactional JDBC store for the exactly-once
  * sink: INSERT/DELETE statements stage operations on the connection,
  * `commit()` applies them atomically to a shared in-memory table,
  * `rollback()`/`close()`-without-commit discards them. A configurable
  * commit-failure index simulates a crash after the write but before
  * the transaction lands. */
object MockJdbcDb {
  import java.lang.reflect.{InvocationHandler, Method, Proxy}
  import scala.collection.mutable

  private val committed = mutable.Buffer[Map[String, Any]]()
  val log = new java.util.concurrent.ConcurrentLinkedQueue[String]()
  private val commitSeq = new java.util.concurrent.atomic.AtomicInteger(0)
  @volatile var failCommitAt: Int = -1 // 1-based commit index to fail once

  def clear(): Unit = synchronized {
    committed.clear(); log.clear(); commitSeq.set(0); failCommitAt = -1
  }
  def rows: Seq[Map[String, Any]] = synchronized { committed.toVector }
  def entries: Seq[String] = { val it = log.iterator(); Iterator.continually(it).takeWhile(_.hasNext).map(_.next()).toSeq }

  private def applyOps(ops: Seq[Either[Map[String, Any], Map[String, Any]]]): Unit =
    synchronized {
      ops.foreach {
        case Left(where) => // delete: drop committed rows matching every bound col
          val survivors = committed.filterNot(r => where.forall { case (c, v) => r.get(c).map(String.valueOf).contains(String.valueOf(v)) })
          committed.clear(); committed ++= survivors
        case Right(row) => committed += row
      }
    }

  private def default(t: Class[_]): AnyRef = t match {
    case java.lang.Boolean.TYPE => java.lang.Boolean.FALSE
    case java.lang.Integer.TYPE => Integer.valueOf(0)
    case java.lang.Long.TYPE => java.lang.Long.valueOf(0L)
    case java.lang.Void.TYPE => null
    case _ => null
  }

  private def stmt(sql: String, staged: mutable.Buffer[Either[Map[String, Any], Map[String, Any]]]): java.sql.PreparedStatement = {
    val isDelete = sql.trim.toUpperCase.startsWith("DELETE")
    val cols: Seq[String] =
      if (isDelete) "(\\w+) = \\?".r.findAllMatchIn(sql).map(_.group(1)).toSeq
      else sql.substring(sql.indexOf('(') + 1, sql.indexOf(')')).split(",").map(_.trim).toSeq
    val binds = mutable.TreeMap[Int, Any]()
    val pending = mutable.Buffer[Map[String, Any]]()
    val h = new InvocationHandler {
      override def invoke(p: AnyRef, m: Method, args: Array[AnyRef]): AnyRef = m.getName match {
        case "setObject" => binds(args(0).asInstanceOf[Integer].intValue()) = args(1); null
        case "addBatch" =>
          pending += cols.zipWithIndex.map { case (c, i) => c -> binds.getOrElse(i + 1, null) }.toMap; null
        case "executeBatch" =>
          val n = pending.size; staged ++= pending.map(Right(_)); pending.clear(); new Array[Int](n)
        case "executeUpdate" =>
          staged += Left(cols.zipWithIndex.map { case (c, i) => c -> binds(i + 1) }.toMap)
          Integer.valueOf(0)
        case "close" => null
        case _ => default(m.getReturnType)
      }
    }
    Proxy.newProxyInstance(getClass.getClassLoader,
      Array(classOf[java.sql.PreparedStatement]), h)
      .asInstanceOf[java.sql.PreparedStatement]
  }

  def connection(): java.sql.Connection = {
    val staged = mutable.Buffer[Either[Map[String, Any], Map[String, Any]]]()
    val h = new InvocationHandler {
      override def invoke(p: AnyRef, m: Method, args: Array[AnyRef]): AnyRef = m.getName match {
        case "setAutoCommit" => log.add("begin"); null
        case "prepareStatement" => stmt(args(0).asInstanceOf[String], staged)
        case "commit" =>
          val n = commitSeq.incrementAndGet()
          if (n == failCommitAt) { log.add("commit-fail"); throw new java.sql.SQLException(s"injected commit failure #$n") }
          applyOps(staged.toSeq); staged.clear(); log.add("commit"); null
        case "rollback" => staged.clear(); log.add("rollback"); null
        case "close" => staged.clear(); null
        case _ => default(m.getReturnType)
      }
    }
    Proxy.newProxyInstance(getClass.getClassLoader,
      Array(classOf[java.sql.Connection]), h).asInstanceOf[java.sql.Connection]
  }
}

/** The three contract points of ClickHouseUtil.java: declaration-order
  * positional binding, skip-annotated-field offset shift, flush at
  * batch size (plus tail flush). */
class JdbcBatchSinkSpec extends SparkSuite {
  import spark.implicits._
  implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

  test("binds columns positionally in declaration order, skipping transient fields") {
    MockJdbc.clear()
    // `trace` sits in the MIDDLE so the offset shift is observable:
    // amount must land at position 3, not 4
    val df = Seq((1L, "a", "t0", 10.5), (2L, "b", "t1", 20.5))
      .toDF("id", "name", "trace", "amount")
      .coalesce(1).sortWithinPartitions("id")
    JdbcBatchSink.writeBatch(df, "product_stats", () => MockJdbc.connection(),
      batchSize = 5, transientCols = Set("trace"))
    val e = MockJdbc.entries
    assert(e.head === "prepare INSERT INTO product_stats (id,name,amount) VALUES (?,?,?)")
    assert(e.contains("row 1=1,2=a,3=10.5"))
    assert(e.contains("row 1=2,2=b,3=20.5"))
  }

  test("flushes every batchSize rows and once more for the tail") {
    MockJdbc.clear()
    val df = spark.range(7).toDF("id").coalesce(1)
    JdbcBatchSink.writeBatch(df, "t", () => MockJdbc.connection(), batchSize = 5)
    val flushes = MockJdbc.entries.filter(_.startsWith("flush"))
    assert(flushes === Seq("flush 5", "flush 2"))
  }

  test("streaming form writes each micro-batch through the same contract") {
    MockJdbc.clear()
    val in = MemoryStream[(Long, String)]
    val q = JdbcBatchSink.sink(in.toDS().toDF("id", "v"), "dws_t",
      () => MockJdbc.connection(), batchSize = 2).start()
    in.addData((1L, "x"), (2L, "y"), (3L, "z"))
    q.processAllAvailable()
    q.stop()
    val e = MockJdbc.entries
    assert(e.exists(_ == "prepare INSERT INTO dws_t (id,v) VALUES (?,?)"))
    assert(e.count(_.startsWith("row")) === 3)
    // every row flushed: flush counts sum to the row count
    val flushed = e.filter(_.startsWith("flush")).map(_.split(" ")(1).toInt).sum
    assert(flushed === 3)
  }

  // ---- exactly-once form (batchId-keyed transactional commit) ----

  private def dataRows(bid: Long): Seq[(Any, Any)] =
    MockJdbcDb.rows.filter(r => String.valueOf(r("_batch_id")) == bid.toString)
      .map(r => (r("id"), r("v"))).sortBy(t => String.valueOf(t._1))

  test("exactly-once: rows land once with ledger columns and txn boundaries") {
    MockJdbcDb.clear()
    val df = Seq((1L, "a"), (2L, "b"), (3L, "c"), (4L, "d")).toDF("id", "v").repartition(2)
    JdbcBatchSink.writeBatchExactlyOnce(df, "dws_t", () => MockJdbcDb.connection(),
      batchId = 7L, batchSize = 2)
    val rs = MockJdbcDb.rows
    assert(rs.size === 4)
    assert(rs.forall(r => String.valueOf(r("_batch_id")) == "7" && r.contains("_part_id")))
    // one driver txn (whole-batch delete) + one per partition, all committed
    val e = MockJdbcDb.entries
    assert(e.count(_ == "begin") === 3)
    assert(e.count(_ == "commit") === 3)
    assert(!e.contains("rollback"))
  }

  test("exactly-once: replaying the same batchId leaves counts and content unchanged") {
    MockJdbcDb.clear()
    val df = Seq((1L, "a"), (2L, "b"), (3L, "c"), (4L, "d")).toDF("id", "v").repartition(2)
    JdbcBatchSink.writeBatchExactlyOnce(df, "dws_t", () => MockJdbcDb.connection(),
      batchId = 7L, batchSize = 2)
    val first = dataRows(7L)
    // crash-after-write replay: same batchId, DIFFERENT partitioning —
    // the driver-level batchId delete must still clear every prior row
    JdbcBatchSink.writeBatchExactlyOnce(df.coalesce(1), "dws_t", () => MockJdbcDb.connection(),
      batchId = 7L, batchSize = 2)
    assert(MockJdbcDb.rows.size === 4)
    assert(dataRows(7L) === first)
  }

  test("exactly-once: distinct batches accumulate; a replay clears only its own batch") {
    MockJdbcDb.clear()
    val mk = () => MockJdbcDb.connection()
    JdbcBatchSink.writeBatchExactlyOnce(
      Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "v").coalesce(1), "t", mk, batchId = 0L)
    JdbcBatchSink.writeBatchExactlyOnce(
      Seq((4L, "d"), (5L, "e")).toDF("id", "v").coalesce(1), "t", mk, batchId = 1L)
    JdbcBatchSink.writeBatchExactlyOnce( // replay of batch 0
      Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "v").coalesce(1), "t", mk, batchId = 0L)
    assert(MockJdbcDb.rows.size === 5)
    assert(dataRows(0L).size === 3)
    assert(dataRows(1L).size === 2)
  }

  test("exactly-once: a torn attempt rolls back; the retry lands rows exactly once") {
    MockJdbcDb.clear()
    val df = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "v").coalesce(1)
    val mk = () => MockJdbcDb.connection()
    // commit #1 = driver delete txn; #2 = the single partition's insert txn
    MockJdbcDb.failCommitAt = 2
    intercept[Throwable] {
      JdbcBatchSink.writeBatchExactlyOnce(df, "t", mk, batchId = 3L)
    }
    assert(MockJdbcDb.rows.isEmpty, "torn attempt must leave no committed rows")
    assert(MockJdbcDb.entries.contains("rollback"))
    JdbcBatchSink.writeBatchExactlyOnce(df, "t", mk, batchId = 3L)
    assert(MockJdbcDb.rows.size === 3)
    assert(dataRows(3L).size === 3)
  }

  test("exactly-once streaming form threads the foreachBatch batchId through") {
    MockJdbcDb.clear()
    val in = MemoryStream[(Long, String)]
    val q = JdbcBatchSink.sinkExactlyOnce(in.toDS().toDF("id", "v"), "dws_t",
      () => MockJdbcDb.connection(), batchSize = 2).start()
    in.addData((1L, "x"), (2L, "y"))
    q.processAllAvailable()
    in.addData((3L, "z"))
    q.processAllAvailable()
    q.stop()
    assert(MockJdbcDb.rows.size === 3)
    val bids = MockJdbcDb.rows.map(r => String.valueOf(r("_batch_id"))).toSet
    assert(bids === Set("0", "1"))
  }
}

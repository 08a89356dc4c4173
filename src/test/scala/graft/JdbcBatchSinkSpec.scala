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
}

package graft

import org.apache.spark.sql.SparkSession

/** GraftExtensions must make vec_dot resolvable by SQL in a session
  * built with .withExtensions (same SparkContext, fresh session). */
class ExtensionsSpec extends SparkSuite {

  test("withExtensions(GraftExtensions) exposes vec_dot to SQL") {
    val shared = spark // force shared session/context init first
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val ext = SparkSession.builder()
        .master("local[2]")
        .config("spark.ui.enabled", "false")
        .withExtensions(new graft.functions.GraftExtensions)
        .getOrCreate()
      val d = ext.sql("SELECT vec_dot(array(CAST(1.0 AS FLOAT), CAST(2.0 AS FLOAT)), " +
          "array(CAST(3.0 AS FLOAT), CAST(4.0 AS FLOAT))) AS d")
        .head().getDouble(0)
      assert(d === 11.0)
      // vec_cosine of a vector with itself is exactly 1.0
      val c = ext.sql("SELECT vec_cosine(array(CAST(3.0 AS FLOAT), CAST(4.0 AS FLOAT)), " +
          "array(CAST(3.0 AS FLOAT), CAST(4.0 AS FLOAT))) AS c")
        .head().getDouble(0)
      assert(math.abs(c - 1.0) < 1e-12)
    } finally {
      SparkSession.setDefaultSession(shared)
      SparkSession.setActiveSession(shared)
    }
  }
}

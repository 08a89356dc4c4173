package graft

/** Every declared query runs at sf0.001 and yields a sane result.
  * (Value-level correctness is the DuckDB oracle gate — Verify +
  * tools/check.py; this guards against runtime regressions.) */
class QueriesSmokeSpec extends SparkSuite {

  /** Queries whose result may legitimately be empty at tiny SF. */
  private val mayBeEmpty = Set("dedup_minhash_lsh", "dedup_jaccard_ngram", "j5_anti_join")

  for (d <- SparkEntry.allDefs) {
    test(s"${d.name} runs at sf0.001") {
      val df = d.fn(spark, sf("sf0.001"))
      val n = df.count()
      if (!mayBeEmpty(d.name)) assert(n > 0, s"${d.name} returned no rows")
      assert(df.columns.nonEmpty)
    }
  }

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every query has oracle SQL or is explicitly rows-only") {
    val noOracle = SparkEntry.allDefs.filter(_.oracle.isEmpty).map(_.name)
    assert(noOracle.isEmpty, s"queries without oracle: $noOracle")
  }
}

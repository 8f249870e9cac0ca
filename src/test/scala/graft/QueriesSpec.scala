package graft

/** Smoke: every gated query runs at sf0.001 (value correctness is the
  * DuckDB gate's job — tools/check.py; this guards against plan-time
  * regressions in `sbt test`).
  */
class QueriesSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracle key has a query") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracle without query: $missing")
  }

  SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
    test(s"$name executes") {
      val df = fn(spark, sf)
      assert(df.columns.nonEmpty)
      df.count() // force full execution
    }
  }
}

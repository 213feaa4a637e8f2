package graft

/** Catch-all gate over the whole registry: every query in
  * `SparkEntry.queries` must (a) execute at sf0.001, (b) produce a
  * non-degenerate schema, and (c) be run-to-run deterministic — two
  * independent executions collect identical row sequences (the property the
  * driver's hash-compare depends on). Queries whose results are
  * intentionally tiny (filters on small fixtures) may be empty; emptiness
  * is asserted only where a dedicated spec covers the operator.
  */
class AllQueriesSpec extends SparkSpec {

  SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
    test(s"$name: executes and is run-to-run deterministic at sf0.001") {
      val a = fn(spark, sf).collect()
      val b = fn(spark, sf).collect()
      assert(a.length === b.length, s"$name row count varies between runs")
      a.zip(b).zipWithIndex.foreach { case ((ra, rb), i) =>
        assert(ra === rb, s"$name row $i differs between runs")
      }
      assert(fn(spark, sf).schema.fields.nonEmpty)
    }
  }

  test("every oracleSql key has a matching queries entry") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracle without query: $missing")
  }
}

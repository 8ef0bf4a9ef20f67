package graft

/** Driver-contract smoke: `entry` must return rows on sf0.001 (t1 gate),
  * and every declared oracle key must correspond to a query. */
class EntrySpec extends SparkSpec {

  test("entry returns rows on sf0.001 (driver t1 smoke)") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracle key has a matching query; queries without oracle are known") {
    val qs = SparkEntry.queries.keySet
    val os = SparkEntry.oracleSql.keySet
    assert(os.subsetOf(qs), s"orphan oracles: ${os.diff(qs)}")
    val rowsOnly = qs.diff(os)
    assert(rowsOnly == Set("s36_ann_ivf", "q57_approx_distinct"),
      s"unexpected rows-only queries: $rowsOnly")
  }

  test("all queries execute on sf0.001 (empty results allowed, e.g. anti-join)") {
    val dir = sf("sf0.001")
    SparkEntry.queries.foreach { case (name, fn) =>
      val n = fn(spark, dir).count() // throws on any planning/execution error
      assert(n >= 0, name)
      spark.catalog.clearCache()
    }
  }
}

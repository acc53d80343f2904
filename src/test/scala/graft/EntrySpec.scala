package graft

/** The driver's t1 smoke gate: SparkEntry.entry returns rows on sf0.001,
  * and every registered query has either an oracle or a documented
  * rows-only status.
  */
class EntrySpec extends SparkSpec {
  test("entry returns rows on sf0.001 (t1 smoke)") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("oracle keys are a subset of query keys, and both are non-trivial") {
    val qs = SparkEntry.queries.keySet
    val os = SparkEntry.oracleSql.keySet
    assert(os.subsetOf(qs), s"oracles without queries: ${os.diff(qs)}")
    assert(qs.size >= 90)
    // rows-only queries are the intentional sketch exceptions
    assert(qs.diff(os) == Set("q_agg_approx_distinct"), qs.diff(os).toString)
  }
}

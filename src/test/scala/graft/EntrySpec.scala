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
    // every registered query is oracle-checked — no rows-only exceptions
    // left (the HLL sketch emits exact count + within_tolerance instead)
    assert(qs.diff(os).isEmpty, s"queries without oracles: ${qs.diff(os)}")
  }
}

package graft

/** Dev tool: print the authoritative registry counts as one JSON line —
  * the source of truth `tools/countcheck.py` diffs the hand-written
  * README/SURVEY numbers against. No SparkSession: the registries are
  * plain Maps (query lambdas are values, never invoked here).
  */
object CountDump {
  def main(args: Array[String]): Unit = {
    val q = SparkEntry.queries.size
    val o = SparkEntry.oracleSql.size
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    require(missing.isEmpty, s"oracles without queries: $missing")
    println(s"""{"n_queries":$q,"n_oracles":$o}""")
  }
}

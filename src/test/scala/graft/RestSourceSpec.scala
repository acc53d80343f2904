package graft

import org.apache.spark.sql.functions._
import graft.sources.rest.StubServer

/** DSv2 REST source semantics, ported from the reference's orchestrator
  * pagination tests (tests/index.test.ts: offset page math :199-218,
  * cursor :470-487, retry :263-300, global limit :499-537, short-page
  * termination :539-576).
  */
class RestSourceSpec extends SparkSpec {

  private val ddl = "id BIGINT, name STRING, value DOUBLE"

  private def read(path: String, extra: (String, String)*) = {
    val r = spark.read.format("graft.sources.rest.RestSource")
      .option("schema", ddl)
      .option("url", StubServer.url(path))
    extra.foldLeft(r)((acc, kv) => acc.option(kv._1, kv._2)).load()
  }

  test("offset pagination reads all rows, stops on short page") {
    StubServer.requestCount.set(0)
    val rows = read("/rows", "itemsPerPage" -> "100").collect()
    assert(rows.length == 250)
    assert(rows.map(_.getLong(0)).toSet == (1L to 250L).toSet)
    // 250 rows / 100 per page → 3 requests (3rd is short → stop)
    assert(StubServer.requestCount.get() == 3)
  }

  test("cursor pagination follows nextOffset chain to the end") {
    StubServer.requestCount.set(0)
    val rows = read("/cursor-rows", "pageType" -> "cursor", "itemsPerPage" -> "60").collect()
    assert(rows.length == 250)
    assert(StubServer.requestCount.get() == 5) // 60×4 + 10, last page has no cursor
  }

  test("limit pushdown stops the page loop early (src/index.ts:284-286)") {
    StubServer.requestCount.set(0)
    val n = read("/rows", "itemsPerPage" -> "50").limit(70).collect().length
    assert(n == 70)
    assert(StubServer.requestCount.get() == 2) // 50 + 20, not 5 pages
  }

  test("totalLimit option caps rows like DEFAULT_CONFIG.TOTAL_ITEMS_LIMIT") {
    val n = read("/rows", "itemsPerPage" -> "100", "totalLimit" -> "120").count()
    assert(n == 120)
  }

  test("maxItemsPerPage clamps the negotiated page size (src/index.ts:145-161)") {
    StubServer.requestCount.set(0)
    val n = read("/rows", "itemsPerPage" -> "1000", "maxItemsPerPage" -> "100").count()
    assert(n == 250)
    assert(StubServer.requestCount.get() == 3) // clamped to 100/page
  }

  test("bounded retry recovers from transient 500s (tests/index.test.ts:263-300)") {
    StubServer.failuresLeft.set(2)
    val rows = read("/flaky-rows", "itemsPerPage" -> "100",
      "maxRetries" -> "3", "retryIntervalMs" -> "10").collect()
    assert(rows.length == 250)
  }

  test("retry budget exhaustion fails the read") {
    StubServer.failuresLeft.set(5)
    intercept[org.apache.spark.SparkException] {
      read("/flaky-rows", "itemsPerPage" -> "100",
        "maxRetries" -> "1", "retryIntervalMs" -> "1").collect()
    }
    StubServer.failuresLeft.set(0)
  }

  test("column pruning reaches the reader (P2 client-side re-projection)") {
    val df = read("/rows", "itemsPerPage" -> "100").select("id")
    val scanLine = df.queryExecution.executedPlan.toString()
      .linesIterator.find(_.contains("BatchScan")).getOrElse("")
    assert(scanLine.contains("[id#") && !scanLine.contains("name#"), scanLine)
    assert(df.collect().length == 250)
  }

  test("rate limiting enforces minimum inter-request spacing (src/index.ts:234-243)") {
    StubServer.requestCount.set(0)
    val t0 = System.nanoTime()
    read("/rows", "itemsPerPage" -> "100", "requestsPerSecond" -> "10").count()
    val elapsedMs = (System.nanoTime() - t0) / 1e6
    // 3 requests at ≥100ms spacing → ≥200ms total
    assert(elapsedMs >= 200, s"elapsed ${elapsedMs}ms")
  }
}

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

  test("page-number pagination (Zoho-style page arithmetic) reads all rows") {
    StubServer.requestCount.set(0)
    val rows = read("/page-rows", "pageType" -> "page", "itemsPerPage" -> "100").collect()
    assert(rows.length == 250)
    assert(rows.map(_.getLong(0)).toSet == (1L to 250L).toSet)
    assert(StubServer.requestCount.get() == 3) // pages 1,2,3 — 3rd short → stop
  }

  test("Link-header pagination (GitHub-style rel=next chain) follows to the end") {
    StubServer.requestCount.set(0)
    val rows = read("/link-rows", "pageType" -> "link", "itemsPerPage" -> "60").collect()
    assert(rows.length == 250)
    assert(rows.map(_.getLong(0)).toSet == (1L to 250L).toSet)
    // 60×4 + 10: the 5th response carries no rel="next" → stop
    assert(StubServer.requestCount.get() == 5)
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

  test("filter pushdown compiles predicates to query params and fetches fewer rows " +
    "(adapters/postgresql/src/index.ts:165-170)") {
    StubServer.rowsServed.set(0)
    val df = read("/rows", "itemsPerPage" -> "100")
      .filter(col("id") >= 100 && col("id") <= 160)
    // plan shows the pushed filters on the scan
    val plan = df.queryExecution.executedPlan.toString()
    assert(plan.contains("PushedFilters") || plan.contains("f_id_gte") ||
      df.queryExecution.optimizedPlan.toString().nonEmpty) // description() carries them
    val rows = df.collect()
    assert(rows.length == 61)
    assert(rows.map(_.getLong(0)).toSet == (100L to 160L).toSet)
    // the server only serialized the 61 matching rows, not all 250 —
    // the wire-level proof that the filter reached the endpoint
    assert(StubServer.rowsServed.get() == 61, s"served ${StubServer.rowsServed.get()}")
  }

  test("unsupported predicates stay engine-side (residual), result still exact") {
    StubServer.rowsServed.set(0)
    // endsWith has no compiled form → full fetch + engine-side filter
    val rows = read("/rows", "itemsPerPage" -> "100")
      .filter(col("name").endsWith("7")).collect()
    assert(rows.length == 25) // Item7, Item17, ..., Item247
    assert(StubServer.rowsServed.get() == 250) // nothing pushed
  }

  test("pushed filters are ALSO re-applied engine-side (server is a bandwidth " +
    "optimization, not a correctness dependency)") {
    // string filter on name + numeric on id through cursor mode too
    val rows = read("/cursor-rows", "pageType" -> "cursor", "itemsPerPage" -> "60")
      .filter(col("name").startsWith("Item24")).collect()
    // Item24, Item240..Item249
    assert(rows.map(_.getString(1)).toSet ==
      (Set("Item24") ++ (240 to 249).map(i => s"Item$i")))
  }

  test("OAuth2: bearer fetched from token endpoint, protected scan succeeds (O8)") {
    StubServer.tokenAutoExpireEvery = 0
    StubServer.tokenFetches.set(0)
    val rows = read("/protected-rows", "itemsPerPage" -> "100",
      "oauthTokenUrl" -> StubServer.url("/oauth/token")).collect()
    assert(rows.length == 250)
    assert(StubServer.tokenFetches.get() >= 1)
  }

  test("OAuth2: expired token mid-scan → refresh-on-401 and continue " +
    "(adapters/hubspot/src/index.ts:300-335)") {
    StubServer.tokenFetches.set(0)
    StubServer.tokenAutoExpireEvery = 1 // token dies after EVERY page
    try {
      val rows = read("/protected-rows", "itemsPerPage" -> "50",
        "oauthTokenUrl" -> StubServer.url("/oauth/token")).collect()
      assert(rows.length == 250)
      // 6 pages (5 full + short), each after the first forced a refresh
      assert(StubServer.tokenFetches.get() >= 5,
        s"expected refresh per page, got ${StubServer.tokenFetches.get()} fetches")
    } finally StubServer.tokenAutoExpireEvery = 0
  }

  test("OAuth2: missing token endpoint on a protected resource fails the read") {
    intercept[org.apache.spark.SparkException] {
      read("/protected-rows", "itemsPerPage" -> "100").collect() // no bearer at all
    }
  }

  test("429 backoff honors Retry-After header (adapters/hubspot/src/index.ts:506-510)") {
    StubServer.rateLimited429Left.set(1)
    StubServer.retryAfterSeconds = 1
    val t0 = System.nanoTime()
    val rows = read("/limited-rows", "itemsPerPage" -> "100",
      "maxRetries" -> "2", "retryIntervalMs" -> "5").collect()
    val elapsedMs = (System.nanoTime() - t0) / 1e6
    assert(rows.length == 250)
    // fixed interval is 5ms; only the header's 1s explains a ≥900ms wait
    assert(elapsedMs >= 900, s"elapsed ${elapsedMs}ms — Retry-After not honored")
  }

  test("incremental read: modifiedAfter watermark → If-Modified-Since, " +
    "server returns only newer rows (adapters/xero/src/index.ts:321-324)") {
    val rows = read("/rows", "itemsPerPage" -> "100",
      "modifiedAfter" -> "200").collect()
    assert(rows.map(_.getLong(0)).toSet == (201L to 250L).toSet)
  }

  test("parallel offset partitions page their slices concurrently and exactly") {
    StubServer.requestCount.set(0)
    val df = read("/rows", "itemsPerPage" -> "40",
      "totalLimit" -> "250", "parallelism" -> "4")
    assert(df.rdd.getNumPartitions == 4) // 63+63+63+61 offset ranges
    val rows = df.collect()
    assert(rows.length == 250)
    assert(rows.map(_.getLong(0)).toSet == (1L to 250L).toSet) // no dupes, no gaps
  }

  test("parallelism falls back to the serial loop for cursor mode") {
    val df = read("/cursor-rows", "pageType" -> "cursor", "itemsPerPage" -> "60",
      "totalLimit" -> "250", "parallelism" -> "4")
    assert(df.rdd.getNumPartitions == 1) // cursor chains are serial
    assert(df.count() == 250)
  }

  test("parallel partitions compose with filter pushdown") {
    StubServer.rowsServed.set(0)
    val rows = read("/rows", "itemsPerPage" -> "40",
      "totalLimit" -> "250", "parallelism" -> "4")
      .filter(col("id") >= 100 && col("id") <= 160).collect()
    assert(rows.map(_.getLong(0)).toSet == (100L to 160L).toSet)
    // server filters BEFORE paginating, so each slice pages the filtered
    // stream — still only the 61 matching rows cross the wire in total
    assert(StubServer.rowsServed.get() == 61, s"served ${StubServer.rowsServed.get()}")
  }

  test("streaming facet: probe finds the exact row count in O(log N) one-row requests") {
    import graft.sources.rest.RestProbe
    StubServer.requestCount.set(0)
    val n = RestProbe.countAvailable(StubServer.url("/rows"), "", 100000000L)
    assert(n == 250L, s"probe found $n rows")
    // doubling to 256 (9 requests incl. offset 0) + binary search inside
    // [128, 256) (~7) — far under a full 250-row page walk
    assert(StubServer.requestCount.get() <= 20, s"probe used ${StubServer.requestCount.get()} requests")
    // probe composes with pushed filters: counts only the filtered stream
    assert(RestProbe.countAvailable(StubServer.url("/rows"), "f_id_lte=60", 100000000L) == 60L)
  }

  test("download timeout keeps partial data (S4, src/index.ts:256-262)") {
    StubServer.requestCount.set(0)
    // each page takes ≥200ms; wall-clock budget of ~300ms admits the first
    // page (checked before each fetch, first fetch always runs) but stops
    // the chain before all 13 pages of 20 arrive
    val rows = read("/slow-rows", "itemsPerPage" -> "20", "timeoutMs" -> "300").collect()
    assert(rows.length > 0, "timeout must KEEP partial data, not fail")
    assert(rows.length < 250, s"expected a partial read, got all ${rows.length}")
    // rows that did arrive are intact
    assert(rows.map(_.getLong(0)).toSet == (1L to rows.length).toSet)
  }
}

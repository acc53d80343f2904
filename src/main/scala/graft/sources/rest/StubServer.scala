package graft.sources.rest

import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}
import java.net.InetSocketAddress
import java.util.concurrent.atomic.AtomicInteger

/** Deterministic in-process REST stub (JDK HttpServer, zero deps) used by
  * specs and the q_rest_* queries. Serves `nRows` rows
  * {id, name: "Item<id>", value: id * 0.5} — the mock-adapter fixture
  * shape from the reference's orchestrator tests
  * (tests/index.test.ts:47-60) — under both pagination protocols, with
  * optional injected failures to exercise retry.
  *
  * GET /rows?limit=N&offset=M         (offset mode)
  * GET /cursor-rows?limit=N&offset=T  (cursor mode; nextOffset token)
  * GET /flaky-rows                    (first `failures` requests → 500)
  */
object StubServer {
  @volatile private var server: HttpServer = _
  @volatile private var boundPort: Int = -1
  val requestCount = new AtomicInteger(0)
  val failuresLeft = new AtomicInteger(0)

  def port: Int = synchronized {
    if (server == null) start()
    boundPort
  }

  def url(path: String): String = s"http://127.0.0.1:$port$path"

  private def rowJson(id: Long): String =
    s"""{"id": $id, "name": "Item$id", "value": ${id.toDouble * 0.5}}"""

  private def pageJson(from: Long, limit: Int, nRows: Long, cursorMode: Boolean): String = {
    val to = math.min(from + limit - 1, nRows)
    val rows = (from to to).map(rowJson).mkString("[", ",", "]")
    val next =
      if (cursorMode && to < nRows) s""","nextOffset": "${to + 1}"""" else ""
    s"""{"data": $rows$next}"""
  }

  private def handler(nRows: Long, cursorMode: Boolean, flaky: Boolean): HttpHandler =
    (ex: HttpExchange) => {
      requestCount.incrementAndGet()
      val params = Option(ex.getRequestURI.getQuery).getOrElse("").split("&")
        .filter(_.contains("=")).map { kv => val Array(k, v) = kv.split("=", 2); k -> v }.toMap
      if (flaky && failuresLeft.getAndDecrement() > 0) {
        ex.sendResponseHeaders(500, -1); ex.close()
      } else {
        val limit = params.getOrElse("limit", "100").toInt
        val offset = params.getOrElse("offset", if (cursorMode) "1" else "0").toLong
        val from = if (cursorMode) offset else offset + 1
        val body = pageJson(from, limit, nRows, cursorMode).getBytes("UTF-8")
        ex.getResponseHeaders.set("Content-Type", "application/json")
        ex.sendResponseHeaders(200, body.length)
        ex.getResponseBody.write(body)
        ex.close()
      }
    }

  def start(nRows: Long = 250): Unit = synchronized {
    if (server != null) return
    server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/rows", handler(nRows, cursorMode = false, flaky = false))
    server.createContext("/cursor-rows", handler(nRows, cursorMode = true, flaky = false))
    server.createContext("/flaky-rows", handler(nRows, cursorMode = false, flaky = true))
    // daemon executor + daemon-spawned dispatcher so a forgotten stub can
    // never keep the Verify/Bench JVM alive after main returns
    server.setExecutor(java.util.concurrent.Executors.newSingleThreadExecutor(r => {
      val t = new Thread(r, "graft-rest-stub"); t.setDaemon(true); t
    }))
    val starter = new Thread(() => server.start(), "graft-rest-stub-start")
    starter.setDaemon(true)
    starter.start()
    starter.join()
    boundPort = server.getAddress.getPort
  }

  def stop(): Unit = synchronized {
    if (server != null) { server.stop(0); server = null; boundPort = -1 }
  }
}

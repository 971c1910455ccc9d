package graft.net

import com.sun.net.httpserver.{HttpExchange, HttpServer}

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets.UTF_8
import scala.util.control.NonFatal

/** The observability endpoint (reference `debug_server.go:32-72`): an
  * HTTP server exposing Prometheus metrics plus liveness/status, built
  * on the JDK's `com.sun.net.httpserver` (zero dependencies). The
  * reference mounts promhttp and Go pprof; the JVM twin serves the
  * [[Metrics]] registry at `/metrics` and replaces pprof with
  * `/statusz` runtime/ingest state — JVM profiling has its own
  * first-class tools (JFR, async-profiler) that attach out-of-band,
  * so an in-process pprof clone would be redundant surface.
  *
  * Routes:
  *  - `GET /metrics`  Prometheus text format 0.0.4
  *  - `GET /healthz`  200 "ok" (liveness)
  *  - `GET /statusz`  uptime, heap, queue depths, open connections
  */
final class DebugServer(port: Int = 0, metrics: Metrics = Metrics.default,
    status: () => Map[String, String] = () => Map.empty) {

  private val startedAt = System.currentTimeMillis()
  private val http = HttpServer.create(new InetSocketAddress(port), 16)
  http.setExecutor(null) // serve on the dispatch thread; scrape traffic is tiny

  private def respond(ex: HttpExchange, code: Int, body: String,
      contentType: String = "text/plain; charset=utf-8"): Unit = {
    val bytes = body.getBytes(UTF_8)
    try {
      ex.getResponseHeaders.set("Content-Type", contentType)
      ex.sendResponseHeaders(code, bytes.length.toLong)
      val os = ex.getResponseBody
      os.write(bytes)
      os.close()
    } finally ex.close()
  }

  http.createContext("/metrics", (ex: HttpExchange) =>
    try respond(ex, 200, metrics.render(),
      "text/plain; version=0.0.4; charset=utf-8")
    catch { case NonFatal(e) => respond(ex, 500, s"error: ${e.getMessage}\n") })

  http.createContext("/healthz", (ex: HttpExchange) => respond(ex, 200, "ok\n"))

  http.createContext("/statusz", (ex: HttpExchange) =>
    try {
      val rt = Runtime.getRuntime
      val base = Map(
        "uptime_ms" -> (System.currentTimeMillis() - startedAt).toString,
        "heap_used_bytes" -> (rt.totalMemory() - rt.freeMemory()).toString,
        "heap_max_bytes" -> rt.maxMemory().toString,
        "threads" -> Thread.activeCount().toString)
      val lines = (base ++ status()).toSeq.sortBy(_._1)
        .map { case (k, v) => s"$k: $v" }.mkString("", "\n", "\n")
      respond(ex, 200, lines)
    } catch { case NonFatal(e) => respond(ex, 500, s"error: ${e.getMessage}\n") })

  def boundPort: Int = http.getAddress.getPort

  def start(): this.type = { http.start(); this }

  def stop(): Unit = http.stop(0)
}

package graft.streaming

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets
import java.util.concurrent.atomic.AtomicBoolean

import com.sun.net.httpserver.{HttpExchange, HttpServer}

/** HTTP health/metrics surface — deployment parity with the reference's
  * Ktor endpoints (KtorApplication.kt:97-153): GET /isalive ("ALIVE" or
  * 503), GET /isready ("READY" or 503 until started/after stop begins),
  * GET /metrics (Prometheus text exposition), GET /stop (the preStop hook:
  * flips readiness off, runs the stop hook, then 200 OK — the documented
  * graceful-termination order, KtorApplication.kt:112-139).
  *
  * Built on the JDK's com.sun.net.httpserver — zero added dependencies, so
  * the engine library stays dependency-free while a deployment gets the
  * same probe contract. Wire it to a rapid like the reference wires
  * KafkaRapid::isRunning:
  *
  * {{{
  * val health = Health.serve(
  *   alive = () => rapid.isRunning,
  *   ready = () => rapid.isRunning,
  *   metrics = () => timers.latest.map { case (q, t) =>
  *     s"""on_packet_seconds{river="$q"}""" -> t.secondsPerMessage },
  *   stopHook = () => rapid.stop())
  * }}}
  */
object Health {

  final class Server private[Health] (private[Health] val http: HttpServer,
      ready: AtomicBoolean) {
    def port: Int = http.getAddress.getPort
    /** Readiness gate — set true once rivers are started (the reference's
      * ApplicationStarted monitor flip, KtorApplication.kt:104-110).
      */
    def markReady(): Unit = ready.set(true)
    def close(): Unit = http.stop(0)
  }

  def serve(
      alive: () => Boolean,
      ready: () => Boolean,
      /** Metric name (with optional {tags}) -> value; rendered as untyped
        * Prometheus text exposition like the reference's scrape endpoint.
        */
      metrics: () => Map[String, Double] = () => Map.empty,
      stopHook: () => Unit = () => (),
      port: Int = 0): Server = {
    val readyToggle = new AtomicBoolean(false)
    val http = HttpServer.create(new InetSocketAddress(port), 0)

    def respond(x: HttpExchange, code: Int, body: String): Unit = {
      val bytes = body.getBytes(StandardCharsets.UTF_8)
      x.getResponseHeaders.set("Content-Type", "text/plain; charset=utf-8")
      x.sendResponseHeaders(code, if (bytes.isEmpty) -1 else bytes.length)
      if (bytes.nonEmpty) x.getResponseBody.write(bytes)
      x.close()
    }

    http.createContext("/isalive", (x: HttpExchange) =>
      if (alive()) respond(x, 200, "ALIVE") else respond(x, 503, ""))
    http.createContext("/isready", (x: HttpExchange) =>
      if (readyToggle.get() && ready()) respond(x, 200, "READY")
      else respond(x, 503, ""))
    http.createContext("/metrics", (x: HttpExchange) =>
      respond(x, 200, metrics().toSeq.sortBy(_._1)
        .map { case (k, v) => s"$k $v" }.mkString("", "\n", "\n")))
    http.createContext("/stop", { (x: HttpExchange) =>
      // readiness drops FIRST so the load balancer stops routing here while
      // the hook drains (KtorApplication.kt:124-137's termination order)
      readyToggle.set(false)
      stopHook()
      respond(x, 200, "OK")
    })
    http.start()
    new Server(http, readyToggle)
  }
}

package graft.streaming

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets
import java.util.concurrent.{CompletableFuture, ExecutionException, TimeUnit, TimeoutException}
import java.util.concurrent.atomic.AtomicBoolean

import com.sun.net.httpserver.{HttpExchange, HttpServer}

/** HTTP health/metrics surface — deployment parity with the reference's
  * Ktor endpoints (KtorApplication.kt:97-153): GET /isalive ("ALIVE" or
  * 503), GET /isready ("READY" or 503 until started/after stop begins),
  * GET /metrics (Prometheus text exposition), GET /stop (the preStop hook:
  * flips readiness off, runs the stop hook bounded by a 30 s drain window,
  * then 200 OK / 503 on timeout / 500 on hook failure — the documented
  * graceful-termination order, KtorApplication.kt:112-139 +
  * PreStopHook.kt:52-67).
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
      /** Upper bound on the /stop drain — the reference's PreStopHook waits
        * at most 30 s for shutdown-complete before letting the preStop call
        * return (PreStopHook.kt:52-67).
        */
      stopTimeoutMillis: Long = 30000,
      /** Deployment-specific endpoints alongside the probes — the analogue
        * of the reference's withKtorModule custom routing
        * (RapidApplication.kt builder; RapidApplicationComponentTest
        * "custom endpoint"): path -> handler returning (status, body).
        */
      extraRoutes: Map[String, () => (Int, String)] = Map.empty,
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
      // the hook drains (KtorApplication.kt:124-137's termination order).
      readyToggle.set(false)
      // The drain is BOUNDED like the reference's PreStopHook (30 s wait for
      // shutdown-complete, PreStopHook.kt:52-67): the hook runs on its own
      // daemon thread so a hung drain cannot hold this HTTP worker — on
      // timeout the hook keeps draining in the background and the probe gets
      // a 503 (the reference logs and returns; kubelet proceeds to SIGTERM).
      val done = new CompletableFuture[Unit]()
      val drain = new Thread(() =>
        try { stopHook(); done.complete(()); () }
        catch { case e: Throwable => done.completeExceptionally(e); () },
        "graft-stop-hook")
      drain.setDaemon(true)
      drain.start()
      try {
        done.get(stopTimeoutMillis, TimeUnit.MILLISECONDS)
        respond(x, 200, "OK")
      } catch {
        case _: TimeoutException =>
          respond(x, 503, s"shutdown did not complete within $stopTimeoutMillis ms")
        case e: ExecutionException =>
          // a throwing hook must surface a 500, not a hung exchange (the
          // reference's Ktor handler would 500); the pod stays unready
          respond(x, 500, s"stop hook failed: ${Option(e.getCause).getOrElse(e)}")
        case _: InterruptedException =>
          // server shutdown interrupting a blocked dispatcher: still answer
          // (no dropped connection) and preserve the interrupt status
          Thread.currentThread().interrupt()
          respond(x, 503, "interrupted while waiting for the drain")
      }
    })
    extraRoutes.foreach { case (path, handler) =>
      http.createContext(path, { (x: HttpExchange) =>
        val (code, body) =
          try handler()
          catch { case e: Throwable => (500, s"handler failed: $e") }
        respond(x, code, body)
      })
    }
    http.start()
    new Server(http, readyToggle)
  }
}

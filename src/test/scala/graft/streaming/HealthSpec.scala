package graft.streaming

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}

import org.scalatest.funsuite.AnyFunSuite

/** Probe contract of the HTTP health surface (KtorApplication.kt:97-153). */
class HealthSpec extends AnyFunSuite {

  private def get(port: Int, path: String): (Int, String) = {
    val rsp = HttpClient.newHttpClient().send(
      HttpRequest.newBuilder(URI.create(s"http://127.0.0.1:$port$path")).GET().build(),
      HttpResponse.BodyHandlers.ofString())
    (rsp.statusCode(), rsp.body())
  }

  test("isalive/isready/metrics/stop follow the reference's probe semantics") {
    @volatile var aliveNow = true
    @volatile var stopped = false
    val srv = Health.serve(
      alive = () => aliveNow,
      ready = () => aliveNow,
      metrics = () => Map(
        """on_packet_seconds{river="r0"}""" -> 0.25,
        "message_counter" -> 42.0),
      stopHook = () => stopped = true)
    try {
      assert(get(srv.port, "/isalive") == (200, "ALIVE"))
      // not ready until the app marks started (ApplicationStarted toggle)
      assert(get(srv.port, "/isready")._1 == 503)
      srv.markReady()
      assert(get(srv.port, "/isready") == (200, "READY"))
      val (mc, body) = get(srv.port, "/metrics")
      assert(mc == 200)
      assert(body.contains("message_counter 42.0"))
      assert(body.contains("""on_packet_seconds{river="r0"} 0.25"""))
      // dead rapid: alive flips to 503 (KafkaRapid.isRunning binding)
      aliveNow = false
      assert(get(srv.port, "/isalive")._1 == 503)
      aliveNow = true
      // preStop: drops readiness BEFORE running the hook, then 200 OK
      assert(get(srv.port, "/stop") == (200, "OK"))
      assert(stopped)
      assert(get(srv.port, "/isready")._1 == 503)
      assert(get(srv.port, "/isalive")._1 == 200) // still alive during drain
    } finally srv.close()
  }

  test("custom endpoints serve alongside the probes (RapidApplicationComponentTest 'custom endpoint')") {
    val srv = Health.serve(
      alive = () => true, ready = () => true,
      extraRoutes = Map(
        "/custom" -> (() => (200, "CUSTOM RESPONSE")),
        "/broken" -> (() => sys.error("boom"))))
    try {
      assert(get(srv.port, "/custom") == (200, "CUSTOM RESPONSE"))
      assert(get(srv.port, "/isalive")._1 == 200) // probes unaffected
      // a throwing handler surfaces a 500, never a hung exchange
      val (code, body) = get(srv.port, "/broken")
      assert(code == 500 && body.contains("boom"))
    } finally srv.close()
  }

  test("/stop drain is bounded: a hung hook gets 503 within the timeout (PreStopHook.kt:52-67)") {
    val hungForever = new java.util.concurrent.CountDownLatch(1)
    val srv = Health.serve(
      alive = () => true, ready = () => true,
      stopHook = () => hungForever.await(), // never completes
      stopTimeoutMillis = 300)
    try {
      val t0 = System.currentTimeMillis()
      val (code, body) = get(srv.port, "/stop")
      val elapsed = System.currentTimeMillis() - t0
      assert(code == 503, s"hung drain must 503, got $code: $body")
      assert(body.contains("did not complete"))
      assert(elapsed < 10000, s"bounded drain took ${elapsed}ms")
      // readiness stays dropped — the pod is draining, not routable
      assert(get(srv.port, "/isready")._1 == 503)
    } finally { hungForever.countDown(); srv.close() }
  }

  test("/stop surfaces a throwing hook as 500, never a hung exchange") {
    val srv = Health.serve(
      alive = () => true, ready = () => true,
      stopHook = () => sys.error("drain exploded"))
    try {
      val (code, body) = get(srv.port, "/stop")
      assert(code == 500, s"throwing hook must 500, got $code: $body")
      assert(body.contains("drain exploded"))
    } finally srv.close()
  }
}

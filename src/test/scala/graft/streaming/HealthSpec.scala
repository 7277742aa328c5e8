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
}

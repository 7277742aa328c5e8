package graft.streaming

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.messages.{River, Validation}

/** Single-scan fanout mode (Fanout / MemoryRapid(fanout = true)): the
  * reference reads each record once and notifies every listener
  * (RapidsConnection.kt:44-55); the single-query mode must prove the same —
  * N rivers, every message seen by each, exactly ONE streaming query whose
  * input rows are counted once.
  */
class FanoutSpec extends AnyFunSuite {

  private def eventRiver(name: String) =
    River().precondition(Validation.requireValue("@event_name", name))

  test("N rivers see every message off ONE query with one input scan") {
    val spark = TestSpark.spark
    val rapid = new MemoryRapid(spark, "fanout", fanout = true)
    // three rivers with different routes; each echoes a tagged reply
    Seq("a", "b", "c").foreach { ev =>
      rapid.register(eventRiver(ev)) { r =>
        r.passed.select(col("key"), concat(lit(s"saw_$ev:"), col("value")).as("value"))
      }
    }
    val msgs = Seq("""{"@event_name":"a"}""", """{"@event_name":"b"}""",
      """{"@event_name":"c"}""", """{"@event_name":"a"}""")
    msgs.foreach(rapid.sendTestMessage(_))
    assert(rapid.isRunning)

    // every river saw its messages (and fanout delivered ALL messages to
    // all rivers — the non-matching ones were routed, just not passed)
    val out = (0 until rapid.inspector.size).map(rapid.inspector.message)
    assert(out.count(_.startsWith("saw_a:")) == 2)
    assert(out.count(_.startsWith("saw_b:")) == 1)
    assert(out.count(_.startsWith("saw_c:")) == 1)

    // exactly ONE streaming query for the whole rapid...
    assert(rapid.queryIds.size == 1, s"expected one query, got ${rapid.queryIds}")
    // ...and the source was scanned once per message, not once per river:
    // total input rows across all processed micro-batches equals the number
    // of injected messages (per-river mode would count 3x)
    val q = spark.streams.get(rapid.queryIds.head)
    val scanned = q.recentProgress.map(_.numInputRows).sum
    assert(scanned == msgs.size.toLong,
      s"expected ${msgs.size} scanned input rows (read-once), got $scanned")

    // per-river routing counters survive the single-scan mode (the
    // reference's per-listener message_counter): every river observed ALL
    // 4 messages, and passed exactly its own
    val m = rapid.fanoutMetrics
    assert(m.keySet == Set("fanout-river-0", "fanout-river-1", "fanout-river-2"),
      s"got ${m.keySet}")
    assert(m.values.forall(_("messages") == 4L), s"got $m")
    assert(m("fanout-river-0")("passed") == 2L) // river a: 2 matches
    assert(m("fanout-river-1")("passed") == 1L)
    assert(m("fanout-river-2")("passed") == 1L)
    assert(m("fanout-river-0")("precondition_failed") == 2L) // the b/c msgs
    rapid.stop()
  }

  test("registering after the fanout query started fails loudly") {
    val rapid = new MemoryRapid(TestSpark.spark, "fanout-late", fanout = true)
    rapid.register(eventRiver("a")) { r => r.passed.select(col("key"), col("value")) }
    rapid.sendTestMessage("""{"@event_name":"a"}""")
    val ex = intercept[IllegalArgumentException] {
      rapid.register(eventRiver("b")) { r => r.passed.select(col("key"), col("value")) }
    }
    assert(ex.getMessage.contains("before the first send"))
    rapid.stop()
  }

  test("error in one river's flow stops the single query — and the rapid (RapidIntegrationTest.kt:126-141)") {
    val spark = TestSpark.spark
    val rapid = new MemoryRapid(spark, "fanout-err", fanout = true)
    rapid.register(eventRiver("fine")) { r =>
      r.passed.select(col("key"), col("value"))
    }
    rapid.register(eventRiver("boom")) { r =>
      r.passed.select(col("key"),
        when(lit(true), raise_error(lit("poison message"))).otherwise(col("value"))
          .cast("string").as("value"))
    }
    rapid.sendTestMessage("""{"@event_name":"fine"}""")
    assert(rapid.isRunning)
    intercept[Exception](rapid.sendTestMessage("""{"@event_name":"boom"}"""))
    val deadline = System.currentTimeMillis() + 30000
    while (rapid.isRunning && System.currentTimeMillis() < deadline) Thread.sleep(100)
    assert(!rapid.isRunning, "rapid kept running after a river error")
    assert(rapid.firstFailure.exists(_.contains("poison message")))
  }

  test("loopback multi-hop flows work off the single query") {
    val spark = TestSpark.spark
    val rapid = new MemoryRapid(spark, "fanout-loop", fanout = true, loopback = true)
    // hop 1: a -> b; hop 2: b -> done
    rapid.register(eventRiver("a")) { r =>
      r.passed.select(col("key"), lit("""{"@event_name":"b"}""").as("value"))
    }
    rapid.register(eventRiver("b")) { r =>
      r.passed.select(col("key"), lit("""{"@event_name":"done"}""").as("value"))
    }
    rapid.sendTestMessage("""{"@event_name":"a"}""")
    val out = (0 until rapid.inspector.size).map(rapid.inspector.message)
    assert(out.exists(_.contains("\"done\"")),
      s"expected the two-hop reply to land, got $out")
    rapid.stop()
  }

  test("a stateful flow on the shared scan fails LOUDLY, never silently resets state") {
    val spark = TestSpark.spark
    val rapid = new MemoryRapid(spark, "fanout-stateful", fanout = true)
    // flatMapGroupsWithState inside the fanout's per-batch routing would
    // run fine and silently forget its state every trigger — the guard
    // must down the rapid with actionable guidance instead
    rapid.register(River()
      .precondition(Validation.requireValue("@event_name", "ping"))
      .validate(Validation.requireParsed("ping_time",
        graft.functions.Converters.asOptionalLocalDateTimeLenient))) { r =>
      PingPong(r, "app", "inst", () => System.currentTimeMillis())
    }
    intercept[Exception](rapid.sendTestMessage("""{"@event_name":"ping"}"""))
    // firstFailure lands via the ASYNC terminated event — poll for it, not
    // for isRunning (the query flips inactive before the event delivers)
    val deadline = System.currentTimeMillis() + 30000
    while (rapid.firstFailure.isEmpty && System.currentTimeMillis() < deadline)
      Thread.sleep(100)
    assert(rapid.firstFailure.exists(_.contains("registerStateful")),
      s"expected the stateful-flow guidance, got ${rapid.firstFailure}")
    // the same river registered STATEFUL works: its own query owns the state
    val rapid2 = new MemoryRapid(spark, "fanout-stateful2", fanout = true)
    rapid2.registerStateful(River()
      .precondition(Validation.requireValue("@event_name", "ping"))
      .validate(Validation.requireParsed("ping_time",
        graft.functions.Converters.asOptionalLocalDateTimeLenient))) { r =>
      PingPong(r, "app", "inst", () => 1700000001000L)
    }
    rapid2.sendTestMessage(
      """{"@event_name":"ping","ping_time":"2023-11-14T22:13:20"}""")
    assert((0 until rapid2.inspector.size).map(rapid2.inspector.message)
      .exists(_.contains("\"pong\"")))
    rapid2.stop()
  }

  test("a stopped fanout rapid reports not running even if its lazy query never started") {
    val rapid = new MemoryRapid(TestSpark.spark, "fanout-idle", fanout = true)
    rapid.register(eventRiver("a")) { r => r.passed.select(col("key"), col("value")) }
    assert(rapid.isRunning) // registered, nothing failed
    rapid.stop()            // stopped before any send: no query ever existed
    assert(!rapid.isRunning, "a drained rapid must not report alive")
  }

  test("sink batch options drop only the checkpoint (the fanout query's own)") {
    val cfg = KafkaRapidConfig("b:9092", "rapid", checkpointLocation = "/durable/ckpt")
    assert(cfg.sinkBatchOptions == cfg.sinkOptions - "checkpointLocation")
    assert(cfg.sinkBatchOptions.contains("kafka.enable.idempotence"))
    assert(cfg.sinkBatchOptions("topic") == "rapid")
  }
}

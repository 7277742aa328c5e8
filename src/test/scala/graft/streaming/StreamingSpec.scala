package graft.streaming

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.messages.{Envelope, River, Validation}

/** In-memory end-to-end pipeline tests — the TestRapid / PingPongTest /
  * RapidApplicationComponentTest analogues (SURVEY §3.3, §5.3).
  */
class StreamingSpec extends AnyFunSuite {

  test("MemoryRapid roundtrip: river filters, replies captured, key-sticky (TestRapidTest.kt:18-35)") {
    val spark = TestSpark.spark
    val rapid = new MemoryRapid(spark, "t1")
    rapid.register(
      River().precondition(Validation.requireValue("@event_name", "ping"))) { routed =>
      routed.passed.select(
        col("key"),
        lit("""{"@event_name":"pong"}""").as("value"))
    }
    rapid.sendTestMessage("""{"@event_name":"ping"}""", key = "k-1")
    rapid.sendTestMessage("""{"@event_name":"other"}""", key = "k-2")
    val insp = rapid.inspector
    assert(insp.size == 1)
    assert(insp.key(0) == "k-1") // reply inherits incoming key, KeyMessageContext.kt:7-10
    assert(insp.field(0, "@event_name").contains("pong"))
    rapid.stop()
  }

  test("multi-river fanout: EVERY registered river sees EVERY message (RapidsConnection.kt:44-55)") {
    val spark = TestSpark.spark
    val rapid = new MemoryRapid(spark, "fanout")
    rapid.register(
      River().precondition(Validation.requireValue("@event_name", "ping"))) { r =>
      r.passed.select(col("key"), lit("""{"seen":"by-ping-river"}""").as("value"))
    }
    rapid.register(
      River().validate(Validation.requireKey("@event_name"))) { r =>
      r.passed.select(col("key"), lit("""{"seen":"by-all-river"}""").as("value"))
    }
    rapid.sendTestMessage("""{"@event_name":"ping"}""", "k1")
    val insp = rapid.inspector
    val bodies = (0 until insp.size).map(insp.message)
    // a shared MemoryStream would let the first query's commit starve the
    // second river — both rivers must reply
    assert(bodies.exists(_.contains("by-ping-river")), s"got $bodies")
    assert(bodies.exists(_.contains("by-all-river")), s"got $bodies")
    rapid.stop()
  }

  test("Republish preserves undeclared fields through mutation (JsonMessage.kt:773-779)") {
    val spark = TestSpark.spark
    spark.conf.set("spark.sql.mapKeyDedupPolicy", "LAST_WIN")
    val in = TestSpark.messages(
      """{"@id":"orig-id","@event_name":"ping","@opprettet":"2024-01-01T00:00:00","system_read_count":0,"undeclared_nested":{"deep":[1,2,{"x":"y"}]},"untouched":"v"}""")
      .withColumn("key", lit("k"))
    val out = Republish(
      in,
      mutations = Seq("@event_name" -> lit("pong"), "pong_time" -> lit("2024-01-01T00:00:05")),
      serviceName = "app", instanceId = "i-1",
      idGen = Envelope.SeededIdGen(lit("seed")),
      now = lit("2024-01-01T00:00:05").cast("timestamp"))
    val json = out.select(col("value")).first().getString(0)
    val v = TestSpark.messages(json).select(
      get_json_object(col("value"), "$['undeclared_nested']['deep'][2]['x']"),
      get_json_object(col("value"), "$['untouched']"),
      get_json_object(col("value"), "$['@event_name']"),
      get_json_object(col("value"), "$['pong_time']"),
      get_json_object(col("value"), "$['system_read_count']"),
      get_json_object(col("value"), "$['@forårsaket_av']['id']"),
      get_json_object(col("value"), "$['@id']")).first()
    assert(v.getString(0) == "y") // nested passthrough survives byte-faithfully
    assert(v.getString(1) == "v")
    assert(v.getString(2) == "pong")
    assert(v.getString(3) == "2024-01-01T00:00:05")
    assert(v.getString(4) == "1") // read count incremented
    assert(v.getString(5) == "orig-id") // caused-by traces the origin
    assert(v.getString(6) != "orig-id") // fresh @id
  }

  test("PingPong: stale pings dropped, rate-limited per instance, pong enriched (PingPong.kt:23-43)") {
    val spark = TestSpark.spark
    import spark.implicits._
    val base = 1700000000000L
    val clock = () => base + 10000L // fixed "now": 10s after base
    val rapid = new MemoryRapid(spark, "pp")
    rapid.register(
      River()
        .precondition(Validation.requireValue("@event_name", "ping"))
        .validate(Validation.requireKey("ping_time"))) { routed =>
      PingPong(routed, "app", "i-1", clock)
    }
    def ping(id: String, atMs: Long): String =
      s"""{"@event_name":"ping","@id":"$id","ping_time":"${new java.sql.Timestamp(atMs).toInstant.toString.stripSuffix("Z")}"}"""
    rapid.sendTestMessage(ping("p1", base), "k")          // answered
    rapid.sendTestMessage(ping("p2", base + 1000), "k")   // within 5s of p1 -> dropped
    rapid.sendTestMessage(ping("p3", base + 6000), "k")   // answered
    rapid.sendTestMessage(ping("p4", base - 2 * 60 * 60 * 1000), "k") // >1h old -> dropped
    val insp = rapid.inspector
    assert(insp.size == 2)
    assert(insp.field(0, "@event_name").contains("pong"))
    assert(insp.field(0, "app_name").contains("app"))
    assert(insp.field(1, "ping_time").isDefined)
    rapid.stop()
  }

  test("streaming dedup by @id compensates at-least-once redelivery (SURVEY 2.7)") {
    val spark = TestSpark.spark
    val msgs = TestSpark.messages(
      """{"@id":"a","@opprettet":"2024-01-01T00:00:00"}""",
      """{"@id":"a","@opprettet":"2024-01-01T00:00:00"}""",
      """{"@id":"b","@opprettet":"2024-01-01T00:00:01"}""")
      .select(col("value"),
        get_json_object(col("value"), "$['@id']").as("id"),
        get_json_object(col("value"), "$['@opprettet']").cast("timestamp").as("otime"))
    // batch form of the same expression pipeline (streaming adds watermark state)
    assert(Dedupe.byId(msgs, "id", "otime").count() == 2)
  }
}

package graft.messages

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** River routing semantics (reference River.kt:52-65, RiverTest.kt:51-79). */
class RiverSpec extends AnyFunSuite {

  private val river = River()
    .precondition(Validation.requireValue("@event_name", "ping"))
    .validate(Validation.requireKey("ping_time"))

  private def statusOf(json: String): String =
    river.attach(TestSpark.messages(json), col("value")).all
      .select(col("status")).first().getString(0)

  test("full pipeline routing: parse -> precondition -> validation -> passed") {
    assert(statusOf("""{"@event_name":"ping","ping_time":"2024-01-01T00:00:00"}""") == "passed")
    assert(statusOf("""{"@event_name":"pong","ping_time":"x"}""") == "precondition_failed")
    assert(statusOf("""{"@event_name":"ping"}""") == "validation_failed")
    assert(statusOf(""""just a string"""") == "unparseable")
    assert(statusOf("""[1,2,3]""") == "unparseable")
    assert(statusOf("""{not json""") == "unparseable")
  }

  test("a river with no rules passes every JSON object (RiverTest 'no validations')") {
    val bare = River()
    def st(json: String) = bare.attach(TestSpark.messages(json), col("value")).all
      .select(col("status")).first().getString(0)
    assert(st("""{"anything": 1}""") == "passed")
    assert(st("""{}""") == "passed")
    // non-objects are still severe — parse is the zeroth precondition
    assert(st("""[1]""") == "unparseable")
    assert(st("""not json""") == "unparseable")
  }

  test("tombstones (null values) are dropped (KafkaRapid.kt:162-163)") {
    val df = TestSpark.spark.createDataFrame(
      java.util.List.of[org.apache.spark.sql.Row](
        org.apache.spark.sql.Row(null: String),
        org.apache.spark.sql.Row("""{"@event_name":"ping","ping_time":"t"}""")),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("value",
          org.apache.spark.sql.types.StringType))))
    assert(river.attach(df, col("value")).all.count() == 1)
  }

  test("problems accumulate all failed checks with severity (MessageProblems.kt:7-18)") {
    val r2 = River().validate(
      Validation.requireKey("a"), Validation.requireKey("b"), Validation.requireValue("c", "x"))
    val row = r2.attach(TestSpark.messages("""{"c":"y"}"""), col("value")).all
      .select(col("status"), col("problems")).first()
    assert(row.getString(0) == "validation_failed")
    val problems = row.getSeq[org.apache.spark.sql.Row](1)
    assert(problems.size == 3)
    assert(problems.forall(_.getString(0) == "error"))
  }

  test("precondition failures report severe and skip validation problems (River.kt:57-60)") {
    val row = river.attach(
        TestSpark.messages("""{"@event_name":"pong"}"""), col("value")).all
      .select(col("problems")).first()
    val problems = row.getSeq[org.apache.spark.sql.Row](0)
    assert(problems.size == 1 && problems.head.getString(0) == "severe")
  }

  test("declare-before-read: undeclared key raises at plan time (JsonMessage.kt:759-771)") {
    val routed = river.attach(TestSpark.messages("""{}"""), col("value"))
    assertThrows[IllegalArgumentException](routed.packet("undeclared"))
    routed.packet("ping_time") // declared: fine
  }

  test("unicode envelope keys route through bracket paths (@løsning, @forårsaket_av)") {
    val r = River().validate(
      Validation.requireKey("@løsning.Inntekt"),
      Validation.requireKey("@forårsaket_av.id"))
    val routed = r.attach(TestSpark.messages(
      """{"@løsning":{"Inntekt":{"beløp":1}},"@forårsaket_av":{"id":"x"}}"""), col("value"))
    assert(routed.passed.count() == 1)
    assert(routed.packetAs("@forårsaket_av.id", "string") != null)
  }

  test("dead-letter projection carries raw payload and problems") {
    val routed = river.attach(TestSpark.messages(
      """{"@event_name":"ping"}""",
      """{"@event_name":"ping","ping_time":"t"}""",
      """not json"""), col("value"))
    val dl = routed.deadLetters(col("value")).collect()
    assert(dl.length == 2)
    val failed = dl.find(_.getString(1) == "validation_failed").get
    assert(failed.getString(0).contains("ping"))
    assert(failed.getString(2).contains("ping_time"))
    // unparseable dead letters carry their severe parse problem — never a
    // report claiming "No errors in message" (JsonMessage.kt:97-105)
    val bad = dl.find(_.getString(1) == "unparseable").get
    assert(bad.getString(2).contains("Invalid JSON per Jackson library"))
    assert(bad.getString(bad.fieldIndex("problems_extended_report"))
      .startsWith("Message has errors:"))
  }

  test("unparseable problems distinguish malformed text from non-object JSON (JsonMessage.kt:97-105)") {
    def problems(json: String) =
      river.attach(TestSpark.messages(json), col("value")).all
        .select(col("problems.message")).first().getSeq[String](0)
    assert(problems("""not json""") == Seq("Invalid JSON per Jackson library"))
    assert(problems("""[1,2]""")
      == Seq("Incomplete json. Should be able to cast as ObjectNode."))
    assert(problems(""""scalar"""")
      == Seq("Incomplete json. Should be able to cast as ObjectNode."))
  }

  test("dead letters carry the originating record trace (MDC.kt:6-17, KafkaRapid.kt:160-174)") {
    // simulate the KafkaRapid.stream projection: value + record coordinates
    val src = TestSpark.messages("""{"@event_name":"pong","@id":"id-7"}""")
      .withColumn("topic", lit("rapid.v1"))
      .withColumn("partition", lit(3))
      .withColumn("offset", lit(42L))
      .withColumn("key", lit("k-9"))
    val routed = river.attach(src, col("value"))
    val t = routed.deadLetters(col("value"))
      .select(col("trace.topic"), col("trace.partition"), col("trace.offset"),
        col("trace.key"), col("trace.id"), col("trace.event_name")).first()
    assert(t.getString(0) == "rapid.v1" && t.getInt(1) == 3 && t.getLong(2) == 42L)
    assert(t.getString(3) == "k-9" && t.getString(4) == "id-7" && t.getString(5) == "pong")
    // file-source rivers (no record coordinates) still trace the envelope
    val bare = river.attach(TestSpark.messages("""{"@event_name":"pong","@id":"id-8"}"""),
      col("value"))
    val bt = bare.deadLetters(col("value")).select(col("trace")).first().getStruct(0)
    assert(bt.isNullAt(0) && bt.getString(4) == "id-8")
  }

  test("republished replies carry the originating trace as system_trace") {
    val src = TestSpark.messages("""{"@event_name":"need","@id":"orig-1","data":1}""")
      .withColumn("topic", lit("rapid.v1"))
      .withColumn("partition", lit(0))
      .withColumn("offset", lit(7L))
      .withColumn("key", lit("k"))
    val routed = River().precondition(Validation.requireValue("@event_name", "need"))
      .attach(src, col("value"))
    val reply = graft.streaming.Republish(
      routed.passed, Seq("solved" -> lit(true)), "solver", "i-1",
      trace = Some(routed.trace(col("value"))))
      .select(get_json_object(col("value"), "$['system_trace']['offset']").as("off"),
        get_json_object(col("value"), "$['system_trace']['id']").as("oid"),
        get_json_object(col("value"), "$['data']").as("passthrough"))
      .first()
    assert(reply.getString(0) == "7" && reply.getString(1) == "orig-1")
    assert(reply.getString(2) == "1")
  }

  test("fast (struct) path and variant path route and read identically") {
    val msgs = TestSpark.messages(
      """{"a":"x","b":"y","d":7}""",          // passes
      """{"a":"x","b":"z"}""",                // b wrong value
      """{"b":"y"}""",                        // a missing
      """{"a":null,"b":"y"}""",               // a JSON-null
      """{"a":"x","b":"y","c":1}""",          // c forbidden
      """{"a":"x","b":3}""",                  // b wrong type
      """[1,2,3]""", """3""", """not json""") // non-objects / malformed
    def rules(r: River) = r.validate(
      Validation.requireKey("a"), Validation.requireValue("b", "y"),
      Validation.forbid("c"), Validation.interestedIn("d"))
    val fast = rules(River())
    // a msg-level predicate (always true) forces the variant path
    val slow = rules(River().precondition(Validation.predicate("t", _ => lit(true))))
    val fr = fast.attach(msgs, col("value"))
    val sr = slow.attach(msgs, col("value"))
    assert(fr.structMsg && !sr.structMsg) // modes actually differ
    def dump(r: Routed) = r.all
      .select(col("value"), col("status"), to_json(col("problems")).as("p"),
        r.packetAs("d", "int").as("d"))
      .collect().map(x => (x.getString(0), x.getString(1), x.getString(2),
        if (x.isNullAt(3)) -1 else x.getInt(3))).toSet
    assert(dump(fr) == dump(sr))
  }

  test("one infix block auto-routes severity: must=>severe, should=>error (MessageValidation.kt:54-78)") {
    import Validation._
    val r = River().rules(
      "@event_name" must be("order"),
      "amount" should exist,
      "note" can exist)
    def route(json: String) =
      r.attach(TestSpark.messages(json), col("value")).all
        .select(col("status"), to_json(col("problems")).as("p")).first()
    // must-failure: precondition stage, severe problem
    val mustFail = route("""{"@event_name":"other","amount":1}""")
    assert(mustFail.getString(0) == "precondition_failed")
    assert(mustFail.getString(1).contains("severe"))
    // should-failure only: validation stage, error problem
    val shouldFail = route("""{"@event_name":"order"}""")
    assert(shouldFail.getString(0) == "validation_failed")
    assert(shouldFail.getString(1).contains("error"))
    assert(route("""{"@event_name":"order","amount":5}""").getString(0) == "passed")
  }

  test("can is should(optional): missing fine, present value must validate (MessageValidation.kt:33-36,73-74)") {
    import Validation._
    val r = River().rules("status" can be("ok"))
    def st(json: String) =
      r.attach(TestSpark.messages(json), col("value")).all
        .select(col("status")).first().getString(0)
    assert(st("""{}""") == "passed")                  // missing: fine
    assert(st("""{"status":null}""") == "passed")     // JSON null: fine
    assert(st("""{"status":"ok"}""") == "passed")
    assert(st("""{"status":"bad"}""") == "validation_failed")
  }

  test("multi-river fanout: independent rivers over one stream (RapidsConnection.kt:44-55)") {
    val msgs = TestSpark.messages(
      """{"@event_name":"ping","ping_time":"t"}""",
      """{"@event_name":"pong","pong_time":"t"}""")
    val pings = River().precondition(Validation.requireValue("@event_name", "ping"))
    val pongs = River().precondition(Validation.requireValue("@event_name", "pong"))
    assert(pings.attach(msgs, col("value")).passed.count() == 1)
    assert(pongs.attach(msgs, col("value")).passed.count() == 1)
  }
}

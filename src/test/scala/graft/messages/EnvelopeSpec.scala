package graft.messages

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Envelope projections and enrichment (JsonMessage.kt:111-145). */
class EnvelopeSpec extends AnyFunSuite {

  private def project(json: String)(c: org.apache.spark.sql.Column => org.apache.spark.sql.Column) =
    TestSpark.messages(json).select(c(try_parse_json(col("value"))).as("r")).first()

  test("eventName defaults to ukjent (JsonMessage.kt:38,111)") {
    assert(project("""{"@event_name":"x"}""")(Envelope.eventName).getString(0) == "x")
    assert(project("""{}""")(Envelope.eventName).getString(0) == "ukjent")
  }

  test("behov: empty array projects as null (JsonMessageTest.kt:1150-1156)") {
    assert(project("""{"@behov":["A","B"]}""")(Envelope.behov).getSeq[String](0) == Seq("A", "B"))
    assert(project("""{"@behov":[]}""")(Envelope.behov).isNullAt(0))
    assert(project("""{}""")(Envelope.behov).isNullAt(0))
  }

  test("solutions are the keys of the @løsning object (JsonMessage.kt:117-125)") {
    val r = TestSpark.messages("""{"@løsning":{"Inntekt":{"beløp":1},"Sykepengehistorikk":[]}}""")
      .select(Envelope.solutions(col("value")).as("r")).first()
    assert(r.getSeq[String](0).toSet == Set("Inntekt", "Sykepengehistorikk"))
  }

  test("participatingServices: distinct non-null service names (JsonMessage.kt:113-115)") {
    val json =
      """{"system_participating_services":[
        |{"id":"1","time":"t","service":"a"},
        |{"id":"2","time":"t"},
        |{"id":"3","time":"t","service":"b"},
        |{"id":"4","time":"t","service":"a"}]}""".stripMargin.replaceAll("\n", "")
    assert(project(json)(Envelope.participatingServices).getSeq[String](0).toSet == Set("a", "b"))
  }

  test("read-count increment: missing -> 0, n -> n+1 (JsonMessage.kt:134)") {
    val r = TestSpark.messages("{}").select(
      Envelope.incrementReadCount(lit(null).cast("int")),
      Envelope.incrementReadCount(lit(4))).first()
    assert(r.getInt(0) == 0 && r.getInt(1) == 5)
  }

  test("participating-services append initializes or appends (JsonMessage.kt:91-94)") {
    val appended = Envelope.appendParticipatingService(
      lit(null).cast(Envelope.ParticipatingServiceDdl),
      lit("id1"), lit("2024-01-01 00:00:00").cast("timestamp"),
      lit("svc"), lit("inst"), lit(null).cast("string"))
    val r = TestSpark.messages("{}").select(size(appended)).first()
    assert(r.getInt(0) == 1)
  }
}

package graft.messages

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.functions.Converters

/** Truth tables from the reference conformance suite
  * (JsonMessageTest.kt — missing / null / wrong-type / wrong-value / match
  * per predicate; SURVEY §5.1).
  */
class ValidationSpec extends AnyFunSuite {

  /** Evaluate a rule against one JSON message. */
  private def check(rule: Validation.Rule, json: String): Boolean = {
    val df = TestSpark.messages(json)
      .select(coalesce(rule(try_parse_json(col("value"))), lit(false)).as("r"))
    df.first().getBoolean(0)
  }

  test("requireKey: missing fails, null fails, value passes (JsonMessageTest.kt:713)") {
    val r = Validation.requireKey("foo")
    assert(!check(r, """{}"""))
    assert(!check(r, """{"foo": null}"""))
    assert(check(r, """{"foo": "bar"}"""))
    assert(check(r, """{"foo": 0}"""))
    assert(check(r, """{"foo": false}"""))
  }

  test("nested keys with dot paths (JsonMessageTest.kt:297-310)") {
    val r = Validation.requireKey("foo.bar")
    assert(check(r, """{"foo": {"bar": "baz"}}"""))
    assert(!check(r, """{"foo": {}}"""))
    assert(!check(r, """{"foo": "bar"}"""))
  }

  test("requireValue string: type and value must match (JsonMessageTest.kt:713-729)") {
    val r = Validation.requireValue("foo", "bar")
    assert(check(r, """{"foo": "bar"}"""))
    assert(!check(r, """{"foo": "baz"}"""))
    assert(!check(r, """{}"""))
    assert(!check(r, """{"foo": null}"""))
    assert(!check(r, """{"foo": 3}"""))
  }

  test("requireValue number: string \"3\" is not number 3 (JsonMessageTest.kt:732-742)") {
    val r = Validation.requireValue("foo", 3.0)
    assert(check(r, """{"foo": 3}"""))
    assert(check(r, """{"foo": 3.0}"""))
    assert(!check(r, """{"foo": "3"}"""))
    assert(!check(r, """{"foo": 4}"""))
  }

  test("requireValue with an Int is type-strict like Kotlin Number.equals (JsonMessage.kt:648)") {
    val r = Validation.requireValue("foo", 3)
    assert(check(r, """{"foo": 3}"""))
    assert(!check(r, """{"foo": 3.0}""")) // Integer(3) != Double(3.0) in Kotlin
    assert(!check(r, """{"foo": "3"}"""))
    assert(!check(r, """{"foo": 4}"""))
    assert(!check(r, """{}"""))
    // and the message renders the Int, not a Double
    val (fast, variant) = messagesFor(r, """{"foo": 3.0}""")
    assert(fast == Seq("Required foo is not number 3"))
    assert(variant == fast)
  }

  test("requireValue boolean requires boolean type") {
    val r = Validation.requireValue("foo", value = true)
    assert(check(r, """{"foo": true}"""))
    assert(!check(r, """{"foo": "true"}"""))
    assert(!check(r, """{"foo": false}"""))
  }

  test("requireAny: string membership (JsonMessage.kt:652-657)") {
    val r = Validation.requireAny("foo", Seq("bar", "baz"))
    assert(check(r, """{"foo": "bar"}"""))
    assert(check(r, """{"foo": "baz"}"""))
    assert(!check(r, """{"foo": "qux"}"""))
    assert(!check(r, """{"foo": 1}"""))
  }

  test("requireArray and element validation (JsonMessageTest.kt:777-796)") {
    val arr = Validation.requireArray("foo")
    assert(check(arr, """{"foo": []}"""))
    assert(check(arr, """{"foo": ["a"]}"""))
    assert(!check(arr, """{"foo": "a"}"""))
    val elems = Validation.requireArrayElements("foo",
      e => try_variant_get(e, "$.bar", "string").isNotNull)
    assert(check(elems, """{"foo": [{"bar": "baz"}]}"""))
    assert(!check(elems, """{"foo": [{"bar": "baz"}, {}]}"""))
  }

  test("requireAll: array superset (JsonMessageTest.kt:613-658)") {
    val r = Validation.requireAll("foo", Seq("bar", "baz"))
    assert(check(r, """{"foo": ["bar", "baz", "qux"]}"""))
    assert(!check(r, """{"foo": ["bar"]}"""))
    assert(!check(r, """{"foo": "bar"}"""))
  }

  test("requireAllOrAny is an intersection test (JsonMessage.kt:678-685)") {
    val r = Validation.requireAllOrAny("foo", Seq("bar", "baz"))
    assert(check(r, """{"foo": ["bar"]}"""))
    assert(check(r, """{"foo": ["baz", "other"]}"""))
    assert(!check(r, """{"foo": ["other"]}"""))
  }

  test("requireContains (JsonMessage.kt:674-676)") {
    val r = Validation.requireContains("foo", "bar")
    assert(check(r, """{"foo": ["x", "bar"]}"""))
    assert(!check(r, """{"foo": ["x"]}"""))
  }

  test("forbid: present non-null fails (JsonMessageTest.kt:842-878)") {
    val r = Validation.forbid("foo")
    assert(check(r, """{}"""))
    assert(check(r, """{"foo": null}"""))
    assert(!check(r, """{"foo": "x"}"""))
  }

  test("forbidValue only fails on exact typed match (JsonMessage.kt:715-725)") {
    val r = Validation.forbidValue("foo", "bad")
    assert(check(r, """{}"""))
    assert(check(r, """{"foo": "good"}"""))
    assert(check(r, """{"foo": 3}"""))
    assert(!check(r, """{"foo": "bad"}"""))
  }

  test("interestedIn always passes; parsed variant errors only on bad parse (JsonMessage.kt:737-745)") {
    assert(check(Validation.interestedIn("foo"), """{}"""))
    val parsed = Validation.interestedInParsed("foo", Converters.asOptionalLocalDate)
    assert(check(parsed, """{}"""))
    assert(check(parsed, """{"foo": "2020-01-01"}"""))
    assert(!check(parsed, """{"foo": "tomorrow"}"""))
  }

  test("temporal converters edge cases (JsonMessageTest.kt:881-1002)") {
    def conv(c: org.apache.spark.sql.Column => org.apache.spark.sql.Column, v: String): Boolean = {
      TestSpark.messages("{}").select(c(lit(v)).isNotNull.as("r")).first().getBoolean(0)
    }
    assert(conv(Converters.asOptionalLocalDate, "2020-01-01"))
    assert(!conv(Converters.asOptionalLocalDate, ""))
    assert(!conv(Converters.asOptionalLocalDate, "2020-13-40"))
    assert(conv(Converters.asOptionalLocalDateTime, "2020-01-01T12:00:00"))
    assert(conv(Converters.asOptionalLocalDateTime, "2020-01-01T12:00:00.000000"))
    assert(!conv(Converters.asOptionalLocalDateTime, "2020-01-01"))
    assert(conv(Converters.asOptionalInstant, "2020-01-01T12:00:00Z"))
    assert(!conv(Converters.asOptionalInstant, "2020-01-01T12:00:00"))
    // lenient accepts both zoned and local (JsonMessage.kt:819-833)
    assert(conv(Converters.asOptionalLocalDateTimeLenient _, "2020-01-01T12:00:00Z"))
    assert(conv(Converters.asOptionalLocalDateTimeLenient _, "2020-01-01T12:00:00"))
    assert(conv(Converters.asOptionalYearMonth, "2020-01"))
  }

  test("uuid format validation (JsonMessage.kt:782)") {
    def ok(v: String) = TestSpark.messages("{}")
      .select(Converters.isUuid(lit(v)).as("r")).first().getBoolean(0)
    assert(ok("123e4567-e89b-12d3-a456-426614174000"))
    assert(!ok("not-a-uuid"))
  }

  test("infix DSL maps to the same rules (MessageValidation.kt:54-78)") {
    import Validation._
    assert(check("foo" must exist, """{"foo": 1}"""))
    assert(!check("foo" must exist, """{"foo": null}"""))
    assert(check("foo" should be("x"), """{"foo": "x"}"""))
    assert(!check("foo" should be("x"), """{"foo": "y"}"""))
    assert(check("foo" can exist, """{}"""))
  }

  /** Problem messages for `json` routed through a river validating `rule`,
    * on BOTH compilation paths (fast struct + whole-doc variant — a
    * message-level predicate sidekick forces the variant path).
    */
  private def messagesFor(rule: Validation.Rule, json: String): (Seq[String], Seq[String]) = {
    def run(river: River) = river.attach(TestSpark.messages(json), col("value"))
      .all.select(col("problems.message")).first().getSeq[String](0)
    val fast = run(River().validate(rule))
    val variant = run(River().validate(rule,
      Validation.predicate("always true", _ => lit(true))))
    (fast, variant)
  }

  test("problem-message truth table matches the reference's exact strings (JsonMessage.kt:633-757)") {
    import Validation._
    // (rule, message-json, expected problem messages) — both paths must agree
    val table: Seq[(Rule, String, Seq[String])] = Seq(
      // requireKey distinguishes missing from null (JsonMessage.kt:749-750)
      (requireKey("foo"), """{}""", Seq("Missing required key foo")),
      (requireKey("foo"), """{"foo": null}""", Seq("Required key foo is null")),
      (requireKey("foo"), """{"foo": 1}""", Nil),
      // require* families: missing vs wrong value/type (JsonMessage.kt:633-698)
      (requireValue("foo", "bar"), """{}""", Seq("Missing required key foo")),
      (requireValue("foo", "bar"), """{"foo": "baz"}""", Seq("Required foo is not string bar")),
      (requireValue("foo", true), """{"foo": 1}""", Seq("Required foo is not boolean true")),
      (requireValue("foo", 3.0), """{"foo": "3"}""", Seq("Required foo is not number 3.0")),
      (requireAny("foo", Seq("a", "b")), """{"foo": "c"}""",
        Seq("Required foo must be one of [a, b]")),
      (requireArray("foo"), """{"foo": 1}""", Seq("Required foo is not an array")),
      (requireAll("foo", Seq("a", "b")), """{"foo": ["a"]}""",
        Seq("Required foo does not contains [a, b]")), // reference's own typo, kt:691
      (requireAllOrAny("foo", Seq("a", "b")), """{"foo": ["c"]}""",
        Seq("Required array foo does not contain one of [a, b]")),
      (requireParsed("foo", Converters.asOptionalLocalDate), """{"foo": "xx"}""",
        Seq("Required foo did not match the predicate")),
      (requireParsed("foo", Converters.asOptionalLocalDate), """{}""",
        Seq("Missing required key foo")),
      // forbid family (JsonMessage.kt:715-731,754-757)
      (forbid("foo"), """{"foo": 1}""", Seq("Forbidden key foo exists")),
      (forbid("foo"), """{"foo": null}""", Nil),
      (forbidValue("foo", "x"), """{"foo": "x"}""", Seq("Required key foo with value x")),
      (forbidValues("foo", Seq("x", "y")), """{"foo": "y"}""",
        Seq("Required foo is one of [x, y]")),
      (interestedInParsed("foo", Converters.asOptionalLocalDate), """{"foo": "xx"}""",
        Seq("Optional foo did not match the predicate")))
    table.foreach { case (rule, json, expected) =>
      val (fast, variant) = messagesFor(rule, json)
      assert(fast == expected, s"fast path, ${rule.description} on $json")
      assert(variant == expected, s"variant path, ${rule.description} on $json")
    }
  }

  test("infix DSL emits its own key-prefixed messages and be() coerces like Jackson asString (MessageValidationTest.kt:43-147)") {
    import Validation._
    // the DSL's messages are NOT the require-family strings
    assert(messagesFor("@event_name" should exist, """{}""")._1
      == Seq("@event_name: Feltet finnes ikke"))
    assert(messagesFor("@event_name" should exist, """{"@event_name": null}""")._1
      == Seq("@event_name: Feltet finnes ikke"))
    assert(messagesFor("@event_name" should be("mitt_eventnavn"), """{"@event_name": "x"}""")._1
      == Seq("@event_name: Feltet har ikke forventet verdi mitt_eventnavn"))
    // be() compares node.asString(): numbers and booleans coerce to text
    assert(check("n" should be("3"), """{"n": 3}"""))
    assert(check("n" should be("3"), """{"n": "3"}"""))
    assert(!check("n" should be("3"), """{"n": 4}"""))
    assert(check("b" should be("true"), """{"b": true}"""))
    // Jackson edges: NullNode.asString() == "null"; missing reads ""
    assert(check("k" should be("null"), """{"k": null}"""))
    assert(check("k" should be(""), """{}"""))
    // decimals render via the DOUBLE path like Jackson (3.10 -> "3.1",
    // NOT the variant's DECIMAL "3.10"); integers stay integral ("3")
    assert(check("n" should be("3.1"), """{"n": 3.10}"""))
    assert(check("n" should be("3.1"), """{"n": 3.1}"""))
    assert(check("n" should be("3.0"), """{"n": 3.0}"""))
    assert(!check("n" should be("3"), """{"n": 3.0}""")) // DoubleNode -> "3.0"
    // both compilation paths agree
    val (fast, variant) = messagesFor("n" should be("3"), """{"n": 4}""")
    assert(fast == variant && fast == Seq("n: Feltet har ikke forventet verdi 3"))
  }

  test("requireArrayElements reports one problem per failing element with its index (JsonMessageTest.kt:777-796)") {
    import Validation._
    val rule = requireArrayElements("tags",
      e => Validation.requireKey("id").onValue.get(try_variant_get(e, "$.id", "variant")))
    // elements #0 and #2 lack `id`
    val (fast, variant) = messagesFor(rule,
      """{"tags": [{"x":1}, {"id":2}, {"y":3}]}""")
    val expected = Seq(
      "Array element #0 at tags did not pass validation",
      "Array element #2 at tags did not pass validation")
    assert(fast == expected)
    assert(variant == expected)
    // missing key and non-array still produce the require-family messages
    assert(messagesFor(rule, """{}""")._1 == Seq("Missing required key tags"))
    assert(messagesFor(rule, """{"tags": 5}""")._1 == Seq("Required tags is not an array"))
  }

  test("requireArrayElements with nested rules composes the element's own problem text (JsonMessage.kt:663-670, MessageProblems.kt:12-14)") {
    import Validation._
    // the reference's composing overload appends each nested error as
    // "$melding $it" WITHOUT String.format, so the melding's literal "%s"
    // survives into the final string — reproduced byte-for-byte
    val rule = requireArrayElements("foo", requireKey("bar"))
    val (fast, variant) = messagesFor(rule, """{"foo": [{}]}""")
    val expected =
      Seq("Array element #0 at foo did not pass validation: %s Missing required key bar")
    assert(fast == expected)
    assert(variant == expected)
    // empty array passes; all-valid elements pass (JsonMessageTest.kt:777-796)
    assert(check(rule, """{"foo": []}"""))
    assert(check(rule, """{"foo": [{"bar":"baz"}]}"""))
    assert(!check(rule, """{"foo": [{}]}"""))
    // per-element, per-rule: nested null vs missing messages compose, with
    // one problem for every failing (element, rule) pair
    val multi = requireArrayElements("foo", requireKey("bar"), requireValue("kind", "a"))
    assert(messagesFor(multi,
      """{"foo": [{"bar": null, "kind": "a"}, {"bar": 1, "kind": "b"}, {"bar": 2, "kind": "a"}]}""")._1
      == Seq(
        "Array element #0 at foo did not pass validation: %s Required key bar is null",
        "Array element #1 at foo did not pass validation: %s Required kind is not string a"))
    // missing array key / non-array keep the require-family messages
    assert(messagesFor(rule, """{}""")._1 == Seq("Missing required key foo"))
    assert(messagesFor(rule, """{"foo": "x"}""")._1 == Seq("Required foo is not an array"))
  }

  test("problems report renders the reference's toString format (MessageProblems.kt:33-36)") {
    val df = TestSpark.spark.sql(
      """SELECT array(
        |  named_struct('severity', 'severe', 'message', 'Severe one'),
        |  named_struct('severity', 'error', 'message', 'err A'),
        |  named_struct('severity', 'error', 'message', 'err B')) AS problems""".stripMargin)
    assert(df.select(Validation.report(col("problems"))).first().getString(0)
      == "S: Severe one\nE: err A\nE: err B")
    // no problems -> empty string, like joining two empty lists
    val clean = TestSpark.spark.sql(
      "SELECT cast(array() as array<struct<severity:string,message:string>>) AS problems")
    assert(clean.select(Validation.report(col("problems"))).first().getString(0) == "")
  }

  test("problems extended report renders the reference's counted sections byte-for-byte (MessageProblems.kt:23-49)") {
    val df = TestSpark.spark.sql(
      """SELECT array(
        |  named_struct('severity', 'severe', 'message', 'Severe one'),
        |  named_struct('severity', 'error', 'message', 'err A'),
        |  named_struct('severity', 'error', 'message', 'err B')) AS problems,
        |  '{"x": 1}' AS raw""".stripMargin)
    val expected =
      "Message has errors:\n\t" +
        "\nSevere errors: 1\n\tSevere one" +
        "\nErrors: 2\n\terr A\n\terr B" +
        "\n" + "Original message: {\"x\": 1}\n"
    assert(df.select(Validation.extendedReport(col("problems"), col("raw")))
      .first().getString(0) == expected)
    // errors-only: no Severe section at all
    val errOnly = TestSpark.spark.sql(
      """SELECT array(named_struct('severity', 'error', 'message', 'e1')) AS problems,
        |  'orig' AS raw""".stripMargin)
    assert(errOnly.select(Validation.extendedReport(col("problems"), col("raw")))
      .first().getString(0)
      == "Message has errors:\n\t\nErrors: 1\n\te1\nOriginal message: orig\n")
    val clean = TestSpark.spark.sql(
      """SELECT cast(array() as array<struct<severity:string,message:string>>) AS problems,
        |  'orig' AS raw""".stripMargin)
    assert(clean.select(Validation.extendedReport(col("problems"), col("raw")))
      .first().getString(0) == "No errors in message\n")
  }

  test("dead letters carry the rendered problem reports") {
    val river = River().validate(Validation.requireKey("foo"))
    val routed = river.attach(TestSpark.messages("""{"bar": 1}"""), col("value"))
    val dl = routed.deadLetters(col("value")).first()
    assert(dl.getString(dl.fieldIndex("problems_report")) == "E: Missing required key foo")
    assert(dl.getString(dl.fieldIndex("problems_extended_report"))
      == "Message has errors:\n\t\nErrors: 1\n\tMissing required key foo\n" +
        "Original message: {\"bar\": 1}\n")
  }
}

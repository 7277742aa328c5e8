package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.Converters
import graft.messages.{Envelope, River, Validation}

/** The reference's own capability surface — validation predicates, routing,
  * projection, converters, envelope enrichment (SURVEY §2.2-§2.6) — exercised
  * as oracle-checkable batch queries over the `events` fixture.
  *
  * Each query constructs JSON messages from event columns with to_json, runs
  * them through the real engine (parse_json variant + compiled Rule
  * predicates + River split), and emits plain relational output. The DuckDB
  * oracle computes the semantically-equivalent result straight from the raw
  * columns — so a hash match proves the DSL's predicate compiler implements
  * exactly the documented truth tables, end to end through JSON.
  */
object Messages {

  /** JSON message per event: the batch stand-in for a rapid record. */
  private def msgJson(): org.apache.spark.sql.Column =
    to_json(struct(
      col("event_type").as("@event_name"),
      col("event_id"),
      col("user_id"),
      col("value"),
      get_json_object(col("props"), "$.k").cast("int").as("k")))

  val queries: Seq[QueryDef] = Seq(

    // River 4-way routing (River.kt:52-65): precondition (severe stage) on
    // @event_name, validation (error stage) on value bound.
    QueryDef.sql("m1_river_route",
      """SELECT event_id,
        |  CASE WHEN event_type NOT IN ('click','purchase','view')
        |         THEN 'precondition_failed'
        |       WHEN NOT (value <= 150.0) THEN 'validation_failed'
        |       ELSE 'passed' END AS status
        |FROM events ORDER BY event_id""".stripMargin) { (s, dir) =>
      val river = River()
        .precondition(Validation.requireAny("@event_name", Seq("click", "purchase", "view")))
        .validate(Validation.predicateOn("value", "value <= 150")(
          v => try_variant_get(v, "$", "double") <= 150.0))
      river.attach(Tables.events(s, dir), msgJson())
        .all.select(col("event_id"), col("status"))
        .orderBy(col("event_id"))
    },

    // requireValue on a JSON *number* (JsonMessage.kt:645-650) read from
    // props — type-discriminated via variant.
    QueryDef.sql("m2_require_value",
      """SELECT event_id FROM events
        |WHERE json_extract(props, '$.k')::INT = 42
        |ORDER BY event_id""".stripMargin) { (s, dir) =>
      val river = River().precondition(Validation.requireValue("k", 42.0d))
      river.attach(Tables.events(s, dir), col("props"))
        .passed.select(col("event_id")).orderBy(col("event_id"))
    },

    // requireAny (JsonMessage.kt:652-657) over the constructed message.
    QueryDef.sql("m3_require_any",
      """SELECT event_id, event_type FROM events
        |WHERE event_type IN ('signup', 'error')
        |ORDER BY event_id""".stripMargin) { (s, dir) =>
      val river = River()
        .validate(Validation.requireAny("@event_name", Seq("signup", "error")))
      val routed = river.attach(Tables.events(s, dir), msgJson())
      routed.passed
        .select(col("event_id"),
          routed.packetAs("@event_name", "string").as("event_type"))
        .orderBy(col("event_id"))
    },

    // forbid (JsonMessage.kt:711-713): error_code present only on 'error'
    // events (to_json drops null fields => absent), forbid routes them out.
    QueryDef.sql("m4_forbid",
      """SELECT event_id FROM events WHERE event_type <> 'error'
        |ORDER BY event_id""".stripMargin) { (s, dir) =>
      val withCode = to_json(struct(
        col("event_id"),
        when(col("event_type") === "error", lit("E1")).as("error_code")))
      val river = River().validate(Validation.forbid("error_code"))
      river.attach(Tables.events(s, dir), withCode)
        .passed.select(col("event_id")).orderBy(col("event_id"))
    },

    // interestedIn (JsonMessage.kt:733-735): nullable projection of declared
    // keys, including one that never exists.
    QueryDef.sql("m5_interested_in",
      """SELECT event_id, json_extract(props, '$.k')::INT AS k,
        |  NULL::VARCHAR AS maybe
        |FROM events ORDER BY event_id""".stripMargin) { (s, dir) =>
      val river = River()
        .validate(Validation.interestedIn("k"), Validation.interestedIn("maybe"),
          Validation.requireKey("event_id"))
      val routed = river.attach(Tables.events(s, dir),
        to_json(struct(col("event_id"), get_json_object(col("props"), "$.k").cast("int").as("k"))))
      routed.passed.select(
          routed.packetAs("event_id", "bigint").as("event_id"),
          routed.packetAs("k", "int").as("k"),
          routed.packetAs("maybe", "string").as("maybe"))
        .orderBy(col("event_id"))
    },

    // require(key, parser) with the temporal converters (JsonMessage.kt:700-709,
    // 782-838): ISO-microsecond timestamps round-trip through JSON and parse
    // back; bucket by hour.
    QueryDef.sql("m6_converters",
      """SELECT strftime(date_trunc('day', ts), '%Y-%m-%d %H:%M:%S') AS day,
        |  CAST(count(*) AS BIGINT) AS n
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin) { (s, dir) =>
      val withTs = to_json(struct(
        col("event_id"),
        date_format(col("ts"), "yyyy-MM-dd'T'HH:mm:ss.SSSSSS").as("ts_str")))
      val river = River()
        .validate(Validation.requireParsed("ts_str", Converters.asOptionalLocalDateTime))
      val routed = river.attach(Tables.events(s, dir), withTs)
      routed.passed
        .select(Converters.asLocalDateTime(routed.packetAs("ts_str", "string")).as("pts"))
        .groupBy(date_format(date_trunc("day", col("pts")), "yyyy-MM-dd HH:mm:ss").as("day"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("day"))
    },

    // Envelope construction + read-side enrichment (JsonMessage.kt:47-58,
    // 127-136) with deterministic injected id/now — built, serialized,
    // re-parsed through the engine, projected back out.
    QueryDef.sql("m7_envelope",
      """SELECT event_id, md5(event_id::VARCHAR) AS id,
        |  strftime(ts, '%Y-%m-%dT%H:%M:%S.%f') AS opprettet,
        |  event_type AS event_name,
        |  CAST(0 AS INT) AS read_count_new,
        |  CAST(1 AS INT) AS read_count_after_hop
        |FROM events ORDER BY event_id""".stripMargin) { (s, dir) =>
      val msg = Envelope.newMessage(
        eventName = col("event_type"),
        fields = Seq("event_id" -> col("event_id")),
        idGen = Envelope.SeededIdGen(col("event_id")),
        now = col("ts"))
      val river = River().validate(
        Validation.requireKey("@id"), Validation.requireKey("@opprettet"),
        Validation.requireKey("@event_name"), Validation.requireKey("system_read_count"),
        Validation.requireKey("event_id"))
      val routed = river.attach(Tables.events(s, dir), msg)
      routed.passed.select(
          routed.packetAs("event_id", "bigint").as("event_id"),
          routed.packetAs("@id", "string").as("id"),
          routed.packetAs("@opprettet", "string").as("opprettet"),
          routed.packetAs("@event_name", "string").as("event_name"),
          routed.packetAs("system_read_count", "int").as("read_count_new"),
          Envelope.incrementReadCount(routed.packetAs("system_read_count", "int"))
            .cast("int").as("read_count_after_hop"))
        .orderBy(col("event_id"))
    },

    // Array predicates requireAll / requireAllOrAny (JsonMessage.kt:678-698)
    // over a constructed tags array.
    QueryDef.sql("m8_array_ops",
      """SELECT event_id,
        |  (event_type = 'signup') AS all_pass,
        |  (event_type IN ('purchase', 'view')) AS any_pass
        |FROM events ORDER BY event_id""".stripMargin) { (s, dir) =>
      val tagged = to_json(struct(
        col("event_id"),
        array(lit("a"), col("event_type")).as("tags")))
      val allRule = Validation.requireAll("tags", Seq("signup", "a"))
      val anyRule = Validation.requireAllOrAny("tags", Seq("purchase", "view"))
      val river = River().validate(Validation.requireKey("event_id"),
        Validation.requireArray("tags"))
      val routed = river.attach(Tables.events(s, dir), tagged)
      routed.passed.select(
          routed.packetAs("event_id", "bigint").as("event_id"),
          coalesce(allRule.onValue.get(routed.packet("tags")), lit(false)).as("all_pass"),
          coalesce(anyRule.onValue.get(routed.packet("tags")), lit(false)).as("any_pass"))
        .orderBy(col("event_id"))
    },

    // MessageProblems accumulation (MessageProblems.kt:7-18): number of
    // failed error-stage validations per message.
    QueryDef.sql("m9_problems",
      """SELECT event_id,
        |  (CASE WHEN event_type <> 'click' THEN 1 ELSE 0 END
        |   + CASE WHEN NOT (value > 100.0) THEN 1 ELSE 0 END
        |   + 1)::INT AS n_problems
        |FROM events ORDER BY event_id""".stripMargin) { (s, dir) =>
      val river = River().validate(
        Validation.requireValue("@event_name", "click"),
        Validation.predicate("value > 100",
          m => try_variant_get(m, "$.value", "double") > 100.0),
        Validation.requireKey("nonexistent_key"))
      river.attach(Tables.events(s, dir), msgJson())
        .all.select(col("event_id"), size(col("problems")).cast("int").as("n_problems"))
        .orderBy(col("event_id"))
    }
  )
}

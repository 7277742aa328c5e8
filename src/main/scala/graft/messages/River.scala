package graft.messages

import org.apache.spark.sql.{Column, DataFrame, Observation}
import org.apache.spark.sql.functions._

import Validation.Rule

/** The river: a declarative filtered sub-stream over a JSON message stream
  * (reference: River.kt:17-65; SURVEY §2.6).
  *
  * The reference's per-message pipeline
  *   parse --severe--> onSevere
  *     preconditions --any error--> onPreconditionError
  *       validations --any error--> onError
  *         onPacket
  * becomes a single projection computing (msg, status, problems) in one pass
  * — a 4-way split of one DataFrame, whole-stage-codegen'd, instead of four
  * interpreted callback layers. Works identically on batch DataFrames and
  * Structured Streaming DataFrames (same expression layer both ways).
  */
final case class River(
    preconditions: Seq[Rule] = Nil,
    validations: Seq[Rule] = Nil) {

  def precondition(rules: Rule*): River = copy(preconditions = preconditions ++ rules)
  def validate(rules: Rule*): River     = copy(validations = validations ++ rules)

  /** One mixed infix-DSL block (MessageValidation.kt:54-78): severity is
    * routed from the verb, not the call site — `must` rules (severe) land
    * in the precondition stage, `should`/`can` rules in the validation
    * stage. `river.rules("a" must exist, "b" should be("x"))` ≡
    * `river.precondition("a" must exist).validate("b" should be("x"))`.
    */
  def rules(rs: Rule*): River = copy(
    preconditions = preconditions ++ rs.filter(_.severe),
    validations = validations ++ rs.filterNot(_.severe))

  /** All keys this river declared — the reference's "recognized keys"
    * (JsonMessage.kt:110,759-761); only these may be read via Packet.
    */
  def declaredKeys: Set[String] =
    (preconditions ++ validations).map(_.key).filter(_.nonEmpty).toSet

  /** Attach to a DataFrame whose `jsonCol` holds raw JSON message strings.
    * Adds columns: `msg`, `status`, `problems`.
    *
    * status: unparseable | precondition_failed | validation_failed | passed.
    * Tombstones (null values) are dropped, KafkaRapid.kt:162-163.
    *
    * Two compilation modes, one semantics (same truth tables, same Routed
    * surface):
    *  - FAST PATH, when every rule is key-scoped (`onValue`) on flat keys:
    *    the message parses via schema-pruned from_json into
    *    struct<key: variant, ...> — Jackson skips undeclared fields, reads
    *    are struct-field accesses, malformed/non-object roots surface in a
    *    corrupt-record column. Measured ~2x over whole-document variant
    *    parse on the envelope suite.
    *  - VARIANT PATH otherwise (msg-level `predicate` rules, dotted keys):
    *    whole-document try_parse_json + per-key variant gets.
    */
  def attach(df: DataFrame, jsonCol: Column): Routed = {
    val rules = preconditions ++ validations
    val keys = declaredKeys.toSeq.sorted
    val fast = keys.nonEmpty && rules.forall(_.onValue.isDefined) &&
      keys.forall(k => !k.contains(".") && !k.contains("`") && k != River.CorruptCol)
    if (fast) attachFast(df, jsonCol, keys) else attachVariant(df, jsonCol)
  }

  private def attachFast(df: DataFrame, jsonCol: Column, keys: Seq[String]): Routed = {
    val corrupt = River.CorruptCol
    val ddl = (keys.map(k => s"`$k` variant") :+ s"`$corrupt` string")
      .mkString("struct<", ", ", ">")
    val schema = org.apache.spark.sql.types.DataType.fromDDL(ddl)
    // Jackson's leniencies are explicitly OFF so both compilation modes
    // accept the same strict-RFC JSON the variant parser does. Remaining
    // documented divergence: duplicate object keys (Jackson is last-wins —
    // matching the REFERENCE's Jackson behavior — while the variant parser
    // rejects them as unparseable).
    val parsed = from_json(col(River.RawCol), schema, Map(
      "columnNameOfCorruptRecord" -> corrupt,
      "mode" -> "PERMISSIVE",
      "allowSingleQuotes" -> "false",
      "allowNonNumericNumbers" -> "false"))
    // malformed JSON and non-object roots (scalars/arrays) land in the
    // corrupt-record field — the reference's "message must be a JSON
    // object" severe (JsonMessage.kt:97-105). A DATA key named like the
    // corrupt column cannot spoof it: JacksonParser only writes that field
    // on a parse failure (locked by the path-equivalence property test).
    val bad = parsed.isNull || parsed.getField(corrupt).isNotNull
    // the exposed msg struct carries ONLY the declared keys — the corrupt
    // field (which holds the full raw text of malformed payloads) must not
    // leak into downstream sinks via msg.* / to_json(msg)
    stage(df, jsonCol, parsed.dropFields(corrupt), bad,
      r => r.onValue.get(parsed.getField(r.key)), structMsg = true,
      // problem messages read the MATERIALIZED msg struct attribute (stage 2
      // runs after the fenced parse projection), not a re-parse
      valueOf = r => col("msg").getField(r.key))
  }

  private def attachVariant(df: DataFrame, jsonCol: Column): Routed = {
    val msg = try_parse_json(col(River.RawCol))
    // Reference: a message must be a JSON *object* (JsonMessage.kt:97-105);
    // scalars/arrays are severe.
    val isObject = schema_of_variant(msg).startsWith("OBJECT")
    stage(df, jsonCol, msg, msg.isNull || !isObject, r => r(msg), structMsg = false,
      valueOf = r => try_variant_get(col("msg"), JsonPaths.variantPath(r.key), "variant"))
  }

  /** Shared routing stages over a parsed message expression and a per-rule
    * flag builder.
    */
  private def stage(df: DataFrame, jsonCol: Column, msg: Column, bad: Column,
      flag: Rule => Column, structMsg: Boolean, valueOf: Rule => Column): Routed = {
    // Stage 0 — materialize the raw JSON once, fenced: the tombstone Filter
    // would otherwise inline jsonCol (often a full to_json envelope build,
    // ~10 us/row) and evaluate it a second time alongside the parse input.
    val raw = col(River.RawCol)
    // Stage 1 — ONE projection holding the parse and every rule predicate
    // as a boolean flag, each wrapped in OptimizerFence. The fence (a
    // non-deterministic identity, zero runtime cost) serves two purposes
    // here: CollapseProject refuses to inline non-deterministic fields into
    // consumers, so this projection stays physically materialized (without
    // it, column pruning + collapse re-inlined every rule tree — each with
    // its own copy of the parse — into the status expression, inside
    // CaseWhen branches where codegen subexpression elimination cannot
    // reach; measured ~1.3 s/rule on the sf0.1 envelope suite). Within this
    // projection the fences sit at field ROOTS, so the deterministic rule
    // trees below them still CSE: the parse and each shared variant read
    // evaluate once per row.
    val preFlags = preconditions.zipWithIndex.map { case (r, i) =>
      s"_p$i" -> graft.functions.OptimizerFence(coalesce(flag(r), lit(false)))
    }
    val valFlags = validations.zipWithIndex.map { case (r, i) =>
      s"_v$i" -> graft.functions.OptimizerFence(coalesce(flag(r), lit(false)))
    }
    val flagCols =
      ("_bad" -> graft.functions.OptimizerFence(bad)) +: (preFlags ++ valFlags)
    val flagged = df
      .withColumn(River.RawCol, graft.functions.OptimizerFence(jsonCol))
      .filter(raw.isNotNull) // tombstone filter
      .withColumns(Map(("msg" -> msg) +: flagCols: _*))
    // Stage 2 — status/problems as cheap boolean/literal combinations over
    // the flag ATTRIBUTES (no variant reads here). status keeps its own
    // fence: PushPredicateThroughNonJoin pushes any filter through a
    // Project whose fields are all deterministic, which would duplicate the
    // routing when-chain into every downstream filter (measured 3-6x); the
    // fence pins it so filters read the computed column.
    val anyPre = preFlags.map { case (n, _) => !col(n) }
      .reduceOption(_ || _).getOrElse(lit(false))
    val anyVal = valFlags.map { case (n, _) => !col(n) }
      .reduceOption(_ || _).getOrElse(lit(false))
    val out = flagged
      .withColumn("status", graft.functions.OptimizerFence(
        when(col("_bad"), lit("unparseable"))
          .when(anyPre, lit("precondition_failed"))
          .when(anyVal, lit("validation_failed"))
          .otherwise(lit("passed"))))
      .withColumn("problems",
        when(col("status") === "precondition_failed",
          Validation.problemsFromFlags("severe", preconditions, i => col(s"_p$i"), valueOf))
          .when(col("status") === "validation_failed",
            Validation.problemsFromFlags("error", validations, i => col(s"_v$i"), valueOf))
          // unparseable rows carry their severe parse problem (JsonMessage
          // .kt:97-105) — a dead letter must never render as "No errors"
          .when(col("status") === "unparseable", Validation.unparseableProblems(raw))
          .otherwise(array().cast("array<struct<severity:string,message:string>>")))
      .drop(flagCols.map(_._1) :+ River.RawCol: _*)
    Routed(out, declaredKeys, structMsg, declaredValues)
  }

  /** Statically-declared tag values per key (requireValue/Any/All... rules)
    * — the label sets the reference's message_counter emits per message
    * (River.kt:75-140). Known at river-declaration time, so [[Routed
    * .observed]] can compile each into a conditional counter.
    */
  def declaredValues: Map[String, Seq[String]] =
    (preconditions ++ validations)
      .filter(r => r.key.nonEmpty && r.values.nonEmpty)
      .groupBy(_.key)
      .view.mapValues(_.flatMap(_.values).distinct).toMap
}

object River {
  /** Internal column names (dropped / not part of the routed surface). */
  private[messages] val RawCol = "_graft_raw"
  private[messages] val CorruptCol = "_graft_corrupt"
}

/** The 4-way routed result. Mirrors the listener fanout onSevere /
  * onPreconditionError / onError / onPacket (River.kt:52-65) as lazily
  * filtered branches over one computed projection.
  */
final case class Routed(all: DataFrame, declared: Set[String],
    structMsg: Boolean = false,
    tagValues: Map[String, Seq[String]] = Map.empty) {

  def passed: DataFrame             = all.filter(col("status") === "passed")
  def preconditionFailed: DataFrame = all.filter(col("status") === "precondition_failed")
  def validationFailed: DataFrame   = all.filter(col("status") === "validation_failed")
  def unparseable: DataFrame        = all.filter(col("status") === "unparseable")

  /** Declare-before-read enforcement (JsonMessage.kt:759-771): reading an
    * undeclared key raises at plan-build time, preserving the reference's
    * safety property with zero runtime cost. The accessor compiles to a
    * struct-field read on the fast path and a variant path get otherwise —
    * caller code is identical either way.
    */
  def packet(key: String): Column = {
    require(declared.contains(key),
      s"Key '$key' was not declared in any precondition/validation of this river")
    if (structMsg) col("msg").getField(key)
    else try_variant_get(col("msg"), JsonPaths.variantPath(key), "variant")
  }

  /** Typed read of a declared key. */
  def packetAs(key: String, ddl: String): Column = {
    require(declared.contains(key),
      s"Key '$key' was not declared in any precondition/validation of this river")
    if (structMsg) try_variant_get(col("msg").getField(key), "$", ddl)
    else try_variant_get(col("msg"), JsonPaths.variantPath(key), ddl)
  }

  /** Per-message diagnostic trace — the Spark-native analogue of the
    * reference's MDC record context (MDC.kt:6-17; recordDiganostics,
    * KafkaRapid.kt:160-174,209-217): a struct of the source's record
    * coordinates (topic/partition/offset/key — the KafkaRapid.stream
    * metadata columns when present, null otherwise) plus the envelope's
    * @id/@event_name read from the raw payload. Executors share no
    * per-record logging context, so the trace travels WITH the data:
    * computed on demand, so the raw-JSON path reads cost only on the rows
    * actually traced (dead letters, reply enrichment), not per message.
    */
  def trace(rawCol: Column): Column = {
    def meta(name: String, tpe: String) =
      (if (all.columns.contains(name)) col(name).cast(tpe)
       else lit(null).cast(tpe)).as(name)
    struct(
      meta("topic", "string"), meta("partition", "int"), meta("offset", "bigint"),
      meta("key", "string"),
      get_json_object(rawCol, "$['@id']").as("id"),
      get_json_object(rawCol, "$['@event_name']").as("event_name"))
  }

  /** Dead-letter projection: everything that did NOT pass, with its raw
    * payload, accumulated problems, and originating [[trace]] — what the
    * reference's onError / onSevere consumers receive (River.kt:67-72),
    * correlatable to the source record like the reference's MDC'd error
    * logs. Write it to any sink (parquet dead-letter table, side topic).
    */
  def deadLetters(rawCol: Column): DataFrame =
    all.filter(col("status") =!= "passed")
      .select(rawCol.as("raw"), col("status"),
        to_json(col("problems")).as("problems_json"),
        // the reference's human-readable renderings (MessageProblems.kt:23-49)
        // alongside the structured problems: toString's "S:"/"E:" lines and
        // toExtendedReport's counted sections + original-message echo
        Validation.report(col("problems")).as("problems_report"),
        Validation.extendedReport(col("problems"), rawCol).as("problems_extended_report"),
        trace(rawCol).as("trace"))

  /** Per-river metrics (reference message_counter / on_packet timer tags,
    * River.kt:75-140): named observation over the routed stream counting
    * each routing outcome, PLUS one tagged counter per statically-declared
    * label value — `event_name_<e>` for each declared @event_name value,
    * `behov_<b>` for each declared @behov element, `losning_<k>` for each
    * declared @løsning.<k> key — mirroring the reference's message_counter
    * event_name/behov/løsninger labels. The tag values come from the
    * river's own requireValue/requireAny/requireAll declarations, so each
    * is a codegen'd conditional count: streaming-safe (observe carries no
    * state, unlike a groupBy) and zero-shuffle. Works on batch (read via
    * Observation) and streaming (StreamingQueryProgress.observedMetrics).
    */
  def observed(name: String = "river"): DataFrame =
    all.observe(name, metricExprs.head, metricExprs.tail: _*)

  /** Batch-friendly variant: read the same metrics via `obs.get`. */
  def observed(obs: Observation): DataFrame =
    all.observe(obs, metricExprs.head, metricExprs.tail: _*)

  private def metricExprs: Seq[Column] = {
    val passed = col("status") === "passed"
    // on_packet counters tag only successfully-routed messages, like the
    // reference incrementing inside onPacket (River.kt:75-96)
    val eventTags = tagValues.getOrElse("@event_name", Nil).map(e =>
      count(when(passed && packetAs("@event_name", "string") === e, 1))
        .as(s"event_name_$e"))
    val behovTags = tagValues.getOrElse("@behov", Nil).map(b =>
      count(when(passed && array_contains(
        coalesce(packetAs("@behov", "array<string>"),
          array().cast("array<string>")), b), 1))
        .as(s"behov_$b"))
    val losningTags = declared.filter(_.startsWith("@løsning.")).toSeq.sorted.map(k =>
      count(when(passed && packet(k).isNotNull && !is_variant_null(packet(k)), 1))
        .as(s"losning_${k.stripPrefix("@løsning.")}"))
    // the reference's participating_services tag (River.kt:136,211-214,
    // RiverTest's three tag cases) joins arbitrary service names into the
    // label — unbounded metric cardinality at corpus scale. The bounded
    // Spark-native form is a present/none counter pair over every parsed
    // outcome (the reference tags severe/error outcomes too), available
    // when the river declares the key (declare-before-read applies to
    // metrics like any other access).
    val svcTags = if (declared.contains("system_participating_services")) {
      val v = packet("system_participating_services")
      val parsed = col("status") =!= "unparseable"
      val present = v.isNotNull && !is_variant_null(v) &&
        size(coalesce(try_variant_get(v, "$", "array<variant>"),
          array().cast("array<variant>"))) > 0
      Seq(
        count(when(parsed && present, 1)).as("participating_services_present"),
        count(when(parsed && !present, 1)).as("participating_services_none"))
    } else Nil
    Seq(
      count(lit(1)).as("messages"),
      count(when(passed, 1)).as("passed"),
      count(when(col("status") === "precondition_failed", 1)).as("precondition_failed"),
      count(when(col("status") === "validation_failed", 1)).as("validation_failed"),
      count(when(col("status") === "unparseable", 1)).as("unparseable")) ++
      eventTags ++ behovTags ++ losningTags ++ svcTags
  }
}

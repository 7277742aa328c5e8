package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DataType

import graft.messages.Envelope

/** Mutate-then-republish preserving undeclared passthrough fields — the
  * hard requirement from SURVEY §7 (reference: packet["k"] = v upsert +
  * toJson, JsonMessage.kt:773-779, and JsonMessageContext auto-enrichment,
  * JsonMessageContext.kt:12-29).
  *
  * A message is re-parsed as map<string,variant> (parse once, all fields
  * kept verbatim as variants), envelope keys and caller mutations are
  * upserted via map_concat (LAST_WIN), and the map is serialized back —
  * fields the river never declared ride through untouched.
  */
object Republish {

  private val MapOfVariant: DataType = DataType.fromDDL("map<string,variant>")

  /** Any column as a variant value (JSON-faithful). */
  def variantOf(c: Column): Column =
    try_variant_get(parse_json(to_json(struct(c.as("v")))), "$.v", "variant")

  /** Enrich + mutate an incoming (key, value) message stream for republish.
    *
    * Applies, in the reference's order (JsonMessage.kt:69-95,127-145):
    * read-count increment, participating-services append, @forårsaket_av
    * from the original message, fresh @id/@opprettet, then the caller's
    * mutations. Returns (key, value) with the incoming key carried through
    * (key-sticky, KeyMessageContext.kt:7-10).
    */
  def apply(
      messages: DataFrame,
      mutations: Seq[(String, Column)],
      serviceName: String,
      instanceId: String,
      idGen: Envelope.IdGen = Envelope.RandomIdGen,
      now: Column = current_timestamp(),
      /** Originating-record trace ([[graft.messages.Routed.trace]]) to stamp
        * into the reply as `system_trace` — the reply-side analogue of the
        * reference's MDC record context (MDC.kt:6-17): with no shared
        * logging context across executors, the trace rides the message, so
        * a consumer can correlate a reply back to the exact source record
        * (topic/partition/offset/key/@id/@event_name) that caused it.
        */
      trace: Option[Column] = None): DataFrame = {
    // Materialize the fresh id ONCE: the reference uses the SAME id for the
    // outgoing @id and the appended participating-services entry
    // (JsonMessage.kt:82-95), and non-deterministic generators are not
    // common-subexpression-eliminated — two idGen.next occurrences would
    // yield two different ids.
    val withId = messages.withColumn("_fresh_id", idGen.next)
    val m = from_json(col("value"), MapOfVariant)
    val orig = parse_json(col("value"))
    val readCount = Envelope.incrementReadCount(
      try_variant_get(orig, "$.system_read_count", "int"))
    val services = Envelope.appendParticipatingService(
      try_variant_get(orig, "$.system_participating_services",
        Envelope.ParticipatingServiceDdl),
      col("_fresh_id"), now, lit(serviceName), lit(instanceId), lit(null).cast("string"))
    // @id is regenerated because an incoming message's id is by construction
    // inherited from the origin (the reference's regenerate-when-inherited
    // rule); a caller-set @id in `mutations` wins (applied last, LAST_WIN).
    val envelope: Seq[(String, Column)] = Seq(
      "system_read_count" -> variantOf(readCount),
      "system_participating_services" -> variantOf(services),
      "@forårsaket_av" -> variantOf(Envelope.causedBy(orig)),
      "@id" -> variantOf(col("_fresh_id")),
      "@opprettet" -> variantOf(date_format(now, "yyyy-MM-dd'T'HH:mm:ss.SSSSSS"))) ++
      trace.map(t => "system_trace" -> variantOf(t))
    val upserts = (envelope ++ mutations.map { case (k, c) => k -> variantOf(c) })
      .flatMap { case (k, c) => Seq(lit(k), c) }
    withId.select(
      col("key"),
      to_json(map_concat(m, map(upserts: _*))).as("value"))
  }
}

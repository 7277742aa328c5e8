package graft.messages

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Envelope construction and enrichment — the reference's computed columns
  * (JsonMessage.kt:36-41,47-95,127-145; SURVEY §2.5).
  *
  * Messages are represented as `map<string,variant>` so mutate-then-republish
  * preserves *undeclared* passthrough fields (the hard requirement called out
  * in SURVEY §7): parse once to a map, upsert envelope keys, serialize back.
  * Requires `spark.sql.mapKeyDedupPolicy=LAST_WIN` (set by GraftSession).
  *
  * ID generation is injectable (reference RandomIdGenerator,
  * rapids-and-rivers-api/.../River.kt:5-10) so the oracle harness can use a
  * deterministic generator while production uses uuid().
  */
object Envelope {

  /** Envelope schema fragment (FIXTURES.md §A.1). */
  val ParticipatingServiceDdl =
    "array<struct<id:string,time:string,service:string,instance:string,image:string>>"

  trait IdGen { def next: Column }
  object RandomIdGen extends IdGen { def next: Column = expr("uuid()") }
  /** Deterministic ids for oracle parity: md5 of a caller-supplied seed. */
  final case class SeededIdGen(seed: Column) extends IdGen { def next: Column = md5(seed.cast("string")) }

  // -------------------------------------------------- message construction

  /** JsonMessage.newMessage (JsonMessage.kt:47-58): fresh envelope around the
    * given field columns. `now` is injectable for determinism (the reference
    * stamps LocalDateTime.now()).
    */
  def newMessage(
      eventName: Column,
      fields: Seq[(String, Column)],
      idGen: IdGen,
      now: Column): Column = {
    val cols =
      Seq(idGen.next.as("@id"),
        date_format(now, "yyyy-MM-dd'T'HH:mm:ss.SSSSSS").as("@opprettet"),
        eventName.as("@event_name"),
        lit(0).as("system_read_count")) ++
        fields.map { case (k, c) => c.as(k) }
    to_json(struct(cols: _*))
  }

  /** newNeed (JsonMessage.kt:60-67): behov event with need list + behovId. */
  def newNeed(
      behov: Seq[String],
      fields: Seq[(String, Column)],
      idGen: IdGen,
      now: Column): Column =
    newMessage(lit("behov"),
      Seq("@behov" -> lit(behov.toArray), "@behovId" -> idGen.next) ++ fields,
      idGen, now)

  // ------------------------------------------------------ read-side enrich

  /** Read-count increment on construction-from-stream (JsonMessage.kt:134):
    * missing counts as -1 so the first read lands on 0.
    */
  def incrementReadCount(readCount: Column): Column =
    coalesce(readCount, lit(-1)) + lit(1)

  /** Append this service's entry to system_participating_services
    * (JsonMessage.kt:82-95): initialize-or-append.
    */
  def appendParticipatingService(
      services: Column, id: Column, time: Column,
      service: Column, instance: Column, image: Column): Column =
    array_append(
      coalesce(services, array().cast(ParticipatingServiceDdl)),
      struct(id.cast("string").as("id"),
        date_format(time, "yyyy-MM-dd'T'HH:mm:ss.SSSSSS").as("time"),
        service.cast("string").as("service"),
        instance.cast("string").as("instance"),
        image.cast("string").as("image")))

  // ------------------------------------------------- envelope projections
  // JsonMessage.kt:111-125 (null-safe; behov: empty array reads as null,
  // JsonMessageTest.kt:1150-1156).

  /** @event_name with the reference's default (JsonMessage.kt:38,111). */
  def eventName(msg: Column): Column =
    coalesce(try_variant_get(msg, "$['@event_name']", "string"), lit("ukjent"))

  /** @behov — empty array projects as null (JsonMessageTest.kt:1150-1156). */
  def behov(msg: Column): Column = {
    val b = try_variant_get(msg, "$['@behov']", "array<string>")
    when(size(b) === 0, lit(null).cast("array<string>")).otherwise(b)
  }

  /** Solution names: the keys of the @løsning object (JsonMessage.kt:117-125).
    * Operates on the raw JSON string (object-key introspection).
    */
  def solutions(rawJson: Column): Column =
    json_object_keys(get_json_object(rawJson, "$['@løsning']"))

  /** Distinct non-null service names from system_participating_services
    * (JsonMessage.kt:113-115).
    */
  def participatingServices(msg: Column): Column =
    array_distinct(filter(
      transform(
        try_variant_get(msg, "$.system_participating_services", ParticipatingServiceDdl),
        e => e.getField("service")),
      s => s.isNotNull))

  // -------------------------------------------------- publish-side enrich

  /** The @forårsaket_av (caused-by) trace struct built from the originating
    * message (JsonMessage.kt:69-80): {id, opprettet, event_name, behov}.
    */
  def causedBy(origMsg: Column): Column = {
    def g(k: String, ddl: String) = try_variant_get(origMsg, JsonPaths.variantPath(k), ddl)
    struct(
      g("@id", "string").as("id"),
      g("@opprettet", "string").as("opprettet"),
      g("@event_name", "string").as("event_name"),
      g("@behov", "array<string>").as("behov"))
  }

  // populateStandardFields (JsonMessage.kt:69-95, applied by
  // JsonMessageContext.publish) lives in graft.streaming.Republish: the
  // map<string,variant> upsert path that also preserves undeclared fields.
}

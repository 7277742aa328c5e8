package graft.messages

import org.apache.spark.sql.{Column, DataFrame}
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

  /** All keys this river declared — the reference's "recognized keys"
    * (JsonMessage.kt:110,759-761); only these may be read via Packet.
    */
  def declaredKeys: Set[String] =
    (preconditions ++ validations).map(_.key).filter(_.nonEmpty).toSet

  /** Attach to a DataFrame whose `jsonCol` holds raw JSON message strings.
    * Adds columns: `msg` (VARIANT), `status`, `problems`.
    *
    * status: unparseable | precondition_failed | validation_failed | passed.
    * Tombstones (null values) are dropped, KafkaRapid.kt:162-163.
    */
  def attach(df: DataFrame, jsonCol: Column): Routed = {
    val msg = try_parse_json(jsonCol)
    // Reference: a message must be a JSON *object* (JsonMessage.kt:97-105);
    // scalars/arrays are severe.
    val isObject = schema_of_variant(msg).startsWith("OBJECT")
    val severeProblems = Validation.problems(msg, "severe", preconditions)
    val errorProblems  = Validation.problems(msg, "error", validations)
    val out = df
      .filter(jsonCol.isNotNull) // tombstone filter
      .withColumn("msg", msg)
      .withColumn("_severe", severeProblems)
      .withColumn("_error", errorProblems)
      // status is wrapped in OptimizerFence (a non-deterministic no-op):
      // PushPredicateThroughNonJoin pushes ANY filter through a Project
      // whose fields are all deterministic — which would substitute the
      // full interpreted variant tree into the routing filter and evaluate
      // it twice per row (measured 3-6x on the envelope queries). A
      // non-deterministic field pins the projection; the filter then reads
      // the computed status column.
      .withColumn("status", graft.functions.OptimizerFence(
        when(msg.isNull || !isObject, lit("unparseable"))
          .when(size(col("_severe")) > 0, lit("precondition_failed"))
          .when(size(col("_error")) > 0, lit("validation_failed"))
          .otherwise(lit("passed"))))
      .withColumn("problems",
        when(col("status") === "precondition_failed", col("_severe"))
          .when(col("status") === "validation_failed", col("_error"))
          .otherwise(array().cast("array<struct<severity:string,message:string>>")))
      .drop("_severe", "_error")
    Routed(out, declaredKeys)
  }
}

/** The 4-way routed result. Mirrors the listener fanout onSevere /
  * onPreconditionError / onError / onPacket (River.kt:52-65) as lazily
  * filtered branches over one computed projection.
  */
final case class Routed(all: DataFrame, declared: Set[String]) {

  def passed: DataFrame             = all.filter(col("status") === "passed")
  def preconditionFailed: DataFrame = all.filter(col("status") === "precondition_failed")
  def validationFailed: DataFrame   = all.filter(col("status") === "validation_failed")
  def unparseable: DataFrame        = all.filter(col("status") === "unparseable")

  /** Declare-before-read enforcement (JsonMessage.kt:759-771): reading an
    * undeclared key raises at plan-build time, preserving the reference's
    * safety property with zero runtime cost.
    */
  def packet(key: String): Column = {
    require(declared.contains(key),
      s"Key '$key' was not declared in any precondition/validation of this river")
    try_variant_get(col("msg"), JsonPaths.variantPath(key), "variant")
  }

  /** Typed read of a declared key. */
  def packetAs(key: String, ddl: String): Column = {
    require(declared.contains(key),
      s"Key '$key' was not declared in any precondition/validation of this river")
    try_variant_get(col("msg"), JsonPaths.variantPath(key), ddl)
  }

  /** Dead-letter projection: everything that did NOT pass, with its raw
    * payload and accumulated problems — what the reference's onError /
    * onSevere consumers receive (River.kt:67-72). Write it to any sink
    * (parquet dead-letter table, side topic).
    */
  def deadLetters(rawCol: Column): DataFrame =
    all.filter(col("status") =!= "passed")
      .select(rawCol.as("raw"), col("status"),
        to_json(col("problems")).as("problems_json"))

  /** Per-river metrics (reference message_counter / on_packet timer tags,
    * River.kt:75-140): named observation over the routed stream counting
    * each routing outcome. Works on batch (read via Observation) and
    * streaming (StreamingQueryProgress.observedMetrics).
    */
  def observed(name: String = "river"): DataFrame =
    all.observe(name,
      count(lit(1)).as("messages"),
      count(when(col("status") === "passed", 1)).as("passed"),
      count(when(col("status") === "precondition_failed", 1)).as("precondition_failed"),
      count(when(col("status") === "validation_failed", 1)).as("validation_failed"),
      count(when(col("status") === "unparseable", 1)).as("unparseable"))
}

package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.messages.Envelope

/** Ping/pong responder (reference: PingPong.kt:23-43; SURVEY §2.7) — the
  * reference's only stateful operator.
  *
  * Semantics preserved:
  *  - drop pings older than 1 hour (PingPong.kt:34 staleness guard);
  *  - per-instance rate limit: drop pings within 5 seconds (inclusive, like
  *    the reference's `<= 5s` check) of the last *answered* ping;
  *  - the pong is the PING MUTATED IN PLACE (@event_name -> pong, pong_time
  *    + identity added — every other ping field rides through) and is
  *    published with full envelope enrichment (fresh @id/@opprettet,
  *    @forårsaket_av tracing the ping) via [[Republish]], matching the
  *    reference's packet mutation + enriching publish context.
  *
  * Implemented with flatMapGroupsWithState keyed by the responding instance
  * — Spark's keyed-state operator is the direct analogue of the reference's
  * per-instance `lastPing` field, and scales to any number of instances
  * because state is partitioned by key.
  */
object PingPong {

  val StalenessLimitMs: Long = 60L * 60 * 1000 // 1 hour
  val RateLimitMs: Long = 5000 // 5 seconds (inclusive)

  final case class PingEvent(pingTime: Timestamp, key: String, raw: String)
  final case class Answered(key: String, raw: String, pongMs: Long)

  /** Decide + update state for one instance's pings within a micro-batch.
    * `now` is the evaluation clock (injectable for tests).
    */
  def respond(now: () => Long)(
      key: String,
      pings: Iterator[PingEvent],
      state: GroupState[Long]): Iterator[Answered] = {
    var lastAnswered: Option[Long] = state.getOption
    val replies = pings.toSeq
      .filter(_.pingTime != null) // unparseable ping_time routes to onError upstream
      .sortBy(_.pingTime.getTime)
      .flatMap { p =>
        val t = p.pingTime.getTime
        val fresh = now() - t <= StalenessLimitMs
        // reference drops when within <= RateLimitMs of the last answer
        val notRateLimited = lastAnswered.forall(last => t - last > RateLimitMs)
        if (fresh && notRateLimited) {
          lastAnswered = Some(t)
          Some(Answered(p.key, p.raw, now()))
        } else None
      }
    lastAnswered.foreach(state.update)
    replies.iterator
  }

  /** Attach to a routed ping river (ping_time declared): responds over its
    * passed branch, reading ping_time via the river's packet accessor (works
    * on both the struct fast path and the variant path). Returns the
    * enriched (key, value) pong stream.
    */
  def apply(
      routed: graft.messages.Routed,
      appName: String,
      instanceId: String,
      now: () => Long = () => System.currentTimeMillis(),
      idGen: Envelope.IdGen = Envelope.RandomIdGen): DataFrame = {
    val pings = routed.passed
    val spark = pings.sparkSession
    import spark.implicits._
    val answered = pings
      .select(
        routed.packetAs("ping_time", "timestamp").as("pingTime"),
        col("key"),
        col("value").as("raw"))
      .as[PingEvent]
      .groupByKey(_ => instanceId)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        respond(now))
      .toDF("key", "value", "pongMs")
    val pongTime = timestamp_millis(col("pongMs"))
    Republish(
      answered,
      mutations = Seq(
        "@event_name" -> lit("pong"),
        "pong_time" -> date_format(pongTime, "yyyy-MM-dd'T'HH:mm:ss.SSSSSS"),
        "app_name" -> lit(appName),
        "instance_id" -> lit(instanceId)),
      serviceName = appName,
      instanceId = instanceId,
      idGen = idGen,
      now = pongTime)
  }
}

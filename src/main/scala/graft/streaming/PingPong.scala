package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Ping/pong responder (reference: PingPong.kt:23-43; SURVEY §2.7) — the
  * reference's only stateful operator.
  *
  * Semantics preserved exactly:
  *  - drop pings older than 1 hour (PingPong.kt:34 staleness guard);
  *  - per-instance rate limit: drop pings within 5 seconds of the last
  *    *answered* ping (PingPong.kt:34, mutable lastPing state);
  *  - otherwise reply with a pong carrying ping_time + pong_time + identity.
  *
  * Implemented with flatMapGroupsWithState keyed by the responding app
  * instance — Spark's keyed-state operator is the direct analogue of the
  * reference's per-instance `lastPing` field, and scales to any number of
  * instances because state is partitioned by key.
  */
object PingPong {

  val StalenessLimitMs: Long = 60L * 60 * 1000 // 1 hour
  val RateLimitMs: Long = 5000 // 5 seconds

  final case class PingEvent(id: String, pingTime: Timestamp, key: String)
  final case class PongReply(key: String, value: String)

  /** Decide + update state for one instance's pings within a micro-batch.
    * `now` is the evaluation clock (injectable for tests, like the
    * reference's Clock-free LocalDateTime.now comparisons).
    */
  def respond(appName: String, instanceId: String, now: () => Long)(
      key: String,
      pings: Iterator[PingEvent],
      state: GroupState[Long]): Iterator[PongReply] = {
    var lastAnswered: Option[Long] = state.getOption
    val replies = pings.toSeq.sortBy(_.pingTime.getTime).flatMap { p =>
      val t = p.pingTime.getTime
      val fresh = now() - t <= StalenessLimitMs
      val notRateLimited = lastAnswered.forall(last => t - last >= RateLimitMs)
      if (fresh && notRateLimited) {
        lastAnswered = Some(t)
        val pong =
          s"""{"@event_name":"pong","ping_time":"${p.pingTime.toInstant}",""" +
            s""""pong_time":"${new Timestamp(now()).toInstant}",""" +
            s""""app_name":"$appName","instance_id":"$instanceId",""" +
            s""""@forårsaket_av":{"id":"${p.id}","event_name":"ping"}}"""
        Some(PongReply(p.key, pong))
      } else None
    }
    lastAnswered.foreach(state.update)
    replies.iterator
  }

  /** Attach to a routed ping stream: expects columns (key, msg) where msg is
    * the parsed variant with @id and ping_time declared.
    */
  def apply(
      pings: DataFrame,
      appName: String,
      instanceId: String,
      now: () => Long = () => System.currentTimeMillis()): Dataset[PongReply] = {
    val spark = pings.sparkSession
    import spark.implicits._
    pings
      .select(
        try_variant_get(col("msg"), "$['@id']", "string").as("id"),
        try_variant_get(col("msg"), "$.ping_time", "timestamp").as("pingTime"),
        col("key"))
      .as[PingEvent]
      .groupByKey(_ => instanceId)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        respond(appName, instanceId, now))
  }
}

package graft.streaming

import java.time.LocalDateTime
import java.util.UUID

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.StreamingQueryListener

/** Application lifecycle events (reference: RapidApplication.kt:94-139;
  * SURVEY §2.7): publish application_up / application_ready /
  * application_not_ready / application_stop / application_down as rapid
  * messages on state transitions.
  *
  * Spark mapping: a StreamingQueryListener publishes ready/down on query
  * start/termination (the engine's own lifecycle), and the explicit up/stop
  * hooks mirror the app shell's start/shutdown callbacks.
  */
object Lifecycle {

  val Events = Seq("application_up", "application_ready", "application_not_ready",
    "application_stop", "application_down")

  /** Minimal JSON string escaping (quote, backslash, control chars) so a
    * caller-supplied app/instance name can never emit invalid JSON onto
    * the rapid.
    */
  private[streaming] def jsonEscape(s: String): String =
    s.flatMap {
      case '"'           => "\\\""
      case '\\'          => "\\\\"
      case c if c < ' '  => f"\\u${c.toInt}%04x"
      case c             => c.toString
    }

  /** Lifecycle message (RapidApplication.kt:119-139 shape). */
  def event(name: String, appName: String, instanceId: String): String = {
    require(Events.contains(name), s"unknown lifecycle event $name")
    s"""{"@event_name":"$name","@id":"${UUID.randomUUID()}",""" +
      s""""@opprettet":"${LocalDateTime.now()}","app_name":"${jsonEscape(appName)}",""" +
      s""""instance_id":"${jsonEscape(instanceId)}"}"""
  }

  /** Listener publishing ready/down on streaming query lifecycle. Returns
    * the listener so callers can remove it on shutdown.
    *
    * The listener bus is session-global, so events are filtered through
    * `owns` (membership test on the query id — this app's rivers): two apps
    * sharing a SparkSession don't see each other's lifecycle.
    *
    * STARTED events are additionally matched by `ownsName` (query-name
    * predicate): QueryStartedEvent is delivered SYNCHRONOUSLY inside
    * `start()`, before the caller can learn the new query's id and record
    * it — an id-only filter can never match the ready event. Query names
    * are caller-chosen (the rapid prefixes its own name), so name matching
    * is race-free where id matching cannot be.
    *
    * Readiness is latched ONCE per attach: the reference publishes a single
    * application_ready per app startup (RapidApplication.kt:94-103), so the
    * first owned query's start flips it and later river/fanout query starts
    * stay silent. application_down stays per-owned-query — the app shell
    * counts terminations against it on shutdown.
    */
  def attach(spark: SparkSession, appName: String, instanceId: String,
             owns: java.util.UUID => Boolean = _ => true,
             ownsName: String => Boolean = _ => false)(
      publish: String => Unit): StreamingQueryListener = {
    val readyLatched = new java.util.concurrent.atomic.AtomicBoolean(false)
    val l = new StreamingQueryListener {
      override def onQueryStarted(e: StreamingQueryListener.QueryStartedEvent): Unit =
        if ((owns(e.id) || (e.name != null && ownsName(e.name))) &&
            readyLatched.compareAndSet(false, true))
          publish(event("application_ready", appName, instanceId))
      override def onQueryProgress(e: StreamingQueryListener.QueryProgressEvent): Unit = ()
      override def onQueryTerminated(e: StreamingQueryListener.QueryTerminatedEvent): Unit =
        if (owns(e.id)) publish(event("application_down", appName, instanceId))
    }
    spark.streams.addListener(l)
    publish(event("application_up", appName, instanceId))
    l
  }
}

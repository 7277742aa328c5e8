package graft.streaming

import scala.collection.mutable

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.StreamingQueryListener

/** Per-river processing timers — the reference's `on_packet_seconds` timer
  * (River.kt:75-96: a micrometer Timer around each listener's onPacket,
  * tagged rapid/river/event_name).
  *
  * Spark executes a river as micro-batches, not per-message callbacks, so
  * the native duration unit is the batch: every QueryProgressEvent already
  * carries wall-clock durations (triggerExecution = the whole batch,
  * addBatch = the sink write) and numInputRows — no instrumentation in the
  * hot path, unlike the reference's per-message Timer.start/stop pair.
  * [[Timers.attach]] folds those events into a per-river surface with the
  * reference's quantity derived as `secondsPerMessage`
  * (triggerExecution / numInputRows). Tagged per-event_name counts remain
  * on [[graft.messages.Routed.observed]], which rides the SAME progress
  * events as observedMetrics — one listener can read both.
  */
object Timers {

  /** Retained timings per query — newest-first ring semantics, like a meter
    * registry's bounded sample window. A rapid ticking every second would
    * otherwise leak ~86k entries/day/river into driver memory over the
    * handle's (app-long) life.
    */
  val MaxHistory = 128

  /** One batch's timing for one river query. */
  final case class RiverTiming(
      queryName: String,
      batchId: Long,
      numInputRows: Long,
      /** Whole-trigger wall clock (durationMs "triggerExecution"). */
      triggerMs: Long,
      /** Sink-write portion (durationMs "addBatch"); 0 for empty batches. */
      addBatchMs: Long,
      /** The on_packet_seconds analogue: batch wall clock per input message. */
      secondsPerMessage: Double)

  /** Collector handle; remove with [[detach]] (or keep for the app's life,
    * like the reference's meter registry).
    */
  final class Handle private[Timers] (
      private[Timers] val listener: StreamingQueryListener,
      state: mutable.Map[String, List[RiverTiming]]) {
    /** Most recent non-empty-batch timing per river query name. */
    def latest: Map[String, RiverTiming] =
      state.synchronized(state.view.mapValues(_.head).toMap)
    /** Newest-first batch history for one river query, at most
      * [[MaxHistory]] entries.
      */
    def history(queryName: String): Seq[RiverTiming] =
      state.synchronized(state.getOrElse(queryName, Nil))
    /** Bounded insert — newest first, oldest dropped past [[MaxHistory]]. */
    private[streaming] def record(t: RiverTiming): Unit =
      state.synchronized {
        state.update(t.queryName,
          (t :: state.getOrElse(t.queryName, Nil)).take(MaxHistory))
      }
  }

  /** Attach a progress listener recording batch timings for the queries
    * accepted by `owns` (e.g. `rapid.queryIds.contains` — the same ownership
    * filter Lifecycle uses, so co-resident rapids don't cross-pollute).
    * Batches with zero input rows are skipped: the reference's timer only
    * fires when a packet is actually read.
    */
  def attach(spark: SparkSession,
      owns: java.util.UUID => Boolean = _ => true): Handle = {
    val state = mutable.Map.empty[String, List[RiverTiming]]
    var handle: Handle = null
    val listener = new StreamingQueryListener {
      import StreamingQueryListener._
      override def onQueryStarted(e: QueryStartedEvent): Unit = ()
      override def onQueryTerminated(e: QueryTerminatedEvent): Unit = ()
      override def onQueryProgress(e: QueryProgressEvent): Unit = {
        val p = e.progress
        if (owns(p.id) && p.numInputRows > 0) {
          def dur(k: String) =
            Option(p.durationMs.get(k)).map(_.longValue).getOrElse(0L)
          handle.record(RiverTiming(
            queryName = p.name,
            batchId = p.batchId,
            numInputRows = p.numInputRows,
            triggerMs = dur("triggerExecution"),
            addBatchMs = dur("addBatch"),
            secondsPerMessage = dur("triggerExecution") / 1000.0 / p.numInputRows))
        }
      }
    }
    handle = new Handle(listener, state)
    spark.streams.addListener(listener)
    handle
  }

  def detach(spark: SparkSession, handle: Handle): Unit =
    spark.streams.removeListener(handle.listener)
}

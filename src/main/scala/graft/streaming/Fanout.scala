package graft.streaming

import org.apache.spark.sql.{DataFrame, Observation}
import org.apache.spark.sql.functions._

import graft.messages.{River, Routed}

/** Read-once listener fanout — the reference consumes each record ONCE and
  * notifies every registered listener in-process (RapidsConnection.kt:44-55;
  * MessageListener loop, KafkaRapid.kt:130-174). The naive Structured
  * Streaming translation runs one streaming query per river, which on Kafka
  * means R subscriptions, R topic scans, and R checkpoints per application —
  * R× source cost at a 100 TB topic.
  *
  * This is the single-scan form: ONE streaming query per rapid. Its
  * foreachBatch persists the micro-batch, routes every registered river's
  * 4-way split off the in-memory rows, hands each river's replies to the
  * sink, then unpersists — so the source is scanned once per micro-batch no
  * matter how many rivers are registered (SURVEY §4 item 2). Each river
  * re-parses its own schema-pruned projection off the cached rows: CPU over
  * memory-resident rows, not another source scan, and each river keeps its
  * own fast-path parse exactly as in the per-query mode.
  *
  * Error semantics come free: any river's flow throwing inside foreachBatch
  * fails THE query, which is the reference's one-dead-listener-stops-the-app
  * contract (RapidIntegrationTest.kt:126-141) without cross-query
  * propagation machinery.
  *
  * Metric granularity trade-off: per-river ROUTING COUNTS survive (each
  * branch carries an Observation, [[routeBatchObserved]]), but batch TIMING
  * is whole-rapid — the rivers execute as one fused action, so
  * [[Timers]]-style on_packet_seconds covers the batch, not one river.
  * Apps needing per-river wall-clock keep the per-river-query mode.
  */
object Fanout {

  /** One registered river and its reply flow. `name` labels the river's
    * metrics (the reference's per-listener counter tags).
    */
  final case class Registration(river: River, flow: Routed => DataFrame,
      name: String = "river")

  /** Route one micro-batch (columns: key, value, plus any source metadata)
    * through every registration off a single persisted scan, passing each
    * river's reply DataFrame to `sink`. The persist is scoped to the batch:
    * released before the micro-batch commits, so state never accumulates
    * across triggers. Each flow passes the same [[rejectStateful]] guard as
    * the unioned/observed forms — a caller reaching for the per-river-sink
    * variant gets the same loud error instead of silent per-batch state
    * resets.
    */
  def routeBatch(batch: DataFrame, regs: Seq[Registration])(
      sink: DataFrame => Unit): Unit = {
    batch.persist()
    try regs.foreach { r =>
      sink(rejectStateful(r.flow(r.river.attach(batch, col("value"))), r.name))
    }
    finally { batch.unpersist(); () }
  }

  /** Like [[routeBatch]] but hands the sink ONE unioned (key, value) reply
    * frame for the whole batch instead of one frame per river: a single
    * Spark job shares the persisted batch across every river's plan, and —
    * on Kafka — ONE producer write per trigger instead of R sequential
    * writes. Error semantics are identical (any river's branch failing
    * fails the one action, downing the query). No-op when no rivers are
    * registered. This is the production hot path: no per-river metric
    * machinery — use [[routeBatchObserved]] for that.
    */
  def routeBatchUnioned(batch: DataFrame, regs: Seq[Registration])(
      sink: DataFrame => Unit): Unit = {
    batch.persist()
    try {
      val replies = regs.map { r =>
        rejectStateful(r.flow(r.river.attach(batch, col("value"))), r.name)
          .select(col("key").cast("string").as("key"), col("value").cast("string").as("value"))
      }
      replies.reduceOption(_.unionAll(_)).foreach(sink)
    } finally { batch.unpersist(); () }
  }

  /** [[routeBatchUnioned]] + per-river routing metrics — the reference's
    * per-listener message_counter survives the single-scan mode: each
    * river's branch carries an `observe` node (a row-pass-through over its
    * routed split), so the ONE unioned action fires every river's counters
    * with zero extra Spark jobs. Returns (registration name -> this batch's
    * metric row: messages / passed / precondition_failed /
    * validation_failed / unparseable + the river's declared tag counters);
    * empty when there were no registrations (no action ran, and the sink
    * was never invoked).
    */
  def routeBatchObserved(batch: DataFrame, regs: Seq[Registration])(
      sink: DataFrame => Unit): Seq[(String, Map[String, Any])] = {
    batch.persist()
    try {
      val observations = regs.map(_ => new Observation())
      val replies = regs.zip(observations).map { case (r, o) =>
        val routed = r.river.attach(batch, col("value"))
        // the flow reads THROUGH the observe node so the union's single
        // action executes it; metrics describe the routed stream, and the
        // flow's own filters (e.g. .passed) sit above the observation
        rejectStateful(r.flow(routed.copy(all = routed.observed(o))), r.name)
          .select(col("key").cast("string").as("key"), col("value").cast("string").as("value"))
      }
      replies.reduceOption(_.unionAll(_)) match {
        case Some(all) =>
          sink(all)
          // safe to block: the sink's action completed, so every branch's
          // observation is resolved
          regs.zip(observations).map { case (r, o) => r.name -> o.get }
        case None => Nil
      }
    } finally { batch.unpersist(); () }
  }

  /** Approximate per-river cost attribution for the fused fanout action.
    * The one action cannot be timed per river (the paradigm trade-off of
    * single-scan mode), so each batch's measured wall clock is apportioned
    * by a two-tier work model over the per-branch observations: every
    * routed row costs one unit (parse + route), every PASSED row one more
    * (it continues through the flow) — so a river passing more traffic
    * attracts proportionally more of the batch wall. Weights aside, the
    * invariant is exact by construction: the per-river "est_busy_nanos"
    * entries of a batch sum to its wall clock (±1 ns rounding per river),
    * so /metrics shows a defensible, conserved seconds estimate. A batch
    * with no observed work splits evenly (idle overhead lands somewhere
    * rather than vanishing).
    */
  def attributeCost(metrics: Seq[(String, Map[String, Any])], wallNanos: Long)
      : Seq[(String, Map[String, Any])] = {
    def cnt(m: Map[String, Any], k: String): Long =
      m.get(k) match { case Some(l: Long) => l; case _ => 0L }
    val weights = metrics.map { case (_, m) => cnt(m, "messages") + cnt(m, "passed") }
    val total = weights.sum
    metrics.zip(weights).map { case ((name, m), w) =>
      val share =
        if (total > 0) wallNanos.toDouble * w / total
        else if (metrics.nonEmpty) wallNanos.toDouble / metrics.size
        else 0.0
      name -> (m + ("est_busy_nanos" -> share.round))
    }
  }

  /** Inside foreachBatch a flow runs as a per-batch BATCH job: keyed state
    * (flatMapGroupsWithState) and watermarked dedup restart EMPTY every
    * trigger — they would run without error and silently forget everything
    * between batches. Stateful rivers must keep their own streaming query
    * (MemoryRapid.registerStateful / a dedicated KafkaRapid.stream query);
    * this guard turns the silent state reset into a loud error.
    *
    * Scope: only STREAMING-INTENT operators are flagged. Plain aggregation
    * or dropDuplicates in a flow is legitimate per-batch semantics (one
    * reply per key per batch) and cannot be distinguished from cross-batch
    * intent, so it is allowed — the APIs that only make sense with
    * continuous keyed state are the ones rejected.
    */
  private def rejectStateful(replies: DataFrame, name: String): DataFrame = {
    import org.apache.spark.sql.catalyst.plans.logical.{EventTimeWatermark, FlatMapGroupsWithState}
    replies.queryExecution.logical.collectFirst {
      case _: FlatMapGroupsWithState => "flatMapGroupsWithState/mapGroupsWithState"
      case _: EventTimeWatermark     => "withWatermark (watermarked dedup/aggregation)"
    }.foreach { op =>
      throw new IllegalStateException(
        s"fanout river '$name' uses $op, whose keyed state restarts EMPTY " +
          "on every micro-batch inside foreachBatch — the operator would run " +
          "without error and silently forget all cross-batch state. Register " +
          "stateful rivers with their own streaming query " +
          "(MemoryRapid.registerStateful) instead of the shared fanout scan.")
    }
    replies
  }
}

package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** CHECKPOINT STATE AUDIT — the verification leg of the erasure story:
  * the forget-control path (CurationStream's [[CurationStream.OpForget]]
  * convention, AsOf.funnelStream's forget events) promises a purged key
  * is GONE, and the behavioral pins prove it can't influence a verdict —
  * this reads the state store itself through Spark's PUBLIC `statestore`
  * data source and proves the key is PHYSICALLY ABSENT from the
  * checkpoint. That distinction is what a GDPR auditor asks for: not
  * "the pipeline no longer uses the data" but "the data is not there" —
  * a checkpoint is a persisted file tree an operator must account for
  * exactly like the saved artifacts p53 sweeps and p54 inventories.
  *
  * Also the OPS side of the horizon knobs: [[stateReport]] is the
  * rows-per-partition accounting a team watches to decide whether a
  * gate needs its event-time horizon (firstSeen / simhash / media /
  * semGate / funnelStream all take `horizonMs`) — state growth shows up
  * here before it shows up as executor memory pressure.
  *
  * Scale shape: the `statestore` source reads the checkpoint's state
  * files directly, one task per state partition — no running query, no
  * driver collect; reports are aggregates over the state rows. Works on
  * HDFS-backed and RocksDB state stores alike (it reads the committed
  * snapshot, the same files a restart would).
  */
object StateAudit {

  /** The keyed state committed in `ckpt` as a table: `key` (struct of
    * the grouping key), `value.groupState` (the fold's state type),
    * `partition_id`. Defaults to the latest committed batch of operator
    * 0 — the [map|flatMap]GroupsWithState in every gate here.
    */
  def stateTable(spark: SparkSession, ckpt: String,
                 operatorId: Int = 0): DataFrame =
    spark.read.format("statestore")
      .option("operatorId", operatorId.toString)
      .load(ckpt)

  /** State-size accounting: rows per state partition plus the totals
    * row (partition_id = -1) — the table that says whether a horizon is
    * needed before the executors say it with an OOM.
    */
  def stateReport(spark: SparkSession, ckpt: String,
                  operatorId: Int = 0): DataFrame = {
    val t = stateTable(spark, ckpt, operatorId)
      .groupBy(col("partition_id")).agg(count(lit(1)).as("n_keys"))
    t.unionByName(
        t.agg(sum(col("n_keys")).as("n_keys"))
          .select(lit(-1).as("partition_id"), col("n_keys")))
      .orderBy(col("partition_id"))
  }

  /** ERASURE AUDIT: the state rows whose grouping key is in
    * `erasedKeys` — an erasure pipeline runs this after its forget
    * records drain and requires ZERO rows. Keys compare as strings
    * (every gate's first key field cast), so one audit covers
    * string-keyed gates (manifest hashes, funnel users) and
    * numeric-keyed ones (fingerprint buckets) alike.
    */
  def auditErased(spark: SparkSession, ckpt: String,
                  erasedKeys: Seq[String], operatorId: Int = 0): DataFrame =
    stateTable(spark, ckpt, operatorId)
      .filter(col("key").getField("value").cast("string")
        .isin(erasedKeys: _*))

  /** One live checkpoint a [[checkpointManifest]] row accounts for:
    * where it lives, whether its gate was started with an event-time
    * horizon (the config is the pipeline's to declare — a checkpoint
    * does not record it), and which stateful operator holds the keys.
    */
  final case class CheckpointEntry(artifact: String, ckpt: String,
                                   horizonConfigured: Boolean,
                                   operatorId: Int = 0)

  /** CHECKPOINT MANIFEST — p54's health table for the OTHER storage
    * class: a checkpoint is equally a persisted file tree holding
    * subject keys (this module reads them), so the inventory that
    * enumerates every saved artifact must cover running queries' state
    * too. One row per entry: key count and occupied state partitions
    * (the [[stateReport]] numbers), whether the gate runs with a
    * bounding horizon, and the erasure class — "live-purgeable", the
    * class every gate here earns by accepting op="forget" control
    * records (vs the saved artifacts' anti-filter/decrement classes).
    *
    * Scale shape: per checkpoint, one statestore read (a task per state
    * partition) feeding two aggregates; nothing is collected.
    */
  def checkpointManifest(spark: SparkSession,
                         entries: Seq[CheckpointEntry]): DataFrame = {
    require(entries.nonEmpty, "at least one checkpoint entry")
    entries.map { e =>
      stateTable(spark, e.ckpt, e.operatorId)
        .agg(count(lit(1)).as("n_keys"),
          countDistinct(col("partition_id")).as("n_partitions"))
        .select(lit(e.artifact).as("artifact"),
          lit("live-purgeable").as("erasure_class"),
          col("n_keys"), col("n_partitions"),
          lit(e.horizonConfigured).as("horizon_configured"))
    }.reduce(_.unionByName(_)).orderBy(col("artifact"))
  }

  /** The single GDPR inventory covering BOTH storage classes: p54's
    * saved-artifact manifest rows plus this module's checkpoint rows,
    * aligned on (artifact, storage_class, erasure_class, n_rows) with
    * the class-specific columns nullable on the other side — `stale`
    * is a saved-artifact question (a checkpoint is always current),
    * `horizon_configured` a live-state one.
    */
  def unifiedManifest(saved: DataFrame, checkpoints: DataFrame): DataFrame =
    saved.select(col("artifact"),
        lit("saved-artifact").as("storage_class"),
        col("erasure_class"), col("n_rows"),
        col("stale"), lit(null).cast("boolean").as("horizon_configured"))
      .unionByName(checkpoints.select(col("artifact"),
        lit("checkpoint").as("storage_class"),
        col("erasure_class"), col("n_keys").as("n_rows"),
        lit(null).cast("boolean").as("stale"), col("horizon_configured")))
      .orderBy(col("storage_class"), col("artifact"))
}

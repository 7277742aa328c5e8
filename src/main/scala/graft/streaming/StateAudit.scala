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

  /** On-disk state bytes per partition, from the checkpoint's own file
    * tree (`ckpt/state/&lt;operatorId&gt;/&lt;partitionId&gt;/...` — delta
    * and snapshot files alike, the bytes a restart replays and an
    * executor's state store must hold): one row per state partition
    * directory. The statestore source exposes rows, not sizes, so the
    * bytes come from the filesystem — a driver-side listing bounded by
    * the (config-sized) state partition count, through the Hadoop FS
    * API so HDFS/object-store checkpoints account identically to local
    * ones.
    */
  def stateBytes(spark: SparkSession, ckpt: String,
                 operatorId: Int = 0): DataFrame = {
    val root = new org.apache.hadoop.fs.Path(s"$ckpt/state/$operatorId")
    val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
    val rows =
      if (!fs.exists(root)) Seq.empty[(Int, Long)]
      else fs.listStatus(root).toSeq
        .filter(st => st.isDirectory && st.getPath.getName.forall(_.isDigit))
        .map(st => st.getPath.getName.toInt ->
          fs.getContentSummary(st.getPath).getLength)
    import spark.implicits._
    rows.toDF("partition_id", "state_bytes")
  }

  /** State-size accounting: rows AND on-disk bytes per state partition
    * plus the totals row (partition_id = -1) — the table that says
    * whether a horizon is needed before the executors say it with an
    * OOM. Keys come from the statestore source (committed snapshot);
    * bytes from the checkpoint file tree ([[stateBytes]] — a partition
    * directory can carry bytes for zero live keys, tombstones in
    * not-yet-compacted deltas, so the join is outer on both sides).
    */
  def stateReport(spark: SparkSession, ckpt: String,
                  operatorId: Int = 0): DataFrame = {
    val t = stateTable(spark, ckpt, operatorId)
      .groupBy(col("partition_id")).agg(count(lit(1)).as("n_keys"))
      .join(stateBytes(spark, ckpt, operatorId), Seq("partition_id"), "full_outer")
      .select(col("partition_id"),
        coalesce(col("n_keys"), lit(0L)).as("n_keys"),
        coalesce(col("state_bytes"), lit(0L)).as("state_bytes"))
    t.unionByName(
        t.agg(sum(col("n_keys")).as("n_keys"),
            sum(col("state_bytes")).as("state_bytes"))
          .select(lit(-1).as("partition_id"), col("n_keys"),
            col("state_bytes")))
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
      val bytes = stateBytes(spark, e.ckpt, e.operatorId)
        .agg(coalesce(sum(col("state_bytes")), lit(0L)).as("state_bytes"))
      stateTable(spark, e.ckpt, e.operatorId)
        .agg(count(lit(1)).as("n_keys"),
          countDistinct(col("partition_id")).as("n_partitions"))
        .crossJoin(broadcast(bytes))
        .select(lit(e.artifact).as("artifact"),
          lit("live-purgeable").as("erasure_class"),
          col("n_keys"), col("n_partitions"), col("state_bytes"),
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
        col("stale"), lit(null).cast("boolean").as("horizon_configured"),
        lit(null).cast("bigint").as("state_bytes"))
      .unionByName(checkpoints.select(col("artifact"),
        lit("checkpoint").as("storage_class"),
        col("erasure_class"), col("n_keys").as("n_rows"),
        lit(null).cast("boolean").as("stale"), col("horizon_configured"),
        col("state_bytes")))
      .orderBy(col("storage_class"), col("artifact"))
}

package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** At-least-once compensation (SURVEY §2.7): the reference redelivers
  * per-record on failure (KafkaRapid.kt:146-157); Spark's checkpointing
  * redelivers per-micro-batch. Idempotence is restored by deduplicating on
  * the envelope @id within the watermark horizon.
  */
object Dedupe {

  /** Drop duplicate deliveries by @id. `eventTimeCol` must be an event-time
    * timestamp column (e.g. parsed @opprettet); state is bounded by the
    * watermark delay — at 100 TB this is the only sane unbounded-stream
    * dedup: state size is O(ids within the horizon), not O(all ids).
    *
    * Id-less messages get a SYNTHETIC id first — the reference assigns @id
    * at parse time (JsonMessage.kt:129-131), so two distinct id-less
    * messages are never merged. Without this, dropDuplicates compares nulls
    * EQUAL and would silently collapse them.
    *
    * The synthetic id is DETERMINISTIC (sha2 over every column of the row),
    * not uuid(): a non-deterministic expression upstream of the dedup
    * shuffle can, on task retry, recompute a row with a different id that
    * hashes to a different partition — under Spark's non-deterministic
    * recompute semantics that can DROP the row, breaking at-least-once in
    * exactly the failure path dedup exists to protect. The trade: id-less
    * rows identical in EVERY column (key, value, event time, any source
    * metadata such as topic/partition/offset) dedup together — they are
    * indistinguishable, so collapsing them is safe where dropping a
    * distinct row is not.
    */
  def byId(messages: DataFrame, idCol: String, eventTimeCol: String,
           watermarkDelay: String = "10 minutes"): DataFrame =
    messages
      .withColumn(idCol, coalesce(col(idCol),
        concat(lit("graft-noid-"), sha2(to_json(struct(col("*"))), 256))))
      .withWatermark(eventTimeCol, watermarkDelay)
      .dropDuplicates(idCol, eventTimeCol)

  /** Dedup on @id ALONE within the watermark horizon
    * (`dropDuplicatesWithinWatermark`): unlike [[byId]], two deliveries of
    * the same id with DIFFERENT event times still collapse — the case a
    * re-publish hop produces (same @id, fresh @opprettet stamped by the
    * producer), which [[byId]]'s (id, ts) key would let through as a
    * duplicate. State is still evicted at the watermark: an id is
    * remembered for the delay window past its first sighting, so state
    * size stays O(ids within the horizon) — the only shape that survives
    * an unbounded stream.
    *
    * The trade vs [[byId]]: a LEGITIMATE reuse of an id more than the
    * delay apart still passes (horizon semantics, same as the reference's
    * practical guarantee — its consumers dedup on recent ids, not all
    * history); within the horizon, id is authoritative regardless of
    * timestamp.
    */
  def byIdWithinWatermark(messages: DataFrame, idCol: String, eventTimeCol: String,
                          watermarkDelay: String = "10 minutes"): DataFrame =
    messages
      .withColumn(idCol, coalesce(col(idCol),
        concat(lit("graft-noid-"), sha2(to_json(struct(col("*"))), 256))))
      .withWatermark(eventTimeCol, watermarkDelay)
      .dropDuplicatesWithinWatermark(idCol)
}

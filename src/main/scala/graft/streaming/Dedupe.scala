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
    * Id-less messages get a FRESH generated id first — the reference
    * assigns @id at parse time (JsonMessage.kt:129-131), so two distinct
    * id-less messages are never merged. Without this, dropDuplicates
    * compares nulls EQUAL and would silently collapse them. Like the
    * reference (which re-generates on every re-read), a redelivered id-less
    * message is NOT deduped — at-least-once stands, false merges never
    * happen.
    */
  def byId(messages: DataFrame, idCol: String, eventTimeCol: String,
           watermarkDelay: String = "10 minutes"): DataFrame =
    messages
      .withColumn(idCol, coalesce(col(idCol), expr("uuid()")))
      .withWatermark(eventTimeCol, watermarkDelay)
      .dropDuplicates(idCol, eventTimeCol)
}

package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.DataStreamWriter

/** Kafka rapid wiring — the production transport (reference: KafkaRapid.kt,
  * Defaults.kt, ConsumerProducerFactory.kt; SURVEY §2.1).
  *
  * The Spark Kafka connector maps 1:1 onto the reference's consumer loop:
  *  - subscribe rapid + extra topics (KafkaRapid.kt:47, Defaults.kt:19,56)
  *  - reset policy latest/earliest (Defaults.kt:20,48) -> startingOffsets
  *  - max.poll.records (Defaults.kt:21,28) -> maxOffsetsPerTrigger
  *  - per-record at-least-once commit (KafkaRapid.kt:146-157) -> checkpointed
  *    micro-batch at-least-once; coarser granularity, compensated by
  *    [[Dedupe.byId]] (documented semantic difference, SURVEY §2.7)
  *  - publish only to the rapid topic (KafkaRapid.kt:72-75), key-sticky
  *    (KeyMessageContext.kt:7-10): carry the incoming key to the sink select
  *  - producer ordering acks=all (AivenConfig.kt:37-39) -> kafka.acks=all
  *
  * Requires spark-sql-kafka on the classpath (not bundled in this
  * container, so this class is wiring + options only; MemoryRapid is the
  * in-process transport used by the test suites).
  */
final case class KafkaRapidConfig(
    bootstrapServers: String,
    rapidTopic: String,
    extraTopics: Seq[String] = Nil,
    resetPolicy: String = "latest", // Defaults.kt:20
    maxOffsetsPerTrigger: Option[Long] = Some(500), // Defaults.kt:21
    /** Must be unique per logical app AND stable across restarts (it IS the
      * consumer-group identity here, the reference's KAFKA_CONSUMER_GROUP_ID),
      * and on durable shared storage: a node-local path (e.g. /tmp) silently
      * loses offsets/exactly-once state across host restarts. Left empty the
      * transport FAILS FAST at wiring time rather than defaulting to a
      * perishable location.
      */
    checkpointLocation: String = "",
    startingOffsetsByTimestamp: Option[String] = None) { // Consumer.kt:12-34
  def resolvedCheckpoint: String = {
    require(checkpointLocation.trim.nonEmpty,
      s"checkpointLocation must be set to a durable path for topic '$rapidTopic' " +
        "(it is the consumer-group identity; a default such as /tmp would silently " +
        "lose offsets across host restarts)")
    checkpointLocation
  }
}

final class KafkaRapid(spark: SparkSession, config: KafkaRapidConfig) {

  /** The subscribed stream with the reference's MessageMetadata columns
    * (MessageMetadata.kt:3-9): key, value, topic, partition, offset, headers.
    */
  def stream: DataFrame = {
    val reader = spark.readStream
      .format("kafka")
      .option("kafka.bootstrap.servers", config.bootstrapServers)
      .option("subscribe", (config.rapidTopic +: config.extraTopics).mkString(","))
      .option("includeHeaders", "true")
    val withOffsets = config.startingOffsetsByTimestamp match {
      case Some(ts) => reader.option("startingOffsetsByTimestamp", ts)
      case None     => reader.option("startingOffsets", config.resetPolicy)
    }
    config.maxOffsetsPerTrigger.fold(withOffsets)(n =>
        withOffsets.option("maxOffsetsPerTrigger", n.toString))
      .load()
      .select(
        col("key").cast("string").as("key"),
        col("value").cast("string").as("value"),
        col("topic"), col("partition"), col("offset"), col("headers"))
      .filter(col("value").isNotNull) // tombstone filter, KafkaRapid.kt:162-163
  }

  /** Publish a (key, value) stream back onto the rapid topic only. */
  def publish(messages: DataFrame): DataStreamWriter[org.apache.spark.sql.Row] =
    messages
      .select(col("key").cast("binary").as("key"), col("value").cast("binary").as("value"))
      .writeStream
      .format("kafka")
      .option("kafka.bootstrap.servers", config.bootstrapServers)
      .option("topic", config.rapidTopic)
      .option("kafka.acks", "all") // AivenConfig.kt:37
      .option("checkpointLocation", config.resolvedCheckpoint)
}

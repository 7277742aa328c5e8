package graft.streaming

import org.scalatest.funsuite.AnyFunSuite

/** Pins the FULL Kafka option mapping — every key the reference's config
  * surface (Defaults.kt:19-29,47-61, Consumer.kt:12-34, AivenConfig.kt:35-65)
  * maps to on the Spark connector — without needing a broker: the maps are
  * pure functions on KafkaRapidConfig, applied verbatim by stream/publish.
  * A typo in an option key would otherwise ship silently (the connector
  * ignores unknown options).
  */
class KafkaWiringSpec extends AnyFunSuite {

  private val base = KafkaRapidConfig(
    bootstrapServers = "b-1:9092,b-2:9092",
    rapidTopic = "rapid",
    checkpointLocation = "/durable/ckpt")

  test("source options: subscribe list, reset policy, headers, poll bound (Defaults.kt:19-29)") {
    val cfg = base.copy(extraTopics = Seq("extra1", "extra2"))
    assert(cfg.sourceOptions == Map(
      "kafka.bootstrap.servers" -> "b-1:9092,b-2:9092",
      "subscribe" -> "rapid,extra1,extra2",
      "includeHeaders" -> "true",
      "startingOffsets" -> "latest", // default reset policy, Defaults.kt:20
      "maxOffsetsPerTrigger" -> "500")) // max.poll.records default, Defaults.kt:21
  }

  test("reset policy earliest maps to startingOffsets; unbounded poll drops the option") {
    val cfg = base.copy(resetPolicy = "earliest", maxOffsetsPerTrigger = None)
    assert(cfg.sourceOptions("startingOffsets") == "earliest")
    assert(!cfg.sourceOptions.contains("maxOffsetsPerTrigger"))
  }

  test("offsets-for-time seek REPLACES the reset policy (Consumer.kt:30-34)") {
    val ts = """{"rapid":{"0":1700000000000}}"""
    val cfg = base.copy(startingOffsetsByTimestamp = Some(ts))
    assert(cfg.sourceOptions("startingOffsetsByTimestamp") == ts)
    assert(!cfg.sourceOptions.contains("startingOffsets"),
      "both offset options set: the connector would reject the stream")
  }

  test("sink options: rapid topic only, acks=all + idempotent ordering, checkpoint (KafkaRapid.kt:72-75, AivenConfig.kt:37-39)") {
    assert(base.sinkOptions == Map(
      "kafka.bootstrap.servers" -> "b-1:9092,b-2:9092",
      "topic" -> "rapid",
      "kafka.acks" -> "all",
      // the reference's max.in.flight=1/linger=0 ordering guarantee, in its
      // scalable idempotent-producer form
      "kafka.enable.idempotence" -> "true",
      "checkpointLocation" -> "/durable/ckpt"))
  }

  test("empty checkpoint fails fast at wiring time, naming the topic") {
    val ex = intercept[IllegalArgumentException](base.copy(checkpointLocation = " ").sinkOptions)
    assert(ex.getMessage.contains("rapid") && ex.getMessage.contains("durable"))
  }

  test("opaque kafka.* options forward verbatim to BOTH source and sink (AivenConfig.kt:35-65)") {
    val ssl = Map(
      "kafka.security.protocol" -> "SSL",
      "kafka.ssl.truststore.location" -> "/var/run/truststore.jks",
      "kafka.ssl.keystore.password" -> "hunter2")
    val cfg = base.copy(kafkaOptions = ssl)
    ssl.foreach { case (k, v) =>
      assert(cfg.sourceOptions.get(k).contains(v), s"source missing $k")
      assert(cfg.sinkOptions.get(k).contains(v), s"sink missing $k")
    }
  }

  test("pass-through may not override owned options, and must carry the kafka. prefix") {
    val clash = base.copy(kafkaOptions = Map("kafka.acks" -> "0"))
    assert(intercept[IllegalArgumentException](clash.sinkOptions)
      .getMessage.contains("kafka.acks"))
    val unprefixed = base.copy(kafkaOptions = Map("subscribe" -> "evil-topic"))
    assert(intercept[IllegalArgumentException](unprefixed.sourceOptions)
      .getMessage.contains("subscribe"))
  }

  test("env contract builds the full config including Aiven SSL (Defaults.kt:47-61, AivenConfig.kt:19-25)") {
    val env = Map(
      "KAFKA_BROKERS" -> "broker:9092",
      "KAFKA_RAPID_TOPIC" -> "rapid.v1",
      "KAFKA_EXTRA_TOPIC" -> "a,b",
      "KAFKA_RESET_POLICY" -> "earliest",
      "KAFKA_MAX_RECORDS" -> "1000",
      "KAFKA_CHECKPOINT_DIR" -> "/ckpt",
      "KAFKA_TRUSTSTORE_PATH" -> "/ts.jks",
      "KAFKA_KEYSTORE_PATH" -> "/ks.p12",
      "KAFKA_CREDSTORE_PASSWORD" -> "pw")
    val cfg = RapidApplication.configFromEnv(env)
    assert(cfg.sourceOptions("subscribe") == "rapid.v1,a,b")
    assert(cfg.sourceOptions("startingOffsets") == "earliest")
    assert(cfg.sourceOptions("maxOffsetsPerTrigger") == "1000")
    assert(cfg.sourceOptions("kafka.security.protocol") == "SSL")
    assert(cfg.sourceOptions("kafka.ssl.truststore.location") == "/ts.jks")
    assert(cfg.sourceOptions("kafka.ssl.keystore.type") == "PKCS12")
    assert(cfg.sourceOptions("kafka.ssl.endpoint.identification.algorithm") == "")
    assert(cfg.sinkOptions("kafka.ssl.keystore.password") == "pw")
    // truststore without its credstore password fails loudly (AivenConfig.kt:19-25)
    val broken = env - "KAFKA_CREDSTORE_PASSWORD"
    assert(intercept[RuntimeException](RapidApplication.configFromEnv(broken))
      .getMessage.contains("KAFKA_CREDSTORE_PASSWORD"))
  }
}

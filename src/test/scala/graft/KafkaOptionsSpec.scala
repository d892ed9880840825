package graft

import graft.sources.KafkaOptions
import graft.sources.KafkaOptions.Conf

/** Kafka option mapping (reference kafka_source.py:13-290) — config-level
  * contract; the runtime format needs the spark-sql-kafka jar. */
class KafkaOptionsSpec extends org.scalatest.funsuite.AnyFunSuite {

  test("read options map the subscribe/offset/security surface") {
    val opts = KafkaOptions.readOptions(Conf(
      bootstrapServers = "b1:9092,b2:9092", topic = "events",
      startingOffsets = "earliest", endingOffsets = Some("latest"),
      maxOffsetsPerTrigger = Some(5000),
      securityProtocol = Some("SASL_SSL"), saslMechanism = Some("PLAIN"),
      saslJaasConfig = Some("org.apache.kafka.common.security.plain.PlainLoginModule required;")))
    assert(opts("kafka.bootstrap.servers") === "b1:9092,b2:9092")
    assert(opts("subscribe") === "events")
    assert(opts("startingOffsets") === "earliest")
    assert(opts("endingOffsets") === "latest")
    assert(opts("maxOffsetsPerTrigger") === "5000")
    assert(opts("kafka.security.protocol") === "SASL_SSL")
    assert(opts("kafka.sasl.mechanism") === "PLAIN")
    assert(opts("failOnDataLoss") === "true")
  }

  test("write options carry the topic, not subscribe") {
    val opts = KafkaOptions.writeOptions(Conf("b:9092", "out_topic"))
    assert(opts("topic") === "out_topic")
    assert(!opts.contains("subscribe"))
  }
}

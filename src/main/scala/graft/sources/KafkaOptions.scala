package graft.sources

/**
 * Kafka source/sink option surface (reference:
 * core/sources/kafka_source.py:13-290): the declarative config a task
 * carries for Kafka reads/writes, mapped to the spark-sql-kafka option
 * names. The runtime format ("kafka") requires the spark-sql-kafka jar,
 * which this environment does not ship — the mapping is the contract a
 * jar-equipped deployment uses unchanged through [[SourceRead]]'s
 * generic options passthrough.
 */
object KafkaOptions {

  final case class Conf(
      bootstrapServers: String,
      topic: String,                         // path in the task config
      startingOffsets: String = "latest",    // earliest | latest | json
      endingOffsets: Option[String] = None,  // batch reads only
      maxOffsetsPerTrigger: Option[Long] = None,
      // SASL/SSL security surface (kafka_source.py option set)
      securityProtocol: Option[String] = None,   // e.g. SASL_SSL
      saslMechanism: Option[String] = None,      // e.g. PLAIN, SCRAM-SHA-512
      saslJaasConfig: Option[String] = None,
      sslTruststoreLocation: Option[String] = None,
      sslTruststorePassword: Option[String] = None,
      groupIdPrefix: Option[String] = None,
      failOnDataLoss: Boolean = true)

  /** Reader options for `spark.readStream.format("kafka")`. */
  def readOptions(c: Conf): Map[String, String] =
    Map(
      "kafka.bootstrap.servers" -> c.bootstrapServers,
      "subscribe" -> c.topic,
      "startingOffsets" -> c.startingOffsets,
      "failOnDataLoss" -> c.failOnDataLoss.toString) ++
      c.endingOffsets.map("endingOffsets" -> _) ++
      c.maxOffsetsPerTrigger.map(v => "maxOffsetsPerTrigger" -> v.toString) ++
      securityOptions(c)

  /** Reader options for batch `spark.read.format("kafka")`: Spark rejects
    * startingOffsets=latest for batch queries, so the batch variant
    * defaults to earliest..latest unless explicitly configured. */
  def batchReadOptions(c: Conf): Map[String, String] = {
    val starting = if (c.startingOffsets == "latest") "earliest" else c.startingOffsets
    readOptions(c) +
      ("startingOffsets" -> starting) +
      ("endingOffsets" -> c.endingOffsets.getOrElse("latest")) -
      "maxOffsetsPerTrigger" // streaming-only option
  }

  /** Writer options for `df.write/writeStream.format("kafka")`
    * (kafka_source.py:249-290: topic option on the sink). */
  def writeOptions(c: Conf): Map[String, String] =
    Map(
      "kafka.bootstrap.servers" -> c.bootstrapServers,
      "topic" -> c.topic) ++ securityOptions(c)

  private def securityOptions(c: Conf): Map[String, String] =
    (c.securityProtocol.map("kafka.security.protocol" -> _) ++
      c.saslMechanism.map("kafka.sasl.mechanism" -> _) ++
      c.saslJaasConfig.map("kafka.sasl.jaas.config" -> _) ++
      c.sslTruststoreLocation.map("kafka.ssl.truststore.location" -> _) ++
      c.sslTruststorePassword.map("kafka.ssl.truststore.password" -> _) ++
      c.groupIdPrefix.map("groupIdPrefix" -> _)).toMap
}

package graft.sources

import graft.config.Config.InputConf
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.DataStreamWriter

/**
 * Kafka runtime read/write path (reference:
 * core/sources/kafka_source.py:13-290). [[KafkaOptions]] holds the
 * declarative option surface; this object is the execution half: build
 * the reader/writer against `format("kafka")` exactly as the reference's
 * `SourceRead.run` (`reader.option("subscribe", path).load()`,
 * kafka_source.py:95-104) and `SinkWrite.run`
 * (`df.writeStream.format("kafka").option("topic", ...)`, :106-155) do.
 *
 * The "kafka" format resolves through Spark's normal source registry, so
 * the same code drives the real spark-sql-kafka connector when its jar
 * is on the classpath and a test-registered stand-in when not (this
 * environment ships no Kafka jar; the spec registers an in-memory
 * broker-backed source under the same short name).
 */
object KafkaSource {

  /** Task-config option names (kafka_source.py ReadOptions field aliases)
    * → [[KafkaOptions.Conf]]; the topic is the input's path. */
  def confFrom(in: InputConf): KafkaOptions.Conf = {
    val o = in.options
    def first(keys: String*): Option[String] = keys.flatMap(o.get).headOption
    KafkaOptions.Conf(
      bootstrapServers = first("bootstrap_server", "kafka.bootstrap.servers")
        .getOrElse(throw new IllegalArgumentException(
          "kafka: bootstrap_server option required")),
      topic = in.path,
      startingOffsets = first("startingOffsets", "starting_offsets").getOrElse("earliest"),
      endingOffsets = first("endingOffsets", "ending_offsets"),
      maxOffsetsPerTrigger = first("maxOffsetsPerTrigger").map(_.toLong),
      securityProtocol = first("security_protocol", "kafka.security.protocol"),
      saslMechanism = first("security_mechanism", "kafka.sasl.mechanism"),
      saslJaasConfig = first("jaas_config", "kafka.sasl.jaas.config"),
      sslTruststoreLocation = first("ssl_truststore_location"),
      sslTruststorePassword = first("ssl_truststore_password"),
      groupIdPrefix = first("group_id_prefix"),
      failOnDataLoss = first("failOnDataLoss", "fail_on_data_loss")
        .forall(_.toBoolean))
  }

  def readBatch(spark: SparkSession, c: KafkaOptions.Conf): DataFrame =
    spark.read.format("kafka").options(KafkaOptions.batchReadOptions(c)).load()

  def readStream(spark: SparkSession, c: KafkaOptions.Conf): DataFrame =
    spark.readStream.format("kafka").options(KafkaOptions.readOptions(c)).load()

  /** Cast the wire columns to strings — the usual first transform after a
    * Kafka read (the reference follows its read with
    * schema_inference_from_registry over the value). */
  def decoded(df: DataFrame): DataFrame =
    df.select(
      col("key").cast("string").as("key"),
      col("value").cast("string").as("value"),
      col("topic"), col("partition"), col("offset"), col("timestamp"))

  /** Batch append to a topic; `df` must carry `value` (and optionally
    * `key`), cast to binary as the connector requires. */
  def writeBatch(df: DataFrame, c: KafkaOptions.Conf): Unit =
    prepared(df).write.format("kafka").mode("append")
      .options(KafkaOptions.writeOptions(c)).save()

  /** Streaming append writer (kafka_source.py:131-143: format + options +
    * topic + checkpoint); caller sets trigger/queryName and starts. */
  def streamWriter(df: DataFrame, c: KafkaOptions.Conf,
                   checkpointLocation: String): DataStreamWriter[org.apache.spark.sql.Row] =
    prepared(df).writeStream.format("kafka")
      .options(KafkaOptions.writeOptions(c))
      .option("checkpointLocation", checkpointLocation)

  private def prepared(df: DataFrame): DataFrame = {
    require(df.columns.contains("value"), "kafka write needs a 'value' column")
    val key =
      if (df.columns.contains("key")) Some(col("key").cast("binary").as("key"))
      else None
    df.select((key.toSeq :+ col("value").cast("binary").as("value")) ++
      df.columns.filter(_ == "topic").map(col): _*)
  }
}

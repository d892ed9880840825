package graft

import graft.config.Config.InputConf
import graft.kafkastub.FakeKafkaBroker
import graft.sources.{KafkaOptions, KafkaSource, SourceRead}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import java.nio.charset.StandardCharsets

/**
 * Kafka runtime path through the test-registered in-memory broker
 * (format("kafka") resolves to [[graft.kafkastub.FakeKafkaSource]] via the
 * test ServiceLoader scope): batch read, micro-batch stream read, batch
 * write, streaming write, and the task-config option mapping — the full
 * read AND write execution surface of reference kafka_source.py:13-290,
 * not just option-map construction.
 */
class KafkaRuntimeSpec extends SparkSpec with org.scalatest.BeforeAndAfterAll {
  import spark.implicits._

  // Spark forces "kafka" through the V1 resolution path by default
  // (spark.sql.sources.useV1SourceList); the stand-in is V2-only, so drop
  // kafka from the list for this suite and restore after.
  private var savedV1List: String = _
  override def beforeAll(): Unit = {
    super.beforeAll()
    savedV1List = spark.conf.get("spark.sql.sources.useV1SourceList")
    spark.conf.set("spark.sql.sources.useV1SourceList",
      savedV1List.split(",").filterNot(_.trim == "kafka").mkString(","))
  }
  override def afterAll(): Unit = {
    spark.conf.set("spark.sql.sources.useV1SourceList", savedV1List)
    super.afterAll()
  }

  private def in(topic: String, extra: Map[String, String] = Map.empty) =
    InputConf(name = "k", path = topic, source = "kafka",
      options = Map("bootstrap_server" -> "stub:9092",
        "security_protocol" -> "SASL_SSL",
        "security_mechanism" -> "PLAIN",
        "jaas_config" -> "module required;") ++ extra)

  private def str(b: Array[Byte]): String =
    if (b == null) null else new String(b, StandardCharsets.UTF_8)

  test("batch read drains a topic through SourceRead with mapped options") {
    FakeKafkaBroker.clear()
    FakeKafkaBroker.publish("t_batch", "k1", "v1")
    FakeKafkaBroker.publish("t_batch", null, "v2")
    val df = SourceRead.readBatch(spark, in("t_batch"))
    assert(df.columns.toSeq === Seq("key", "value", "topic", "partition",
      "offset", "timestamp", "timestampType"))
    val rows = KafkaSource.decoded(df)
      .select("key", "value", "offset").as[(String, String, Long)]
      .collect().sortBy(_._3)
    assert(rows.toSeq === Seq(("k1", "v1", 0L), (null, "v2", 1L)))
    // the security surface reached the source as kafka.* options
    assert(FakeKafkaBroker.lastReadOptions("kafka.security.protocol") === "SASL_SSL")
    assert(FakeKafkaBroker.lastReadOptions("kafka.sasl.mechanism") === "PLAIN")
    assert(FakeKafkaBroker.lastReadOptions("kafka.bootstrap.servers") === "stub:9092")
    // batch reads force startingOffsets away from "latest"
    assert(FakeKafkaBroker.lastReadOptions("startingOffsets") === "earliest")
  }

  test("batch write appends key/value to the broker topic") {
    FakeKafkaBroker.clear()
    val df = Seq(("a", "1"), ("b", "2")).toDF("key", "value")
    KafkaSource.writeBatch(df, KafkaOptions.Conf("stub:9092", "t_out",
      saslMechanism = Some("PLAIN")))
    // rows land from concurrent write tasks, so broker order is a race —
    // compare the record SET, not offset order
    val recs = FakeKafkaBroker.records("t_out")
    assert(recs.map(r => (str(r.key), str(r.value))).toSet === Set(("a", "1"), ("b", "2")))
    assert(FakeKafkaBroker.lastWriteOptions("kafka.sasl.mechanism") === "PLAIN")
    // value-less frames are rejected before reaching the connector
    intercept[IllegalArgumentException](
      KafkaSource.writeBatch(Seq(1).toDF("x"), KafkaOptions.Conf("s", "t")))
  }

  test("micro-batch stream read picks up records published between batches") {
    FakeKafkaBroker.clear()
    FakeKafkaBroker.publish("t_stream", "k", "first")
    val stream = SourceRead.readStream(spark, in("t_stream"))
    val q = KafkaSource.decoded(stream).select("value")
      .writeStream.format("memory").queryName("kafka_sink_mem")
      .option("checkpointLocation", tmpDir("kafka_ck")).start()
    try {
      q.processAllAvailable()
      FakeKafkaBroker.publish("t_stream", "k", "second")
      q.processAllAvailable()
      val seen = spark.table("kafka_sink_mem").as[String].collect().toSet
      assert(seen === Set("first", "second"))
    } finally q.stop()
  }

  test("streaming write lands micro-batches in the broker with checkpointing") {
    FakeKafkaBroker.clear()
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[(String, String)]
    val df = mem.toDF().toDF("key", "value")
    val q = KafkaSource.streamWriter(df,
        KafkaOptions.Conf("stub:9092", "t_sink"), tmpDir("kafka_wck"))
      .start()
    try {
      mem.addData(("k1", "v1"), ("k2", "v2"))
      q.processAllAvailable()
      mem.addData(("k3", "v3"))
      q.processAllAvailable()
      val recs = FakeKafkaBroker.records("t_sink").sortBy(_.offset)
      assert(recs.map(r => (str(r.key), str(r.value))) ===
        Seq(("k1", "v1"), ("k2", "v2"), ("k3", "v3")))
    } finally q.stop()
  }

  test("confFrom maps task-config aliases and validates bootstrap server") {
    val c = KafkaSource.confFrom(in("events",
      Map("startingOffsets" -> "latest", "maxOffsetsPerTrigger" -> "100")))
    assert(c.topic === "events" && c.bootstrapServers === "stub:9092")
    assert(c.startingOffsets === "latest" && c.maxOffsetsPerTrigger === Some(100L))
    assert(c.securityProtocol === Some("SASL_SSL"))
    intercept[IllegalArgumentException](
      KafkaSource.confFrom(InputConf("k", "t", "kafka")))
  }
}

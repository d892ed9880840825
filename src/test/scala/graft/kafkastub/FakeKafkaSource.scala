package graft.kafkastub

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog._
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.connector.write.streaming.{StreamingDataWriterFactory, StreamingWrite}
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String
import java.util
import scala.collection.concurrent.TrieMap
import scala.collection.mutable.ArrayBuffer

/**
 * Test-registered stand-in for the spark-sql-kafka connector: an
 * in-memory broker behind `format("kafka")` with batch read, micro-batch
 * stream read, batch write, and streaming write — so the library's
 * KafkaSource runtime path (option mapping included) is exercised end to
 * end without the Kafka jar. Registered only in the TEST ServiceLoader
 * scope; the published jar still resolves "kafka" to the real connector.
 *
 * Single-JVM by design (local[n] test runs): readers and writers resolve
 * the shared [[FakeKafkaBroker]] object in-process.
 */
object FakeKafkaBroker {
  final case class Rec(key: Array[Byte], value: Array[Byte], topic: String,
                       partition: Int, offset: Long, timestampMs: Long)

  private val topics = TrieMap.empty[String, ArrayBuffer[Rec]]
  @volatile var lastReadOptions: Map[String, String] = Map.empty
  @volatile var lastWriteOptions: Map[String, String] = Map.empty

  def publish(topic: String, key: String, value: String): Unit = synchronized {
    val buf = topics.getOrElseUpdate(topic, ArrayBuffer.empty)
    buf += Rec(
      if (key == null) null else key.getBytes("UTF-8"),
      value.getBytes("UTF-8"),
      topic, 0, buf.size.toLong, System.currentTimeMillis())
    ()
  }

  def append(topic: String, key: Array[Byte], value: Array[Byte]): Unit = synchronized {
    val buf = topics.getOrElseUpdate(topic, ArrayBuffer.empty)
    buf += Rec(key, value, topic, 0, buf.size.toLong, System.currentTimeMillis())
    ()
  }

  def records(topic: String): Seq[Rec] = synchronized {
    topics.get(topic).map(_.toSeq).getOrElse(Nil)
  }

  def size(topic: String): Long = synchronized {
    topics.get(topic).map(_.size.toLong).getOrElse(0L)
  }

  def clear(): Unit = synchronized { topics.clear() }

  val schema: StructType = StructType(Seq(
    StructField("key", BinaryType),
    StructField("value", BinaryType),
    StructField("topic", StringType),
    StructField("partition", IntegerType),
    StructField("offset", LongType),
    StructField("timestamp", TimestampType),
    StructField("timestampType", IntegerType)))

  def toRow(r: Rec): InternalRow =
    InternalRow(r.key, r.value, UTF8String.fromString(r.topic), r.partition,
      r.offset, r.timestampMs * 1000L, 0)
}

class FakeKafkaSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "kafka"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    FakeKafkaBroker.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table =
    new FakeKafkaTable(properties)
}

class FakeKafkaTable(props: util.Map[String, String])
  extends Table with SupportsRead with SupportsWrite {
  import scala.jdk.CollectionConverters._

  private def opt(k: String): Option[String] = Option(props.get(k))
  private def subscribedTopic: String =
    opt("subscribe").getOrElse(
      throw new IllegalArgumentException("fake kafka: 'subscribe' option required"))

  override def name(): String = s"fakekafka:${opt("subscribe").getOrElse(opt("topic").getOrElse("?"))}"
  override def schema(): StructType = FakeKafkaBroker.schema

  override def capabilities(): util.Set[TableCapability] = {
    val s = new util.HashSet[TableCapability]()
    s.add(TableCapability.BATCH_READ)
    s.add(TableCapability.MICRO_BATCH_READ)
    s.add(TableCapability.BATCH_WRITE)
    s.add(TableCapability.STREAMING_WRITE)
    s.add(TableCapability.ACCEPT_ANY_SCHEMA) // writes carry key/value only
    s
  }

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder = {
    FakeKafkaBroker.lastReadOptions =
      options.asCaseSensitiveMap().asScala.toMap
    () => new FakeKafkaScan(subscribedTopic)
  }

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder = {
    FakeKafkaBroker.lastWriteOptions =
      info.options().asCaseSensitiveMap().asScala.toMap
    val topic = Option(info.options().get("topic"))
    new WriteBuilder {
      override def build(): Write = new FakeKafkaWrite(topic, info.schema())
    }
  }
}

// ------------------------------------------------------------- read side

final case class FakeKafkaRange(topic: String, from: Int, until: Int)
  extends InputPartition

class FakeKafkaScan(topic: String) extends Scan with Batch {
  override def readSchema(): StructType = FakeKafkaBroker.schema
  override def toBatch: Batch = this

  override def planInputPartitions(): Array[InputPartition] =
    Array(FakeKafkaRange(topic, 0, FakeKafkaBroker.size(topic).toInt))

  override def createReaderFactory(): PartitionReaderFactory =
    new FakeKafkaReaderFactory

  override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
    new FakeKafkaMicroBatch(topic)
}

class FakeKafkaReaderFactory extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val range = partition.asInstanceOf[FakeKafkaRange]
    val rows = FakeKafkaBroker.records(range.topic)
      .slice(range.from, range.until).map(FakeKafkaBroker.toRow)
    new PartitionReader[InternalRow] {
      private val it = rows.iterator
      private var cur: InternalRow = _
      override def next(): Boolean = { if (it.hasNext) { cur = it.next(); true } else false }
      override def get(): InternalRow = cur
      override def close(): Unit = ()
    }
  }
}

final case class FakeKafkaOffset(count: Long) extends Offset {
  override def json(): String = count.toString
}

class FakeKafkaMicroBatch(topic: String) extends MicroBatchStream {
  override def initialOffset(): Offset = FakeKafkaOffset(0L)
  override def latestOffset(): Offset = FakeKafkaOffset(FakeKafkaBroker.size(topic))
  override def deserializeOffset(json: String): Offset = FakeKafkaOffset(json.toLong)
  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] =
    Array(FakeKafkaRange(topic,
      start.asInstanceOf[FakeKafkaOffset].count.toInt,
      end.asInstanceOf[FakeKafkaOffset].count.toInt))
  override def createReaderFactory(): PartitionReaderFactory =
    new FakeKafkaReaderFactory
  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}

// ------------------------------------------------------------ write side

/** Append to the broker: topic from the sink option or a `topic` column
  * (the real connector's precedence). */
class FakeKafkaWrite(topicOpt: Option[String], inputSchema: StructType)
  extends Write {

  private def factory(): FakeKafkaWriterFactory = {
    val keyIdx = inputSchema.fieldNames.indexOf("key")
    val valueIdx = inputSchema.fieldNames.indexOf("value")
    val topicIdx = inputSchema.fieldNames.indexOf("topic")
    require(valueIdx >= 0, "fake kafka write: 'value' column required")
    require(topicOpt.isDefined || topicIdx >= 0,
      "fake kafka write: 'topic' option or column required")
    FakeKafkaWriterFactory(topicOpt, keyIdx, valueIdx, topicIdx)
  }

  override def toBatch: BatchWrite = new BatchWrite {
    private val f = factory()
    override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory = f
    override def commit(messages: Array[WriterCommitMessage]): Unit = ()
    override def abort(messages: Array[WriterCommitMessage]): Unit = ()
  }

  override def toStreaming: StreamingWrite = new StreamingWrite {
    private val f = factory()
    override def createStreamingWriterFactory(info: PhysicalWriteInfo): StreamingDataWriterFactory = f
    override def commit(epochId: Long, messages: Array[WriterCommitMessage]): Unit = ()
    override def abort(epochId: Long, messages: Array[WriterCommitMessage]): Unit = ()
  }
}

/** Serializable factory: ships only column indexes + the topic option to
  * the task side; the broker is resolved statically (single JVM). */
final case class FakeKafkaWriterFactory(topicOpt: Option[String], keyIdx: Int,
                                        valueIdx: Int, topicIdx: Int)
  extends DataWriterFactory with StreamingDataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new FakeKafkaDataWriter(topicOpt, keyIdx, valueIdx, topicIdx)
  override def createWriter(partitionId: Int, taskId: Long,
                            epochId: Long): DataWriter[InternalRow] =
    new FakeKafkaDataWriter(topicOpt, keyIdx, valueIdx, topicIdx)
}

class FakeKafkaDataWriter(topicOpt: Option[String], keyIdx: Int, valueIdx: Int,
                          topicIdx: Int) extends DataWriter[InternalRow] {
  override def write(row: InternalRow): Unit = {
    val key = if (keyIdx >= 0 && !row.isNullAt(keyIdx)) row.getBinary(keyIdx) else null
    val value = row.getBinary(valueIdx)
    val topic =
      if (topicIdx >= 0 && !row.isNullAt(topicIdx)) row.getUTF8String(topicIdx).toString
      else topicOpt.get
    FakeKafkaBroker.append(topic, key, value)
  }
  override def commit(): WriterCommitMessage = new WriterCommitMessage {}
  override def abort(): Unit = ()
  override def close(): Unit = ()
}

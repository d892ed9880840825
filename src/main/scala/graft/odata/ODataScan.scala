package graft.odata

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.util.DateTimeUtils
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.read.streaming.MicroBatchStream
import org.apache.spark.sql.sources.Filter
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/**
 * Scan pipeline: ScanBuilder collects the three pushdowns Catalyst offers
 * (filters → `$filter`, required columns → `$select`, limit → `$top` cap),
 * the Scan plans `ceil(count/rowsPerPage)` page partitions via a `$count`
 * probe, and each executor-side reader HTTP-pages its slice into
 * `InternalRow`s.
 *
 * Reference: ODataScan.scala:30-165 (builder), :216-257 (partition
 * planning), ODataPartition.scala:27-95 (reader). The `StringContains`→
 * `endswith` bug at ODataScan.scala:134-135 is intentionally not ported.
 */
class ODataScanBuilder(opts: ODataOptions, schema: StructType)
  extends ScanBuilder
  with SupportsPushDownFilters
  with SupportsPushDownRequiredColumns
  with SupportsPushDownLimit {

  // user predicate strings (`predicates` option) seed the pushed set
  // (reference ODataTable.scala:151-216)
  private var pushed: Seq[ODataFilters.Pushed] =
    opts.predicates.map(ODataFilters.parsePredicates).getOrElse(Nil)
  private var prunedSchema: StructType = schema
  private var limit: Option[Int] = None

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (p, rest) = ODataFilters.split(filters, schema)
    pushed = pushed ++ p
    rest.toArray
  }

  override def pushedFilters(): Array[Filter] = pushed.map(_.raw).toArray

  override def pruneColumns(requiredSchema: StructType): Unit = {
    val names = requiredSchema.fields.map(_.name).toSet
    prunedSchema = StructType(schema.fields.filter(f => names.contains(f.name)))
  }

  override def pushLimit(n: Int): Boolean = { limit = Some(n); true }

  override def build(): Scan = new ODataScan(opts, prunedSchema,
    ODataFilters.combine(pushed), limit)
}

class ODataScan(opts: ODataOptions, schema: StructType,
                filter: Option[String], limit: Option[Int])
  extends Scan with Batch {

  override def readSchema(): StructType = schema
  override def toBatch: Batch = this

  override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
    new ODataMicroStream(opts, schema, filter, checkpointLocation)

  /** `$count` probe under the pushed filter (or the pushed limit) →
    * page-sized partitions (ODataScan.scala:216-257). */
  override def planInputPartitions(): Array[InputPartition] = {
    val rows: Long = limit match {
      case Some(l) => l.toLong
      case None => new ODataClient(opts).count(filter)
    }
    val nPartitions = ((rows + opts.rowsPerPage - 1) / opts.rowsPerPage).toInt
    val selected = if (schema.fields.length > 0) Some(schema.fieldNames.toSeq) else None
    (0 until nPartitions).map { i =>
      val top = math.min(opts.rowsPerPage.toLong, rows - i.toLong * opts.rowsPerPage).toInt
      ODataInputPartition(i, top, opts, schema, filter, selected): InputPartition
    }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    (partition: InputPartition) =>
      new ODataPartitionReader(partition.asInstanceOf[ODataInputPartition])
}

final case class ODataInputPartition(
    pageIndex: Int, top: Int, opts: ODataOptions, schema: StructType,
    filter: Option[String], select: Option[Seq[String]]) extends InputPartition

/** Volcano-style reader: fetches its page once, then `next/get` iterates
  * (ODataPartition.scala:37-95). Value conversion to Catalyst internal
  * types mirrors ODataClient.scala:352-401 (UTF8String / epoch-micros). */
class ODataPartitionReader(p: ODataInputPartition)
  extends PartitionReader[InternalRow] {

  private lazy val rows: Iterator[Map[String, Any]] =
    new ODataClient(p.opts).page(p.pageIndex, p.filter, p.select, p.top).iterator
  private var current: Map[String, Any] = _

  override def next(): Boolean =
    if (rows.hasNext) { current = rows.next(); true } else false

  override def get(): InternalRow =
    InternalRow.fromSeq(p.schema.fields.toSeq.map { f =>
      toCatalyst(current.getOrElse(f.name, null), f.dataType)
    })

  private def toCatalyst(v: Any, dt: DataType): Any = (v, dt) match {
    case (null, _) => null
    case (s: String, StringType) => UTF8String.fromString(s)
    case (x, StringType) => UTF8String.fromString(String.valueOf(x))
    case (n: Long, IntegerType) => n.toInt
    case (n: Double, IntegerType) => n.toInt
    case (n: Long, LongType) => n
    case (n: Double, DoubleType) => n
    case (n: Long, DoubleType) => n.toDouble
    case (b: Boolean, BooleanType) => b
    case (s: String, TimestampType) =>
      DateTimeUtils.instantToMicros(java.time.OffsetDateTime.parse(s).toInstant)
    case (x, _) => throw new IllegalArgumentException(
      s"odata: cannot convert $x (${x.getClass.getSimpleName}) to $dt")
  }

  override def close(): Unit = ()
}

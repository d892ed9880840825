package graft.odata

import org.apache.spark.sql.connector.read.{InputPartition, PartitionReader, PartitionReaderFactory}
import org.apache.spark.sql.connector.read.streaming._
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.types.StructType
import java.time.Instant
import java.time.format.DateTimeFormatter
import java.time.ZoneOffset

final class ODataRecordsMismatch(msg: String) extends RuntimeException(msg)

/**
 * Versioned streaming offset (reference: ODataStreamOffset.scala:17-142):
 * a watermark window [startValue, value) over the incremental field plus
 * page progress within it. JSON field names and the v3 layout match the
 * reference, including back-compat reads of version ≤ 2 offsets
 * (records_count → -1, pages_limit → 0).
 */
final case class ODataOffset(
    value: Long,        // window end (epoch ms) — exclusive
    startValue: Long,   // window start (epoch ms) — inclusive
    totalPage: Int,
    currentPage: Int,
    rowsPerPage: Int,
    recordsCount: Int,
    pagesLimit: Int = 0,
    limit: Int = 0,
    field: String = "ModifiedOn") extends Offset {

  override def json(): String =
    s"""{"version":3,"field":"$field","offset":$value,"total_pages":$totalPage,""" +
      s""""current_page":$currentPage,"rows_per_page":$rowsPerPage,""" +
      s""""start_value":$startValue,"records_count":$recordsCount,""" +
      s""""pages_limit":$pagesLimit,"limit":$limit}"""
}

object ODataOffset {
  /** 2000-01-01T00:00:00Z — the reference's EARLIEST_TIME
    * (ODataHelper.scala:217). */
  val EarliestMs: Long = 946684800000L

  def initial(rowsPerPage: Int, field: String): ODataOffset =
    ODataOffset(EarliestMs, EarliestMs, 0, 0, rowsPerPage, 0, field = field)

  def fromJson(s: String): ODataOffset = {
    val n = new com.fasterxml.jackson.databind.ObjectMapper().readTree(s)
    def req(k: String) = Option(n.get(k)).getOrElse(
      throw new IllegalArgumentException(s"offset json missing '$k'"))
    val version = req("version").asInt()
    ODataOffset(
      value = req("offset").asLong(),
      startValue = req("start_value").asLong(),
      totalPage = req("total_pages").asInt(),
      currentPage = req("current_page").asInt(),
      rowsPerPage = req("rows_per_page").asInt(),
      recordsCount = if (version <= 2) -1 else req("records_count").asInt(),
      pagesLimit = if (version <= 2) 0 else req("pages_limit").asInt(),
      limit = Option(n.get("limit")).map(_.asInt()).getOrElse(0),
      field = Option(n.get("field")).map(_.asText()).getOrElse("ModifiedOn"))
  }
}

/**
 * Micro-batch stream with admission control
 * (reference: ODataMicroStream.scala:36-208): each `latestOffset` advances
 * at most `maxPagesPerBatch` pages through the current watermark window,
 * re-counting the window to detect a source that shifted mid-paging
 * (→ [[ODataRecordsMismatch]], the reference's
 * ODataRecordsMisMatchException). When the window is exhausted the next
 * call opens a fresh window [old end, now). Initial-offset persistence is
 * Spark's own offset log — no custom metadata log needed on Spark 4.
 */
class ODataMicroStream(opts: ODataOptions, schema: StructType,
                       baseFilter: Option[String], checkpointLocation: String)
  extends MicroBatchStream with SupportsAdmissionControl with SupportsTriggerAvailableNow {

  private val client = new ODataClient(opts)
  private val Iso = DateTimeFormatter.ofPattern("yyyy-MM-dd'T'HH:mm:ss.SSS'Z'")
  private var lastPlanned: Option[ODataOffset] = None
  // Trigger.AvailableNow: the drain target — no window may extend past it,
  // and once reached latestOffset returns its input unchanged so the
  // runner observes quiescence and terminates.
  private var availableNowEnd: Option[Long] = None

  private def iso(ms: Long): String =
    Instant.ofEpochMilli(ms).atZone(ZoneOffset.UTC).format(Iso)

  private def windowFilter(startMs: Long, endMs: Long): String = {
    val w = s"${opts.incrementalField} ge ${iso(startMs)} and ${opts.incrementalField} lt ${iso(endMs)}"
    baseFilter.map(b => s"$b and $w").getOrElse(w)
  }

  override def initialOffset(): Offset =
    ODataOffset.initial(opts.rowsPerPage, opts.incrementalField)

  override def deserializeOffset(json: String): Offset = ODataOffset.fromJson(json)

  override def getDefaultReadLimit: ReadLimit =
    ReadLimit.maxRows(opts.maxPagesPerBatch.toLong)

  override def latestOffset(): Offset =
    throw new UnsupportedOperationException(
      "latestOffset(Offset, ReadLimit) is used (SupportsAdmissionControl)")

  override def reportLatestOffset(): Offset = lastPlanned.orNull

  override def prepareForTriggerAvailableNow(): Unit =
    availableNowEnd = Some(System.currentTimeMillis())

  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val s = start.asInstanceOf[ODataOffset]
    val maxPages = limit match {
      case r: ReadMaxRows => math.max(1, r.maxRows().toInt)
      case _ => opts.maxPagesPerBatch
    }
    val next =
      if (s.currentPage < s.totalPage) {
        // still paging the current window — re-count to catch shifting data
        val c = client.count(Some(windowFilter(s.startValue, s.value))).toInt
        if (s.recordsCount >= 0 && c != s.recordsCount)
          throw new ODataRecordsMismatch(
            s"window [${iso(s.startValue)}, ${iso(s.value)}) had ${s.recordsCount} records, now $c")
        s.copy(currentPage = math.min(s.totalPage, s.currentPage + maxPages))
      } else if (availableNowEnd.exists(s.value >= _)) {
        s // drained up to the AvailableNow snapshot — report quiescence
      } else {
        // window exhausted → open [old end, min(now, drain target))
        val end = availableNowEnd
          .fold(System.currentTimeMillis())(math.min(System.currentTimeMillis(), _))
        val c = client.count(Some(windowFilter(s.value, end))).toInt
        val pages = (c + opts.rowsPerPage - 1) / opts.rowsPerPage
        ODataOffset(end, s.value, pages, math.min(pages, maxPages),
          opts.rowsPerPage, c, pagesLimit = maxPages, field = opts.incrementalField)
      }
    lastPlanned = Some(next)
    next
  }

  /** Pages [start.currentPage, end.currentPage) of end's window. */
  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[ODataOffset]
    val e = end.asInstanceOf[ODataOffset]
    val firstPage = if (s.startValue == e.startValue && s.value == e.value) s.currentPage else 0
    val filter = Some(windowFilter(e.startValue, e.value))
    val selected = if (schema.fields.length > 0) Some(schema.fieldNames.toSeq) else None
    (firstPage until e.currentPage).map { i =>
      ODataInputPartition(i, opts.rowsPerPage, opts, schema, filter, selected): InputPartition
    }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    (partition: InputPartition) =>
      new ODataPartitionReader(partition.asInstanceOf[ODataInputPartition])

  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}

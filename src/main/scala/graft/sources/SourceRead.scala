package graft.sources

import graft.config.Config.InputConf
import graft.table.ManagedTable
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/**
 * Generic declarative read path — the reference's `Source.read_batch` /
 * `read_stream` (reference: core/sources/__init__.py:568-648): format from
 * config, options passed through, optional explicit schema (Spark DDL,
 * validated the way core/schemas/sources.py:117-134 does with
 * `_parse_datatype_string`), `.load(path)` for files / `.table(path)` for
 * catalog tables.
 *
 * csv/parquet/json/orc/text are plain Spark formats (csv defaults
 * `header=true, inferSchema=true` like file_source.py:932-935). `jdbc`
 * passes the partitioned-read options straight through
 * (jdbc_source.py:39-54 — partitionColumn/lowerBound/upperBound/
 * numPartitions give parallel reads for free). `kafka` keeps the option
 * surface but needs the spark-sql-kafka jar at runtime. `graft` reads a
 * [[ManagedTable]] snapshot.
 */
object SourceRead {

  private val CsvDefaults = Map("header" -> "true", "inferSchema" -> "true")

  def readBatch(spark: SparkSession, in: InputConf): DataFrame = in.source match {
    case "graft" => ManagedTable(spark, in.path).read
    case "kafka" => KafkaSource.readBatch(spark, KafkaSource.confFrom(in))
    case "excel" => ExcelSource.read(spark, in.path, ExcelSource.Options(
      sheet = in.options.get("sheet"),
      header = in.options.get("header").forall(_.toBoolean),
      cellRange = in.options.get("range")))
    case fmt =>
      val opts = if (fmt == "csv") CsvDefaults ++ in.options else in.options
      var r = spark.read.format(fmt).options(opts)
      in.schemaDdl.foreach(ddl => r = r.schema(StructType.fromDDL(ddl)))
      // zip payloads are extracted to a temp dir before the format read
      // (reference compression pre-step, file_source.py:145-172)
      val path = if (in.sourceType == "file") FileOps.resolveCompression(in.path)
                 else in.path
      if (in.sourceType == "table") r.table(path) else r.load(path)
  }

  def readStream(spark: SparkSession, in: InputConf): DataFrame = {
    if (in.source == "kafka")
      return KafkaSource.readStream(spark, KafkaSource.confFrom(in))
    val opts = if (in.source == "csv") CsvDefaults ++ in.options else in.options
    var r = spark.readStream.format(in.source).options(opts)
    in.schemaDdl.foreach(ddl => r = r.schema(StructType.fromDDL(ddl)))
    if (in.sourceType == "table") r.table(in.path) else r.load(in.path)
  }

  /** `SourceRead.run` wrapper (sources/__init__.py:302-314):
    * load + optional filter + drop columns. */
  def run(spark: SparkSession, in: InputConf,
          filterExpr: Option[String] = None,
          dropCols: Seq[String] = Nil): DataFrame = {
    var df = readBatch(spark, in)
    filterExpr.foreach(f => df = df.filter(f))
    if (dropCols.nonEmpty) df = df.drop(dropCols: _*)
    df
  }
}

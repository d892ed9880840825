package graft.odata

import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.ScanBuilder
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types.{StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import java.util

/**
 * DataSource V2 provider: `spark.read.format("odata")
 * .option("instanceUrl", ...).load("EntityName")`.
 *
 * Mirrors the reference's provider surface (ODataSource.scala:17-130:
 * TableProvider + DataSourceRegister, shortName "odata", entity from the
 * load path, lazy `$metadata` schema) with batch + micro-batch read
 * capabilities.
 */
class ODataSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "odata"

  override def supportsExternalMetadata(): Boolean = true

  private def entityOf(options: CaseInsensitiveStringMap): String = {
    val e = Option(options.get("path")).orElse(Option(options.get("entity")))
    require(e.exists(_.nonEmpty), "odata: entity required (load path or 'entity' option)")
    e.get
  }

  override def inferSchema(options: CaseInsensitiveStringMap): StructType = {
    val opts = ODataOptions.fromMap(options, entityOf(options))
    val cols = new ODataClient(opts).inferSchema()
    StructType(cols.map(c => StructField(c.name, c.sparkType)))
  }

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table = {
    val cism = new CaseInsensitiveStringMap(properties)
    new ODataTable(ODataOptions.fromMap(cism, entityOf(cism)), schema)
  }
}

class ODataTable(opts: ODataOptions, schema: StructType) extends Table with SupportsRead {
  override def name(): String = s"odata:${opts.entity}"
  override def schema(): StructType = schema

  override def capabilities(): util.Set[TableCapability] = {
    val s = new util.HashSet[TableCapability]()
    s.add(TableCapability.BATCH_READ)
    s.add(TableCapability.MICRO_BATCH_READ)
    s
  }

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ODataScanBuilder(opts, schema)
}

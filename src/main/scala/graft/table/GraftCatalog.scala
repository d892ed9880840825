package graft.table

import java.util
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.{NoSuchNamespaceException, NoSuchTableException}
import org.apache.spark.sql.connector.catalog._
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/**
 * The `graft` CATALOG — a thin DSv2 `CatalogPlugin` that makes the
 * namespace a first-class citizen of Spark's identifier resolution:
 *
 * {{{
 *   spark.sql.catalog.graft = graft.table.GraftCatalog
 *   [spark.sql.catalog.graft.warehouse = /data/graft]
 * }}}
 *
 * With the catalog registered, MULTI-part names (`graft.ns.t`) resolve
 * (the session catalog no longer rejects them with
 * REQUIRES_SINGLE_PART_NAMESPACE before extension rules run), `SHOW
 * TABLES IN graft[.ns]` and `SHOW NAMESPACES IN graft` list the
 * warehouse from the filesystem, and `DROP TABLE graft.ns.t` deletes
 * the table directory through the ordinary v2 command.
 *
 * Deliberately THIN: `loadTable` always signals not-found, so relation
 * resolution falls through to [[SqlTableResolution]], which substitutes
 * the commit-log-aware plan (DV anti-join, column mapping, time
 * travel). The catalog handles the parts of the dialect that are about
 * NAMES — listing, existence, dropping — and the resolution rule
 * handles the parts that are about DATA. A namespace is any warehouse
 * subdirectory that is not itself a table; a table is any directory
 * holding a `_graft_log`.
 */
class GraftCatalog extends TableCatalog with SupportsNamespaces {

  private var catalogName: String = SqlTables.Namespace
  private var warehouseOpt: Option[String] = None

  override def initialize(name: String, options: CaseInsensitiveStringMap): Unit = {
    catalogName = name
    warehouseOpt = Option(options.get("warehouse"))
  }

  override def name(): String = catalogName

  private def spark: SparkSession = SparkSession.active

  private def warehouse: String =
    warehouseOpt.getOrElse(SqlTables.warehouse(spark))

  private def fsOf(p: Path) =
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def rootOf(ident: Identifier): String =
    SqlTables.rootOf(spark, ident.namespace.toSeq :+ ident.name)

  private def isTable(p: Path): Boolean =
    fsOf(p).exists(new Path(p, "_graft_log"))

  // ---- tables ----------------------------------------------------------

  override def listTables(namespace: Array[String]): Array[Identifier] = {
    val base = new Path((warehouse +: namespace.toSeq).mkString("/"))
    val fs = fsOf(base)
    if (!fs.exists(base)) throw new NoSuchNamespaceException(
      catalogName +: namespace.toSeq)
    fs.listStatus(base).filter(_.isDirectory).map(_.getPath)
      .filter(isTable)
      .map(p => Identifier.of(namespace, p.getName))
  }

  override def tableExists(ident: Identifier): Boolean =
    isTable(new Path(rootOf(ident)))

  /** Always signals not-found: data access is the resolution rule's
    * job (the substituted plan, not a DSv2 scan). */
  override def loadTable(ident: Identifier): Table =
    throw new NoSuchTableException(ident)

  override def createTable(ident: Identifier, schema: StructType,
                           partitions: Array[Transform],
                           properties: util.Map[String, String]): Table = {
    val t = ManagedTable(spark, rootOf(ident))
    require(partitions.isEmpty,
      "PARTITIONED BY is not supported through the graft catalog — " +
        "declare partitioning on the first write")
    t.createIfNotExists(schema)
    loadTable(ident) // unreachable contract-wise; creation path is the hint rule
  }

  override def alterTable(ident: Identifier, changes: TableChange*): Table =
    throw new UnsupportedOperationException(
      "ALTER TABLE routes through the graft analyzer rules, not the catalog")

  override def dropTable(ident: Identifier): Boolean = {
    val p = new Path(rootOf(ident))
    if (!isTable(p)) false
    else fsOf(p).delete(p, true)
  }

  override def renameTable(oldIdent: Identifier, newIdent: Identifier): Unit = {
    if (!isTable(new Path(rootOf(oldIdent))))
      throw new NoSuchTableException(oldIdent)
    SqlProcedures.renameTableDir(spark, rootOf(oldIdent), rootOf(newIdent))
  }

  // ---- namespaces ------------------------------------------------------

  override def listNamespaces(): Array[Array[String]] = {
    val base = new Path(warehouse)
    val fs = fsOf(base)
    if (!fs.exists(base)) Array.empty
    else fs.listStatus(base).filter(_.isDirectory).map(_.getPath)
      .filterNot(isTable)
      .map(p => Array(p.getName))
  }

  override def listNamespaces(namespace: Array[String]): Array[Array[String]] =
    if (namespace.isEmpty) listNamespaces()
    else {
      val base = new Path((warehouse +: namespace.toSeq).mkString("/"))
      val fs = fsOf(base)
      if (!fs.exists(base)) throw new NoSuchNamespaceException(
        catalogName +: namespace.toSeq)
      fs.listStatus(base).filter(_.isDirectory).map(_.getPath)
        .filterNot(isTable)
        .map(p => namespace :+ p.getName)
    }

  override def namespaceExists(namespace: Array[String]): Boolean =
    namespace.isEmpty || {
      val p = new Path((warehouse +: namespace.toSeq).mkString("/"))
      fsOf(p).exists(p) && !isTable(p)
    }

  override def loadNamespaceMetadata(namespace: Array[String]): util.Map[String, String] =
    if (namespaceExists(namespace)) new util.HashMap[String, String]()
    else throw new NoSuchNamespaceException(catalogName +: namespace.toSeq)

  override def createNamespace(namespace: Array[String],
                               metadata: util.Map[String, String]): Unit = {
    val p = new Path((warehouse +: namespace.toSeq).mkString("/"))
    fsOf(p).mkdirs(p)
    ()
  }

  override def alterNamespace(namespace: Array[String],
                              changes: NamespaceChange*): Unit =
    throw new UnsupportedOperationException(
      "graft namespaces carry no mutable metadata")

  override def dropNamespace(namespace: Array[String], cascade: Boolean): Boolean = {
    val p = new Path((warehouse +: namespace.toSeq).mkString("/"))
    val fs = fsOf(p)
    if (!fs.exists(p)) false
    else {
      if (!cascade)
        require(fs.listStatus(p).isEmpty,
          s"namespace ${namespace.mkString(".")} is not empty — use CASCADE")
      fs.delete(p, true)
    }
  }
}

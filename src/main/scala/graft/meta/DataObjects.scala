package graft.meta

import graft.table.ManagedTable
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Catalog data objects — Schema/Table/View/Volume
 * (reference: core/schemas/data_objects.py:6-151) and the
 * create-table-if-not-exists pre-step with identity / generated /
 * default column semantics (core/utils/delta.py:12-132).
 *
 * The reference delegates identity & generated columns to Delta table
 * features; without a Delta jar we enforce them at write time:
 *  - `generateExpr` columns are computed with `expr(...)` when absent;
 *  - `default` values fill NULLs;
 *  - identity columns are assigned `maxExisting + i * step` with `i` the
 *    row's global index from `zipWithIndex` — gap-free like a sequence,
 *    but computed distributed (per-partition counts + offsets), never via
 *    a single-partition window (see [[assignIdentity]]).
 */
object DataObjects {

  final case class ColumnSchema(
      name: String,
      dataType: String,
      comment: Option[String] = None,
      nullable: Boolean = true,
      identity: Boolean = false,
      identityStart: Long = 1L,
      identityStep: Long = 1L,
      generateExpr: Option[String] = None,
      default: Option[String] = None)

  /** Unity-Catalog-style grant on a securable: a principal (user email,
    * group name, or service principal) and its privileges (SELECT,
    * MODIFY, READ_VOLUME, ALL_PRIVILEGES, ...). */
  final case class Grant(principal: String, privileges: Seq[String])

  final case class TableDef(
      name: String,
      columns: Seq[ColumnSchema],
      partitionBy: Seq[String] = Nil,
      properties: Map[String, String] = Map.empty,
      comment: Option[String] = None,
      location: Option[String] = None,
      grants: Seq[Grant] = Nil)

  final case class ViewDef(name: String, query: String,
                           grants: Seq[Grant] = Nil)
  final case class VolumeDef(name: String, location: String,
                             grants: Seq[Grant] = Nil)
  final case class SchemaDef(
      name: String,
      tables: Seq[TableDef] = Nil,
      views: Seq[ViewDef] = Nil,
      volumes: Seq[VolumeDef] = Nil,
      grants: Seq[Grant] = Nil)

  /** StructType with comment metadata; identity columns are forced to
    * LongType like the reference (delta.py:27-30). */
  def structType(t: TableDef): StructType =
    StructType(t.columns.map { c =>
      val dt = if (c.identity) LongType else DataType.fromDDL(c.dataType)
      val mb = new MetadataBuilder()
      c.comment.foreach(mb.putString("comment", _))
      c.generateExpr.foreach(mb.putString("generationExpression", _))
      c.default.foreach(mb.putString("default", _))
      StructField(c.name, dt, c.nullable, mb.build())
    })

  /** Apply declared column semantics to an incoming batch:
    * compute missing generated columns, fill defaults, assign identity
    * values continuing from the table's current maximum. */
  def applyColumnSemantics(spark: SparkSession, t: TableDef,
                           tablePath: String, batch: DataFrame): DataFrame = {
    var df = batch
    t.columns.filter(c => c.generateExpr.isDefined && !batch.columns.contains(c.name))
      .foreach(c => df = df.withColumn(c.name, expr(c.generateExpr.get)))
    t.columns.filter(c => c.default.isDefined)
      .foreach { c =>
        val d = lit(c.default.get).cast(
          if (c.identity) LongType else DataType.fromDDL(c.dataType))
        df = if (df.columns.contains(c.name))
          df.withColumn(c.name, coalesce(col(c.name), d))
        else df.withColumn(c.name, d)
      }
    t.columns.filter(_.identity).foreach { c =>
      val table = ManagedTable(spark, tablePath)
      val current: Long =
        if (table.exists && table.read.columns.contains(c.name))
          Option(table.read.agg(max(col(c.name))).collect()(0).get(0))
            .map(_.asInstanceOf[Long]).getOrElse(c.identityStart - c.identityStep)
        else c.identityStart - c.identityStep
      df = assignIdentity(spark, df, c.name, current, c.identityStep)
    }
    df.select(t.columns.map(c => col(c.name)): _*)
  }

  /** Gap-free identity assignment that stays distributed. The old shape —
    * `row_number() over (order by monotonically_increasing_id())` — is a
    * no-partition window, which Spark executes by funnelling the whole
    * batch through ONE task; at cluster scale that stalls every
    * create-table-with-identity write. `zipWithIndex` gets the same
    * gap-free global numbering from one extra lightweight job (per-
    * partition counts) plus a per-partition offset add — no shuffle, no
    * single-task stage. */
  private[graft] def assignIdentity(spark: SparkSession, df: DataFrame,
                                   name: String, current: Long,
                                   step: Long): DataFrame = {
    val base = if (df.columns.contains(name)) df.drop(name) else df
    val schema = base.schema.add(StructField(name, LongType, nullable = false))
    val rows = base.rdd.zipWithIndex().map { case (r, i) =>
      org.apache.spark.sql.Row.fromSeq(r.toSeq :+ (current + (i + 1L) * step))
    }
    spark.createDataFrame(rows, schema)
  }

  /** Register a view over managed tables: the referenced tables must be
    * registered as temp views first (data_objects.py:99-115 analogue —
    * the reference issues CREATE VIEW DDL). */
  def createView(spark: SparkSession, v: ViewDef): Unit =
    spark.sql(s"CREATE OR REPLACE TEMPORARY VIEW ${v.name} AS ${v.query}")

  /** Register a managed table under its object name for SQL access. */
  def registerTable(spark: SparkSession, name: String, path: String): Unit =
    ManagedTable(spark, path).read.createOrReplaceTempView(name)
}

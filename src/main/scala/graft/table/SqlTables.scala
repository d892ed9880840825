package graft.table

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.catalyst.AliasIdentifier
import org.apache.spark.sql.catalyst.analysis.{RelationTimeTravel, UnresolvedIdentifier, UnresolvedRelation, UnresolvedTable}
import org.apache.spark.sql.catalyst.expressions.{Attribute, Cast, Expression}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.classic.GraftShims
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.functions.{col, lit}
import org.apache.spark.sql.types.{StructType, TimestampType}

/**
 * SQL-addressable managed tables — the `spark.sql("... graft.t ...")`
 * surface over [[ManagedTable]], done the Spark-first way: one analyzer
 * resolution rule (injected by `GraftExtensions`) substitutes any
 * relation under the reserved `graft` namespace with the SAME logical
 * plan the Scala API builds, so Catalyst sees one tree and every
 * downstream mechanism — filter/column pushdown into the parquet scan,
 * AQE, plan reuse — applies unchanged (a `graft.t` reference is not a
 * black box, exactly like the TVF surface).
 *
 * Identifier → table root:
 *   - `` graft.`/abs/path` ``       → that absolute root (quoting keeps
 *     the slashes in one identifier part)
 *   - `graft.t` / `` graft.`ns/t` `` → `<warehouse>/[ns/]t`, warehouse
 *     from `spark.graft.warehouse` (defaults under
 *     `spark.sql.warehouse.dir`)
 *   - `graft.ns.t` (unquoted multi-part) additionally needs the thin
 *     [[GraftCatalog]] registered (`spark.sql.catalog.graft`) — without
 *     it the session catalog rejects >2-part chains with
 *     REQUIRES_SINGLE_PART_NAMESPACE before any extension rule runs
 *
 * Supported statements:
 *   - `SELECT ... FROM graft.t`                    — snapshot read (DV- and
 *     column-mapping-aware, same as [[ManagedTable.read]])
 *   - `... FROM graft.t VERSION AS OF n`           — [[ManagedTable.readAt]]
 *   - `... FROM graft.t TIMESTAMP AS OF ts`        — [[ManagedTable.readAsOf]]
 *   - `INSERT INTO graft.t [(cols)] SELECT ...`    — append commit
 *   - `INSERT OVERWRITE graft.t SELECT ...`        — replace commit
 *   - streaming reads: `spark.readStream.table("graft.t")` resolves to the
 *     `graft-table` micro-batch source (initial snapshot + bounded tail)
 *
 * The reference keeps its SQL surface against Delta tables registered in
 * the metastore (`core/sources/delta_source.py:19-44`); here the commit
 * log itself is the metastore and resolution is pure metadata — no
 * catalog round-trips, constant-time at any table count.
 */
object SqlTables {

  /** Reserved leading identifier part. */
  val Namespace = "graft"

  def warehouse(spark: SparkSession): String =
    spark.conf.getOption("spark.graft.warehouse")
      .getOrElse(spark.conf.get("spark.sql.warehouse.dir") + "/graft")

  /** Multipart identifier (without the leading `graft`) → table root. */
  def rootOf(spark: SparkSession, parts: Seq[String]): String = {
    val joined = parts.mkString("/")
    if (joined.startsWith("/") || joined.contains("://")) joined
    else warehouse(spark) + "/" + joined
  }

  private[table] def aliased(parts: Seq[String], plan: LogicalPlan): LogicalPlan =
    SubqueryAlias(AliasIdentifier(parts.last, Namespace +: parts.init.toList), plan)
}

/**
 * The analyzer rule. Runs inside the main resolution batch (fixed
 * point), so it sees `UnresolvedRelation`s before CheckAnalysis would
 * reject them; relations outside the `graft` namespace pass through
 * untouched. Substituted subtrees are ALREADY analyzed (they come from
 * `ManagedTable.read`'s DataFrame), which is the supported shape for
 * resolution-rule output — the remaining iterations only resolve the
 * statement around them.
 */
final case class SqlTableResolution(spark: SparkSession) extends Rule[LogicalPlan] {

  private object GraftRel {
    def unapply(p: LogicalPlan): Option[(Seq[String], Boolean)] = p match {
      case UnresolvedRelation(head +: rest, _, isStreaming)
        if head.equalsIgnoreCase(SqlTables.Namespace) && rest.nonEmpty =>
        Some((rest, isStreaming))
      case _ => None
    }
  }

  private def table(parts: Seq[String]): ManagedTable =
    ManagedTable(spark, SqlTables.rootOf(spark, parts))

  private def plan(df: org.apache.spark.sql.DataFrame): LogicalPlan =
    df.queryExecution.analyzed

  override def apply(p: LogicalPlan): LogicalPlan = p.resolveOperatorsUp {
    // INSERT INTO / INSERT OVERWRITE graft.t — wait until the source
    // query is fully resolved, then hand it to the runnable command
    case InsertIntoStatement(GraftRel((parts, false)), partSpec, userCols,
        query, overwrite, ifPartitionNotExists, byName)
        if query.resolved =>
      require(partSpec.isEmpty && !ifPartitionNotExists,
        "static PARTITION specs are not supported for graft tables — " +
          "partitioning is declared at write time and appends are dir-composed")
      GraftInsertCommand(SqlTables.rootOf(spark, parts), query, userCols,
        overwrite, byName)

    // DELETE / UPDATE / MERGE: the relation child substitutes first
    // (post-order), so these match on the alias marker it leaves behind
    case DeleteFromTable(SqlDml.GraftTarget((parts, aliases)), cond) =>
      GraftDeleteCommand(SqlTables.rootOf(spark, parts),
        SqlDml.ExprBox(cond), aliases)

    case UpdateTable(SqlDml.GraftTarget((parts, aliases)), assigns, cond) =>
      val set = assigns.map { a =>
        a.key match {
          case org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute(ps) =>
            ps.last -> SqlDml.ExprBox(a.value)
          case other => throw new IllegalArgumentException(
            s"UPDATE SET key must be a column name, got ${other.sql}")
        }
      }
      GraftUpdateCommand(SqlTables.rootOf(spark, parts), set,
        cond.map(SqlDml.ExprBox), aliases)

    case MergeIntoTable(SqlDml.GraftTarget((parts, aliases)), source, cond,
        matchedActions, notMatchedActions, notMatchedBySource,
        withSchemaEvolution) =>
      require(notMatchedBySource.isEmpty,
        "WHEN NOT MATCHED BY SOURCE is not supported for graft tables")
      require(!withSchemaEvolution,
        "MERGE WITH SCHEMA EVOLUTION is not supported for graft tables")
      GraftMergeCommand(SqlTables.rootOf(spark, parts), source, aliases,
        SqlDml.ExprBox(cond), SqlDml.compileMatched(matchedActions),
        SqlDml.compileNotMatched(notMatchedActions))


    // graft.t VERSION AS OF n / TIMESTAMP AS OF ts
    case RelationTimeTravel(GraftRel((parts, false)), tsExpr, version) =>
      val t = table(parts)
      val df = version match {
        case Some(v) => t.readAt(v.toLong)
        case None =>
          val e = tsExpr.getOrElse(throw new IllegalArgumentException(
            "time travel needs VERSION AS OF or TIMESTAMP AS OF"))
          t.readAsOf(evalTsMs(e))
      }
      SqlTables.aliased(parts, plan(df))

    // plain graft.v where a VIEW is defined: splice the stored SQL's
    // re-parsed (unresolved) plan — the surrounding fixed point
    // resolves it, including nested graft references (view-over-view,
    // views over graft tables)
    case UnresolvedRelation(head +: rest, _, false)
        if head.equalsIgnoreCase(SqlTables.Namespace) && rest.nonEmpty &&
          !ManagedTable(spark, SqlTables.rootOf(spark, rest)).exists &&
          GraftViews.load(spark, SqlTables.rootOf(spark, rest)).isDefined =>
      SqlTables.aliased(rest, spark.sessionState.sqlParser.parsePlan(
        GraftViews.load(spark, SqlTables.rootOf(spark, rest)).get))

    // plain graft.t — batch snapshot or streaming source; the batch
    // path honors Delta-style reader options (`spark.read
    // .option("versionAsOf", 3).table("graft.t")`)
    case UnresolvedRelation(head +: rest, opts, isStreaming)
        if head.equalsIgnoreCase(SqlTables.Namespace) && rest.nonEmpty =>
      val root = SqlTables.rootOf(spark, rest)
      val df =
        if (isStreaming) {
          // forward the graft-table source's own admission options
          // (startingVersion, maxBytesPerTrigger, readChangeFeed, ...)
          // from `spark.readStream.option(...).table("graft.t")`
          import scala.jdk.CollectionConverters._
          spark.readStream.format("graft-table")
            .options(opts.asScala.toMap).option("path", root).load()
        }
        else (Option(opts.get("versionAsOf")),
              Option(opts.get("timestampAsOf"))) match {
          case (Some(v), None) => table(rest).readAt(v.toLong)
          case (None, Some(ts)) =>
            // parsed in the SESSION timezone (Delta's timestampAsOf
            // semantics), not the JVM default
            val zone = java.time.ZoneId.of(conf.sessionLocalTimeZone)
            table(rest).readAsOf(java.time.LocalDateTime
              .parse(ts.replace(" ", "T"))
              .atZone(zone).toInstant.toEpochMilli)
          case (None, None) => table(rest).read
          case _ => throw new IllegalArgumentException(
            "pass either versionAsOf or timestampAsOf, not both")
        }
      SqlTables.aliased(rest, plan(df))
  }

  /** `TIMESTAMP AS OF <expr>` → epoch millis: the parser hands a foldable
    * expression (usually a string literal); cast it to timestamp in the
    * session zone and evaluate driver-side — exactly what the DSv2 time
    * travel spec does. */
  private def evalTsMs(e: Expression): Long = {
    require(e.foldable, s"TIMESTAMP AS OF must be a literal, got ${e.sql}")
    val cast = Cast(e, TimestampType, Some(conf.sessionLocalTimeZone))
    val micros = cast.eval()
    require(micros != null, s"TIMESTAMP AS OF evaluated to NULL: ${e.sql}")
    micros.asInstanceOf[Long] / 1000L
  }
}

/**
 * `INSERT INTO` / `INSERT OVERWRITE` against a managed table, as a
 * runnable command (planned by Spark's built-in strategy — no custom
 * physical node needed; the write job itself is [[ManagedTable.write]]'s
 * distributed parquet write, identical to the Scala API's).
 *
 * Semantics:
 *   - table absent → created with the query's schema (first append wins)
 *   - `byName` (`INSERT ... BY NAME`) → columns matched by name
 *   - explicit column list → query outputs bind to those names
 *     positionally; unmentioned table columns fill with NULL
 *   - otherwise positional against the table schema (arity must match)
 *   - values cast to the table's column types; partitioning layout is
 *     carried from the table's last commit so appends keep the layout
 */
final case class GraftInsertCommand(
    root: String,
    query: LogicalPlan,
    userCols: Seq[String],
    overwrite: Boolean,
    byName: Boolean) extends LeafRunnableCommand {

  override def innerChildren: Seq[org.apache.spark.sql.catalyst.plans.QueryPlan[_]] =
    Seq(query)

  override def output: Seq[Attribute] = Nil

  override def run(spark: SparkSession): Seq[Row] = {
    val t = ManagedTable(spark, root)
    var df = GraftShims.ofRows(spark, query)
    if (userCols.nonEmpty) {
      require(userCols.size == df.columns.length,
        s"INSERT column list has ${userCols.size} columns but the query " +
          s"produced ${df.columns.length}")
      df = df.toDF(userCols: _*)
    }
    val last = t.lastCommit
    val aligned = last match {
      case None => df
      case Some(c) =>
        val target = StructType.fromDDL(c.schemaDdl)
        if (byName || userCols.nonEmpty) {
          val have = df.columns.toSet
          df.select(target.fields.toSeq.map { f =>
            if (have.contains(f.name)) col(s"`${f.name}`").cast(f.dataType)
            else if (userCols.nonEmpty) lit(null).cast(f.dataType).as(f.name)
            else throw new IllegalArgumentException(
              s"INSERT BY NAME: query has no column `${f.name}` " +
                s"required by table $root")
          }: _*)
        } else {
          require(df.columns.length == target.fields.length,
            s"INSERT: query produced ${df.columns.length} columns but table " +
              s"$root has ${target.fields.length} — list the columns or use BY NAME")
          df.toDF(target.fieldNames.toIndexedSeq: _*)
            .select(target.fields.toSeq.map(f =>
              col(s"`${f.name}`").cast(f.dataType)): _*)
        }
    }
    val partitionBy = last.map(_.partitionBy).getOrElse(Nil)
    // mergeSchema: the alignment above already pinned names and types to
    // the table's, so the only "evolution" this can admit is nullability
    // widening (a nullable source column may really deliver NULLs) —
    // exact-DDL append matching would otherwise reject e.g. a NOT NULL
    // literal inserted into a nullable column
    if (overwrite) t.write(aligned, "OVERWRITE", "replace", None, partitionBy)
    else t.write(aligned, "APPEND", "append", None, partitionBy,
      mergeSchema = true)
    Nil
  }
}

/**
 * DDL statements must be intercepted BEFORE the Resolution batch:
 * Spark's `ResolveSessionCatalog` (which runs ahead of injected
 * resolution rules in the same fixed point) would otherwise convert
 * `CREATE TABLE` / `ALTER TABLE ... TBLPROPERTIES` on a `graft.`
 * identifier into session-catalog v1 commands that reject the path
 * identifier at execution. Injected via `injectHintResolutionRule` —
 * the Hints batch precedes Resolution, and these nodes need no
 * resolution context (the identifier and literals are all parser
 * output).
 */
final case class SqlTableDdl(spark: SparkSession) extends Rule[LogicalPlan] {

  /** Identifier parts of the single graft relation under `p`, if any. */
  private def graftRelUnder(p: LogicalPlan): Option[Seq[String]] =
    p.collectFirst {
      case UnresolvedRelation(head +: rest, _, _)
        if head.equalsIgnoreCase(SqlTables.Namespace) && rest.nonEmpty => rest
    }

  override def apply(p: LogicalPlan): LogicalPlan = p.resolveOperatorsUp {
    // CREATE TABLE graft.t (cols...) [TBLPROPERTIES (...)]
    case CreateTable(UnresolvedIdentifier(head +: rest, _), columns,
        partitioning, tableSpec, ignoreIfExists)
        if head.equalsIgnoreCase(SqlTables.Namespace) && rest.nonEmpty =>
      require(partitioning.isEmpty,
        "PARTITIONED BY is not supported in CREATE TABLE for graft tables " +
          "— declare partitioning on the first write instead")
      val schema = org.apache.spark.sql.types.StructType(columns.map(c =>
        org.apache.spark.sql.types.StructField(c.name, c.dataType, c.nullable)))
      val props = tableSpec match {
        case u: UnresolvedTableSpec => u.properties
        case t: TableSpec => t.properties
        case _ => Map.empty[String, String]
      }
      val checks = tableSpec match {
        case u: UnresolvedTableSpec => u.constraints.map {
          case cc: org.apache.spark.sql.catalyst.expressions.CheckConstraint =>
            cc.userProvidedName -> cc.condition
          case other => throw new UnsupportedOperationException(
            s"only CHECK constraints are supported in CREATE TABLE, got $other")
        }
        case _ => Nil
      }
      GraftCreateTableCommand(SqlTables.rootOf(spark, rest), schema, props,
        ignoreIfExists, checks)

    // CREATE TABLE graft.t [PARTITIONED BY (...)] [TBLPROPERTIES] AS SELECT
    // — the query stays unanalyzed parser output here (Hints batch);
    // the command analyzes it at run time (GraftShims.ofRows), exactly
    // like MERGE's source, so CTAS over other graft tables works too
    case CreateTableAsSelect(UnresolvedIdentifier(head +: rest, _),
        partitioning, ctQuery, tableSpec, _, ignoreIfExists, _)
        if head.equalsIgnoreCase(SqlTables.Namespace) && rest.nonEmpty =>
      val partCols = partitioning.map { t =>
        GraftShims.identityTransformCol(t).getOrElse(
          throw new UnsupportedOperationException(
            "CTAS on graft tables supports only identity PARTITIONED BY " +
              s"columns, got $t"))
      }
      val props = tableSpec match {
        case u: UnresolvedTableSpec => u.properties
        case t: TableSpec => t.properties
        case _ => Map.empty[String, String]
      }
      GraftCtasCommand(SqlTables.rootOf(spark, rest), ctQuery, partCols,
        props, ignoreIfExists)

    // [CREATE OR] REPLACE TABLE graft.t ... AS SELECT — one replace
    // commit on the same log, history intact
    case ReplaceTableAsSelect(UnresolvedIdentifier(head +: rest, _),
        partitioning, rtQuery, tableSpec, _, orCreate, _)
        if head.equalsIgnoreCase(SqlTables.Namespace) && rest.nonEmpty =>
      val partCols = partitioning.map { t =>
        GraftShims.identityTransformCol(t).getOrElse(
          throw new UnsupportedOperationException(
            "REPLACE TABLE AS SELECT on graft tables supports only " +
              s"identity PARTITIONED BY columns, got $t"))
      }
      val props = tableSpec match {
        case u: UnresolvedTableSpec => u.properties
        case t: TableSpec => t.properties
        case _ => Map.empty[String, String]
      }
      GraftRtasCommand(SqlTables.rootOf(spark, rest), rtQuery, partCols,
        props, orCreate)

    // CREATE [OR REPLACE] VIEW graft.v AS SELECT — persist the ORIGINAL
    // SQL text; reads splice the re-parsed plan (SqlTableResolution)
    case CreateView(UnresolvedIdentifier(head +: rest, _), userCols, _, _,
        props, originalText, _, allowExisting, replace, _)
        if head.equalsIgnoreCase(SqlTables.Namespace) && rest.nonEmpty =>
      require(userCols.isEmpty,
        "column lists are not supported in CREATE VIEW for graft views")
      require(props.isEmpty,
        "TBLPROPERTIES are not supported in CREATE VIEW for graft views")
      val sql = originalText.getOrElse(throw new IllegalArgumentException(
        "CREATE VIEW on graft views needs the query's SQL text"))
      GraftCreateViewCommand(SqlTables.rootOf(spark, rest), sql,
        allowExisting, replace)

    case DropView(UnresolvedIdentifier(head +: rest, _), ifExists)
        if head.equalsIgnoreCase(SqlTables.Namespace) && rest.nonEmpty =>
      GraftDropViewCommand(SqlTables.rootOf(spark, rest), ifExists)

    // ALTER TABLE graft.t SET/UNSET TBLPROPERTIES
    case SetTableProperties(UnresolvedTable(head +: rest, _, _), props)
        if head.equalsIgnoreCase(SqlTables.Namespace) && rest.nonEmpty =>
      GraftSetPropertiesCommand(SqlTables.rootOf(spark, rest), props)
    case UnsetTableProperties(UnresolvedTable(head +: rest, _, _), keys, _)
        if head.equalsIgnoreCase(SqlTables.Namespace) && rest.nonEmpty =>
      GraftUnsetPropertiesCommand(SqlTables.rootOf(spark, rest), keys)

    // ALTER TABLE graft.t ADD/RENAME/DROP COLUMN(S) — all metadata-only
    case AddColumns(UnresolvedTable(head +: rest, _, _), cols)
        if head.equalsIgnoreCase(SqlTables.Namespace) && rest.nonEmpty =>
      val specs = cols.map { qc =>
        require(qc.name.size == 1,
          s"nested column paths are not supported: ${qc.name.mkString(".")}")
        require(qc.position.isEmpty && qc.default.isEmpty,
          "column position / DEFAULT are not supported in ADD COLUMN " +
            "for graft tables")
        (qc.name.head, qc.dataType)
      }
      GraftAddColumnsCommand(SqlTables.rootOf(spark, rest), specs)

    case RenameColumn(UnresolvedTable(head +: rest, _, _), fieldName, newName)
        if head.equalsIgnoreCase(SqlTables.Namespace) && rest.nonEmpty =>
      require(fieldName.name.size == 1,
        s"nested column paths are not supported: ${fieldName.name.mkString(".")}")
      GraftRenameColumnCommand(SqlTables.rootOf(spark, rest),
        fieldName.name.head, newName)

    case DropColumns(UnresolvedTable(head +: rest, _, _), fields, ifExists)
        if head.equalsIgnoreCase(SqlTables.Namespace) && rest.nonEmpty =>
      val names = fields.map { f =>
        require(f.name.size == 1,
          s"nested column paths are not supported: ${f.name.mkString(".")}")
        f.name.head
      }
      GraftDropColumnsCommand(SqlTables.rootOf(spark, rest), names, ifExists)

    // TRUNCATE TABLE graft.t — one empty-snapshot replace commit on the
    // same log (history stays travelable, schema survives)
    case TruncateTable(UnresolvedTable(head +: rest, _, _))
        if head.equalsIgnoreCase(SqlTables.Namespace) && rest.nonEmpty =>
      GraftTruncateCommand(SqlTables.rootOf(spark, rest))

    // SHOW CREATE TABLE graft.t — the DDL reconstructed from the
    // commit log (views answer with their CREATE VIEW text)
    case ShowCreateTable(u: org.apache.spark.sql.catalyst.analysis.UnresolvedTableOrView,
        _, out)
        if u.multipartIdentifier.headOption.exists(
          _.equalsIgnoreCase(SqlTables.Namespace)) &&
          u.multipartIdentifier.size > 1 =>
      GraftShowCreateCommand(
        SqlTables.rootOf(spark, u.multipartIdentifier.tail),
        u.multipartIdentifier.tail, out)

    // SHOW TBLPROPERTIES graft.t [('key')]
    case ShowTableProperties(u: org.apache.spark.sql.catalyst.analysis.UnresolvedTableOrView,
        key, out)
        if u.multipartIdentifier.headOption.exists(
          _.equalsIgnoreCase(SqlTables.Namespace)) &&
          u.multipartIdentifier.size > 1 =>
      GraftShowPropertiesCommand(
        SqlTables.rootOf(spark, u.multipartIdentifier.tail), key, out)

    // DESCRIBE [EXTENDED] graft.t — schema rows (+ table detail)
    case DescribeRelation(u: org.apache.spark.sql.catalyst.analysis.UnresolvedTableOrView,
        partSpec, isExtended, out)
        if u.multipartIdentifier.headOption.exists(
          _.equalsIgnoreCase(SqlTables.Namespace)) &&
          u.multipartIdentifier.size > 1 && partSpec.isEmpty =>
      GraftDescribeCommand(
        SqlTables.rootOf(spark, u.multipartIdentifier.tail), isExtended, out)

    // DROP TABLE / ALTER TABLE RENAME — name-level operations the thin
    // catalog cannot serve through loadTable (it deliberately refuses,
    // keeping the data path in the resolution rule), so they route here
    case DropTable(
        org.apache.spark.sql.catalyst.analysis.UnresolvedTableOrView(
          head +: rest, _, _), ifExists, _)
        if head.equalsIgnoreCase(SqlTables.Namespace) && rest.nonEmpty =>
      GraftDropTableCommand(SqlTables.rootOf(spark, rest), ifExists)

    case RenameTable(
        org.apache.spark.sql.catalyst.analysis.UnresolvedTableOrView(
          head +: rest, _, _), newName, false)
        if head.equalsIgnoreCase(SqlTables.Namespace) && rest.nonEmpty =>
      val target =
        if (newName.headOption.exists(_.equalsIgnoreCase(SqlTables.Namespace)))
          newName.tail
        else newName
      require(target.nonEmpty, "RENAME TO needs a table name")
      GraftRenameTableCommand(SqlTables.rootOf(spark, rest),
        SqlTables.rootOf(spark, target))

    // SHOW VIEWS IN graft[.ns] [LIKE 'pat'] — logical views are
    // descriptor files, not catalog entries, so the v2 catalog path
    // cannot serve them; list the warehouse namespace directly
    case ShowViews(
        org.apache.spark.sql.catalyst.analysis.UnresolvedNamespace(
          head +: ns, _), pattern, out)
        if head.equalsIgnoreCase(SqlTables.Namespace) =>
      GraftShowViewsCommand(ns, pattern, out)

    // CALL graft.<proc>(...) — maintenance procedures
    case Call(org.apache.spark.sql.catalyst.analysis.UnresolvedProcedure(
        head +: proc), callArgs, _)
        if head.equalsIgnoreCase(SqlTables.Namespace) && proc.nonEmpty =>
      GraftCallCommand(proc.mkString("."), callArgs)

    // ALTER TABLE graft.t ADD CONSTRAINT name CHECK (cond) — the parser
    // wraps the relation in a validation Filter; recover it underneath
    case a: AddCheckConstraint if graftRelUnder(a.child).isDefined =>
      val rest = graftRelUnder(a.child).get
      GraftAddConstraintCommand(SqlTables.rootOf(spark, rest),
        a.checkConstraint.userProvidedName, a.checkConstraint.condition)
  }
}

/** Thin delegating parser (injected by `GraftExtensions`) adding the
  * one statement Spark's grammar lacks: `DESCRIBE HISTORY graft.t` —
  * Delta's spelling for the commit-log listing
  * (`CALL graft.history(path)` remains the procedure form; both return
  * the same rows). Non-graft identifiers and every other statement
  * delegate untouched, so the session dialect is otherwise exactly
  * Spark's. */
final class GraftSqlParser(
    delegate: org.apache.spark.sql.catalyst.parser.ParserInterface)
  extends org.apache.spark.sql.catalyst.parser.ParserInterface {

  private val HistoryRe =
    """(?is)\A\s*(?:DESC|DESCRIBE)\s+HISTORY\s+(.+?)\s*;?\s*\z""".r

  override def parsePlan(sqlText: String): LogicalPlan = sqlText match {
    case HistoryRe(ident) =>
      val parts =
        try delegate.parseMultipartIdentifier(ident)
        catch { case _: Exception => Nil }
      if (parts.headOption.exists(_.equalsIgnoreCase(SqlTables.Namespace)) &&
          parts.size > 1)
        GraftDescribeHistoryCommand(parts.tail)
      else delegate.parsePlan(sqlText)
    case _ => delegate.parsePlan(sqlText)
  }

  override def parseExpression(s: String) = delegate.parseExpression(s)
  override def parseTableIdentifier(s: String) = delegate.parseTableIdentifier(s)
  override def parseFunctionIdentifier(s: String) =
    delegate.parseFunctionIdentifier(s)
  override def parseMultipartIdentifier(s: String) =
    delegate.parseMultipartIdentifier(s)
  override def parseQuery(s: String) = delegate.parseQuery(s)
  override def parseRoutineParam(s: String) = delegate.parseRoutineParam(s)
  override def parseTableSchema(s: String) = delegate.parseTableSchema(s)
  override def parseDataType(s: String) = delegate.parseDataType(s)
}

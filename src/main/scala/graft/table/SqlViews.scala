package graft.table

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.catalyst.expressions.Attribute
import org.apache.spark.sql.execution.command.LeafRunnableCommand

/**
 * Logical SQL VIEWS over the `graft` namespace — the missing §2.1
 * object kind next to tables (reference: core/schemas/data_objects.py:99
 * — a View IS a name plus a SQL query): `CREATE [OR REPLACE] VIEW
 * graft.v AS SELECT ...` persists the ORIGINAL SQL TEXT, and any later
 * `... FROM graft.v` splices the re-parsed plan into the statement at
 * resolution time — exactly how the TVF surface works, so Catalyst
 * sees one tree and pushdown/pruning/AQE apply through the view
 * unchanged (a view reference is never a black box, and a view over a
 * graft TABLE time-travels with the table's current snapshot).
 *
 * Storage: one small JSON file `_graft_view.json` at the identifier's
 * root (same identifier → root mapping as tables — warehouse-relative
 * or quoted absolute). A root can hold a table OR a view, never both
 * (loudly enforced both ways). View-over-view nests naturally through
 * the analyzer's fixed point; a definition CYCLE surfaces as the
 * analyzer's max-iterations error rather than a hang.
 *
 * Deliberately unsupported (loud): column lists, TBLPROPERTIES on
 * views, and streaming reads through a view.
 */
object GraftViews {

  private def fsAndPath(spark: SparkSession, root: String) = {
    val p = new org.apache.hadoop.fs.Path(root, "_graft_view.json")
    (p.getFileSystem(spark.sparkContext.hadoopConfiguration), p)
  }

  /** The stored view SQL at `root`, if a view is defined there. */
  def load(spark: SparkSession, root: String): Option[String] = {
    val (fs, p) = fsAndPath(spark, root)
    if (!fs.exists(p)) None
    else {
      val in = fs.open(p)
      val body = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
        finally in.close()
      // minimal, dependency-free JSON: {"sql": "<escaped>"}
      val re = """(?s)\{"sql":\s*"(.*)"\}\s*""".r
      body match {
        case re(esc) => Some(unescape(esc))
        case _ => throw new IllegalStateException(
          s"corrupt view definition at $p: $body")
      }
    }
  }

  /** Single left-to-right pass — sequential `.replace` calls would
    * mangle SQL containing a literal backslash before an 'n' (regex
    * text inside the view query, e.g. `'\\n'`). */
  private def unescape(esc: String): String = {
    val sb = new StringBuilder(esc.length)
    var i = 0
    while (i < esc.length) {
      if (esc.charAt(i) == '\\' && i + 1 < esc.length) {
        esc.charAt(i + 1) match {
          case 'n' => sb.append('\n')
          case c => sb.append(c) // \\  \"  and any future escape
        }
        i += 2
      } else { sb.append(esc.charAt(i)); i += 1 }
    }
    sb.toString
  }

  def store(spark: SparkSession, root: String, sql: String): Unit = {
    val (fs, p) = fsAndPath(spark, root)
    val esc = sql.replace("\\", "\\\\").replace("\"", "\\\"")
      .replace("\n", "\\n")
    val out = fs.create(p, true)
    try out.write(s"""{"sql": "$esc"}""".getBytes("UTF-8"))
    finally out.close()
  }

  def drop(spark: SparkSession, root: String, ifExists: Boolean): Unit = {
    val (fs, p) = fsAndPath(spark, root)
    if (fs.exists(p)) {
      // delete ONLY the view descriptor — anything else under the root
      // (pre-existing user files, a nested graft table created beneath
      // it) is not the view's to destroy; the directory itself leaves
      // only once it is empty afterwards
      fs.delete(p, false)
      val dir = new org.apache.hadoop.fs.Path(root)
      if (fs.exists(dir) && fs.listStatus(dir).isEmpty) fs.delete(dir, false)
      ()
    }
    else if (!ifExists) throw new IllegalStateException(
      s"graft view at $root does not exist (use DROP VIEW IF EXISTS)")
  }
}

/** `CREATE [OR REPLACE] VIEW graft.v AS SELECT ...` — stores the
  * original query text. `IF NOT EXISTS` no-ops on an existing view;
  * plain CREATE refuses; a TABLE at the root always refuses. */
final case class GraftCreateViewCommand(root: String, sql: String,
                                        allowExisting: Boolean,
                                        replace: Boolean)
  extends LeafRunnableCommand {
  override def output: Seq[Attribute] = Nil
  override def run(spark: SparkSession): Seq[Row] = {
    require(!ManagedTable(spark, root).exists,
      s"cannot CREATE VIEW at $root — a graft TABLE already lives there")
    val exists = GraftViews.load(spark, root).isDefined
    if (exists && !replace) {
      if (!allowExisting)
        throw new IllegalStateException(s"graft view at $root already " +
          "exists (use CREATE OR REPLACE VIEW or IF NOT EXISTS)")
    } else GraftViews.store(spark, root, sql)
    Nil
  }
}

/** `DROP VIEW [IF EXISTS] graft.v`. A TABLE at the root refuses (that
  * is what DROP TABLE is for — mirroring the session catalog's
  * table/view kind checks). */
final case class GraftDropViewCommand(root: String, ifExists: Boolean)
  extends LeafRunnableCommand {
  override def output: Seq[Attribute] = Nil
  override def run(spark: SparkSession): Seq[Row] = {
    require(!ManagedTable(spark, root).exists,
      s"$root is a graft TABLE — use DROP TABLE")
    GraftViews.drop(spark, root, ifExists)
    Nil
  }
}

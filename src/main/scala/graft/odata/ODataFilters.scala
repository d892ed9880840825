package graft.odata

import org.apache.spark.sql.sources._
import org.apache.spark.sql.types._
import java.sql.{Date, Timestamp}
import java.time.ZoneOffset
import java.time.format.DateTimeFormatter

/**
 * Spark `Filter` → OData `$filter` translation
 * (reference: ODataScan.scala:85-141, ODataHelper.scala:42-101).
 *
 * Pushable: =, <>, <, >, <=, >= and the string predicates, but only on
 * String/Timestamp/Double/Integer/Long columns (ODataHelper.scala:109-117).
 * Values render as OData literals: strings quoted, timestamps ISO-8601 Z
 * (ODataHelper.scala:71-101). The reference renders `StringContains` as
 * `endswith` (ODataScan.scala:134-135) — a bug we do NOT replicate;
 * contains renders as `contains`.
 */
object ODataFilters {

  final case class Pushed(expression: String, raw: Filter)

  private val IsoTs = DateTimeFormatter.ofPattern("yyyy-MM-dd'T'HH:mm:ss.SSSSSS'Z'")

  def renderValue(value: Any): String = value match {
    // OData escapes embedded quotes by doubling; without it a value like
    // O'Brien produces a malformed (and injectable) $filter
    case s: String => s"'${s.replace("'", "''")}'"
    case ts: Timestamp => ts.toInstant.atZone(ZoneOffset.UTC).format(IsoTs)
    case d: Date => d.toString
    case other => String.valueOf(other)
  }

  private def pushableType(dt: DataType): Boolean = dt match {
    case StringType | TimestampType | DoubleType | IntegerType | LongType => true
    case _ => false
  }

  /** Split filters into (pushed, postScan). Unknown shapes and non-pushable
    * column types are returned to Spark for post-evaluation
    * (ODataScan.scala:60-72). */
  def split(filters: Array[Filter], schema: StructType): (Seq[Pushed], Seq[Filter]) = {
    def colOk(attr: String): Boolean =
      schema.fields.find(_.name == attr).exists(f => pushableType(f.dataType))
    def render(attr: String, op: String, v: Any): String =
      s"$attr $op ${renderValue(v)}"
    val results = filters.map { f =>
      val pushed: Option[String] = f match {
        case EqualTo(a, v) if colOk(a) => Some(render(a, "eq", v))
        case Not(EqualTo(a, v)) if colOk(a) => Some(render(a, "ne", v))
        case LessThan(a, v) if colOk(a) => Some(render(a, "lt", v))
        case GreaterThan(a, v) if colOk(a) => Some(render(a, "gt", v))
        case LessThanOrEqual(a, v) if colOk(a) => Some(render(a, "le", v))
        case GreaterThanOrEqual(a, v) if colOk(a) => Some(render(a, "ge", v))
        case StringStartsWith(a, v) if colOk(a) => Some(s"startswith($a,${renderValue(v)})")
        case StringEndsWith(a, v) if colOk(a) => Some(s"endswith($a,${renderValue(v)})")
        case StringContains(a, v) if colOk(a) => Some(s"contains($a,${renderValue(v)})")
        case _ => None
      }
      (f, pushed)
    }
    (results.collect { case (f, Some(e)) => Pushed(e, f) }.toSeq,
      results.collect { case (f, None) => f }.toSeq)
  }

  def combine(pushed: Seq[Pushed]): Option[String] =
    if (pushed.isEmpty) None else Some(pushed.map(_.expression).mkString(" and "))

  /**
   * User-supplied predicate strings (the `predicates` option, parsed with
   * `CatalystSqlParser` — reference ODataTable.scala:151-216). Supported
   * shapes: `=`, `<`, `>`, `<=`, `>=`, `!=`/`<>`; anything else throws,
   * matching the reference's strictness.
   */
  def parsePredicate(expr: String): Pushed = {
    import org.apache.spark.sql.catalyst.parser.CatalystSqlParser
    import org.apache.spark.sql.catalyst.{expressions => cat}
    def attrOf(e: cat.Expression): String = e.toString.replace("'", "")
    def valOf(e: cat.Expression): Any = e.eval() match {
      case u: org.apache.spark.unsafe.types.UTF8String => u.toString
      case other => other
    }
    val parsed = try CatalystSqlParser.parseExpression(expr) catch {
      case e: Throwable => throw new IllegalArgumentException(
        s"predicate '$expr' failed to parse: ${e.getMessage}")
    }
    parsed match {
      case cat.EqualTo(a, v) =>
        Pushed(s"${attrOf(a)} eq ${renderValue(valOf(v))}", EqualTo(attrOf(a), valOf(v)))
      case cat.LessThan(a, v) =>
        Pushed(s"${attrOf(a)} lt ${renderValue(valOf(v))}", LessThan(attrOf(a), valOf(v)))
      case cat.GreaterThan(a, v) =>
        Pushed(s"${attrOf(a)} gt ${renderValue(valOf(v))}", GreaterThan(attrOf(a), valOf(v)))
      case cat.LessThanOrEqual(a, v) =>
        Pushed(s"${attrOf(a)} le ${renderValue(valOf(v))}", LessThanOrEqual(attrOf(a), valOf(v)))
      case cat.GreaterThanOrEqual(a, v) =>
        Pushed(s"${attrOf(a)} ge ${renderValue(valOf(v))}", GreaterThanOrEqual(attrOf(a), valOf(v)))
      case cat.Not(cat.EqualTo(a, v)) =>
        Pushed(s"${attrOf(a)} ne ${renderValue(valOf(v))}", Not(EqualTo(attrOf(a), valOf(v))))
      case other => throw new IllegalArgumentException(
        s"predicate '$expr' shape ${other.getClass.getSimpleName} not supported")
    }
  }

  /** Parse a semicolon-separated predicates option. The split is
    * quote-aware so a literal like `Name = 'a;b'` stays one predicate. */
  def parsePredicates(option: String): Seq[Pushed] = {
    val parts = Seq.newBuilder[String]
    val cur = new StringBuilder
    var inQuote = false
    option.foreach {
      case '\'' => inQuote = !inQuote; cur += '\''
      case ';' if !inQuote => parts += cur.toString(); cur.clear()
      case c => cur += c
    }
    parts += cur.toString()
    parts.result().map(_.trim).filter(_.nonEmpty).map(parsePredicate)
  }
}

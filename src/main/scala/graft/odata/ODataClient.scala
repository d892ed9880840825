package graft.odata

import org.apache.spark.sql.types._
import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.net.URLEncoder
import java.nio.charset.StandardCharsets
import java.time.Duration

/**
 * OData REST connector core: connection options, schema inference from the
 * service `$metadata` document, `$count` probes, and paged entity reads.
 *
 * Re-expresses the reference connector's client
 * (reference: connectors/spark/scala/odata/.../ODataClient.scala:231-469,
 * ODataHelper.scala:147-160 for the Edm type map) on `java.net.http` —
 * no third-party HTTP/JSON deps; JSON via Jackson (ships with Spark),
 * XML via scala-xml (ships with Spark).
 */
final case class ODataOptions(
    instanceUrl: String,
    entity: String,
    accessToken: Option[String] = None,
    rowsPerPage: Int = 1000,
    maxPagesPerBatch: Int = 4,
    incrementalField: String = "ModifiedOn",
    connectTimeoutMs: Int = 100000,
    predicates: Option[String] = None) {
  require(instanceUrl.nonEmpty, "odata: instanceUrl required")
  require(entity.nonEmpty, "odata: entity required")
  require(rowsPerPage > 0, "odata: rowsPerPage must be positive")
}

object ODataOptions {
  /** Build from DSv2 options map (reference ODataSource.scala:42-129
    * validates clientID/clientSecret/identityUrl/instanceUrl; we accept a
    * pre-acquired bearer token — the OAuth client-credentials dance is an
    * orthogonal concern for a stub-tested connector). */
  def fromMap(options: java.util.Map[String, String], entity: String): ODataOptions = {
    def req(k: String): String = {
      val v = options.get(k)
      require(v != null && v.nonEmpty, s"odata: required option '$k' missing")
      v
    }
    ODataOptions(
      instanceUrl = req("instanceUrl").stripSuffix("/"),
      entity = entity,
      accessToken = Option(options.get("accessToken")),
      rowsPerPage = Option(options.get("rowsPerPage")).map(_.toInt).getOrElse(1000),
      maxPagesPerBatch = Option(options.get("maxPagesPerBatch")).map(_.toInt).getOrElse(4),
      incrementalField = Option(options.get("incrementalField")).getOrElse("ModifiedOn"),
      predicates = Option(options.get("predicates")))
  }
}

/** One entity column: OData name + Edm source type → Spark type
  * (ODataHelper.scala:147-160 mapping, default StringType). */
final case class ODataColumn(name: String, edmType: String) {
  def sparkType: DataType = edmType match {
    case "Edm.String" => StringType
    case "Edm.Int32" => IntegerType
    case "Edm.Int64" => LongType
    case "Edm.DateTimeOffset" => TimestampType
    case "Edm.Decimal" | "Edm.Double" => DoubleType
    case "Edm.Boolean" => BooleanType
    case _ => StringType
  }
}

final class ODataHttpError(msg: String) extends RuntimeException(msg)

class ODataClient(opts: ODataOptions) extends Serializable {

  @transient private lazy val http: HttpClient = HttpClient.newBuilder()
    .connectTimeout(Duration.ofMillis(opts.connectTimeoutMs)).build()

  private def get(path: String, params: Map[String, String] = Map.empty): String = {
    val qs = params.map { case (k, v) =>
      s"${URLEncoder.encode(k, StandardCharsets.UTF_8)}=${URLEncoder.encode(v, StandardCharsets.UTF_8)}"
    }.mkString("&")
    val url = s"${opts.instanceUrl}/$path" + (if (qs.nonEmpty) s"?$qs" else "")
    // request timeout too: connectTimeout alone doesn't bound a server
    // that accepts the connection and then stalls
    val b = HttpRequest.newBuilder(URI.create(url))
      .timeout(Duration.ofMillis(opts.connectTimeoutMs)).GET()
    opts.accessToken.foreach(t => b.header("Authorization", s"Bearer $t"))
    val resp = http.send(b.build(), HttpResponse.BodyHandlers.ofString())
    if (resp.statusCode() / 100 != 2)
      throw new ODataHttpError(s"GET $url -> ${resp.statusCode()}: ${resp.body().take(200)}")
    resp.body()
  }

  /** Schema inference: walk `$metadata` EntityType/Property, skipping
    * `Edm.Stream` columns (ODataClient.scala:415-469). */
  def inferSchema(): Seq[ODataColumn] = {
    val xml = scala.xml.XML.loadString(get("$metadata"))
    val entityTypes = (xml \\ "EntityType").filter(e => (e \ "@Name").text == opts.entity)
    if (entityTypes.isEmpty)
      throw new ODataHttpError(s"entity ${opts.entity} not found in \\$$metadata")
    (entityTypes.head \\ "Property")
      .filter(p => (p \ "@Type").text != "Edm.Stream")
      .map(p => ODataColumn((p \ "@Name").text, (p \ "@Type").text))
  }

  /** Entity count under the given `$filter` — the partition-planning probe
    * (`$count=true&$top=0`, ODataClient.scala:276-327). */
  def count(filter: Option[String]): Long = {
    val params = Map("$count" -> "true", "$top" -> "0") ++
      filter.map("$filter" -> _)
    val node = new com.fasterxml.jackson.databind.ObjectMapper()
      .readTree(get(opts.entity, params))
    val c = Option(node.get("@odata.count")).orElse(Option(node.get("count")))
    c.map(_.asLong()).getOrElse(
      throw new ODataHttpError("count response missing @odata.count"))
  }

  /** One page of entity data ordered by the incremental field
    * (`$top/$skip/$orderby`, ODataClient.scala:352-401), with optional
    * `$filter`/`$select` from the pushdowns. */
  def page(pageIndex: Int, filter: Option[String], select: Option[Seq[String]],
           top: Int): Seq[Map[String, Any]] = {
    val params = Map(
      "$top" -> top.toString,
      "$skip" -> (pageIndex.toLong * opts.rowsPerPage).toString,
      "$orderby" -> s"${opts.incrementalField} asc") ++
      filter.map("$filter" -> _) ++
      select.map(cols => "$select" -> cols.mkString(","))
    val node = new com.fasterxml.jackson.databind.ObjectMapper()
      .readTree(get(opts.entity, params))
    val arr = Option(node.get("value")).getOrElse(
      throw new ODataHttpError("page response missing 'value' array"))
    import scala.jdk.CollectionConverters._
    arr.elements().asScala.map { row =>
      row.properties().asScala.map { e =>
        val v: Any = e.getValue match {
          case n if n.isNull => null
          case n if n.isIntegralNumber => n.asLong()
          case n if n.isNumber => n.asDouble()
          case n if n.isBoolean => n.asBoolean()
          case n => n.asText()
        }
        e.getKey -> v
      }.toMap
    }.toSeq
  }
}

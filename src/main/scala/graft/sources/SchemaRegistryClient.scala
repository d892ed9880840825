package graft.sources

import com.fasterxml.jackson.databind.ObjectMapper
import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.charset.StandardCharsets
import java.time.Duration
import java.util.Base64

final class SchemaRegistryRequestException(msg: String, cause: Throwable = null)
  extends RuntimeException(msg, cause)

/** One registered schema version (Confluent wire format). */
final case class RegistrySchema(
    subject: String,
    id: Int,
    version: Int,
    schemaType: String, // AVRO (the registry default when absent) | JSON | PROTOBUF
    schemaStr: String)

/**
 * Confluent schema-registry REST client (reference:
 * core/utils/spark.py:145-177 `read_from_schema_registry` — the
 * confluent_kafka SchemaRegistryClient's `get_latest_version(subject)`
 * with basic auth). The wire call that library makes is
 * `GET {url}/subjects/{subject}/versions/latest` with
 * `Authorization: Basic base64(key:pass)`; this client makes it directly
 * on `java.net.http`, stub-testable like the OData connector.
 */
final class SchemaRegistryClient(
    baseUrl: String,
    registryKey: Option[String] = None,
    registryPass: Option[String] = None,
    connectTimeoutMs: Int = 100000) {

  private val http = HttpClient.newBuilder()
    .connectTimeout(Duration.ofMillis(connectTimeoutMs)).build()
  private val mapper = new ObjectMapper()

  /** Latest registered version of a subject
    * (spark.py:170-173; errors wrap into the registry exception like
    * SchemaRegistryRequestParsingError). */
  def latestVersion(subject: String): RegistrySchema = {
    val url = s"${baseUrl.stripSuffix("/")}/subjects/" +
      java.net.URLEncoder.encode(subject, StandardCharsets.UTF_8) +
      "/versions/latest"
    val b = HttpRequest.newBuilder(URI.create(url))
      // request timeout too: connectTimeout alone doesn't bound a server
      // that accepts the connection and then stalls
      .timeout(Duration.ofMillis(connectTimeoutMs))
      .header("Accept", "application/vnd.schemaregistry.v1+json").GET()
    for (k <- registryKey; p <- registryPass)
      b.header("Authorization", "Basic " + Base64.getEncoder
        .encodeToString(s"$k:$p".getBytes(StandardCharsets.UTF_8)))
    val resp =
      try http.send(b.build(), HttpResponse.BodyHandlers.ofString())
      catch {
        case e: Exception =>
          throw new SchemaRegistryRequestException(
            s"schema registry request failed for $url: ${e.getMessage}", e)
      }
    if (resp.statusCode() / 100 != 2)
      throw new SchemaRegistryRequestException(
        s"GET $url -> ${resp.statusCode()}: ${resp.body().take(200)}")
    val n = mapper.readTree(resp.body())
    RegistrySchema(
      subject = subject,
      id = Option(n.get("id")).map(_.asInt()).getOrElse(-1),
      version = Option(n.get("version")).map(_.asInt()).getOrElse(-1),
      schemaType = Option(n.get("schemaType")).map(_.asText()).getOrElse("AVRO"),
      schemaStr = Option(n.get("schema")).map(_.asText()).getOrElse(
        throw new SchemaRegistryRequestException(
          s"registry response for $subject missing 'schema'")))
  }
}

package graft.sources

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import java.net.{URI, URLEncoder}
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path => JPath}
import java.time.Duration

final class SharepointRequestException(msg: String, cause: Throwable = null)
  extends RuntimeException(msg, cause)

/**
 * Sharepoint drive client over the Microsoft Graph REST API
 * (reference: core/sources/file_source.py:264-421 `SharepointClient` —
 * MSAL confidential-client auth + office365 GraphClient). Re-expressed on
 * `java.net.http` with no third-party deps: the OAuth2 client-credentials
 * token POST, site resolution by URL, drive-item listing/stat, and
 * content download are the actual wire calls the office365 library makes.
 *
 * `authorityBase`/`graphBase` default to the public Microsoft endpoints
 * and are injectable so tests can stand up a local stub Graph server
 * (same pattern as the OData connector's stub-HTTP suite).
 */
final class SharepointClient private[sources] (
    graphBase: String,
    siteId: String,
    bearer: () => String,
    connectTimeoutMs: Int = 100000) extends RemoteFileClient {

  @transient private lazy val http: HttpClient = HttpClient.newBuilder()
    .connectTimeout(Duration.ofMillis(connectTimeoutMs))
    .followRedirects(HttpClient.Redirect.NORMAL).build()
  private val mapper = new ObjectMapper()

  /** `/drive/root:/{path}:` addressing; bare root for "" or "/". */
  private def itemUrl(path: String, suffix: String): String = {
    val clean = path.stripPrefix("/").stripSuffix("/")
    if (clean.isEmpty) s"$graphBase/v1.0/sites/$siteId/drive/root$suffix"
    else {
      val enc = clean.split("/").map(URLEncoder.encode(_, StandardCharsets.UTF_8)
        .replace("+", "%20")).mkString("/")
      val colonSuffix = if (suffix.isEmpty) "" else s":$suffix"
      s"$graphBase/v1.0/sites/$siteId/drive/root:/$enc$colonSuffix"
    }
  }

  private def get(url: String): HttpResponse[Array[Byte]] = {
    val req = HttpRequest.newBuilder(URI.create(url))
      // request timeout too: connectTimeout alone doesn't bound a server
      // that accepts the connection and then stalls
      .timeout(Duration.ofMillis(connectTimeoutMs))
      .header("Authorization", s"Bearer ${bearer()}").GET().build()
    val resp = http.send(req, HttpResponse.BodyHandlers.ofByteArray())
    if (resp.statusCode() / 100 != 2)
      throw new SharepointRequestException(
        s"Failed while requesting the resource details from sharepoint " +
          s"location $url with error HTTP ${resp.statusCode()}: " +
          new String(resp.body(), StandardCharsets.UTF_8).take(200))
    resp
  }

  private def getJson(url: String): JsonNode =
    mapper.readTree(new String(get(url).body(), StandardCharsets.UTF_8))

  /** Drive-item children names (file_source.py:314-329 `listdir` —
    * `root.get_by_path(path).children.get()`). */
  override def listdir(path: String): Seq[String] = {
    import scala.jdk.CollectionConverters._
    val node = getJson(itemUrl(path, "/children"))
    Option(node.get("value")).map(_.elements().asScala.toSeq).getOrElse(Nil)
      .map(_.get("name").asText())
  }

  /** Drive-item metadata: folder/file facet, size,
    * lastModifiedDateTime (file_source.py:356-362 resource fetch). */
  override def stat(path: String): RemoteStat = {
    val node = getJson(itemUrl(path, ""))
    val modified = Option(node.get("lastModifiedDateTime"))
      .map(n => java.time.Instant.parse(n.asText()).toEpochMilli).getOrElse(0L)
    RemoteStat(
      path = path,
      isFile = node.has("file"),
      sizeBytes = Option(node.get("size")).map(_.asLong()).getOrElse(0L),
      modifiedMs = modified)
  }

  /** Content download (file_source.py:410-421 `get_file` —
    * `source_file.download(f)`); Graph serves `/content` directly or via
    * a 302 to a pre-signed URL, both handled by redirect-following. */
  override def download(remote: String, local: JPath): Unit = {
    Files.createDirectories(local.getParent)
    Files.write(local, get(itemUrl(remote, "/content")).body())
    ()
  }
}

object SharepointClient {

  /**
   * Service-principal auth + site resolution
   * (file_source.py:269-310 `with_client_secrets`): acquire a
   * client-credentials token from `{authorityBase}/{tenantId}/oauth2/v2.0/
   * token` scoped to Graph, then resolve the site id from its URL via
   * `GET /v1.0/sites/{host}:{sitePath}`. The token is re-acquired lazily
   * on expiry (epoch check with 60 s slack).
   */
  def withClientSecrets(
      tenantId: String,
      clientId: String,
      clientSecret: String,
      siteUrl: String,
      authorityBase: String = "https://login.microsoftonline.com",
      graphBase: String = "https://graph.microsoft.com"): SharepointClient = {

    val http = HttpClient.newBuilder()
      .connectTimeout(Duration.ofMillis(100000)).build()
    val mapper = new ObjectMapper()

    var token: String = null
    var expiresAtMs: Long = 0L
    def acquire(): String = synchronized {
      if (token == null || System.currentTimeMillis() > expiresAtMs - 60000L) {
        val form = Map(
          "grant_type" -> "client_credentials",
          "client_id" -> clientId,
          "client_secret" -> clientSecret,
          "scope" -> s"$graphBase/.default")
          .map { case (k, v) =>
            s"${URLEncoder.encode(k, StandardCharsets.UTF_8)}=${URLEncoder.encode(v, StandardCharsets.UTF_8)}"
          }.mkString("&")
        val req = HttpRequest.newBuilder(
            URI.create(s"$authorityBase/$tenantId/oauth2/v2.0/token"))
          .timeout(Duration.ofMillis(100000))
          .header("Content-Type", "application/x-www-form-urlencoded")
          .POST(HttpRequest.BodyPublishers.ofString(form)).build()
        val resp = http.send(req, HttpResponse.BodyHandlers.ofString())
        if (resp.statusCode() / 100 != 2)
          throw new SharepointRequestException(
            s"token acquisition failed: HTTP ${resp.statusCode()}: ${resp.body().take(200)}")
        val node = mapper.readTree(resp.body())
        token = Option(node.get("access_token")).map(_.asText()).getOrElse(
          throw new SharepointRequestException("token response missing access_token"))
        expiresAtMs = System.currentTimeMillis() +
          Option(node.get("expires_in")).map(_.asLong()).getOrElse(3600L) * 1000L
      }
      token
    }

    // site-by-URL: https://host/sites/name -> GET /v1.0/sites/host:/sites/name
    val uri = URI.create(siteUrl)
    val sitePath = Option(uri.getPath).getOrElse("").stripSuffix("/")
    val siteAddr =
      if (sitePath.isEmpty || sitePath == "/") uri.getHost
      else s"${uri.getHost}:$sitePath"
    val req = HttpRequest.newBuilder(URI.create(s"$graphBase/v1.0/sites/$siteAddr"))
      .timeout(Duration.ofMillis(100000))
      .header("Authorization", s"Bearer ${acquire()}").GET().build()
    val resp = http.send(req, HttpResponse.BodyHandlers.ofString())
    if (resp.statusCode() / 100 != 2)
      throw new SharepointRequestException(
        s"site resolution failed for $siteUrl: HTTP ${resp.statusCode()}: ${resp.body().take(200)}")
    val siteId = Option(mapper.readTree(resp.body()).get("id")).map(_.asText())
      .getOrElse(throw new SharepointRequestException("site response missing id"))

    new SharepointClient(graphBase, siteId, () => acquire())
  }
}

package graft.events

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.charset.StandardCharsets
import java.time.Duration

final class WebhookRequestException(msg: String) extends RuntimeException(msg)

/**
 * Webhook notification consumer for the event bus (reference:
 * core/event/__init__.py:113-133 `event_handler_notification` posting via
 * core/utils/__init__.py:121-128 `post_webhook_api` — a JSON POST with
 * raise-for-status). A subscribed-consumer config carries the request URL
 * and an optional static message; absent a message, the event itself is
 * serialized — name, severity, payload — so the receiving hook sees what
 * fired.
 */
object Webhook {

  private lazy val http: HttpClient = HttpClient.newBuilder()
    .connectTimeout(Duration.ofMillis(30000)).build()

  /** POST a JSON body; throws on non-2xx like requests'
    * `raise_for_status`. The per-request timeout covers a server that
    * accepts the connection then stalls — otherwise a dead endpoint would
    * hang the event handler (and the task behind it) forever. */
  def post(url: String, jsonBody: String): Int = {
    val req = HttpRequest.newBuilder(URI.create(url))
      .timeout(Duration.ofMillis(30000))
      .header("Content-Type", "application/json")
      .POST(HttpRequest.BodyPublishers.ofString(jsonBody, StandardCharsets.UTF_8))
      .build()
    val resp = http.send(req, HttpResponse.BodyHandlers.ofString())
    if (resp.statusCode() / 100 != 2)
      throw new WebhookRequestException(
        s"POST $url -> ${resp.statusCode()}: ${resp.body().take(200)}")
    resp.statusCode()
  }

  /** Event-bus handler for a NOTIFICATION consumer
    * (event/__init__.py:136-154 `get_event_handler_function`): failures
    * are contained (the reference logs a warning; the bus additionally
    * never propagates handler errors). */
  def notificationHandler(requestUrl: String,
                          message: Option[String] = None): Event => Unit = {
    event =>
      val body = message.getOrElse(eventJson(event))
      try { post(requestUrl, body); () }
      catch { case _: Exception => () }
  }

  /** Canonical JSON for an event (used when no static message is
    * configured). */
  def eventJson(event: Event): String = {
    val m = new com.fasterxml.jackson.databind.ObjectMapper()
    val node = m.createObjectNode()
    node.put("name", event.name)
    node.put("severity", event.severity)
    val p = node.putObject("payload")
    event.payload.foreach { case (k, v) => p.put(k, v) }
    m.writeValueAsString(node)
  }
}

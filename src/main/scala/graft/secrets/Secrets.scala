package graft.secrets

import scala.util.matching.Regex

/**
 * `{{scope/key}}` secret templating (reference:
 * core/secrets/spark_secret.py:9-77, applied across the whole config tree
 * in task.py:136-209). Backends: an in-memory map (tests) or a local JSON
 * file of `{scope: {key: value}}` — the reference's non-Databricks
 * fallback. Unknown references are left untouched, like the reference's
 * regex substitution.
 */
trait SecretBackend {
  def get(scope: String, key: String): Option[String]
}

final class MapSecretBackend(values: Map[(String, String), String]) extends SecretBackend {
  def get(scope: String, key: String): Option[String] = values.get((scope, key))
}

final class JsonFileSecretBackend(path: String) extends SecretBackend {
  private val root = new com.fasterxml.jackson.databind.ObjectMapper()
    .readTree(java.nio.file.Files.readString(java.nio.file.Paths.get(path)))
  def get(scope: String, key: String): Option[String] =
    Option(root.get(scope)).flatMap(s => Option(s.get(key))).map(_.asText())
}

object Secrets {
  private val Pattern: Regex = """\{\{([^/{}]+)/([^/{}]+)\}\}""".r

  /** Substitute every `{{scope/key}}` occurrence in a string. */
  def format(s: String, backend: SecretBackend): String =
    Pattern.replaceAllIn(s, m =>
      Regex.quoteReplacement(
        backend.get(m.group(1), m.group(2)).getOrElse(m.matched)))

  /** Substitute across a string→string option map (config tree analogue). */
  def formatMap(m: Map[String, String], backend: SecretBackend): Map[String, String] =
    m.map { case (k, v) => k -> format(v, backend) }
}

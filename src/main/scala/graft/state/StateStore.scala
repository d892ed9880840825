package graft.state

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}
import java.nio.charset.StandardCharsets

/**
 * Versioned file-based key-value state store.
 *
 * Mirrors the reference's `SparkExecutionTaskState`
 * (reference: core/state/spark/state.py:37-180): a state directory with
 * `sources/`, `sink/`, `state/` sub-dirs; `set` writes
 * `{"version":N,"value":...}` to `<source>/<key>/<key>` after copying the
 * previous value aside as `<key>_v<prevN>`; `get` unwraps the JSON
 * envelope; `append` writes a raw value to `<srcPrefix>/<keyDir>/<key>`
 * (source split on the first `_`, state.py:131-155).
 *
 * All IO goes through Hadoop `FileSystem`, so the same store works on
 * HDFS/S3A at cluster scale — state is tiny metadata, never data.
 */
final class StateStore(conf: Configuration, root: String) {
  private val rootPath = new Path(root)
  private def fs: FileSystem = rootPath.getFileSystem(conf)

  // sources/sink/state pre-created like the reference (state.py:77-88)
  Seq("sources", "sink", "state").foreach(d => fs.mkdirs(new Path(rootPath, d)))

  def stateLocation: String = root

  private def keyPath(source: String, key: String) =
    new Path(rootPath, s"$source/$key/$key")

  private def readFile(p: Path): String = {
    val in = fs.open(p)
    try new String(org.apache.commons.io.IOUtils.toByteArray(in), StandardCharsets.UTF_8)
    finally in.close()
  }

  private def writeFile(p: Path, v: String): Unit = {
    val out = fs.create(p, true)
    try out.write(v.getBytes(StandardCharsets.UTF_8)) finally out.close()
  }

  private def mapper = new com.fasterxml.jackson.databind.ObjectMapper()

  /** Versioned set (state.py:90-129): previous value preserved as
    * `<key>_v<N>`, new value wrapped as `{"version":N+1,"value":v}`. */
  def set(source: String, key: String, value: String): Unit = {
    val dir = new Path(rootPath, s"$source/$key")
    val kp = keyPath(source, key)
    var version = 0L
    if (!fs.exists(dir)) fs.mkdirs(dir)
    else if (fs.exists(kp)) {
      val previous = readFile(kp)
      val prevVersion = mapper.readTree(previous).get("version").asLong()
      writeFile(new Path(dir, s"${key}_v$prevVersion"), previous)
      version = prevVersion + 1
    }
    val node = mapper.createObjectNode()
    node.put("version", version)
    node.put("value", value)
    writeFile(kp, mapper.writeValueAsString(node))
  }

  /** Raw append-style write (state.py:131-155): `source` is split at the
    * first underscore into `<dir>/<keyDir>`. */
  def append(source: String, key: String, value: String): Unit = {
    val parts = source.split("_", 2)
    val dir = new Path(rootPath, s"${parts(0)}/${if (parts.length > 1) parts(1) else ""}")
    fs.mkdirs(dir)
    writeFile(new Path(dir, key), value)
  }

  def get(source: String, key: String, default: Option[String] = None): Option[String] = {
    val kp = keyPath(source, key)
    if (fs.exists(kp)) Some(mapper.readTree(readFile(kp)).get("value").asText())
    else default
  }

  /** Full version history of a key, oldest first (current value last). */
  def versions(source: String, key: String): Seq[(Long, String)] = {
    val dir = new Path(rootPath, s"$source/$key")
    if (!fs.exists(dir)) return Nil
    fs.listStatus(dir).toSeq.flatMap { st =>
      val name = st.getPath.getName
      val content = readFile(st.getPath)
      val n = mapper.readTree(content)
      if (name == key || name.startsWith(s"${key}_v"))
        Some(n.get("version").asLong() -> n.get("value").asText())
      else None
    }.sortBy(_._1)
  }
}

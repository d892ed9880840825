package graft.sources

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}
import java.io.{BufferedOutputStream, FileOutputStream}
import java.nio.file.{Files, Paths}
import java.util.zip.ZipInputStream
import scala.collection.mutable

/**
 * File-level source utilities: zip decompression of fetched files
 * (reference: core/utils/__init__.py:81-84, applied in
 * file_source.py:145-172), deferred post-task file operations
 * (core/runtime/__init__.py:8-33 `Runtime.atexit` + the
 * post_task_execution feature, input.py:305-333), and modified-time file
 * listing for file-path CDC (file_source.py:727-813 — the reference
 * lists via Sharepoint/SFTP clients; ours walks any Hadoop FileSystem,
 * which covers local, HDFS, and S3A the same way).
 */
object FileOps {

  final class NoSourceData(msg: String) extends RuntimeException(msg)

  /** Extract a .zip archive into `targetDir`; returns extracted paths.
    * Entry names are sanitized against path traversal. */
  def unzip(zipFile: String, targetDir: String): Seq[String] = {
    Files.createDirectories(Paths.get(targetDir))
    val out = mutable.ArrayBuffer.empty[String]
    val zin = new ZipInputStream(Files.newInputStream(Paths.get(zipFile)))
    try {
      var entry = zin.getNextEntry
      while (entry != null) {
        val name = entry.getName
        require(!name.contains(".."), s"zip entry escapes target dir: $name")
        val target = Paths.get(targetDir, name)
        if (entry.isDirectory) Files.createDirectories(target)
        else {
          Files.createDirectories(target.getParent)
          val os = new BufferedOutputStream(new FileOutputStream(target.toFile))
          try {
            val buf = new Array[Byte](8192)
            var n = zin.read(buf)
            while (n >= 0) { os.write(buf, 0, n); n = zin.read(buf) }
          } finally os.close()
          out += target.toString
        }
        zin.closeEntry()
        entry = zin.getNextEntry
      }
    } finally zin.close()
    out.toSeq
  }

  /** If the input path is a zip, extract to a temp dir and return the new
    * read path; otherwise return the path unchanged (file_source.py
    * compression pre-step). */
  def resolveCompression(path: String): String =
    if (path.endsWith(".zip")) {
      val dir = Files.createTempDirectory("graft_unzip").toString
      unzip(path, dir)
      dir
    } else path

  /** Files under `dir` with modification time in (startMs, endMs] —
    * the file-path CDC listing. Throws [[NoSourceData]] when empty,
    * like the reference (file_source.py:799-809). */
  def modifiedFiles(conf: Configuration, dir: String,
                    startMs: Long, endMs: Long): Seq[String] = {
    val p = new Path(dir)
    val fs: FileSystem = p.getFileSystem(conf)
    if (!fs.exists(p)) throw new NoSourceData(s"source path $dir does not exist")
    val it = fs.listFiles(p, true)
    val out = mutable.ArrayBuffer.empty[String]
    while (it.hasNext) {
      val st = it.next()
      if (st.isFile && st.getModificationTime > startMs && st.getModificationTime <= endMs)
        out += st.getPath.toString
    }
    if (out.isEmpty)
      throw new NoSourceData(s"no files modified in ($startMs, $endMs] under $dir")
    out.toSeq
  }

  /**
   * Wildcard resolution over comma-separated paths (reference:
   * file_source.py:87-121): each `/`-segment containing `*` or `?` is
   * expanded via directory listing with glob matching; non-matching
   * branches are silently dropped. Runs on the Hadoop FileSystem so the
   * same globbing works on local/HDFS/S3A.
   */
  def wildcardResolution(conf: Configuration, pathSpec: String): Seq[String] = {
    def matches(pattern: String, name: String): Boolean = {
      val rx = ("\\Q" + pattern.replace("*", "\\E.*\\Q").replace("?", "\\E.\\Q") + "\\E").r
      rx.pattern.matcher(name).matches()
    }
    val SchemePrefix = "^([a-zA-Z][a-zA-Z0-9+.-]*://[^/]*)(/.*)?$".r
    pathSpec.split(",").map(_.trim).filter(_.nonEmpty).toSeq.flatMap { one =>
      if (!one.contains("*") && !one.contains("?")) Seq(one)
      else {
        // split off "scheme://authority" so s3a://bucket/... paths keep
        // their root instead of being treated as relative segments
        val (root, rest) = one match {
          case SchemePrefix(auth, tail) => (auth, Option(tail).getOrElse(""))
          case p if p.startsWith("/") => ("", p)
          case p => (".", s"/$p")
        }
        val segs = rest.stripPrefix("/").split("/").toSeq.filter(_.nonEmpty)
        segs.foldLeft(Seq(root)) { (bases, seg) =>
          if (!seg.contains("*") && !seg.contains("?")) bases.map(b => s"$b/$seg")
          else bases.flatMap { b =>
            val p = new Path(if (b.isEmpty) "/" else b)
            val fs = p.getFileSystem(conf)
            if (!fs.exists(p)) Nil
            else fs.listStatus(p).toSeq.map(_.getPath.getName)
              .filter(matches(seg, _)).map(n => s"$b/$n")
          }
        }
      }
    }
  }

  /**
   * Deferred post-task executor: operations registered during the run
   * execute only after the task succeeds (`Runtime.atexit` analogue;
   * keyed per-runtime-instance rather than per-thread — tasks own their
   * runtime). Failures in cleanup functions are contained.
   */
  final class PostTaskRuntime {
    private val ops = mutable.ArrayBuffer.empty[() => Unit]

    def atExit(op: () => Unit): Unit = synchronized { ops += op; () }

    /** Register a file deletion (the post_task_execution `delete` op). */
    def deleteAtExit(conf: Configuration, path: String): Unit =
      atExit { () =>
        val p = new Path(path)
        p.getFileSystem(conf).delete(p, true)
        ()
      }

    def cleanup(): Unit = synchronized {
      ops.foreach(op => try op() catch { case _: Throwable => })
      ops.clear()
    }

    def pending: Int = synchronized(ops.size)
  }
}

package graft

import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}
import graft.sources._
import java.io.{DataInputStream, DataOutputStream}
import java.net.{InetSocketAddress, ServerSocket}
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path => JPath, Paths}

/**
 * Remote business-file clients against in-process stub servers — the
 * same pattern ODataSpec uses for its HTTP stub (reference behaviors:
 * core/sources/file_source.py:264-421 Sharepoint MSAL+Graph, :424-560
 * SFTP, :921-1011 CSV-via-remote e2e).
 */
class RemoteFileSourcesSpec extends SparkSpec {

  // ---------------------------------------------------------------------
  // SFTP stub server: SFTP v3 wire protocol over a plain socket, serving
  // a local directory. Exercises the client's actual packet encoding.
  // ---------------------------------------------------------------------

  /** `omitPermissions` mimics servers whose STAT/READDIR attrs carry no
    * ATTR_PERMISSIONS flag — the client must then probe with OPENDIR
    * instead of misreading a defaulted 0 as "regular file". */
  private final class SftpStubServer(rootDir: JPath,
                                     omitPermissions: Boolean = false) extends AutoCloseable {
    import SftpProtocol._
    private val server = new ServerSocket(0)
    val port: Int = server.getLocalPort
    @volatile private var running = true

    // one thread per connection: executor-side distributed fetch opens
    // several concurrent channels
    private val thread = new Thread(() => {
      while (running) {
        try {
          val sock = server.accept()
          val t = new Thread(() => {
            val din = new DataInputStream(sock.getInputStream)
            val dout = new DataOutputStream(sock.getOutputStream)
            try serveOne(din, dout)
            catch { case _: Exception => () }
            finally sock.close()
          })
          t.setDaemon(true)
          t.start()
        } catch { case _: Exception => () }
      }
    })
    thread.setDaemon(true)
    thread.start()

    private def resolve(remote: String): JPath =
      rootDir.resolve(remote.stripPrefix("/")).normalize()

    private def serveOne(din: DataInputStream, dout: DataOutputStream): Unit = {
      var handles = Map.empty[String, Either[Seq[JPath], JPath]] // dir listing | file
      var served = Set.empty[String] // dir handles already listed once
      var nextHandle = 0

      def sendPacket(tpe: Int, payload: Array[Byte]): Unit = {
        dout.writeInt(payload.length + 1); dout.writeByte(tpe)
        dout.write(payload); dout.flush()
      }
      def status(id: Int, code: Int, msg: String): Unit = {
        val p = new Payload
        p.u32(id); p.u32(code); p.str(msg); p.str("en")
        sendPacket(FXP_STATUS, p.bytes)
      }
      def attrsOf(p: JPath): Attrs = Attrs(
        size = if (Files.isRegularFile(p)) Files.size(p) else 0L,
        permissions =
          if (omitPermissions) 0
          else if (Files.isDirectory(p)) S_IFDIR | 0x1ed else 0x1a4,
        mtimeSec = Files.getLastModifiedTime(p).toMillis / 1000L,
        hasPermissions = !omitPermissions)

      while (true) {
        val len = din.readInt()
        val tpe = din.readUnsignedByte()
        val body = new Array[Byte](len - 1)
        din.readFully(body)
        val r = new Reader(body)
        tpe match {
          case FXP_INIT =>
            val p = new Payload; p.u32(PROTOCOL_VERSION)
            sendPacket(FXP_VERSION, p.bytes)
          case FXP_OPENDIR =>
            val id = r.u32(); val path = r.str()
            val dir = resolve(path)
            if (!Files.isDirectory(dir)) status(id, STATUS_NO_SUCH_FILE, s"no dir $path")
            else {
              nextHandle += 1
              val h = s"h$nextHandle"
              import scala.jdk.CollectionConverters._
              handles += h -> Left(Files.list(dir).iterator().asScala.toSeq)
              val p = new Payload; p.u32(id); p.str(h)
              sendPacket(FXP_HANDLE, p.bytes)
            }
          case FXP_READDIR =>
            val id = r.u32(); val h = new String(r.strBytes(), StandardCharsets.UTF_8)
            handles.get(h) match {
              case Some(Left(entries)) if !served.contains(h) =>
                served += h
                val p = new Payload
                p.u32(id); p.u32(entries.size)
                entries.foreach { e =>
                  p.str(e.getFileName.toString)
                  p.str(s"---------- 1 u g 0 Jan 1 00:00 ${e.getFileName}")
                  p.attrs(attrsOf(e))
                }
                sendPacket(FXP_NAME, p.bytes)
              case Some(Left(_)) => status(id, STATUS_EOF, "eof")
              case _ => status(id, STATUS_FAILURE, "bad handle")
            }
          case FXP_STAT | FXP_LSTAT =>
            val id = r.u32(); val path = r.str()
            val p0 = resolve(path)
            if (!Files.exists(p0)) status(id, STATUS_NO_SUCH_FILE, s"no file $path")
            else {
              val p = new Payload; p.u32(id); p.attrs(attrsOf(p0))
              sendPacket(FXP_ATTRS, p.bytes)
            }
          case FXP_OPEN =>
            val id = r.u32(); val path = r.str()
            val f = resolve(path)
            if (!Files.isRegularFile(f)) status(id, STATUS_NO_SUCH_FILE, s"no file $path")
            else {
              nextHandle += 1
              val h = s"h$nextHandle"
              handles += h -> Right(f)
              val p = new Payload; p.u32(id); p.str(h)
              sendPacket(FXP_HANDLE, p.bytes)
            }
          case FXP_READ =>
            val id = r.u32(); val h = new String(r.strBytes(), StandardCharsets.UTF_8)
            val offset = r.u64(); val want = r.u32()
            handles.get(h) match {
              case Some(Right(f)) =>
                val size = Files.size(f)
                if (offset >= size) status(id, STATUS_EOF, "eof")
                else {
                  val n = math.min(want.toLong, size - offset).toInt
                  val ch = Files.newByteChannel(f)
                  val buf = java.nio.ByteBuffer.allocate(n)
                  ch.position(offset)
                  while (buf.hasRemaining && ch.read(buf) >= 0) {}
                  ch.close()
                  val p = new Payload; p.u32(id); p.raw(buf.array())
                  sendPacket(FXP_DATA, p.bytes)
                }
              case _ => status(id, STATUS_FAILURE, "bad handle")
            }
          case FXP_CLOSE =>
            val id = r.u32(); val h = new String(r.strBytes(), StandardCharsets.UTF_8)
            handles -= h; served -= h
            status(id, STATUS_OK, "ok")
          case FXP_REMOVE =>
            val id = r.u32(); val path = r.str()
            val f = resolve(path)
            if (Files.deleteIfExists(f)) status(id, STATUS_OK, "ok")
            else status(id, STATUS_NO_SUCH_FILE, s"no file $path")
          case other =>
            val id = r.u32()
            status(id, STATUS_FAILURE, s"unsupported packet $other")
        }
      }
    }

    override def close(): Unit = { running = false; server.close() }
  }

  private def withSftp(f: (SftpClient, JPath) => Unit): Unit = {
    val root = Files.createTempDirectory("sftp_stub_root")
    val server = new SftpStubServer(root)
    try {
      val client = new SftpClient(SftpChannel.tcp("localhost", server.port))
      try f(client, root) finally client.close()
    } finally server.close()
  }

  private def seedTree(root: JPath): Unit = {
    Files.createDirectories(root.resolve("inbox/2026"))
    Files.write(root.resolve("inbox/a.csv"), "id,v\n1,x\n2,y\n".getBytes)
    Files.write(root.resolve("inbox/b.csv"), "id,v\n3,z\n".getBytes)
    Files.write(root.resolve("inbox/skip.txt"), "not csv".getBytes)
    Files.write(root.resolve("inbox/2026/c.csv"), "id,v\n4,w\n".getBytes)
  }

  test("sftp: listdir, stat, download round-trip the v3 wire protocol") {
    withSftp { (client, root) =>
      seedTree(root)
      assert(client.listdir("/inbox").toSet === Set("a.csv", "b.csv", "skip.txt", "2026"))
      val st = client.stat("/inbox/a.csv")
      assert(st.isFile && st.sizeBytes === 13L && st.modifiedMs > 0)
      assert(!client.stat("/inbox/2026").isFile)
      val local = Files.createTempDirectory("sftp_dl").resolve("a.csv")
      client.download("/inbox/a.csv", local)
      assert(new String(Files.readAllBytes(local), StandardCharsets.UTF_8) ===
        "id,v\n1,x\n2,y\n")
      // missing paths fail with the status mapped into the message
      val e = intercept[SFTPRequestException](client.stat("/nope"))
      assert(e.getMessage.contains("NO_SUCH_FILE"))
    }
  }

  test("sftp: wildcard resolution + recursive files list via the shared ops") {
    withSftp { (client, root) =>
      seedTree(root)
      val resolved = RemoteFileOps.wildcardResolution(client, "/inbox/*.csv")
      assert(resolved.toSet === Set("/inbox/a.csv", "/inbox/b.csv"))
      // dir expansion recurses (file_source.py get_files_list)
      val all = RemoteFileOps.filesList(client, Seq("/inbox")).map(_.path)
      assert(all.toSet === Set("/inbox/a.csv", "/inbox/b.csv",
        "/inbox/skip.txt", "/inbox/2026/c.csv"))
      // non-matching wildcard branches drop silently
      assert(RemoteFileOps.wildcardResolution(client, "/nope/*.csv").isEmpty)
    }
  }

  test("sftp: stat classifies dirs via OPENDIR probe when server omits permissions") {
    val root = Files.createTempDirectory("sftp_noperm_root")
    val server = new SftpStubServer(root, omitPermissions = true)
    try {
      seedTree(root)
      val client = new SftpClient(SftpChannel.tcp("localhost", server.port))
      try {
        assert(!client.stat("/inbox/2026").isFile,
          "dir must not be misclassified as a file when permissions are absent")
        assert(client.stat("/inbox/a.csv").isFile)
        // walk must recurse into the dir, not try to download it
        val all = RemoteFileOps.filesList(client, Seq("/inbox")).map(_.path)
        assert(all.toSet === Set("/inbox/a.csv", "/inbox/b.csv",
          "/inbox/skip.txt", "/inbox/2026/c.csv"))
      } finally client.close()
    } finally server.close()
  }

  test("sftp: delete removes the remote file") {
    withSftp { (client, root) =>
      seedTree(root)
      client.delete("/inbox/skip.txt")
      assert(!Files.exists(root.resolve("inbox/skip.txt")))
      intercept[SFTPRequestException](client.delete("/inbox/skip.txt"))
    }
  }

  test("sftp: CSV-via-remote e2e reads staged files through Spark") {
    withSftp { (client, root) =>
      seedTree(root)
      val df = RemoteFileOps.readCsv(spark, client, "/inbox/*.csv")
      import spark.implicits._
      assert(df.as[(Int, String)].collect().toSet ===
        Set((1, "x"), (2, "y"), (3, "z")))
    }
  }

  test("sftp: driver-side fetch keeps same-named files from different dirs") {
    withSftp { (client, root) =>
      Files.createDirectories(root.resolve("in/a"))
      Files.createDirectories(root.resolve("in/b"))
      Files.write(root.resolve("in/a/part.csv"), "id,v\n1,x\n".getBytes)
      Files.write(root.resolve("in/b/part.csv"), "id,v\n2,y\n".getBytes)
      val df = RemoteFileOps.readCsv(spark, client, "/in")
      import spark.implicits._
      // basename staging would have silently dropped one of the two
      assert(df.as[(Int, String)].collect().toSet === Set((1, "x"), (2, "y")))
    }
  }

  test("sftp: zip archives staged via fetchFiles are decompressed") {
    withSftp { (client, root) =>
      Files.createDirectories(root.resolve("inbox"))
      val zipPath = root.resolve("inbox/batch.zip")
      val zos = new java.util.zip.ZipOutputStream(Files.newOutputStream(zipPath))
      zos.putNextEntry(new java.util.zip.ZipEntry("z.csv"))
      zos.write("id,v\n9,q\n".getBytes); zos.closeEntry(); zos.close()
      val dir = RemoteFileOps.fetchFiles(client, "/inbox", ".csv")
      val df = spark.read.option("header", "true")
        .option("recursiveFileLookup", "true").csv(dir)
      assert(df.collect().map(_.getString(0)).toSeq === Seq("9"))
    }
  }

  test("sftp: distributed fetch downloads on executors with per-partition connections") {
    val root = Files.createTempDirectory("sftp_dist_root")
    val server = new SftpStubServer(root)
    try {
      Files.createDirectories(root.resolve("in/a"))
      Files.createDirectories(root.resolve("in/b"))
      // same file name in two remote dirs — flattened names must not collide
      Files.write(root.resolve("in/a/part.csv"), "id,v\n1,x\n".getBytes)
      Files.write(root.resolve("in/b/part.csv"), "id,v\n2,y\n".getBytes)
      (0 until 6).foreach(i =>
        Files.write(root.resolve(s"in/f$i.csv"), s"id,v\n${10 + i},z$i\n".getBytes))
      val target = tmpDir("dist_fetch_target")
      // factory captures only the port — serializable into executor tasks
      val port = server.port
      val dir = RemoteFileOps.fetchFilesDistributed(spark,
        () => new SftpClient(SftpChannel.tcp("localhost", port)),
        "/in", ".csv", target, parallelism = 4)
      val df = spark.read.option("header", "true")
        .option("inferSchema", "true").csv(dir)
      import spark.implicits._
      assert(df.as[(Int, String)].collect().toSet === Set(
        (1, "x"), (2, "y")) ++ (0 until 6).map(i => (10 + i, s"z$i")))
      // both same-named files survived under distinct flattened names
      val names = new java.io.File(target).list().toSet
      assert(names.contains("in__a__part.csv") && names.contains("in__b__part.csv"))
    } finally server.close()
  }

  // ---------------------------------------------------------------------
  // Sharepoint stub: minimal Graph API (token endpoint + site resolution
  // + drive-item listing/stat/content) over a local directory.
  // ---------------------------------------------------------------------

  @volatile private var tokenRequests: List[String] = Nil
  @volatile private var bearersSeen: Set[String] = Set.empty

  private def startGraphStub(rootDir: JPath): HttpServer = {
    val server = HttpServer.create(new InetSocketAddress(0), 0)
    server.createContext("/", new HttpHandler {
      override def handle(ex: HttpExchange): Unit = {
        val path = ex.getRequestURI.getPath
        def send(code: Int, body: Array[Byte], cType: String = "application/json"): Unit = {
          ex.getResponseHeaders.set("Content-Type", cType)
          ex.sendResponseHeaders(code, if (body.isEmpty) -1 else body.length)
          if (body.nonEmpty) ex.getResponseBody.write(body)
          ex.close()
        }
        def sendJson(code: Int, body: String): Unit =
          send(code, body.getBytes(StandardCharsets.UTF_8))

        // --- token endpoint (authority side)
        if (path.endsWith("/oauth2/v2.0/token")) {
          val form = new String(ex.getRequestBody.readAllBytes(), StandardCharsets.UTF_8)
          tokenRequests = tokenRequests :+ form
          if (form.contains("grant_type=client_credentials") &&
              form.contains("client_secret=s3cret"))
            sendJson(200, """{"access_token":"tok_123","expires_in":3600}""")
          else sendJson(401, """{"error":"invalid_client"}""")
          return
        }

        Option(ex.getRequestHeaders.getFirst("Authorization"))
          .foreach(a => bearersSeen += a)

        // --- site resolution: /v1.0/sites/{host}:{/sites/x}
        if (path.startsWith("/v1.0/sites/") && !path.contains("/drive")) {
          sendJson(200, """{"id":"site_42","displayName":"stub"}""")
          return
        }

        // --- drive items under /v1.0/sites/site_42/drive/root...
        val RootChildren = "/v1.0/sites/site_42/drive/root/children"
        val ItemPat = "/v1.0/sites/site_42/drive/root:/(.*)".r
        def itemJson(p: JPath, rel: String): String = {
          val facet =
            if (Files.isDirectory(p)) s""""folder":{"childCount":0}"""
            else s""""file":{"mimeType":"text/csv"}"""
          val mod = java.time.Instant
            .ofEpochMilli(Files.getLastModifiedTime(p).toMillis)
          s"""{"name":"${p.getFileName}","size":${if (Files.isRegularFile(p)) Files.size(p) else 0},
             |"lastModifiedDateTime":"$mod",$facet}""".stripMargin.replace("\n", "")
        }
        def childrenJson(dir: JPath): String = {
          import scala.jdk.CollectionConverters._
          val items = Files.list(dir).iterator().asScala.toSeq
            .map(p => itemJson(p, p.getFileName.toString))
          s"""{"value":[${items.mkString(",")}]}"""
        }

        path match {
          case RootChildren => sendJson(200, childrenJson(rootDir))
          case ItemPat(tail) =>
            val decoded = java.net.URLDecoder.decode(tail, StandardCharsets.UTF_8)
            val (rel, op) =
              if (decoded.endsWith(":/children")) (decoded.stripSuffix(":/children"), "children")
              else if (decoded.endsWith(":/content")) (decoded.stripSuffix(":/content"), "content")
              else (decoded.stripSuffix(":"), "item")
            val p = rootDir.resolve(rel).normalize()
            if (!Files.exists(p)) sendJson(404, """{"error":{"code":"itemNotFound"}}""")
            else op match {
              case "children" => sendJson(200, childrenJson(p))
              case "content" => send(200, Files.readAllBytes(p), "text/csv")
              case _ => sendJson(200, itemJson(p, rel))
            }
          case _ => sendJson(404, s"""{"error":{"code":"unknown path $path"}}""")
        }
      }
    })
    server.start()
    server
  }

  private def withSharepoint(f: (SharepointClient, JPath) => Unit): Unit = {
    val root = Files.createTempDirectory("graph_stub_root")
    tokenRequests = Nil; bearersSeen = Set.empty
    val server = startGraphStub(root)
    try {
      val base = s"http://localhost:${server.getAddress.getPort}"
      val client = SharepointClient.withClientSecrets(
        tenantId = "tenant1", clientId = "app1", clientSecret = "s3cret",
        siteUrl = "https://corp.example.com/sites/data",
        authorityBase = base, graphBase = base)
      f(client, root)
    } finally server.stop(0)
  }

  test("sharepoint: client-credentials auth flow + site resolution") {
    withSharepoint { (client, root) =>
      seedTree(root)
      assert(client.listdir("inbox").toSet === Set("a.csv", "b.csv", "skip.txt", "2026"))
      // the MSAL-equivalent POST carried the credentials and Graph scope
      assert(tokenRequests.exists(f =>
        f.contains("client_id=app1") && f.contains("scope=")))
      // every Graph call carried the acquired bearer
      assert(bearersSeen === Set("Bearer tok_123"))
    }
  }

  test("sharepoint: bad credentials raise on token acquisition") {
    val root = Files.createTempDirectory("graph_stub_root2")
    val server = startGraphStub(root)
    try {
      val base = s"http://localhost:${server.getAddress.getPort}"
      val e = intercept[SharepointRequestException] {
        SharepointClient.withClientSecrets("t", "app", "wrong",
          "https://corp.example.com/sites/data", base, base)
      }
      assert(e.getMessage.contains("token acquisition failed"))
    } finally server.stop(0)
  }

  test("sharepoint: stat + modified-range listing over wildcards") {
    withSharepoint { (client, root) =>
      seedTree(root)
      val st = client.stat("inbox/a.csv")
      assert(st.isFile && st.sizeBytes === 13L)
      assert(!client.stat("inbox/2026").isFile)
      // age one file out of the window (closed-open [start, end))
      Files.setLastModifiedTime(root.resolve("inbox/b.csv"),
        java.nio.file.attribute.FileTime.fromMillis(1000L))
      val now = System.currentTimeMillis()
      val recent = RemoteFileOps.modifiedFilesList(
        client, "/inbox/*.csv", now - 3600000L, now + 3600000L)
      assert(recent.toSet === Set("/inbox/a.csv"))
      // directories in the spec are walked (file_source.py:364-379)
      val all = RemoteFileOps.modifiedFilesList(client, "/inbox", 0L, now + 3600000L)
      assert(all.toSet === Set("/inbox/a.csv", "/inbox/b.csv",
        "/inbox/skip.txt", "/inbox/2026/c.csv"))
    }
  }

  test("sharepoint: CSV-via-remote e2e (download then Spark read)") {
    withSharepoint { (client, root) =>
      seedTree(root)
      val df = RemoteFileOps.readCsv(spark, client, "/inbox/*.csv")
      import spark.implicits._
      assert(df.as[(Int, String)].collect().toSet ===
        Set((1, "x"), (2, "y"), (3, "z")))
    }
  }
}

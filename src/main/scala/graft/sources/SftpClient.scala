package graft.sources

import java.io.{BufferedInputStream, BufferedOutputStream, ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream, InputStream, OutputStream}
import java.net.Socket
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path => JPath}

final class SFTPRequestException(msg: String, cause: Throwable = null)
  extends RuntimeException(msg, cause)

/**
 * Transport channel an [[SftpClient]] speaks over. The SFTP file protocol
 * is transport-agnostic: in production it runs as the "sftp" subsystem of
 * an authenticated SSH session (reference connects via paramiko,
 * core/sources/file_source.py:424-487 — username/password/key auth are
 * properties of that SSH layer, not of the file protocol). No SSH
 * implementation ships in this environment, so the channel is the
 * integration point: a deployment wraps its SSH library's subsystem
 * streams; tests use [[SftpChannel.tcp]] against an in-process stub
 * server speaking the same wire protocol.
 */
trait SftpChannel extends AutoCloseable {
  def in: InputStream
  def out: OutputStream
}

object SftpChannel {
  /** Direct TCP channel (stub servers / sftp-over-plain-socket). */
  def tcp(host: String, port: Int): SftpChannel = new SftpChannel {
    private val socket = new Socket(host, port)
    val in: InputStream = socket.getInputStream
    val out: OutputStream = socket.getOutputStream
    override def close(): Unit = socket.close()
  }
}

/**
 * SFTP version-3 protocol client (draft-ietf-secsh-filexfer-02 — the
 * version every server speaks; what paramiko's SFTPClient implements for
 * the reference's `SFTPClient` file ops, file_source.py:424-560).
 * Implements the request/response packet layer directly: INIT/VERSION
 * handshake, OPENDIR/READDIR directory listing, STAT, OPEN/READ/CLOSE
 * download, REMOVE delete. Single-threaded (driver-side fetch, like the
 * reference's use).
 */
final class SftpClient(channel: SftpChannel) extends RemoteFileClient {
  import SftpProtocol._

  private val din = new DataInputStream(new BufferedInputStream(channel.in))
  private val dout = new DataOutputStream(new BufferedOutputStream(channel.out))
  private var nextReqId = 0

  // ---- handshake: INIT(version) -> VERSION(version)
  locally {
    val b = new Payload
    b.u32(PROTOCOL_VERSION)
    writePacket(FXP_INIT, b.bytes)
    val (tpe, body) = readPacket()
    if (tpe != FXP_VERSION)
      throw new SFTPRequestException(s"expected VERSION, got packet type $tpe")
    val v = new Reader(body).u32()
    if (v != PROTOCOL_VERSION)
      throw new SFTPRequestException(s"server negotiated unsupported sftp version $v")
  }

  override def listdir(path: String): Seq[String] =
    readdir(path).map(_._1).filterNot(n => n == "." || n == "..")

  override def stat(path: String): RemoteStat = {
    val (tpe, r) = request(FXP_STAT) { b => b.str(path) }
    tpe match {
      case FXP_ATTRS =>
        val a = r.attrs()
        // a server may omit ATTR_PERMISSIONS entirely; the defaulted 0
        // would classify a directory as a file (and a walk would then try
        // to download it) — probe with OPENDIR instead of trusting it
        val isFile =
          if (a.hasPermissions) (a.permissions & S_IFDIR) == 0
          else !isDirByProbe(path)
        RemoteStat(path, isFile = isFile,
          sizeBytes = a.size, modifiedMs = a.mtimeSec * 1000L)
      case FXP_STATUS => throw statusError("stat", path, r)
      case other => throw new SFTPRequestException(s"stat $path: unexpected packet $other")
    }
  }

  /** Directory probe for servers whose STAT replies carry no permissions:
    * OPENDIR succeeds only on directories. */
  private def isDirByProbe(path: String): Boolean = {
    val (tpe, r) = request(FXP_OPENDIR) { b => b.str(path) }
    tpe match {
      case FXP_HANDLE => closeHandle(r.strBytes()); true
      case FXP_STATUS => false
      case other =>
        throw new SFTPRequestException(s"opendir probe $path: unexpected packet $other")
    }
  }

  override def download(remote: String, local: JPath): Unit = {
    Files.createDirectories(local.getParent)
    val handle = open(remote, FXF_READ)
    try {
      val out = Files.newOutputStream(local)
      try {
        var offset = 0L
        var eof = false
        while (!eof) {
          val (tpe, r) = request(FXP_READ) { b =>
            b.raw(handle); b.u64(offset); b.u32(READ_CHUNK)
          }
          tpe match {
            case FXP_DATA =>
              val data = r.strBytes()
              out.write(data); offset += data.length
            case FXP_STATUS if r.peekStatus == STATUS_EOF => eof = true
            case FXP_STATUS => throw statusError("read", remote, r)
            case other =>
              throw new SFTPRequestException(s"read $remote: unexpected packet $other")
          }
        }
      } finally out.close()
    } finally closeHandle(handle)
  }

  override def delete(path: String): Unit = {
    val (tpe, r) = request(FXP_REMOVE) { b => b.str(path) }
    if (tpe != FXP_STATUS || r.peekStatus != STATUS_OK)
      throw statusError("remove", path, r)
  }

  override def close(): Unit = channel.close()

  // ---- directory entries as (name, attrs)
  private def readdir(path: String): Seq[(String, Attrs)] = {
    val handle = {
      val (tpe, r) = request(FXP_OPENDIR) { b => b.str(path) }
      tpe match {
        case FXP_HANDLE => r.strBytes()
        case FXP_STATUS => throw statusError("opendir", path, r)
        case other => throw new SFTPRequestException(s"opendir $path: unexpected packet $other")
      }
    }
    try {
      val out = scala.collection.mutable.ArrayBuffer.empty[(String, Attrs)]
      var eof = false
      while (!eof) {
        val (tpe, r) = request(FXP_READDIR) { b => b.raw(handle) }
        tpe match {
          case FXP_NAME =>
            val n = r.u32()
            (0 until n).foreach { _ =>
              val name = r.str()
              r.str() // longname, unused
              out += ((name, r.attrs()))
            }
          case FXP_STATUS if r.peekStatus == STATUS_EOF => eof = true
          case FXP_STATUS => throw statusError("readdir", path, r)
          case other =>
            throw new SFTPRequestException(s"readdir $path: unexpected packet $other")
        }
      }
      out.toSeq
    } finally closeHandle(handle)
  }

  private def open(path: String, pflags: Int): Array[Byte] = {
    val (tpe, r) = request(FXP_OPEN) { b => b.str(path); b.u32(pflags); b.u32(0) }
    tpe match {
      case FXP_HANDLE => r.strBytes()
      case FXP_STATUS => throw statusError("open", path, r)
      case other => throw new SFTPRequestException(s"open $path: unexpected packet $other")
    }
  }

  private def closeHandle(handle: Array[Byte]): Unit = {
    request(FXP_CLOSE) { b => b.raw(handle) }
    ()
  }

  /** Send one request packet (type + auto request-id + payload), read its
    * response, asserting the response id matches. */
  private def request(tpe: Int)(fill: Payload => Unit): (Int, Reader) = {
    nextReqId += 1
    val id = nextReqId
    val b = new Payload
    b.u32(id)
    fill(b)
    writePacket(tpe, b.bytes)
    val (rtpe, body) = readPacket()
    val r = new Reader(body)
    val rid = r.u32()
    if (rid != id)
      throw new SFTPRequestException(s"response id $rid does not match request $id")
    (rtpe, r)
  }

  private def writePacket(tpe: Int, payload: Array[Byte]): Unit = {
    dout.writeInt(payload.length + 1)
    dout.writeByte(tpe)
    dout.write(payload)
    dout.flush()
  }

  private def readPacket(): (Int, Array[Byte]) = {
    val len = din.readInt()
    if (len < 1 || len > MAX_PACKET)
      throw new SFTPRequestException(s"invalid sftp packet length $len")
    val tpe = din.readUnsignedByte()
    val body = new Array[Byte](len - 1)
    din.readFully(body)
    (tpe, body)
  }

  private def statusError(op: String, path: String, r: Reader): SFTPRequestException = {
    val code = r.u32()
    val msg = try r.str() catch { case _: Exception => "" }
    new SFTPRequestException(
      s"Failed while fetching the stats for SFTP location:$path " +
        s"($op -> ${statusName(code)}${if (msg.nonEmpty) s": $msg" else ""})")
  }
}

/** SFTP v3 wire constants + packet encoding helpers, shared by the client
  * and the test stub server (two ends of the same protocol). */
object SftpProtocol {
  val PROTOCOL_VERSION = 3

  val FXP_INIT = 1; val FXP_VERSION = 2
  val FXP_OPEN = 3; val FXP_CLOSE = 4; val FXP_READ = 5
  val FXP_LSTAT = 7
  val FXP_OPENDIR = 11; val FXP_READDIR = 12; val FXP_REMOVE = 13
  val FXP_STAT = 17
  val FXP_STATUS = 101; val FXP_HANDLE = 102; val FXP_DATA = 103
  val FXP_NAME = 104; val FXP_ATTRS = 105

  val STATUS_OK = 0; val STATUS_EOF = 1; val STATUS_NO_SUCH_FILE = 2
  val STATUS_PERMISSION_DENIED = 3; val STATUS_FAILURE = 4

  val FXF_READ = 0x00000001

  val ATTR_SIZE = 0x00000001
  val ATTR_PERMISSIONS = 0x00000004
  val ATTR_ACMODTIME = 0x00000008

  val S_IFDIR = 0x4000

  val READ_CHUNK = 32768
  val MAX_PACKET: Int = 1 << 20

  def statusName(code: Int): String = code match {
    case STATUS_OK => "OK"
    case STATUS_EOF => "EOF"
    case STATUS_NO_SUCH_FILE => "NO_SUCH_FILE"
    case STATUS_PERMISSION_DENIED => "PERMISSION_DENIED"
    case STATUS_FAILURE => "FAILURE"
    case other => s"STATUS_$other"
  }

  /** `hasPermissions` records whether ATTR_PERMISSIONS was on the wire —
    * the flag set is per-server, and a defaulted permissions=0 would look
    * like a regular file (see [[SftpClient.stat]]'s OPENDIR fallback). */
  final case class Attrs(size: Long, permissions: Int, mtimeSec: Long,
                         hasPermissions: Boolean = true)

  /** Binary payload builder (network byte order, SSH string framing). */
  final class Payload {
    private val buf = new ByteArrayOutputStream()
    private val out = new DataOutputStream(buf)
    def u32(v: Int): Unit = out.writeInt(v)
    def u64(v: Long): Unit = out.writeLong(v)
    def str(s: String): Unit = raw(s.getBytes(StandardCharsets.UTF_8))
    def raw(b: Array[Byte]): Unit = { out.writeInt(b.length); out.write(b) }
    def attrs(a: Attrs): Unit = {
      u32(ATTR_SIZE | (if (a.hasPermissions) ATTR_PERMISSIONS else 0) | ATTR_ACMODTIME)
      u64(a.size)
      if (a.hasPermissions) u32(a.permissions)
      u32(a.mtimeSec.toInt); u32(a.mtimeSec.toInt) // atime, mtime
    }
    def bytes: Array[Byte] = { out.flush(); buf.toByteArray }
  }

  /** Binary payload reader mirroring [[Payload]]. */
  final class Reader(body: Array[Byte]) {
    private val in = new DataInputStream(new ByteArrayInputStream(body))
    in.mark(body.length)
    def u32(): Int = in.readInt()
    def u64(): Long = in.readLong()
    def str(): String = new String(strBytes(), StandardCharsets.UTF_8)
    def strBytes(): Array[Byte] = {
      val n = in.readInt()
      val b = new Array[Byte](n); in.readFully(b); b
    }
    /** Status code without consuming (status packets are read twice: once
      * for EOF checks, once for error construction). */
    def peekStatus: Int = {
      in.mark(8); val v = in.readInt(); in.reset(); v
    }
    def attrs(): Attrs = {
      val flags = u32()
      val size = if ((flags & ATTR_SIZE) != 0) u64() else 0L
      if ((flags & 0x00000002) != 0) { u32(); u32() } // uid/gid (not in v3 servers' habit but spec'd)
      val hasPerms = (flags & ATTR_PERMISSIONS) != 0
      val perms = if (hasPerms) u32() else 0
      val mtime = if ((flags & ATTR_ACMODTIME) != 0) { u32(); u32().toLong & 0xffffffffL } else 0L
      Attrs(size, perms, mtime, hasPerms)
    }
  }
}

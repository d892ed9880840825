package graft

import graft.sources.SftpProtocol
import graft.sources.SftpProtocol.{Attrs, Payload, Reader}
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/**
 * SFTP v3 wire-encoding round-trip properties: whatever a [[Payload]]
 * writes, a [[Reader]] reads back identically — for any interleaving of
 * the frame primitives (u32/u64/string/raw/attrs). Protocol bugs here
 * corrupt every packet, so the encoder/decoder pair gets the
 * property-based treatment rather than a handful of examples.
 */
class SftpProtocolPropertySpec extends AnyFunSuite {

  private def check(p: Prop, name: String): Unit = {
    val r = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(200), p)
    assert(r.passed, s"$name: ${r.status}")
  }

  private val strGen: Gen[String] = for {
    n <- Gen.chooseNum(0, 64)
    cs <- Gen.listOfN(n, Gen.oneOf(Gen.alphaNumChar, Gen.oneOf('/', ' ', 'ß', '≠')))
  } yield cs.mkString

  private val bytesGen: Gen[Array[Byte]] =
    Gen.chooseNum(0, 256).flatMap(n => Gen.listOfN(n, Gen.chooseNum(-128, 127))
      .map(_.map(_.toByte).toArray))

  test("u32/u64/string/raw round-trip in any interleaving") {
    sealed trait Tok
    case class U32(v: Int) extends Tok
    case class U64(v: Long) extends Tok
    case class Str(v: String) extends Tok
    case class Raw(v: Array[Byte]) extends Tok
    val tokGen: Gen[Tok] = Gen.oneOf(
      Gen.chooseNum(Int.MinValue, Int.MaxValue).map(U32(_)),
      Gen.chooseNum(Long.MinValue, Long.MaxValue).map(U64(_)),
      strGen.map(Str(_)),
      bytesGen.map(Raw(_)))
    check(Prop.forAll(Gen.listOfN(12, tokGen)) { toks =>
      val p = new Payload
      toks.foreach {
        case U32(v) => p.u32(v)
        case U64(v) => p.u64(v)
        case Str(v) => p.str(v)
        case Raw(v) => p.raw(v)
      }
      val r = new Reader(p.bytes)
      toks.forall {
        case U32(v) => r.u32() == v
        case U64(v) => r.u64() == v
        case Str(v) => r.str() == v
        case Raw(v) => java.util.Arrays.equals(r.strBytes(), v)
      }
    }, "interleaved primitives")
  }

  test("attrs round-trip preserves size/permissions/mtime") {
    val attrsGen = for {
      size <- Gen.chooseNum(0L, Long.MaxValue)
      hasPerms <- Gen.oneOf(true, false)
      perms <- Gen.chooseNum(0, 0xffff)
      // v3 mtime is uint32 seconds on the wire
      mtime <- Gen.chooseNum(0L, 0xffffffffL)
    } yield Attrs(size, if (hasPerms) perms else 0, mtime, hasPerms)
    check(Prop.forAll(attrsGen) { a =>
      val p = new Payload
      p.attrs(a)
      new Reader(p.bytes).attrs() == a
    }, "attrs")
  }

  test("peekStatus does not consume the status code") {
    check(Prop.forAll(Gen.chooseNum(0, 8), strGen) { (code, msg) =>
      val p = new Payload
      p.u32(code); p.str(msg)
      val r = new Reader(p.bytes)
      r.peekStatus == code && r.u32() == code && r.str() == msg
    }, "peekStatus")
  }
}

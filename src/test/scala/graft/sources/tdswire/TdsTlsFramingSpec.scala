package graft.sources.tdswire

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, EOFException,
  IOException}
import java.net.Socket

import org.scalatest.funsuite.AnyFunSuite

/** The PRELOGIN framing layer under the TDS TLS handshake
  * ([[TdsTlsFramingSocket]]): header parsing must be byte-exact and
  * refuse cleanly — EOF on the first byte is a clean end-of-stream, EOF
  * anywhere later in the 8-byte header is a truncation error (never a
  * fabricated remaining-count from -1 reads), a non-PRELOGIN packet
  * type during the framed phase is a protocol error, and lengths below
  * header+1 are refused.
  */
class TdsTlsFramingSpec extends AnyFunSuite {

  private def framedIn(bytes: Array[Byte]) = {
    val sink = new ByteArrayOutputStream()
    new TdsTlsFramingSocket(new Socket(),
      new ByteArrayInputStream(bytes), sink).getInputStream
  }

  private def packet(payload: Array[Byte], tpe: Int = 0x12): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    out.write(tpe); out.write(0x01)
    out.write((payload.length + 8) >> 8); out.write((payload.length + 8) & 0xFF)
    out.write(0); out.write(0); out.write(1); out.write(0)
    out.write(payload)
    out.toByteArray
  }

  test("well-formed PRELOGIN packets unwrap to their payload bytes, " +
      "clean EOF between packets reads as -1") {
    val in = framedIn(packet(Array[Byte](1, 2, 3)) ++
      packet(Array[Byte](4, 5)))
    val got = Iterator.continually(in.read()).takeWhile(_ >= 0).toSeq
    assert(got == Seq(1, 2, 3, 4, 5))
    assert(in.read() == -1, "clean EOF stays -1")
  }

  test("a header truncated after the first byte fails loudly, never " +
      "fabricates a remaining-count from -1 reads") {
    val in = framedIn(Array[Byte](0x12, 0x01, 0x00)) // 3 of 8 header bytes
    intercept[EOFException] { in.read() }
  }

  test("a non-PRELOGIN packet type during the framed phase is refused") {
    val in = framedIn(packet(Array[Byte](1), tpe = 0x10)) // LOGIN7
    val e = intercept[IOException] { in.read() }
    assert(e.getMessage.contains("0x10"))
  }

  test("a length below header+payload minimum is refused") {
    val out = new ByteArrayOutputStream()
    out.write(0x12); out.write(0x01)
    out.write(0); out.write(5) // length 5 < 9
    out.write(0); out.write(0); out.write(1); out.write(0)
    val in = framedIn(out.toByteArray)
    val e = intercept[IOException] { in.read() }
    assert(e.getMessage.contains("length 5"))
  }
}

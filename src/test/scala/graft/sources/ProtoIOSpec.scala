package graft.sources

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, EOFException}

import org.scalatest.funsuite.AnyFunSuite

/** Wire-format laws for the hand-written protobuf codec: varint edges
  * (0, 127/128 boundary, Long.MaxValue, the 10-byte negative form),
  * ZigZag involution, round trips with non-ASCII text, the
  * unknown-field skip for all three skippable wire types, the
  * deprecated-group refusal, duplicate-field last-wins, and the torn
  * stream refusals.
  */
class ProtoIOSpec extends AnyFunSuite {
  import ProtoIO._

  private def varintBytes(v: Long): Array[Byte] = {
    val b = new ByteArrayOutputStream(); writeVarint(b, v); b.toByteArray
  }

  test("varint: boundaries round-trip with the spec's byte counts") {
    for ((v, len) <- Seq(0L -> 1, 1L -> 1, 127L -> 1, 128L -> 2,
        16383L -> 2, 16384L -> 3, Long.MaxValue -> 9, -1L -> 10,
        Long.MinValue -> 10)) {
      val b = varintBytes(v)
      assert(b.length == len, s"$v must encode to $len bytes")
      assert(readVarint(new ByteArrayInputStream(b)) == v)
    }
    // truncated continuation refuses
    intercept[EOFException] {
      readVarint(new ByteArrayInputStream(Array(0x80.toByte)))
    }
    // an 11-byte varint refuses
    intercept[EOFException] {
      readVarint(new ByteArrayInputStream(Array.fill(11)(0x80.toByte)))
    }
  }

  test("zigzag is the spec mapping and an involution") {
    for ((v, z) <- Seq(0L -> 0L, -1L -> 1L, 1L -> 2L, -2L -> 3L,
        2147483647L -> 4294967294L, -2147483648L -> 4294967295L))
      assert(zigzag(v) == z, s"zigzag($v)")
    for (v <- Seq(0L, 5L, -5L, Long.MaxValue, Long.MinValue, -123456789L))
      assert(unzigzag(zigzag(v)) == v)
  }

  test("message round trip: non-ASCII text, negative sint64, empty " +
      "strings, delimited stream framing") {
    val docs = Seq(
      Doc(1L, "naïve café — ünïcodé ✓", "fr", "web", 22L),
      Doc(-9L, "", "", "", -12345L), // negative id = 10-byte varint
      Doc(Long.MaxValue, "x" * 10000, "en", "s", Long.MinValue))
    docs.foreach(d => assert(decode(encode(d)) == d))
    val out = new ByteArrayOutputStream()
    docs.foreach(d => writeDelimited(out, d))
    val back = readDelimited(
      new ByteArrayInputStream(out.toByteArray)).toSeq
    assert(back == docs)
  }

  test("unknown fields skip by wire type (varint, fixed64, " +
      "length-delimited, fixed32); groups refuse; duplicates last-win") {
    val d = Doc(7L, "t", "en", "s", 3L)
    val base = encode(d)
    def withExtra(extra: Array[Byte]): Array[Byte] = base ++ extra
    val varintX = varintBytes((50L << 3) | 0) ++ varintBytes(999L)
    val fixed64X = varintBytes((51L << 3) | 1) ++ Array.fill(8)(0xAB.toByte)
    val lenX = varintBytes((52L << 3) | 2) ++ varintBytes(4L) ++
      Array[Byte](9, 9, 9, 9)
    val fixed32X = varintBytes((53L << 3) | 5) ++ Array.fill(4)(0xCD.toByte)
    for (x <- Seq(varintX, fixed64X, lenX, fixed32X))
      assert(decode(withExtra(x)) == d, "unknown field must skip cleanly")
    assert(decode(withExtra(varintX ++ fixed64X ++ lenX ++ fixed32X)) == d)
    // deprecated group wire types refuse
    intercept[EOFException] { decode(withExtra(varintBytes((60L << 3) | 3))) }
    intercept[EOFException] { decode(withExtra(varintBytes((60L << 3) | 4))) }
    // duplicate scalar: last value wins (spec rule)
    val dup = base ++ varintBytes(1L << 3) ++ varintBytes(42L)
    assert(decode(dup).doc_id == 42L)
  }

  test("torn shards fail loudly: mid-message EOF throws, clean EOF " +
      "between messages ends the stream; truncated field payloads refuse") {
    val out = new ByteArrayOutputStream()
    writeDelimited(out, Doc(1L, "hello world", "en", "s", 11L))
    writeDelimited(out, Doc(2L, "second", "en", "s", 6L))
    val whole = out.toByteArray
    assert(readDelimited(new ByteArrayInputStream(whole)).size == 2)
    // cut inside the second message
    val torn = java.util.Arrays.copyOf(whole, whole.length - 3)
    intercept[EOFException] {
      readDelimited(new ByteArrayInputStream(torn)).toSeq
    }
    // a length-delimited field whose declared length overruns the
    // message refuses
    val bad = varintBytes(1L << 3) ++ varintBytes(7L) ++
      varintBytes((2L << 3) | 2) ++ varintBytes(100L) ++ Array[Byte](1, 2)
    intercept[EOFException] { decode(bad) }
  }
}

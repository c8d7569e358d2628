package graft.sources

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, EOFException}

import org.scalatest.funsuite.AnyFunSuite

/** RFC 8949 laws for the hand-written CBOR codec: argument-form
  * boundaries (23/24, 255/256, 65535/65536, 2^32), the negint −1−n
  * rule, round trips with non-ASCII and long text, the STRUCTURAL
  * unknown-key skip (nested maps/arrays, tags, floats), duplicate-key
  * last-wins, indefinite-length refusal and torn-stream refusal.
  */
class CborIOSpec extends AnyFunSuite {
  import CborIO._

  private def enc(d: Doc): Array[Byte] = {
    val b = new ByteArrayOutputStream(); writeDoc(b, d); b.toByteArray
  }
  private def dec(a: Array[Byte]): Doc =
    readDoc(new ByteArrayInputStream(a)).get

  test("round trip across the argument-form boundaries and the negint " +
      "rule; sequence framing is self-delimiting") {
    val docs = Seq(
      Doc(0L, "", "", "", 0L),
      Doc(23L, "x", "en", "s", -1L),        // immediate / negint(0)
      Doc(24L, "naïve café ✓", "fr", "s", -25L), // 1-byte arg
      Doc(255L, "y" * 300, "en", "s", 256L),     // 1/2-byte args
      Doc(65536L, "z" * 70000, "en", "s", -65537L), // 2/4-byte args
      Doc(Long.MaxValue, "t", "e", "s", Long.MinValue)) // 8-byte args
    docs.foreach(d => assert(dec(enc(d)) == d))
    val out = new ByteArrayOutputStream()
    docs.foreach(d => writeDoc(out, d))
    val back = readSequence(
      new ByteArrayInputStream(out.toByteArray)).toSeq
    assert(back == docs)
  }

  test("byte-level pins from the RFC examples: 0 -> 0x00, 23 -> 0x17, " +
      "24 -> 0x1818, -1 -> 0x20, -500 -> 0x39 01F3, 'a' -> 0x6161") {
    def encLong(v: Long): Seq[Int] = {
      val d = enc(Doc(v, "", "", "", 0L))
      // map(5) header, then "doc_id" key (0x66 + 6 bytes), then the int
      d.drop(1 + 1 + 6).takeWhile(_ => true).take(
        d.length).map(_ & 0xFF).toSeq
    }
    assert(encLong(0L).head == 0x00)
    assert(encLong(23L).head == 0x17)
    assert(encLong(24L).take(2) == Seq(0x18, 0x18))
    assert(encLong(-1L).head == 0x20)
    assert(encLong(-500L).take(3) == Seq(0x39, 0x01, 0xF3))
    val d = enc(Doc(1L, "a", "en", "s", 0L))
    assert(d.indexOfSlice(Array(0x64.toByte, 't', 'e', 'x', 't',
      0x61.toByte, 'a'.toByte)) >= 0, "text 'a' must encode 0x61 0x61")
  }

  test("unknown keys skip structurally: nested maps, arrays, tags, " +
      "floats, byte strings; duplicates last-win") {
    val d = Doc(7L, "t", "en", "s", 3L)
    val base = enc(d)
    def withExtra(extraPairs: Int)(write: ByteArrayOutputStream => Unit)
        : Array[Byte] = {
      val b = new ByteArrayOutputStream()
      b.write((5 << 5) | (5 + extraPairs))
      write(b)
      b.write(base, 1, base.length - 1)
      b.toByteArray
    }
    def txt(b: ByteArrayOutputStream, s: String): Unit = {
      val bs = s.getBytes("UTF-8")
      b.write((3 << 5) | bs.length); b.write(bs, 0, bs.length)
    }
    // nested map inside a tagged array, plus a double and a byte string
    val payload = withExtra(3) { b =>
      txt(b, "k1")
      b.write((6 << 5) | 24); b.write(99)      // tag(99)
      b.write((4 << 5) | 2)                    // array(2)
      b.write((5 << 5) | 1); txt(b, "in"); b.write(5) // {in: 5}
      b.write(0x20)                            // -1
      txt(b, "k2")
      b.write(0xFB); (0 until 8).foreach(_ => b.write(0x3F)) // float64
      txt(b, "k3")
      b.write((2 << 5) | 3); b.write(9); b.write(9); b.write(9) // bytes(3)
    }
    assert(dec(payload) == d, "unknown keys must skip structurally")
    // duplicate doc_id: last wins
    val dup = {
      val b = new ByteArrayOutputStream()
      b.write((5 << 5) | 6)
      b.write(base, 1, base.length - 1)
      txt(b, "doc_id"); b.write(0x18); b.write(42)
      b.toByteArray
    }
    assert(dec(dup).doc_id == 42L)
  }

  test("refusals: indefinite lengths, torn items, reserved additional " +
      "info, wrong top-level type") {
    val d = Doc(1L, "hello", "en", "s", 5L)
    val whole = {
      val b = new ByteArrayOutputStream()
      writeDoc(b, d); writeDoc(b, d.copy(doc_id = 2L))
      b.toByteArray
    }
    assert(readSequence(new ByteArrayInputStream(whole)).size == 2)
    intercept[EOFException] { // cut inside the second item
      readSequence(new ByteArrayInputStream(
        java.util.Arrays.copyOf(whole, whole.length - 2))).toSeq
    }
    intercept[EOFException] { // indefinite map
      readDoc(new ByteArrayInputStream(Array(((5 << 5) | 31).toByte)))
    }
    intercept[EOFException] { // reserved additional info 28
      readDoc(new ByteArrayInputStream(Array(((5 << 5) | 28).toByte)))
    }
    intercept[EOFException] { // top-level array is not a document map
      readDoc(new ByteArrayInputStream(Array(((4 << 5) | 0).toByte)))
    }
    // a uint64 above Long.MaxValue must refuse, never wrap: doc_id =
    // 18446744073709551615 would otherwise silently decode as -1
    val big = {
      val b = new ByteArrayOutputStream()
      b.write((5 << 5) | 1)                    // map(1)
      b.write((3 << 5) | 6)                    // text(6)
      b.write("doc_id".getBytes("UTF-8"))
      b.write((0 << 5) | 27)                   // uint64
      (0 until 8).foreach(_ => b.write(0xFF))  // 2^64 - 1
      b.toByteArray
    }
    intercept[EOFException] { readDoc(new ByteArrayInputStream(big)) }
    // same refusal on the negint side: -1 - 2^63 is below Long.MinValue
    val bigNeg = {
      val b = new ByteArrayOutputStream()
      b.write((5 << 5) | 1)
      b.write((3 << 5) | 6)
      b.write("doc_id".getBytes("UTF-8"))
      b.write((1 << 5) | 27)                   // negint, 8-byte arg
      b.write(0x80); (0 until 7).foreach(_ => b.write(0x00)) // arg = 2^63
      b.toByteArray
    }
    intercept[EOFException] { readDoc(new ByteArrayInputStream(bigNeg)) }
  }
}

package graft.sources

import java.io.{EOFException, InputStream, OutputStream}
import java.nio.charset.StandardCharsets.UTF_8

/** CBOR codec for the documents record, hand-written from RFC 8949 — no
  * CBOR library: initial-byte major types (0 uint, 1 negint, 2 byte
  * string, 3 text, 4 array, 5 map, 6 tag, 7 floats/simples), the five
  * argument forms (immediate < 24, then 1/2/4/8-byte big-endian), the
  * negint `-1 − n` rule, and RFC 8742 CBOR Sequence framing (items
  * back-to-back — the standard log-shipping stream form, self-delimiting
  * so no length prefix exists to corrupt).
  *
  * Each document is a definite-length text-keyed map
  * `{"doc_id", "text", "lang", "source", "n_chars"}`. Decoder contract
  * (the [[ProtoIO]] rules on the second self-describing format):
  *
  *   - UNKNOWN map keys skip STRUCTURALLY — any well-formed item
  *     (nested arrays/maps, tagged items, floats) skips by recursion,
  *     the self-describing forward-compatibility CBOR exists for;
  *   - indefinite-length items refuse (scope honesty: the streaming
  *     form this leg writes is definite-length; a decoder that guesses
  *     at "break" handling corrupts silently);
  *   - truncation refuses via EOF mid-item, never a torn row;
  *   - duplicate map keys take the last value (matching [[ProtoIO]]).
  *
  * Scale: items stream off the InputStream one at a time — O(1) rows in
  * memory per shard on either side.
  */
object CborIO {

  final case class Doc(doc_id: Long, text: String, lang: String,
                      source: String, n_chars: Long)

  // ---- encoding -----------------------------------------------------------

  private def writeTypeArg(out: OutputStream, major: Int, v: Long): Unit = {
    require(v >= 0)
    val mb = major << 5
    if (v < 24) out.write(mb | v.toInt)
    else if (v < 256) { out.write(mb | 24); out.write(v.toInt) }
    else if (v < 65536) {
      out.write(mb | 25); out.write((v >> 8).toInt); out.write(v.toInt & 0xFF)
    } else if (v < (1L << 32)) {
      out.write(mb | 26)
      var i = 3
      while (i >= 0) { out.write(((v >> (8 * i)) & 0xFF).toInt); i -= 1 }
    } else {
      out.write(mb | 27)
      var i = 7
      while (i >= 0) { out.write(((v >> (8 * i)) & 0xFF).toInt); i -= 1 }
    }
  }

  private def writeLong(out: OutputStream, v: Long): Unit =
    if (v >= 0) writeTypeArg(out, 0, v)
    else writeTypeArg(out, 1, -1L - v) // RFC 8949 §3.1: negint = -1 - arg

  private def writeText(out: OutputStream, s: String): Unit = {
    val b = s.getBytes(UTF_8)
    writeTypeArg(out, 3, b.length.toLong)
    out.write(b)
  }

  /** Append one document map to a CBOR Sequence stream. */
  def writeDoc(out: OutputStream, d: Doc): Unit = {
    writeTypeArg(out, 5, 5L) // map of 5 pairs
    writeText(out, "doc_id"); writeLong(out, d.doc_id)
    writeText(out, "text"); writeText(out, d.text)
    writeText(out, "lang"); writeText(out, d.lang)
    writeText(out, "source"); writeText(out, d.source)
    writeText(out, "n_chars"); writeLong(out, d.n_chars)
  }

  // ---- decoding -----------------------------------------------------------

  private def rd(in: InputStream): Int = {
    val b = in.read()
    if (b < 0) throw new EOFException("cbor truncated")
    b
  }

  /** Argument of an initial byte; -1 when `ai` is the indefinite form. */
  private def arg(in: InputStream, ai: Int): Long = ai match {
    case n if n < 24 => n.toLong
    case 24 => rd(in).toLong
    case 25 => (rd(in).toLong << 8) | rd(in)
    case 26 =>
      var v = 0L; var i = 0
      while (i < 4) { v = (v << 8) | rd(in); i += 1 }
      v
    case 27 =>
      var v = 0L; var i = 0
      while (i < 8) { v = (v << 8) | rd(in); i += 1 }
      v
    case 31 => -1L
    case _ => throw new EOFException(s"cbor: reserved additional info $ai")
  }

  private def readBytesN(in: InputStream, n: Long): Array[Byte] = {
    if (n < 0 || n > (64L << 20))
      throw new EOFException("cbor: implausible length")
    val a = new Array[Byte](n.toInt)
    var off = 0
    while (off < a.length) {
      val k = in.read(a, off, a.length - off)
      if (k < 0) throw new EOFException("cbor payload truncated")
      off += k
    }
    a
  }

  /** Skip one well-formed item of ANY shape (the unknown-key path). */
  private def skipItem(in: InputStream): Unit = {
    val ib = rd(in)
    val major = ib >> 5
    val a = arg(in, ib & 0x1F)
    if (a < 0) throw new EOFException("cbor: indefinite length refused")
    major match {
      case 0 | 1 => ()
      case 2 | 3 => readBytesN(in, a)
      case 4 => var i = 0L; while (i < a) { skipItem(in); i += 1 }
      case 5 =>
        var i = 0L
        while (i < a) { skipItem(in); skipItem(in); i += 1 }
      case 6 => skipItem(in) // tag: skip the tagged item
      case 7 => // floats/simples: arg bytes were already consumed
    }
  }

  private def readLong(in: InputStream): Long = {
    val ib = rd(in)
    val major = ib >> 5
    val ai = ib & 0x1F
    val a = arg(in, ai)
    if (a < 0 && ai == 31)
      throw new EOFException("cbor: indefinite length refused")
    // an 8-byte argument with the top bit set (uint64 > Long.MaxValue,
    // or a negint below Long.MinValue) has no Long representation —
    // refuse rather than silently wrap (18446744073709551615 would
    // otherwise decode as -1), the decoder's refuse-never-guess rule
    if (a < 0)
      throw new EOFException("cbor: 64-bit integer outside Long range")
    major match {
      case 0 => a
      case 1 => -1L - a
      case _ => throw new EOFException(s"cbor: expected int, major $major")
    }
  }

  private def readText(in: InputStream): String = {
    val ib = rd(in)
    if ((ib >> 5) != 3) throw new EOFException("cbor: expected text")
    val a = arg(in, ib & 0x1F)
    if (a < 0) throw new EOFException("cbor: indefinite text refused")
    new String(readBytesN(in, a), UTF_8)
  }

  /** Read one document map; None on clean EOF between items. */
  def readDoc(in: InputStream): Option[Doc] = {
    val first = in.read()
    if (first < 0) return None // clean sequence end
    if ((first >> 5) != 5) throw new EOFException("cbor: expected map")
    val n = arg(in, first & 0x1F)
    if (n < 0) throw new EOFException("cbor: indefinite map refused")
    var id = 0L; var text = ""; var lang = ""; var source = ""
    var nChars = 0L
    var i = 0L
    while (i < n) {
      readText(in) match {
        case "doc_id" => id = readLong(in)
        case "text" => text = readText(in)
        case "lang" => lang = readText(in)
        case "source" => source = readText(in)
        case "n_chars" => nChars = readLong(in)
        case _ => skipItem(in) // unknown key: structural skip
      }
      i += 1
    }
    Some(Doc(id, text, lang, source, nChars))
  }

  /** Stream a CBOR Sequence until clean EOF; mid-item EOF throws. */
  def readSequence(in: InputStream): Iterator[Doc] = new Iterator[Doc] {
    private var nextDoc: Option[Doc] = null
    override def hasNext: Boolean = {
      if (nextDoc == null) nextDoc = readDoc(in)
      nextDoc.isDefined
    }
    override def next(): Doc = {
      if (!hasNext) throw new NoSuchElementException
      val d = nextDoc.get; nextDoc = null; d
    }
  }
}

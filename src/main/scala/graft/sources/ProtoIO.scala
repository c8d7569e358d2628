package graft.sources

import java.io.{EOFException, InputStream, OutputStream}
import java.nio.charset.StandardCharsets.UTF_8

/** Protocol-Buffers WIRE FORMAT codec, hand-written from the public
  * encoding specification (protobuf.dev/programming-guides/encoding) —
  * no protobuf library: base-128 varints (little-endian groups, high
  * bit = continuation), ZigZag for signed fields, the four live wire
  * types (0 varint, 1 fixed64, 2 length-delimited, 5 fixed32), field
  * keys `(number << 3) | type`, and the standard length-delimited
  * STREAM framing (a varint byte-length prefix per message — what
  * `writeDelimitedTo` emits and every log-shipping pipeline uses).
  *
  * The message schema is the documents row:
  *
  *   message Doc { int64 doc_id = 1; string text = 2; string lang = 3;
  *                 string source = 4; sint64 n_chars = 5; }
  *
  * Decoder contract (the codec-house rules):
  *   - UNKNOWN fields skip by wire type — the forward-compatibility
  *     property that defines protobuf (a v2 writer's extra fields must
  *     not break a v1 reader);
  *   - deprecated group types (3/4) and unknown wire types refuse;
  *   - truncated varints / payloads refuse via EOF, never a torn row;
  *   - duplicate scalar fields take the LAST value (the spec's rule).
  *
  * Scale: messages stream off the InputStream one at a time — an
  * export shard holds O(1) rows in memory on either side.
  */
object ProtoIO {

  final case class Doc(doc_id: Long, text: String, lang: String,
                       source: String, n_chars: Long)

  // ---- primitives --------------------------------------------------------

  def writeVarint(out: OutputStream, v0: Long): Unit = {
    var v = v0
    while ((v & ~0x7FL) != 0) {
      out.write(((v & 0x7F) | 0x80).toInt)
      v >>>= 7
    }
    out.write(v.toInt & 0x7F)
  }

  /** Read one varint; EOFException on truncation; refuses >10 bytes. */
  private[sources] def readVarint(in: InputStream): Long = {
    var shift = 0
    var v = 0L
    while (shift < 70) {
      val b = in.read()
      if (b < 0) throw new EOFException("varint truncated")
      v |= (b & 0x7FL) << shift
      if ((b & 0x80) == 0) return v
      shift += 7
    }
    throw new EOFException("varint longer than 10 bytes")
  }

  private[sources] def zigzag(v: Long): Long = (v << 1) ^ (v >> 63)
  private[sources] def unzigzag(v: Long): Long = (v >>> 1) ^ -(v & 1)

  private def writeLenDelimited(out: OutputStream, field: Int,
                                bytes: Array[Byte]): Unit = {
    writeVarint(out, (field.toLong << 3) | 2)
    writeVarint(out, bytes.length.toLong)
    out.write(bytes)
  }

  private def writeVarintField(out: OutputStream, field: Int,
                               v: Long): Unit = {
    writeVarint(out, field.toLong << 3) // wire type 0
    writeVarint(out, v)
  }

  // ---- message codec -----------------------------------------------------

  /** Serialize one Doc (field-number order; the spec allows any). */
  def encode(d: Doc): Array[Byte] = {
    val b = new java.io.ByteArrayOutputStream()
    writeVarintField(b, 1, d.doc_id)
    writeLenDelimited(b, 2, d.text.getBytes(UTF_8))
    writeLenDelimited(b, 3, d.lang.getBytes(UTF_8))
    writeLenDelimited(b, 4, d.source.getBytes(UTF_8))
    writeVarintField(b, 5, zigzag(d.n_chars)) // sint64
    b.toByteArray
  }

  /** Parse one message payload; unknown fields skip by wire type. */
  def decode(payload: Array[Byte]): Doc = {
    val in = new java.io.ByteArrayInputStream(payload)
    var id = 0L; var text = ""; var lang = ""; var source = ""
    var nChars = 0L
    while (in.available() > 0) {
      val key = readVarint(in)
      val field = (key >>> 3).toInt
      val wt = (key & 7).toInt
      def lenPayload(): Array[Byte] = {
        val n = readVarint(in)
        if (n < 0 || n > in.available())
          throw new EOFException("length-delimited field truncated")
        val a = new Array[Byte](n.toInt)
        var off = 0
        while (off < a.length) {
          val k = in.read(a, off, a.length - off)
          if (k < 0) throw new EOFException("payload truncated")
          off += k
        }
        a
      }
      (field, wt) match {
        case (1, 0) => id = readVarint(in)
        case (2, 2) => text = new String(lenPayload(), UTF_8)
        case (3, 2) => lang = new String(lenPayload(), UTF_8)
        case (4, 2) => source = new String(lenPayload(), UTF_8)
        case (5, 0) => nChars = unzigzag(readVarint(in))
        case (_, 0) => readVarint(in) // unknown varint: skip
        case (_, 1) => // unknown fixed64: skip 8
          var k = 0
          while (k < 8) {
            if (in.read() < 0) throw new EOFException("fixed64 truncated")
            k += 1
          }
        case (_, 2) => lenPayload() // unknown length-delimited: skip
        case (_, 5) => // unknown fixed32: skip 4
          var k = 0
          while (k < 4) {
            if (in.read() < 0) throw new EOFException("fixed32 truncated")
            k += 1
          }
        case (_, other) =>
          throw new EOFException(s"unsupported wire type $other" +
            " (groups are deprecated; refuse, never guess)")
      }
    }
    Doc(id, text, lang, source, nChars)
  }

  // ---- length-delimited stream framing -----------------------------------

  /** Append one delimited message to the stream. */
  def writeDelimited(out: OutputStream, d: Doc): Unit = {
    val m = encode(d)
    writeVarint(out, m.length.toLong)
    out.write(m)
  }

  /** Stream delimited messages until EOF; a clean EOF BETWEEN messages
    * ends the iterator, a mid-message EOF throws (a torn shard must
    * fail loudly, not truncate silently).
    */
  def readDelimited(in: InputStream): Iterator[Doc] = new Iterator[Doc] {
    private var nextDoc: Doc = null
    private var done = false
    private def advance(): Unit = {
      val first = in.read()
      if (first < 0) { done = true; return } // clean EOF
      // re-assemble the length varint whose first byte we consumed
      var len = (first & 0x7FL)
      var shift = 7
      var b = first
      while ((b & 0x80) != 0) {
        b = in.read()
        if (b < 0) throw new EOFException("length prefix truncated")
        len |= (b & 0x7FL) << shift
        shift += 7
        if (shift > 70) throw new EOFException("length prefix too long")
      }
      if (len < 0 || len > (64L << 20))
        throw new EOFException("implausible message length")
      val a = new Array[Byte](len.toInt)
      var off = 0
      while (off < a.length) {
        val k = in.read(a, off, a.length - off)
        if (k < 0) throw new EOFException("message truncated")
        off += k
      }
      nextDoc = decode(a)
    }
    override def hasNext: Boolean = {
      if (nextDoc == null && !done) advance()
      nextDoc != null
    }
    override def next(): Doc = {
      if (!hasNext) throw new NoSuchElementException
      val d = nextDoc; nextDoc = null; d
    }
  }
}

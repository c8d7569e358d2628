package graft.operators

import scala.util.Random

import graft.SparkTestBase

/** TIFF codec laws. The fixture leg (clear-code-heavy byte-aligned
  * MSB-first LZW) is what the oracle checks; THIS spec pins the general
  * decoder on real dictionary-growing streams via a reference encoder —
  * compress → [[Tiff.decode]] must reproduce the exact gray raster
  * across width growth (including the EARLY-change boundary), KwKwK,
  * dictionary resets at 4096, multi-strip assembly, Predictor 2, and
  * the `MM` byte order. Refusal edges are pinned explicitly.
  */
class TiffSpec extends SparkTestBase {

  /** Reference TIFF-LZW encoder (TIFF 6.0 §13 with the universal
    * early-change convention): MSB-first bit packing, width grows when
    * the encoder's next free code would need more bits MINUS the
    * spec's one-early offset, CLEAR + reset at 4094 so the decoder
    * never sees a 4095 insert.
    */
  private def lzwEncode(bytes: Array[Byte]): Array[Byte] = {
    val clear = 256
    val eoi = 257
    val bos = new java.io.ByteArrayOutputStream()
    var bitBuf = 0L
    var nBits = 0
    var codeSize = 9
    def put(code: Int): Unit = {
      bitBuf = (bitBuf << codeSize) | code.toLong
      nBits += codeSize
      while (nBits >= 8) {
        bos.write(((bitBuf >>> (nBits - 8)) & 0xFF).toInt); nBits -= 8
      }
    }
    var dict = collection.mutable.HashMap[(Int, Byte), Int]()
    var avail = eoi + 1
    def reset(): Unit = { dict = collection.mutable.HashMap(); avail = eoi + 1 }
    put(clear)
    var cur = -1
    bytes.foreach { b =>
      if (cur < 0) cur = b & 0xFF
      else dict.get((cur, b)) match {
        case Some(c) => cur = c
        case None =>
          put(cur)
          dict((cur, b)) = avail
          avail += 1
          // encoder leads the decoder's insert counter by one, and TIFF
          // grows one code EARLY: widen when avail == 2^codeSize
          if (avail == (1 << codeSize) && codeSize < 12) codeSize += 1
          if (avail == 4094) {
            put(clear); codeSize = 9; reset()
          }
          cur = b & 0xFF
      }
    }
    if (cur >= 0) put(cur)
    put(eoi)
    if (nBits > 0) bos.write(((bitBuf << (8 - nBits)) & 0xFF).toInt)
    bos.toByteArray
  }

  /** Assemble a complete gray-8 TIFF: header + one IFD + strip data.
    * Strips split at `rowsPerStrip`; each strip compressed independently
    * when `lzw` (the spec's strip-is-a-unit rule).
    */
  private def buildTiff(w: Int, h: Int, px: Array[Byte], lzw: Boolean,
                        rowsPerStrip: Int = 0, predictor: Int = 1,
                        bigEndian: Boolean = false): Array[Byte] = {
    val rps = if (rowsPerStrip <= 0) h else rowsPerStrip
    val nStrips = (h + rps - 1) / rps
    // apply predictor 2 on the way IN (difference), decoder must undo
    val stored = px.clone()
    if (predictor == 2) {
      var y = 0
      while (y < h) {
        var x = w - 1
        while (x > 0) {
          stored(y * w + x) = (stored(y * w + x) - stored(y * w + x - 1)).toByte
          x -= 1
        }
        y += 1
      }
    }
    val strips = (0 until nStrips).map { s =>
      val rows = math.min(rps, h - s * rps)
      val raw = java.util.Arrays.copyOfRange(stored, s * rps * w,
        s * rps * w + rows * w)
      if (lzw) lzwEncode(raw) else raw
    }
    val extraTags =
      (if (predictor != 1) 1 else 0) + (if (nStrips > 1) 0 else 0)
    val nTags = 9 + extraTags
    val ifdSize = 2 + 12 * nTags + 4
    // strip offset/count arrays go right after the IFD when nStrips > 1
    val arraysSize = if (nStrips > 1) 8 * nStrips else 0
    val dataOff = 8 + ifdSize + arraysSize
    val bos = new java.io.ByteArrayOutputStream()
    def w16(v: Int): Unit =
      if (bigEndian) { bos.write(v >> 8 & 0xFF); bos.write(v & 0xFF) }
      else { bos.write(v & 0xFF); bos.write(v >> 8 & 0xFF) }
    def w32(v: Long): Unit =
      if (bigEndian) { w16((v >> 16).toInt); w16((v & 0xFFFF).toInt) }
      else { w16((v & 0xFFFF).toInt); w16((v >> 16).toInt) }
    bos.write(if (bigEndian) 'M' else 'I'); bos.write(if (bigEndian) 'M' else 'I')
    w16(42); w32(8)
    w16(nTags)
    def entryShort(tag: Int, v: Int): Unit = {
      w16(tag); w16(3); w32(1)
      // SHORT value left-justified in the 4-byte field
      if (bigEndian) { w16(v); w16(0) } else { w16(v); w16(0) }
    }
    def entryLong(tag: Int, v: Long): Unit = { w16(tag); w16(4); w32(1); w32(v) }
    val stripOffs = strips.scanLeft(dataOff.toLong)(_ + _.length).init
    entryShort(256, w); entryShort(257, h); entryShort(258, 8)
    entryShort(259, if (lzw) 5 else 1)
    entryShort(262, 1)
    if (nStrips == 1) entryLong(273, stripOffs.head)
    else { w16(273); w16(4); w32(nStrips); w32(8 + ifdSize) }
    entryShort(277, 1); entryShort(278, rps)
    if (nStrips == 1) entryLong(279, strips.head.length)
    else { w16(279); w16(4); w32(nStrips); w32(8 + ifdSize + 4 * nStrips) }
    if (predictor != 1) entryShort(317, predictor)
    w32(0) // next IFD
    if (nStrips > 1) {
      stripOffs.foreach(w32)
      strips.foreach(s => w32(s.length))
    }
    strips.foreach(s => bos.write(s, 0, s.length))
    bos.toByteArray
  }

  private def rnd(seed: Int, n: Int, span: Int = 256): Array[Byte] = {
    val r = new Random(seed)
    Array.fill[Byte](n)((r.nextInt(span)).toByte)
  }

  test("round trip: dictionary-growing LZW streams decode to the exact " +
      "raster (random + low-entropy + KwKwK-heavy inputs)") {
    for ((seed, w, h, span) <- Seq((1, 37, 21, 256), (2, 64, 48, 4),
        (3, 101, 33, 2), (4, 16, 16, 256))) {
      val px = rnd(seed, w * h, span)
      val t = buildTiff(w, h, px, lzw = true)
      val got = Tiff.decode(t)
      assert(got.isDefined, s"seed=$seed must decode")
      val (info, buf) = got.get
      assert(info.width == w && info.height == h && info.channels == 1)
      assert(buf.sameElements(px), s"seed=$seed pixel mismatch")
    }
  }

  test("early-change boundary: a stream crossing 511/1023/2047 inserts " +
      "round-trips (large low-variety image grows the dictionary far)") {
    val w = 128; val h = 96
    val px = Array.tabulate[Byte](w * h)(i => ((i * 7 + i / w * 3) % 11).toByte)
    val t = buildTiff(w, h, px, lzw = true)
    val got = Tiff.decode(t)
    assert(got.isDefined)
    assert(got.get._2.sameElements(px))
  }

  test("4096-cap reset round-trips (image big enough to exhaust the " +
      "dictionary forces CLEAR mid-stream)") {
    val w = 256; val h = 200
    val px = rnd(9, w * h)
    val t = buildTiff(w, h, px, lzw = true)
    val got = Tiff.decode(t)
    assert(got.isDefined)
    assert(got.get._2.sameElements(px))
  }

  test("multi-strip rasters assemble in order; each strip is an " +
      "independent LZW unit") {
    val w = 40; val h = 25
    val px = rnd(5, w * h)
    for (rps <- Seq(1, 7, 8, 25)) {
      val t = buildTiff(w, h, px, lzw = true, rowsPerStrip = rps)
      val got = Tiff.decode(t)
      assert(got.isDefined, s"rps=$rps")
      assert(got.get._2.sameElements(px), s"rps=$rps pixel mismatch")
    }
  }

  test("predictor 2 (horizontal differencing) is undone exactly, " +
      "compressed and uncompressed") {
    val w = 32; val h = 16
    val px = rnd(6, w * h)
    for (lzw <- Seq(true, false)) {
      val t = buildTiff(w, h, px, lzw = lzw, predictor = 2)
      val got = Tiff.decode(t)
      assert(got.isDefined, s"lzw=$lzw")
      assert(got.get._2.sameElements(px), s"lzw=$lzw pixel mismatch")
    }
  }

  test("MM (big-endian) containers decode identically") {
    val w = 20; val h = 12
    val px = rnd(7, w * h)
    val t = buildTiff(w, h, px, lzw = true, bigEndian = true)
    val got = Tiff.decode(t)
    assert(got.isDefined)
    assert(got.get._1.width == w)
    assert(got.get._2.sameElements(px))
  }

  test("refusals: truncation, bad magic, wrong bit depth, RGB samples, " +
      "unknown compression, strip extent past EOF") {
    val w = 16; val h = 8
    val px = rnd(8, w * h)
    val good = buildTiff(w, h, px, lzw = true)
    assert(Tiff.decode(good).isDefined)
    // truncated LZW payload
    assert(Tiff.decode(good.dropRight(5)).isEmpty)
    // bad magic / version
    val badMagic = good.clone(); badMagic(0) = 'X'
    assert(Tiff.decode(badMagic).isEmpty)
    val bad42 = good.clone(); bad42(2) = 43
    assert(Tiff.decode(bad42).isEmpty)
    // uncompressed with a short strip refuses (counts must cover raster)
    val raw = buildTiff(w, h, px, lzw = false)
    assert(Tiff.decode(raw).isDefined)
    val shortStrip = java.util.Arrays.copyOf(raw, raw.length - 3)
    assert(Tiff.decode(shortStrip).isEmpty)
    // 16-bit / 3-sample / unknown-compression variants refuse: patch the
    // SHORT value of tags 258/277/259 in place (entry layout is fixed)
    def patched(tag: Int, v: Int): Array[Byte] = {
      val d = good.clone()
      val n = (d(8) & 0xFF) | ((d(9) & 0xFF) << 8)
      for (i <- 0 until n) {
        val e = 10 + 12 * i
        val t = (d(e) & 0xFF) | ((d(e + 1) & 0xFF) << 8)
        if (t == tag) { d(e + 8) = (v & 0xFF).toByte; d(e + 9) = (v >> 8).toByte }
      }
      d
    }
    assert(Tiff.decode(patched(258, 16)).isEmpty, "16-bit must refuse")
    assert(Tiff.decode(patched(277, 3)).isEmpty, "RGB must refuse")
    assert(Tiff.decode(patched(259, 7)).isEmpty, "JPEG-in-TIFF must refuse")
    assert(Tiff.decode(patched(262, 2)).isEmpty, "RGB photometric must refuse")
  }

  test("fixture leg: tiffMedia payloads decode through the SAME decoder " +
      "with the closed-form pixel stream the oracle recomputes") {
    import org.apache.spark.sql.functions._
    val m = Tiff.tiffMedia(
      graft.Tables.load(spark, sfDir, "documents").limit(24),
      "doc_id", "doc_id").collect()
    assert(m.length == 24)
    m.foreach { r =>
      val id = r.getLong(0)
      val data = r.getAs[Array[Byte]](1)
      val got = Tiff.decode(data)
      assert(got.isDefined, s"doc $id must decode")
      val (info, buf) = got.get
      val w = (id % 3 + 2).toInt * 4
      val h = (id % 5 + 8).toInt
      assert(info.width == w && info.height == h)
      buf.zipWithIndex.foreach { case (b, i) =>
        val expect = ((id * 19 + i * 31 + (id * i) % 251) % 256).toInt
        assert((b & 0xFF) == expect, s"doc $id pixel $i")
      }
    }
  }

  test("mirrored orientations (tag 274 = 2/4/5/7) decode for geometry/" +
      "luminance consumers but refuse in exifRotate, which cannot express " +
      "a mirror as 90-degree turns") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // hand-rolled 4x3 single-strip uncompressed gray TIFF carrying the
    // requested orientation: same fixed 10-entry IFD as exifMedia
    def tiffWithOrientation(ori: Int): Array[Byte] = {
      val w = 4; val h = 3
      val hex = new StringBuilder
      hex ++= "49492A00" ++= "08000000" ++= "0A00"
      def e(tag: String, typ: String, v: Int): Unit = {
        hex ++= tag ++= typ ++= "01000000"
        hex ++= f"${v & 0xFF}%02X${(v >> 8) & 0xFF}%02X0000"
      }
      e("0001", "0300", w); e("0101", "0300", h)
      e("0201", "0300", 8); e("0301", "0300", 1); e("0601", "0300", 1)
      e("1101", "0400", 134) // strip offset: 8 + 2 + 10*12 + 4
      e("1201", "0300", ori) // tag 274
      e("1501", "0300", 1); e("1601", "0300", h)
      e("1701", "0400", w * h)
      hex ++= "00000000"
      (0 until w * h).foreach(i => hex ++= f"${(i * 7) % 256}%02X")
      hex.toString.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray
    }
    Seq(2, 4, 5, 7).foreach { ori =>
      val d = tiffWithOrientation(ori)
      assert(Tiff.dims(d).contains((4, 3, 1)), s"ori=$ori dims must parse")
      assert(Tiff.decode(d).isDefined, s"ori=$ori must decode (tag ignored)")
      assert(Tiff.parse(d).exists(_.orientation == ori))
      val media = Seq(Multimodal.MediaRow(1L, d, "image/tiff",
        d.length.toLong)).toDS()
      assert(Tiff.exifRotate(media).count() == 0L,
        s"ori=$ori must refuse in exifRotate")
    }
    // the rotation form still flows through exifRotate
    val rot = tiffWithOrientation(6)
    val media6 = Seq(Multimodal.MediaRow(2L, rot, "image/tiff",
      rot.length.toLong)).toDS()
    val rows = Tiff.exifRotate(media6).collect()
    assert(rows.length == 1 && rows.head.orientation == 6 &&
      rows.head.out_w == 3 && rows.head.out_h == 4)
  }
}

package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Baseline GIF codec written from the public GIF89a specification
  * (W3C/CompuServe GRAPHICS INTERCHANGE FORMAT 89a, 1990): logical
  * screen descriptor, global/local color tables, extension-block
  * skipping, image-data sub-block reassembly, and a REAL variable-width
  * LZW decoder (LSB-first bit packing, code width growth 3→12 bits,
  * CLEAR/EOI handling, the 4096-entry cap with deferred clear). This is
  * the palette-indexed lossless leg of the media surface — BMP covers
  * raw truecolor, PNG covers filtered+deflate, JPEG covers lossy DCT,
  * GIF covers dictionary compression over an indexed palette (LZW is
  * also TIFF's and PDF's dictionary codec, so this exercises the family).
  *
  * Refusal contract (the [[Multimodal.decodeHeader]] rule — parse or
  * refuse, never fabricate): interlaced images, missing color tables,
  * truncated LZW streams, and undersized pixel output all return None.
  * Animations decode as their FIRST image (the still-image contract);
  * later frames are data the caller never sees mislabeled.
  *
  * Oracle strategy (the PNG STORED-block precedent, BASELINE round-10
  * note): [[gifMedia]] fixtures interleave a CLEAR code before every
  * pixel code at minCodeSize 7, so every code is exactly 8 bits — the
  * LZW stream is byte-aligned and an external oracle reproduces it (and
  * the decoded pixels) in closed form without running a compressor.
  * A real encoder's dictionary-growing streams decode through the SAME
  * [[lzwDecode]] path and are spec-pinned by round-tripping against the
  * test-side reference encoder in GifSpec.
  */
object Gif {

  private def le16(d: Array[Byte], off: Int): Int =
    (d(off) & 0xFF) | ((d(off + 1) & 0xFF) << 8)

  private def isGif(d: Array[Byte]): Boolean =
    d.length >= 13 && d(0) == 'G' && d(1) == 'I' && d(2) == 'F' &&
      d(3) == '8' && (d(4) == '7' || d(4) == '9') && d(5) == 'a'

  /** Geometry-only parse: dimensions of the FIRST image descriptor
    * (what the decode returns), 3 channels after palette expansion.
    */
  def dims(data: Array[Byte]): Option[(Int, Int, Int)] =
    firstImage(data).map { case (_, w, h, _, _, _) => (w, h, 3) }

  /** Walk to the first image descriptor. Returns (pixel-data position
    * just past the descriptor, w, h, palette offset, palette size,
    * interlaced).
    */
  private def firstImage(
      d: Array[Byte]): Option[(Int, Int, Int, Int, Int, Boolean)] = {
    if (!isGif(d)) return None
    val packed = d(10) & 0xFF
    val gctSize = if ((packed & 0x80) != 0) 2 << (packed & 7) else 0
    var pos = 13 + 3 * gctSize
    val gctOff = 13
    while (pos < d.length) {
      (d(pos) & 0xFF) match {
        case 0x21 => // extension: label + sub-blocks to terminator
          pos += 2
          while (pos < d.length && d(pos) != 0) pos += 1 + (d(pos) & 0xFF)
          pos += 1
        case 0x2C =>
          if (pos + 10 > d.length) return None
          val w = le16(d, pos + 5)
          val h = le16(d, pos + 7)
          val ip = d(pos + 9) & 0xFF
          val interlaced = (ip & 0x40) != 0
          val lctSize = if ((ip & 0x80) != 0) 2 << (ip & 7) else 0
          val (pOff, pSize) =
            if (lctSize > 0) (pos + 10, lctSize)
            else (gctOff, gctSize)
          if (pSize == 0 || w <= 0 || h <= 0) return None
          return Some((pos + 10 + 3 * lctSize, w, h, pOff, pSize, interlaced))
        case 0x3B => return None // trailer before any image
        case _ => return None // unknown block type: refuse, don't guess
      }
    }
    None
  }

  /** GIF-variant LZW decode: LSB-first bit reader over the reassembled
    * sub-block payload, code width minCodeSize+1 growing to 12, CLEAR
    * resets, EOI stops, `avail == code` KwKwK case, deferred clear at
    * 4096 (width pins at 12, no inserts, until the encoder sends CLEAR).
    * Returns exactly `expect` indices or None.
    */
  private[operators] def lzwDecode(data: Array[Byte], minCodeSize: Int,
                                   expect: Int): Option[Array[Byte]] = {
    if (minCodeSize < 2 || minCodeSize > 11) return None
    val clear = 1 << minCodeSize
    val eoi = clear + 1
    val prefix = new Array[Int](4096)
    val suffix = new Array[Byte](4096)
    val stack = new Array[Byte](4097)
    val out = new Array[Byte](expect)
    var produced = 0
    var codeSize = minCodeSize + 1
    var avail = eoi + 1
    var prev = -1
    var bitPos = 0L
    val nBits = data.length.toLong * 8
    def readCode(): Int = {
      if (bitPos + codeSize > nBits) return -1
      var v = 0
      var i = 0
      while (i < codeSize) {
        val bp = bitPos + i
        if ((data((bp >> 3).toInt) >> (bp & 7).toInt & 1) != 0) v |= 1 << i
        i += 1
      }
      bitPos += codeSize
      v
    }
    def firstByteOf(code: Int): Byte = {
      var c = code
      while (c >= clear) c = prefix(c)
      c.toByte
    }
    def emit(code: Int): Boolean = {
      var c = code
      var sp = 0
      while (c >= clear) { stack(sp) = suffix(c); sp += 1; c = prefix(c) }
      stack(sp) = c.toByte; sp += 1
      while (sp > 0) {
        sp -= 1
        if (produced >= expect) return false // overrun: malformed
        out(produced) = stack(sp); produced += 1
      }
      true
    }
    var running = true
    while (running && produced < expect) {
      val code = readCode()
      if (code < 0) return None // truncated stream
      if (code == clear) {
        codeSize = minCodeSize + 1
        avail = eoi + 1
        prev = -1
      } else if (code == eoi) {
        running = false
      } else if (prev < 0) {
        if (code >= clear) return None // first code must be a root
        if (!emit(code)) return None
        prev = code
      } else {
        if (code > avail || (code == avail && avail >= 4096)) return None
        // the new dictionary entry is string(prev) + first byte of the
        // string being OUTPUT now; in the KwKwK case (code == avail)
        // that output string IS the new entry
        val newSuffix =
          if (code == avail) firstByteOf(prev) else firstByteOf(code)
        if (code == avail) {
          if (!emit(prev)) return None
          if (produced >= expect) return None
          out(produced) = newSuffix; produced += 1
        } else if (!emit(code)) return None
        if (avail < 4096) {
          prefix(avail) = prev
          suffix(avail) = newSuffix
          avail += 1
          if (avail == (1 << codeSize) && codeSize < 12) codeSize += 1
        }
        prev = code
      }
    }
    if (produced != expect) None else Some(out)
  }

  /** Full decode to an RGB pixel buffer (the [[Multimodal.decodeToPixels]]
    * contract): first image descriptor, sub-blocks reassembled, LZW
    * decoded, indices mapped through the active color table.
    */
  def decode(data: Array[Byte])
      : Option[(Multimodal.ImageInfo, Array[Byte])] = {
    val (pos0, w, h, pOff, pSize, interlaced) = firstImage(data) match {
      case Some(t) => t
      case None => return None
    }
    if (interlaced) return None // refuse: out of the baseline contract
    val nPix = w.toLong * h
    if (nPix > (64L << 20) / 3) return None
    if (pos0 >= data.length) return None
    val minCodeSize = data(pos0) & 0xFF
    // reassemble sub-blocks
    val bos = new java.io.ByteArrayOutputStream()
    var pos = pos0 + 1
    var done = false
    while (!done) {
      if (pos >= data.length) return None
      val len = data(pos) & 0xFF
      if (len == 0) done = true
      else {
        if (pos + 1 + len > data.length) return None
        bos.write(data, pos + 1, len)
        pos += 1 + len
      }
    }
    val idx = lzwDecode(bos.toByteArray, minCodeSize, nPix.toInt) match {
      case Some(a) => a
      case None => return None
    }
    val px = new Array[Byte](nPix.toInt * 3)
    var i = 0
    while (i < idx.length) {
      val j = idx(i) & 0xFF
      if (j >= pSize) return None // index outside the palette
      px(i * 3) = data(pOff + 3 * j)
      px(i * 3 + 1) = data(pOff + 3 * j + 1)
      px(i * 3 + 2) = data(pOff + 3 * j + 2)
      i += 1
    }
    Some((Multimodal.ImageInfo(w, h, 3, 0, w * 3,
      bottomUp = false, bgr = false), px))
  }

  /** Deterministic GIF fixture payloads — REAL compressed-format images
    * for the oracle leg: 128-entry global palette (closed-form RGB per
    * index), minCodeSize 7, and a CLEAR code before every pixel code so
    * each code is exactly 8 bits — byte-aligned LZW any decoder accepts
    * and an external oracle reproduces without a compressor (the PNG
    * STORED-block argument; dictionary-growing streams are spec-pinned
    * against the reference encoder in GifSpec). LZW payload spans
    * multiple ≤120-byte sub-blocks, so the oracle path genuinely
    * exercises sub-block reassembly. Pure column expressions; one
    * row-local pass, no shuffle.
    */
  def gifMedia(ids: DataFrame, idCol: String, seedCol: String): DataFrame = {
    val lut = Multimodal.hexLutSql
    // pixel index stream and palette, shared (as formulas) with the oracle
    val pixIdx = "pmod(seed * 29 + i * 23 + pmod(seed * i, 127), 128)"
    val base = Spread.ifNarrow(
        ids.select(col(idCol).as("doc_id"), col(seedCol).as("seed")))
      .withColumn("w", (col("seed") % 5 + 8).cast("int"))
      .withColumn("hh", (col("seed") % 4 + 8).cast("int"))
      .withColumn("np", expr("w * hh"))
    base
      .withColumn("pal_hex", expr(
        s"""array_join(transform(sequence(0, 127), j -> concat(
           |  element_at($lut, pmod(j * 2 + 5, 256) + 1),
           |  element_at($lut, pmod(j * 7 + 11, 256) + 1),
           |  element_at($lut, pmod(j * 13 + 17, 256) + 1))), '')""".stripMargin))
      .withColumn("lzw_hex", expr(
        s"""concat(array_join(transform(sequence(0, np - 1), i ->
           |  concat('80', element_at($lut, CAST($pixIdx AS INT) + 1))), ''),
           |  '81')""".stripMargin))
      .withColumn("blocks_hex", expr(
        """array_join(transform(sequence(0, (2 * np + 1 + 119) div 120 - 1),
          |  c -> concat(
          |    lpad(hex(least(120, 2 * np + 1 - c * 120)), 2, '0'),
          |    substr(lzw_hex, c * 240 + 1, 240))), '')""".stripMargin))
      .withColumn("gif_hex", expr(
        """concat('474946383961',
          |  lpad(hex(w), 2, '0'), '00', lpad(hex(hh), 2, '0'), '00',
          |  'E60000', pal_hex,
          |  '2C', '00000000',
          |  lpad(hex(w), 2, '0'), '00', lpad(hex(hh), 2, '0'), '00', '00',
          |  '07', blocks_hex, '00', '3B')""".stripMargin))
      .select(col("doc_id"), unhex(col("gif_hex")).as("data"))
      .select(col("doc_id"), col("data"),
        struct(lit("image/gif").as("mime"),
          octet_length(col("data")).cast("long").as("n_bytes")).as("meta"))
  }
}

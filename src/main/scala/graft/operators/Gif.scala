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

  // ---------------------------------------------------------------------
  // Animated GIF: frame-indexed decode with GIF89a compositing
  // ---------------------------------------------------------------------

  /** One composited animation frame: the FULL logical screen after this
    * frame painted (what a viewer shows at that instant), plus the
    * Graphic Control Extension delay.
    */
  final case class Frame(index: Int, delayCs: Int, px: Array[Byte])

  /** Frame-indexed decode of a (possibly animated) GIF: every image
    * descriptor decoded and COMPOSITED onto the logical screen per the
    * GIF89a Graphic Control semantics — sub-rect placement, transparent
    * index skip, disposal none/keep (0/1), restore-to-background (2,
    * background = the logical-screen background color from the global
    * table, the deterministic reading), restore-to-previous (3). Returns
    * (screenW, screenH, frames), each frame a full W×H×3 RGB snapshot —
    * the surface mm_frame_sample / mm_scene_detect consume.
    *
    * Refusals (the [[decode]] contract): interlace, missing palettes,
    * out-of-screen frame rects, truncated LZW, more than `maxFrames`
    * frames (bounded memory: the snapshots are maxFrames · W·H·3 bytes).
    */
  def decodeFrames(data: Array[Byte],
                   maxFrames: Int = 64): Option[(Int, Int, Seq[Frame])] =
    try decodeFramesImpl(data, maxFrames)
    catch { // refuse, never throw (the decode() fuzz contract)
      case _: IndexOutOfBoundsException | _: NegativeArraySizeException =>
        None
    }

  private def decodeFramesImpl(data: Array[Byte],
                   maxFrames: Int): Option[(Int, Int, Seq[Frame])] = {
    if (!isGif(data)) return None
    val sw = le16(data, 6)
    val sh = le16(data, 8)
    if (sw <= 0 || sh <= 0) return None
    if (sw.toLong * sh * 3 * (maxFrames + 1) > (256L << 20)) return None
    val packed = data(10) & 0xFF
    val gctSize = if ((packed & 0x80) != 0) 2 << (packed & 7) else 0
    if (13 + 3 * gctSize > data.length) return None // truncated GCT
    val gctOff = 13
    val bgIndex = data(11) & 0xFF
    val screen = new Array[Byte](sw * sh * 3)
    // initial screen = background color when a global table provides it
    if (gctSize > 0 && bgIndex < gctSize) {
      var p = 0
      while (p < sw * sh) {
        screen(p * 3) = data(gctOff + 3 * bgIndex)
        screen(p * 3 + 1) = data(gctOff + 3 * bgIndex + 1)
        screen(p * 3 + 2) = data(gctOff + 3 * bgIndex + 2)
        p += 1
      }
    }
    val frames = scala.collection.mutable.ArrayBuffer.empty[Frame]
    var pos = 13 + 3 * gctSize
    var disposal = 0
    var transparent = -1
    var delayCs = 0
    var prevScreen: Array[Byte] = null
    while (pos < data.length) {
      (data(pos) & 0xFF) match {
        case 0x3B => // trailer
          return if (frames.isEmpty) None else Some((sw, sh, frames.toSeq))
        case 0x21 => // extension
          if (pos + 2 > data.length) return None
          val label = data(pos + 1) & 0xFF
          if (label == 0xF9 && pos + 7 < data.length &&
              (data(pos + 2) & 0xFF) == 4) {
            val gp = data(pos + 3) & 0xFF
            disposal = (gp >> 2) & 7
            delayCs = le16(data, pos + 4)
            transparent = if ((gp & 1) != 0) data(pos + 6) & 0xFF else -1
          }
          pos += 2
          while (pos < data.length && data(pos) != 0)
            pos += 1 + (data(pos) & 0xFF)
          if (pos >= data.length) return None
          pos += 1
        case 0x2C => // image descriptor
          if (frames.size >= maxFrames) return None
          if (pos + 10 > data.length) return None
          val left = le16(data, pos + 1)
          val top = le16(data, pos + 3)
          val fw = le16(data, pos + 5)
          val fh = le16(data, pos + 7)
          val ip = data(pos + 9) & 0xFF
          if ((ip & 0x40) != 0) return None // interlace: refuse
          val lctSize = if ((ip & 0x80) != 0) 2 << (ip & 7) else 0
          val (pOff, pSize) =
            if (lctSize > 0) (pos + 10, lctSize) else (gctOff, gctSize)
          if (pSize == 0 || fw <= 0 || fh <= 0) return None
          if (left + fw > sw || top + fh > sh) return None
          var dp = pos + 10 + 3 * lctSize
          if (dp >= data.length) return None
          val minCodeSize = data(dp) & 0xFF
          val bos = new java.io.ByteArrayOutputStream()
          dp += 1
          var blockDone = false
          while (!blockDone) {
            if (dp >= data.length) return None
            val len = data(dp) & 0xFF
            if (len == 0) blockDone = true
            else {
              if (dp + 1 + len > data.length) return None
              bos.write(data, dp + 1, len)
              dp += 1 + len
            }
          }
          dp += 1
          val idx = lzwDecode(bos.toByteArray, minCodeSize,
            fw * fh) match {
            case Some(a) => a
            case None => return None
          }
          if (disposal == 3) prevScreen = screen.clone()
          var q = 0
          while (q < idx.length) {
            val j = idx(q) & 0xFF
            if (j >= pSize) return None
            if (j != transparent) {
              val x = left + q % fw
              val y = top + q / fw
              val o = (y * sw + x) * 3
              screen(o) = data(pOff + 3 * j)
              screen(o + 1) = data(pOff + 3 * j + 1)
              screen(o + 2) = data(pOff + 3 * j + 2)
            }
            q += 1
          }
          frames += Frame(frames.size, delayCs, screen.clone())
          // post-frame disposal prepares the NEXT frame's base
          if (disposal == 2) {
            // restore the frame rect to the background color
            val (br, bg2, bb) =
              if (gctSize > 0 && bgIndex < gctSize)
                (data(gctOff + 3 * bgIndex), data(gctOff + 3 * bgIndex + 1),
                  data(gctOff + 3 * bgIndex + 2))
              else (0.toByte, 0.toByte, 0.toByte)
            var yy = top
            while (yy < top + fh) {
              var xx = left
              while (xx < left + fw) {
                val o = (yy * sw + xx) * 3
                screen(o) = br; screen(o + 1) = bg2; screen(o + 2) = bb
                xx += 1
              }
              yy += 1
            }
          } else if (disposal == 3 && prevScreen != null) {
            System.arraycopy(prevScreen, 0, screen, 0, screen.length)
          }
          disposal = 0; transparent = -1; delayCs = 0
          pos = dp
        case _ => return None
      }
    }
    None // no trailer: truncated
  }

  /** Deterministic multi-frame (animated) fixture: 3 frames over a
    * shared 128-entry global palette — frame 0 full-screen, frame 1 a
    * sub-rect at (2,3), frame 2 a sub-rect at (1,1) with TRANSPARENT
    * index 13 (those pixels keep showing the frame-1 composite), all
    * disposal keep-in-place, delays 10/20/30 cs. The CLEAR-before-every-
    * code trick keeps the LZW byte-aligned, so an external oracle
    * reproduces every composited pixel in closed form (the [[gifMedia]]
    * argument); bytes are generated JVM-side (the jpegMedia precedent —
    * the oracle never needs the bytes, only the decoded screen).
    */
  def animFixture(seed: Long): Array[Byte] = {
    val w = (seed % 5 + 10).toInt
    val h = (seed % 4 + 10).toInt
    val b = new java.io.ByteArrayOutputStream()
    def u8(v: Int): Unit = b.write(v & 0xFF)
    def u16(v: Int): Unit = { u8(v & 0xFF); u8((v >> 8) & 0xFF) }
    b.write("GIF89a".getBytes(java.nio.charset.StandardCharsets.US_ASCII))
    u16(w); u16(h)
    u8(0xE6) // GCT present, 128 entries
    u8(0)    // background index 0
    u8(0)
    var j = 0
    while (j < 128) {
      u8((j * 2 + 5) % 256); u8((j * 7 + 11) % 256); u8((j * 13 + 17) % 256)
      j += 1
    }
    def frame(left: Int, top: Int, fw: Int, fh: Int, delay: Int,
              trans: Int, idxAt: Int => Int): Unit = {
      // GCE: disposal 1 (keep), optional transparency
      u8(0x21); u8(0xF9); u8(4)
      u8((1 << 2) | (if (trans >= 0) 1 else 0))
      u16(delay)
      u8(math.max(trans, 0))
      u8(0)
      // descriptor, no LCT, no interlace
      u8(0x2C); u16(left); u16(top); u16(fw); u16(fh); u8(0)
      u8(7) // minCodeSize
      val lzw = new java.io.ByteArrayOutputStream()
      var q = 0
      while (q < fw * fh) { lzw.write(0x80); lzw.write(idxAt(q)); q += 1 }
      lzw.write(0x81) // EOI
      val payload = lzw.toByteArray
      var off = 0
      while (off < payload.length) {
        val n = math.min(120, payload.length - off)
        u8(n); b.write(payload, off, n)
        off += n
      }
      u8(0)
    }
    frame(0, 0, w, h, 10, -1,
      q => ((seed * 29 + q.toLong * 23) % 128).toInt)
    frame(2, 3, w - 4, h - 5, 20, -1,
      q => ((seed * 31 + q.toLong * 19 + 7) % 128).toInt)
    frame(1, 1, w - 2, 4, 30, 13,
      q => ((seed * 37 + q.toLong * 17 + 3) % 128).toInt)
    u8(0x3B)
    b.toByteArray
  }

  /** 6-frame SCENE fixture for shot-boundary detection over REAL decoded
    * frames: a monotone gray palette (pal(j) = (2j,2j,2j), so per-pixel
    * luminance is exactly 2000·j), frames 0–2 constant at index
    * `base0+k`, frames 3–5 constant at `base1+k` — within-scene
    * frame-to-frame steps are one palette slot while the cut at frame 3
    * jumps ≥ 75 slots, a guaranteed margin any threshold inside it
    * detects. Constant frames keep the closed form trivial while the
    * engine still LZW-decodes all six frames.
    */
  def sceneFixture(seed: Long): Array[Byte] = {
    val w = (seed % 5 + 10).toInt
    val h = (seed % 4 + 10).toInt
    val base0 = (8 + seed % 6).toInt
    val base1 = (88 + seed % 6).toInt
    val b = new java.io.ByteArrayOutputStream()
    def u8(v: Int): Unit = b.write(v & 0xFF)
    def u16(v: Int): Unit = { u8(v & 0xFF); u8((v >> 8) & 0xFF) }
    b.write("GIF89a".getBytes(java.nio.charset.StandardCharsets.US_ASCII))
    u16(w); u16(h)
    u8(0xE6); u8(0); u8(0)
    var j = 0
    while (j < 128) { u8(2 * j); u8(2 * j); u8(2 * j); j += 1 }
    for (k <- 0 until 6) {
      u8(0x21); u8(0xF9); u8(4); u8(1 << 2); u16(5); u8(0); u8(0)
      u8(0x2C); u16(0); u16(0); u16(w); u16(h); u8(0)
      u8(7)
      val idx = (if (k < 3) base0 else base1) + k
      val lzw = new java.io.ByteArrayOutputStream()
      var q = 0
      while (q < w * h) { lzw.write(0x80); lzw.write(idx); q += 1 }
      lzw.write(0x81)
      val payload = lzw.toByteArray
      var off = 0
      while (off < payload.length) {
        val n = math.min(120, payload.length - off)
        u8(n); b.write(payload, off, n)
        off += n
      }
      u8(0)
    }
    u8(0x3B)
    b.toByteArray
  }

  /** Deterministic animated-GIF payload column over [[animFixture]]
    * bytes — the [[Jpeg.jpegProgressiveMedia]] shape.
    */
  def gifAnimMedia(ids: DataFrame, idCol: String,
                   seedCol: String): DataFrame =
    fixtureMedia(ids, idCol, seedCol, animFixture)

  /** [[sceneFixture]] payload column — the scene-cut leg's input. */
  def gifSceneMedia(ids: DataFrame, idCol: String,
                    seedCol: String): DataFrame =
    fixtureMedia(ids, idCol, seedCol, sceneFixture)

  private def fixtureMedia(ids: DataFrame, idCol: String, seedCol: String,
                           fx: Long => Array[Byte]): DataFrame = {
    val spark = ids.sparkSession
    import spark.implicits._
    val base = Spread.ifNarrow(ids.select(
      col(idCol).cast("long").as("doc_id"),
      col(seedCol).cast("long").as("seed")))
    base.as[(Long, Long)]
      .mapPartitions(it => it.map { case (id, seed) => (id, fx(seed)) })
      .toDF("doc_id", "data")
      .select(col("doc_id"), col("data"),
        struct(lit("image/gif").as("mime"),
          octet_length(col("data")).cast("long").as("n_bytes")).as("meta"))
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

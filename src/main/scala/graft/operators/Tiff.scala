package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Baseline TIFF codec written from the public TIFF 6.0 specification
  * (Adobe, 1992): both byte orders (`II`/`MM`), first-IFD tag walk,
  * strip-oriented 8-bit grayscale payloads, Compression 1 (none) and
  * 5 (LZW), and Predictor 2 (per-row horizontal differencing). This is
  * the second dictionary-compression leg of the media surface beside
  * [[Gif]]: the SAME LZW algorithm with the OPPOSITE bit order —
  * TIFF packs codes MSB-first and switches code width one code EARLY
  * (the spec's "early change", baked into every real-world writer via
  * libtiff) where GIF is LSB-first with on-time growth. Getting both
  * variants right is the point: a decoder that silently mixes them
  * produces plausible garbage, not a refusal.
  *
  * Refusal contract (the [[Multimodal.decodeHeader]] rule — parse or
  * refuse, never fabricate): unknown compression or photometric,
  * non-8-bit or multi-sample images, tag/strip geometry that doesn't
  * cover the raster, truncated LZW streams, and out-of-bounds strip
  * extents all return None.
  *
  * Oracle strategy (the [[Gif.gifMedia]] precedent): fixtures interleave
  * a CLEAR code before every pixel code, so the 9-bit MSB-first stream
  * repeats in 72-bit (= 4-pixel / 9-byte) groups — byte-aligned LZW an
  * external oracle reproduces in closed form without a compressor.
  * Dictionary-growing streams, the early-change boundary itself, `MM`
  * byte order, multi-strip rasters, and Predictor 2 decode through the
  * SAME paths and are spec-pinned in TiffSpec against a reference
  * encoder and hand-built fixtures.
  */
object Tiff {

  private def u16(d: Array[Byte], off: Int, le: Boolean): Int =
    if (le) (d(off) & 0xFF) | ((d(off + 1) & 0xFF) << 8)
    else ((d(off) & 0xFF) << 8) | (d(off + 1) & 0xFF)

  private def u32(d: Array[Byte], off: Int, le: Boolean): Long =
    if (le) (d(off) & 0xFFL) | ((d(off + 1) & 0xFFL) << 8) |
      ((d(off + 2) & 0xFFL) << 16) | ((d(off + 3) & 0xFFL) << 24)
    else ((d(off) & 0xFFL) << 24) | ((d(off + 1) & 0xFFL) << 16) |
      ((d(off + 2) & 0xFFL) << 8) | (d(off + 3) & 0xFFL)

  private[operators] case class Info(le: Boolean, w: Int, h: Int, compression: Int,
                          predictor: Int, rowsPerStrip: Int,
                          stripOffsets: Array[Long],
                          stripCounts: Array[Long],
                          orientation: Int = 1)

  /** Read an IFD entry's integer value list: SHORT(3) or LONG(4),
    * inline when it fits the 4-byte value field, external otherwise.
    */
  private def values(d: Array[Byte], entry: Int,
                     le: Boolean): Option[Array[Long]] = {
    val typ = u16(d, entry + 2, le)
    val size = typ match { case 3 => 2; case 4 => 4; case _ => return None }
    val count = u32(d, entry + 4, le)
    if (count < 1 || count > 65535) return None
    val total = size * count
    val base =
      if (total <= 4) entry + 8
      else {
        val off = u32(d, entry + 8, le)
        if (off + total > d.length) return None
        off.toInt
      }
    Some(Array.tabulate(count.toInt) { i =>
      if (size == 2) u16(d, base + 2 * i, le).toLong
      else u32(d, base + 4 * i, le)
    })
  }

  private[operators] def parse(d: Array[Byte]): Option[Info] = {
    if (d.length < 8) return None
    val le =
      if (d(0) == 'I' && d(1) == 'I') true
      else if (d(0) == 'M' && d(1) == 'M') false
      else return None
    if (u16(d, 2, le) != 42) return None
    val ifd = u32(d, 4, le)
    if (ifd < 8 || ifd + 2 > d.length) return None
    val n = u16(d, ifd.toInt, le)
    if (ifd + 2 + 12L * n + 4 > d.length) return None
    var w, h, rps = -1L
    var comp, photo, bits, spp, pred = -1L
    var orient = 1L
    var offs, cnts: Array[Long] = null
    var i = 0
    while (i < n) {
      val e = ifd.toInt + 2 + 12 * i
      val tag = u16(d, e, le)
      def v1: Option[Long] = values(d, e, le).flatMap(_.headOption)
      tag match {
        case 256 => w = v1.getOrElse(return None)
        case 257 => h = v1.getOrElse(return None)
        case 258 => bits = v1.getOrElse(return None)
        case 259 => comp = v1.getOrElse(return None)
        case 262 => photo = v1.getOrElse(return None)
        case 273 => offs = values(d, e, le).getOrElse(return None)
        case 274 => orient = v1.getOrElse(return None)
        case 277 => spp = v1.getOrElse(return None)
        case 278 => rps = v1.getOrElse(return None)
        case 279 => cnts = values(d, e, le).getOrElse(return None)
        case 317 => pred = v1.getOrElse(return None)
        case _ => () // unknown tags are skippable by design (TIFF 6.0 §2)
      }
      i += 1
    }
    if (w <= 0 || h <= 0 || offs == null || cnts == null) return None
    if (bits >= 0 && bits != 8) return None       // baseline: gray 8
    if (spp >= 0 && spp != 1) return None
    if (photo >= 0 && photo != 0 && photo != 1) return None
    if (comp >= 0 && comp != 1 && comp != 5) return None
    if (pred >= 0 && pred != 1 && pred != 2) return None
    if (rps <= 0) rps = h // default: one strip
    // any tag-274 value is recorded, never refused here: decode-only
    // consumers (dims, decodeToPixels, the luminance legs) read mirrored
    // scans (2/4/5/7) fine with the tag ignored — only exifRotate, which
    // must APPLY the orientation, refuses the mirrored forms it can't
    // express as pure rotations
    val nStrips = ((h + rps - 1) / rps).toInt
    if (offs.length != nStrips || cnts.length != nStrips) return None
    if (w * h > (64L << 20)) return None
    Some(Info(le, w.toInt, h.toInt, math.max(comp, 1).toInt,
      math.max(pred, 1).toInt, rps.toInt, offs, cnts, orient.toInt))
  }

  /** IFD0 tag-274 read for EXIF payloads — the TIFF blob inside a JPEG
    * APP1 carries NO strip data at IFD0 (the image is the JPEG itself),
    * so [[parse]]'s raster requirements don't apply: walk the first IFD
    * for the orientation tag only; absent tag = 1 (the spec default).
    */
  private[operators] def orientationOnly(d: Array[Byte]): Option[Int] = {
    if (d.length < 8) return None
    val le =
      if (d(0) == 'I' && d(1) == 'I') true
      else if (d(0) == 'M' && d(1) == 'M') false
      else return None
    if (u16(d, 2, le) != 42) return None
    val ifd = u32(d, 4, le)
    if (ifd < 8 || ifd + 2 > d.length) return None
    val n = u16(d, ifd.toInt, le)
    if (ifd + 2 + 12L * n > d.length) return None
    var i = 0
    while (i < n) {
      val e = ifd.toInt + 2 + 12 * i
      if (u16(d, e, le) == 274)
        return values(d, e, le).flatMap(_.headOption).map(_.toInt)
      i += 1
    }
    Some(1)
  }

  /** Geometry-only parse: (width, height, 1 channel). */
  def dims(data: Array[Byte]): Option[(Int, Int, Int)] =
    parse(data).map(i => (i.w, i.h, 1))

  /** TIFF-variant LZW decode: MSB-first bit reader, 256 literal roots,
    * CLEAR=256 / EOI=257, initial code width 9, EARLY width change
    * (grow when the table reaches 2^width − 1, one code before GIF
    * would — TIFF 6.0 §13 as implemented by libtiff), 4096 cap with
    * deferred clear. Returns exactly `expect` bytes or None.
    */
  private[operators] def lzwDecodeTiff(data: Array[Byte],
                                       expect: Int): Option[Array[Byte]] = {
    val clear = 256
    val eoi = 257
    val prefix = new Array[Int](4096)
    val suffix = new Array[Byte](4096)
    val stack = new Array[Byte](4097)
    val out = new Array[Byte](expect)
    var produced = 0
    var codeSize = 9
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
        v <<= 1
        if ((data((bp >> 3).toInt) >> (7 - (bp & 7)).toInt & 1) != 0) v |= 1
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
        codeSize = 9
        avail = eoi + 1
        prev = -1
      } else if (code == eoi) {
        running = false
      } else if (prev < 0) {
        if (code >= clear) return None // first code must be a literal
        if (!emit(code)) return None
        prev = code
      } else {
        if (code > avail || (code == avail && avail >= 4096)) return None
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
          // EARLY change: one entry before the width would overflow
          if (avail == (1 << codeSize) - 1 && codeSize < 12) codeSize += 1
        }
        prev = code
      }
    }
    if (produced != expect) None else Some(out)
  }

  /** Full decode to an 8-bit grayscale buffer (the
    * [[Multimodal.decodeToPixels]] contract): per-strip decompress,
    * concatenate, undo Predictor 2's horizontal differencing.
    */
  def decode(data: Array[Byte])
      : Option[(Multimodal.ImageInfo, Array[Byte])] = {
    val info = parse(data) match {
      case Some(i) => i
      case None => return None
    }
    val px = new Array[Byte](info.w * info.h)
    var strip = 0
    var row = 0
    while (row < info.h) {
      val rows = math.min(info.rowsPerStrip, info.h - row)
      val expect = rows * info.w
      val off = info.stripOffsets(strip)
      val len = info.stripCounts(strip)
      if (off < 0 || len < 0 || off + len > data.length) return None
      val raw = info.compression match {
        case 1 =>
          if (len != expect) return None
          java.util.Arrays.copyOfRange(data, off.toInt, (off + len).toInt)
        case 5 =>
          lzwDecodeTiff(java.util.Arrays.copyOfRange(
            data, off.toInt, (off + len).toInt), expect) match {
            case Some(a) => a
            case None => return None
          }
      }
      System.arraycopy(raw, 0, px, row * info.w, expect)
      row += rows
      strip += 1
    }
    if (info.predictor == 2) {
      var y = 0
      while (y < info.h) {
        var x = 1
        val base = y * info.w
        while (x < info.w) {
          px(base + x) = (px(base + x) + px(base + x - 1)).toByte
          x += 1
        }
        y += 1
      }
    }
    Some((Multimodal.ImageInfo(info.w, info.h, 1, 0, info.w,
      bottomUp = false, bgr = false), px))
  }

  /** Deterministic TIFF fixture payloads — REAL LZW-compressed gray-8
    * images for the oracle leg: a CLEAR code before every pixel code
    * keeps the dictionary at its initial state, so the MSB-first 9-bit
    * stream repeats in 72-bit groups — each 4 pixels pack into exactly
    * 9 bytes an external oracle emits in closed form (widths are
    * multiples of 4 to keep the raster on the group boundary; the
    * trailing EOI is the byte-aligned pair 0x80 0x80). Single strip,
    * little-endian, 9 sorted IFD entries. Pure column expressions; one
    * row-local pass, no shuffle.
    */
  case class ExifRow(doc_id: Long, orientation: Int, out_w: Int,
                     out_h: Int, lum_total: Long, tl: Long, row0: Long)

  /** EXIF-ORIENTATION auto-rotate — the fix every camera/scanner corpus
    * needs before any geometry-sensitive op (crop, OCR, patch
    * embedding): read TIFF tag 274, decode, and apply the correcting
    * number of 90°-CW rotations (1 → none, 3 → two, 6 → one, 8 →
    * three; mirrored orientations refuse at parse). Probes are the
    * [[Multimodal.rotateProbes]] discipline: rotated dims, the
    * (invariant) luminance total, the top-left corner, and the full
    * first-row sum — together they pin WHICH rotation ran, not just
    * that one did. Partition-wise: one parse + decode + ≤3 in-memory
    * rotations per payload, nothing shuffles.
    */
  def exifRotate(media: org.apache.spark.sql.Dataset[Multimodal.MediaRow])
      : org.apache.spark.sql.Dataset[ExifRow] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.flatMap { r =>
        parse(r.data).flatMap { meta =>
          // rotation orientations only — the mirrored forms (2/4/5/7)
          // can't be expressed as 90°-CW turns, so THIS consumer refuses
          // them; parse itself accepts any tag-274 value for decode legs
          val ok = meta.orientation == 1 || meta.orientation == 3 ||
            meta.orientation == 6 || meta.orientation == 8
          if (!ok) None
          else decode(r.data).map { case (ii0, buf0) =>
            val k = meta.orientation match {
              case 1 => 0; case 3 => 2; case 6 => 1; case _ => 3
            }
            var cur = (ii0, buf0)
            var i = 0
            while (i < k) {
              cur = Multimodal.rotate90cw(cur._1, cur._2); i += 1
            }
            val (ii, buf) = cur
            val w = ii.width; val h = ii.height; val ch = ii.channels
            def lum(x: Int, y: Int): Long = {
              val row = if (ii.bottomUp) h - 1 - y else y
              val b = ii.pixelOffset + row * ii.rowStride + x * ch
              1000L * (buf(b) & 0xFF) // gray TIFF: single channel
            }
            var tot = 0L
            var y = 0
            while (y < h) {
              var x = 0
              while (x < w) { tot += lum(x, y); x += 1 }
              y += 1
            }
            var row0 = 0L
            var x = 0
            while (x < w) { row0 += lum(x, 0); x += 1 }
            ExifRow(r.doc_id, meta.orientation, w, h, tot, lum(0, 0), row0)
          }
        }
      }
    }
  }

  /** Uncompressed single-strip gray fixtures CARRYING tag 274: pixel
    * (y, x) = `(seed·23 + (y·w + x)·7) mod 256`, orientation cycling
    * 1/3/6/8 by seed mod 4 — each value demands a different correcting
    * rotation, and the corner/row probes differ between all four.
    * Fixed IFD: 10 sorted entries, pixel data at offset 134.
    */
  def exifMedia(ids: DataFrame, idCol: String, seedCol: String): DataFrame = {
    val lut = Multimodal.hexLutSql
    val base = Spread.ifNarrow(
        ids.select(col(idCol).as("doc_id"), col(seedCol).as("seed")))
      .withColumn("w", (col("seed") % 6 + 6).cast("int"))
      .withColumn("hh", (col("seed") % 5 + 6).cast("int"))
      .withColumn("np", expr("w * hh"))
      .withColumn("ori", expr(
        "CASE CAST(seed % 4 AS INT) WHEN 0 THEN 1 WHEN 1 THEN 3 " +
          "WHEN 2 THEN 6 ELSE 8 END"))
    val ifd =
      """concat('49492A00', '08000000', '0A00',
        |  '0001', '0300', '01000000', lpad(hex(w), 2, '0'), '000000',
        |  '0101', '0300', '01000000', lpad(hex(hh), 2, '0'), '000000',
        |  '0201', '0300', '01000000', '08000000',
        |  '0301', '0300', '01000000', '01000000',
        |  '0601', '0300', '01000000', '01000000',
        |  '1101', '0400', '01000000', '86000000',
        |  '1201', '0300', '01000000', lpad(hex(ori), 2, '0'), '000000',
        |  '1501', '0300', '01000000', '01000000',
        |  '1601', '0300', '01000000', lpad(hex(hh), 2, '0'), '000000',
        |  '1701', '0400', '01000000', lpad(hex(np), 2, '0'), '000000',
        |  '00000000')""".stripMargin
    base
      .withColumn("px_hex", expr(
        s"""array_join(transform(sequence(0, np - 1),
           |  i -> element_at($lut,
           |         CAST((seed * 23 + i * 7) % 256 AS INT) + 1)), '')"""
          .stripMargin))
      .withColumn("tiff_hex", expr(s"concat($ifd, px_hex)"))
      .select(col("doc_id"), unhex(col("tiff_hex")).as("data"))
      .select(col("doc_id"), col("data"),
        struct(lit("image/tiff").as("mime"),
          octet_length(col("data")).cast("long").as("n_bytes")).as("meta"))
  }

  def tiffMedia(ids: DataFrame, idCol: String, seedCol: String): DataFrame = {
    val lut = Multimodal.hexLutSql
    // pixel byte stream, shared (as a formula) with the oracle
    val pix = "CAST((seed * 19 + i * 31 + pmod(seed * i, 251)) % 256 AS INT)"
    val base = Spread.ifNarrow(
        ids.select(col(idCol).as("doc_id"), col(seedCol).as("seed")))
      .withColumn("w", ((col("seed") % 3 + 2) * 4).cast("int"))
      .withColumn("hh", (col("seed") % 5 + 8).cast("int"))
      .withColumn("np", expr("w * hh"))
      .withColumn("len", expr("(np div 4) * 9 + 2"))
      .withColumn("pix", expr(
        s"transform(sequence(0, np - 1), i -> $pix)"))
    // one 9-byte group per 4 pixels: CLEAR p0 CLEAR p1 CLEAR p2 CLEAR p3
    // packed MSB-first at 9 bits/code (derivation in the scaladoc)
    def p(k: Int) = s"element_at(pix, CAST(4 * g + ${k + 1} AS INT))"
    val groups =
      s"""array_join(transform(sequence(0, np div 4 - 1), g -> concat(
         |  '80',
         |  element_at($lut, CAST((${p(0)} div 4) + 1 AS INT)),
         |  element_at($lut, CAST((${p(0)} % 4) * 64 + 32 + 1 AS INT)),
         |  element_at($lut, CAST((${p(1)} div 16) + 1 AS INT)),
         |  element_at($lut, CAST((${p(1)} % 16) * 16 + 8 + 1 AS INT)),
         |  element_at($lut, CAST((${p(2)} div 64) + 1 AS INT)),
         |  element_at($lut, CAST((${p(2)} % 64) * 4 + 2 + 1 AS INT)),
         |  '00',
         |  element_at($lut, CAST(${p(3)} + 1 AS INT)))), '')""".stripMargin
    // 9 sorted IFD entries, value fields little-endian (derivation in
    // the scaladoc); pixel data lands at fixed offset 122 = 8 + 2 +
    // 9*12 + 4
    val ifd =
      """concat('49492A00', '08000000', '0900',
        |  '0001', '0300', '01000000', lpad(hex(w), 2, '0'), '000000',
        |  '0101', '0300', '01000000', lpad(hex(hh), 2, '0'), '000000',
        |  '0201', '0300', '01000000', '08000000',
        |  '0301', '0300', '01000000', '05000000',
        |  '0601', '0300', '01000000', '01000000',
        |  '1101', '0400', '01000000', '7A000000',
        |  '1501', '0300', '01000000', '01000000',
        |  '1601', '0300', '01000000', lpad(hex(hh), 2, '0'), '000000',
        |  '1701', '0400', '01000000',
        |    lpad(hex(len % 256), 2, '0'), lpad(hex(len div 256), 2, '0'),
        |    '0000',
        |  '00000000')""".stripMargin
    base
      .withColumn("tiff_hex", expr(
        s"concat($ifd, $groups, '8080')"))
      .select(col("doc_id"), unhex(col("tiff_hex")).as("data"))
      .select(col("doc_id"), col("data"),
        struct(lit("image/tiff").as("mime"),
          octet_length(col("data")).cast("long").as("n_bytes")).as("meta"))
  }
}

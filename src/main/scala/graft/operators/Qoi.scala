package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** QOI ("Quite OK Image") codec — the CHUNK-OP leg of the real-decode
  * pipeline (PNG = deflate, JPEG = transform, GIF = LZW, TGA/TIFF/BMP =
  * RLE/strips/raw; this is the byte-op state-machine family: a running
  * 64-slot pixel index plus delta ops, increasingly common for
  * screenshot/texture corpora). Written from the public one-page QOI
  * specification (qoiformat.org): 14-byte header — magic `qoif`,
  * width/height u32 BIG-endian, channels 3/4, colorspace byte — then a
  * stream of chunks over a previous-pixel register seeded (0,0,0,255)
  * and a zero-initialized index whose slot is
  * `(r·3 + g·5 + b·7 + a·11) mod 64`:
  *
  *  - `0xFE` QOI_OP_RGB: explicit r,g,b (alpha kept)
  *  - `0xFF` QOI_OP_RGBA: explicit r,g,b,a
  *  - `00xxxxxx` QOI_OP_INDEX: replay index slot x
  *  - `01drdgdb` QOI_OP_DIFF: 2-bit channel deltas, bias 2, mod-256 wrap
  *  - `10dddddd` + byte QOI_OP_LUMA: 6-bit green delta (bias 32), the
  *    second byte's nibbles dr−dg / db−dg (bias 8)
  *  - `11xxxxxx` QOI_OP_RUN: repeat previous pixel x+1 times (1..62 —
  *    63/64 collide with the RGB/RGBA tags and never appear)
  *
  * After every CHUNK decode the new pixel is written to its index slot
  * (run repeats do not re-hash — the pixel is already resident). The
  * stream must terminate with the 8-byte end marker 00×7 01.
  *
  * Refusals (the decoder contract): wrong magic, zero/hostile dims,
  * channels outside {3,4}, run overrunning the pixel count, truncated
  * chunk stream, missing end marker — None, never fabricate.
  *
  * Scale: decode is partition-wise inside the media scan (the
  * [[Multimodal.decodeToPixels]] chain) — one linear chunk walk per
  * payload, nothing shuffles.
  */
object Qoi {

  private def be32(d: Array[Byte], p: Int): Long =
    ((d(p) & 0xFFL) << 24) | ((d(p + 1) & 0xFFL) << 16) |
      ((d(p + 2) & 0xFFL) << 8) | (d(p + 3) & 0xFFL)

  /** Header-only geometry; the same field constraints as [[decode]]. */
  def dims(data: Array[Byte]): Option[(Int, Int, Int)] = {
    if (data.length < 14) return None
    if (data(0) != 'q' || data(1) != 'o' || data(2) != 'i' || data(3) != 'f')
      return None
    val w = be32(data, 4); val h = be32(data, 8)
    val ch = data(12) & 0xFF
    if (w <= 0 || h <= 0 || (ch != 3 && ch != 4)) return None
    // hostile-header bound: cap each dimension BEFORE multiplying so a
    // crafted u32 pair near 2^32 can't overflow the Long product into a
    // negative that slips past the area check
    if (w > (1L << 20) || h > (1L << 20)) return None
    if (w * h * ch > (64L << 20)) return None
    Some((w.toInt, h.toInt, ch))
  }

  /** Full decode to a packed top-down pixel buffer (RGB for channels=3,
    * RGBA for 4) + [[Multimodal.ImageInfo]].
    */
  def decode(data: Array[Byte]): Option[(Multimodal.ImageInfo, Array[Byte])] = {
    val (w, h, ch) = dims(data) match {
      case Some(t) => t
      case None => return None
    }
    val n = w * h
    val px = new Array[Byte](n * ch)
    // index slots + previous-pixel register, both per the spec's seeds
    val idx = new Array[Int](64) // packed 0xRRGGBBAA, zero-initialized
    var r = 0; var g = 0; var b = 0; var a = 255
    var p = 14
    var i = 0
    def emit(k: Int): Unit = {
      val base = k * ch
      px(base) = r.toByte; px(base + 1) = g.toByte; px(base + 2) = b.toByte
      if (ch == 4) px(base + 3) = a.toByte
    }
    while (i < n) {
      if (p >= data.length) return None
      val b1 = data(p) & 0xFF; p += 1
      var isRun = false
      if (b1 == 0xFE) { // QOI_OP_RGB
        if (p + 3 > data.length) return None
        r = data(p) & 0xFF; g = data(p + 1) & 0xFF; b = data(p + 2) & 0xFF
        p += 3
      } else if (b1 == 0xFF) { // QOI_OP_RGBA
        if (p + 4 > data.length) return None
        r = data(p) & 0xFF; g = data(p + 1) & 0xFF
        b = data(p + 2) & 0xFF; a = data(p + 3) & 0xFF
        p += 4
      } else (b1 >> 6) match {
        case 0 => // QOI_OP_INDEX
          val v = idx(b1 & 0x3F)
          r = (v >>> 24) & 0xFF; g = (v >>> 16) & 0xFF
          b = (v >>> 8) & 0xFF; a = v & 0xFF
        case 1 => // QOI_OP_DIFF — 2-bit deltas, bias 2, wrapping
          r = (r + ((b1 >> 4) & 3) - 2) & 0xFF
          g = (g + ((b1 >> 2) & 3) - 2) & 0xFF
          b = (b + (b1 & 3) - 2) & 0xFF
        case 2 => // QOI_OP_LUMA — 6-bit green delta + nibble offsets
          if (p >= data.length) return None
          val b2 = data(p) & 0xFF; p += 1
          val vg = (b1 & 0x3F) - 32
          r = (r + vg - 8 + ((b2 >> 4) & 0xF)) & 0xFF
          g = (g + vg) & 0xFF
          b = (b + vg - 8 + (b2 & 0xF)) & 0xFF
        case _ => // QOI_OP_RUN — repeat previous pixel, no re-hash
          val run = (b1 & 0x3F) + 1
          if (i + run > n) return None // runs must not overrun the image
          var k = 0
          while (k < run) { emit(i + k); k += 1 }
          i += run; isRun = true
      }
      if (!isRun) { // every chunk but RUN decodes one pixel and re-hashes
        idx(((r * 3 + g * 5 + b * 7 + a * 11) & 0x3F)) =
          (r << 24) | (g << 16) | (b << 8) | a
        emit(i); i += 1
      }
    }
    // the 8-byte end marker is mandatory: seven 0x00 then 0x01
    if (p + 8 > data.length) return None
    var k = 0
    while (k < 7) { if (data(p + k) != 0) return None; k += 1 }
    if (data(p + 7) != 1) return None
    Some((Multimodal.ImageInfo(w, h, ch, 0, w * ch,
      bottomUp = false, bgr = false), px))
  }

  /** Deterministic QOI fixtures: w = seed % 13 + 8, h = 4·(seed % 5 + 2)
    * (pixel count divisible by 4 by construction), and the pixel stream
    * emitted as n/4 four-pixel groups each exercising a distinct op —
    *
    *   pixel 4k:   QOI_OP_RGB with the closed-form base value
    *               v(k) = (seed·29 + k·13 + c·85) mod 256, c = 0/1/2
    *   pixel 4k+1: QOI_OP_DIFF 0x7F (+1,+1,+1)
    *   pixel 4k+2: QOI_OP_LUMA 0xA3 0x69 (dg=+3, dr=+1, db=+4)
    *   pixel 4k+3: QOI_OP_RUN(1)
    *
    * so group k's channel-c values are v, v+1, v+2+c', v+2+c' (mod 256,
    * with c' = 0/2/3 for R/G/B) — a decoder that confuses op classes,
    * biases, or the wrap changes the luminance total. INDEX/RGBA ops are
    * spec-pinned on hand-built vectors (their closed form would need the
    * running index replayed in SQL). Pure column expressions through the
    * hex codec; row-local.
    */
  def qoiMedia(ids: DataFrame, idCol: String, seedCol: String): DataFrame = {
    def chanHex(c: Int): String =
      s"element_at(${Multimodal.hexLutSql}, " +
        s"CAST(pmod(seed * 29 + k * 13 + $c * 85, 256) AS INT) + 1)"
    val groupHex =
      s"""concat('FE', ${chanHex(0)}, ${chanHex(1)}, ${chanHex(2)},
         |  '7F', 'A369', 'C0')""".stripMargin
    val base = Spread.ifNarrow(
        ids.select(col(idCol).as("doc_id"), col(seedCol).as("seed")))
      .withColumn("w", (col("seed") % 13 + 8).cast("int"))
      .withColumn("hh", ((col("seed") % 5 + 2) * 4).cast("int"))
    base
      .withColumn("hdr_hex", expr(
        """concat('716F6966',
          |  lpad(hex(w), 8, '0'), lpad(hex(hh), 8, '0'), '03', '00')"""
          .stripMargin))
      .withColumn("px_hex", expr(
        s"""array_join(transform(sequence(0, (w * hh) div 4 - 1),
           |  k -> $groupHex), '')""".stripMargin))
      .select(col("doc_id"),
        unhex(concat(col("hdr_hex"), col("px_hex"),
          lit("0000000000000001"))).as("data"))
      .select(col("doc_id"), col("data"),
        struct(lit("image/qoi").as("mime"),
          octet_length(col("data")).cast("long").as("n_bytes")).as("meta"))
  }
}

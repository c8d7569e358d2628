package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Windows ICO codec — the MULTI-IMAGE DIRECTORY container leg (one
  * file, several resolutions of the same asset — the favicon/asset
  * corpus shape; GIF's animation frames are temporal, ICO's entries are
  * scale variants). Written from the public ICONDIR/BITMAPINFOHEADER
  * layout: 6-byte header (reserved 0, type 1, count), 16-byte directory
  * entries (u8 dims with 0 meaning 256, bit count, resource size,
  * absolute offset), each entry a headerless DIB — BITMAPINFOHEADER
  * with DOUBLED height covering the XOR pixel block (bottom-up BGR,
  * 4-byte-padded rows; 24-bit only here) followed by the 1-bpp AND
  * transparency mask (rows padded to 32 bits, MSB-first within a
  * byte).
  *
  * Refusals (the decoder contract): wrong reserved/type, zero entries,
  * entries pointing outside the payload, biSize ≠ 40, compressed or
  * non-24-bit DIBs, odd doubled heights, dimension mismatch between a
  * directory entry and its DIB — None, never fabricate.
  *
  * Scale: decode is partition-wise ([[icoStats]]) — one directory walk
  * + one linear pass per entry, nothing shuffles.
  */
object Ico {

  private def u16(d: Array[Byte], p: Int): Int =
    (d(p) & 0xFF) | ((d(p + 1) & 0xFF) << 8)
  private def u32(d: Array[Byte], p: Int): Long =
    (u16(d, p) & 0xFFFFL) | ((u16(d, p + 2) & 0xFFFFL) << 16)

  /** One decoded directory entry: geometry + pixel/mask features. */
  final case class IcoEntry(idx: Int, width: Int, height: Int,
                            lumTotal: Long, nTransparent: Long)

  /** Full directory decode; None on any malformed byte. */
  def decode(data: Array[Byte]): Option[Seq[IcoEntry]] = {
    if (data.length < 6) return None
    if (u16(data, 0) != 0 || u16(data, 2) != 1) return None
    val count = u16(data, 4)
    if (count < 1 || 6 + 16 * count > data.length) return None
    val entries = (0 until count).map { e =>
      val p = 6 + 16 * e
      val ew = { val v = data(p) & 0xFF; if (v == 0) 256 else v }
      val eh = { val v = data(p + 1) & 0xFF; if (v == 0) 256 else v }
      val size = u32(data, p + 8)
      val off = u32(data, p + 12)
      (ew, eh, size, off)
    }
    val out = Seq.newBuilder[IcoEntry]
    entries.zipWithIndex.foreach { case ((ew, eh, size, off), idx) =>
      if (off < 6 || off + size > data.length || size < 40) return None
      val o = off.toInt
      if (u32(data, o) != 40) return None // BITMAPINFOHEADER only
      val w = u32(data, o + 4).toInt
      val h2 = u32(data, o + 8).toInt
      val bits = u16(data, o + 14)
      val comp = u32(data, o + 16)
      if (w <= 0 || h2 <= 0 || (h2 & 1) != 0 || bits != 24 || comp != 0)
        return None
      val h = h2 / 2
      if (w != ew || h != eh) return None
      val rs = ((3 * w + 3) / 4) * 4
      val andRow = ((w + 31) / 32) * 4
      if (40L + rs.toLong * h + andRow.toLong * h > size) return None
      var lum = 0L
      var r = 0
      while (r < h) {
        val rowBase = o + 40 + r * rs
        var x = 0
        while (x < w) {
          val b = rowBase + 3 * x
          lum += 299L * (data(b + 2) & 0xFF) + 587L * (data(b + 1) & 0xFF) +
            114L * (data(b) & 0xFF)
          x += 1
        }
        r += 1
      }
      val maskBase = o + 40 + rs * h
      var transparent = 0L
      r = 0
      while (r < h) {
        var x = 0
        while (x < w) {
          val byte = data(maskBase + r * andRow + (x >> 3)) & 0xFF
          if ((byte & (0x80 >> (x & 7))) != 0) transparent += 1
          x += 1
        }
        r += 1
      }
      out += IcoEntry(idx, w, h, lum, transparent)
    }
    Some(out.result())
  }

  case class IcoRow(doc_id: Long, img_idx: Int, width: Int, height: Int,
                    lum_total: Long, n_transparent: Long)

  /** Partition-wise directory decode → one row per contained image. */
  def icoStats(media: Dataset[Multimodal.MediaRow]): Dataset[IcoRow] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.flatMap { r =>
        decode(r.data).toSeq.flatten.map(e =>
          IcoRow(r.doc_id, e.idx, e.width, e.height, e.lumTotal,
            e.nTransparent))
      }
    }
  }

  /** Deterministic two-entry fixtures: entry 0 is w₀ = seed%6+6 ×
    * h₀ = seed%5+6 with an ALL-OPAQUE mask, entry 1 is the smaller
    * scale variant w₁ = seed%3+4 × h₁ = seed%2+4 with an
    * ALL-TRANSPARENT mask (every mask byte 0xFF — padding bits are set
    * too, so a decoder that counts past the row width over-reports).
    * Pixel-area byte i of entry e is `(seed·37 + i·13 + e·77) mod 256`
    * with row-pad bytes zero (the [[Multimodal.bmpMedia]] formula
    * family) — bottom-up BGR, so the luminance oracle weights byte
    * positions 0/1/2 of each triple as B/G/R. Pure column expressions
    * through the hex codec; row-local.
    */
  def icoMedia(ids: DataFrame, idCol: String, seedCol: String): DataFrame = {
    def leHex(v: String, bytes: Int): String =
      (0 until bytes).map(k =>
        s"lpad(hex((($v) div ${1L << (8 * k)}) % 256), 2, '0')")
        .mkString("concat(", ", ", ")")
    def entryHex(e: Int, w: String, h: String): String = {
      val rs = s"(((3 * ($w) + 3) div 4) * 4)"
      val andRow = s"((((($w) + 31) div 32)) * 4)"
      val xorLen = s"($rs * ($h))"
      val maskHex =
        if (e == 0) s"repeat('00', $andRow * ($h))"
        else s"repeat('FF', $andRow * ($h))"
      s"""concat('28000000', ${leHex(w, 4)}, ${leHex(s"2 * ($h)", 4)},
         |  '0100', '1800', '00000000', ${leHex(xorLen, 4)},
         |  '00000000', '00000000', '00000000', '00000000',
         |  array_join(transform(sequence(0, $xorLen - 1),
         |    i -> IF(pmod(i, $rs) < 3 * ($w),
         |            element_at(${Multimodal.hexLutSql},
         |              CAST(pmod(seed * 37 + i * 13 + $e * 77, 256) AS INT)
         |                + 1),
         |            '00')), ''),
         |  $maskHex)""".stripMargin
    }
    def resLen(w: String, h: String): String =
      s"(40 + ((((3 * ($w) + 3) div 4) * 4) + (((($w) + 31) div 32) * 4))" +
        s" * ($h))"
    val base = Spread.ifNarrow(
        ids.select(col(idCol).as("doc_id"), col(seedCol).as("seed")))
      .withColumn("w0", (col("seed") % 6 + 6).cast("int"))
      .withColumn("h0", (col("seed") % 5 + 6).cast("int"))
      .withColumn("w1", (col("seed") % 3 + 4).cast("int"))
      .withColumn("h1", (col("seed") % 2 + 4).cast("int"))
    base
      .withColumn("dir_hex", expr(
        s"""concat('0000', '0100', '0200',
           |  lpad(hex(w0), 2, '0'), lpad(hex(h0), 2, '0'), '0000',
           |  '0100', '1800', ${leHex(s"${resLen("w0", "h0")}", 4)},
           |  ${leHex("38", 4)},
           |  lpad(hex(w1), 2, '0'), lpad(hex(h1), 2, '0'), '0000',
           |  '0100', '1800', ${leHex(s"${resLen("w1", "h1")}", 4)},
           |  ${leHex(s"38 + ${resLen("w0", "h0")}", 4)})""".stripMargin))
      .withColumn("e0_hex", expr(entryHex(0, "w0", "h0")))
      .withColumn("e1_hex", expr(entryHex(1, "w1", "h1")))
      .select(col("doc_id"),
        unhex(concat(col("dir_hex"), col("e0_hex"), col("e1_hex")))
          .as("data"))
      .select(col("doc_id"), col("data"),
        struct(lit("image/x-icon").as("mime"),
          octet_length(col("data")).cast("long").as("n_bytes")).as("meta"))
  }
}

package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Truevision TGA codec — the RUN-LENGTH-ENCODED leg of the real-decode
  * pipeline (PNG = deflate, JPEG = transform, GIF = LZW, TIFF = strips;
  * this is the packet-RLE family, still common for game/texture and
  * scanline-tool corpora). Written from the public TGA 2.0 spec:
  * 18-byte little-endian header (no magic — the format is identified by
  * field constraints: color-map type 0, image type 2/10, 24-bit depth),
  * optional image-ID skip, BGR pixel packets — raw packets of
  * `count` literal pixels and RLE packets of ONE pixel repeated
  * `count` times (bit 7 of the packet header selects), descriptor
  * bit 5 choosing top-down vs the default bottom-up row origin.
  * Trailing bytes (the optional 26-byte TGA 2.0 footer) are ignored.
  *
  * Refusals (the decoder contract): color-mapped images, depths other
  * than 24, zero dims, packets overrunning the pixel count, truncated
  * payloads — None, never fabricate.
  *
  * Scale: decode is partition-wise inside the media scan (the
  * [[Multimodal.decodeToPixels]] chain) — per-payload header parse +
  * one linear packet walk, nothing shuffles.
  */
object Tga {

  private def le16(d: Array[Byte], p: Int): Int =
    (d(p) & 0xFF) | ((d(p + 1) & 0xFF) << 8)

  /** Header-only geometry; the same field constraints as [[decode]]. */
  def dims(data: Array[Byte]): Option[(Int, Int, Int)] = {
    if (data.length < 18) return None
    val cmType = data(1) & 0xFF
    val imgType = data(2) & 0xFF
    if (cmType != 0 || (imgType != 2 && imgType != 10)) return None
    val w = le16(data, 12); val h = le16(data, 14)
    val depth = data(16) & 0xFF
    if (w <= 0 || h <= 0 || depth != 24) return None
    Some((w, h, 3))
  }

  /** Full decode to a BGR pixel buffer + [[Multimodal.ImageInfo]] whose
    * bottomUp/bgr flags route the downstream luma walks correctly.
    */
  def decode(data: Array[Byte]): Option[(Multimodal.ImageInfo, Array[Byte])] = {
    val (w, h, _) = dims(data) match {
      case Some(t) => t
      case None => return None
    }
    val imgType = data(2) & 0xFF
    val idLen = data(0) & 0xFF
    val desc = data(17) & 0xFF
    if (w.toLong * h * 3 > (64L << 20)) return None // hostile-header bound
    val topDown = (desc & 0x20) != 0
    val n = w * h
    val px = new Array[Byte](n * 3)
    var p = 18 + idLen
    if (imgType == 2) { // uncompressed: one literal BGR block
      if (p.toLong + n.toLong * 3 > data.length) return None
      System.arraycopy(data, p, px, 0, n * 3)
    } else { // RLE packet walk
      var i = 0
      while (i < n) {
        if (p >= data.length) return None
        val hdr = data(p) & 0xFF; p += 1
        val cnt = (hdr & 0x7F) + 1
        if (i + cnt > n) return None // packets must not overrun the image
        if ((hdr & 0x80) != 0) {
          if (p + 3 > data.length) return None
          var k = 0
          while (k < cnt) {
            px(3 * (i + k)) = data(p)
            px(3 * (i + k) + 1) = data(p + 1)
            px(3 * (i + k) + 2) = data(p + 2)
            k += 1
          }
          p += 3; i += cnt
        } else {
          if (p + 3 * cnt > data.length) return None
          System.arraycopy(data, p, px, 3 * i, 3 * cnt)
          p += 3 * cnt; i += cnt
        }
      }
    }
    Some((Multimodal.ImageInfo(w, h, 3, 0, w * 3,
      bottomUp = !topDown, bgr = true), px))
  }

  /** Deterministic RLE-TGA fixtures: the [[Multimodal.pngMedia]]
    * geometry family (w = seed % 13 + 8, h = seed % 11 + 8), top-down
    * descriptor, and per row one packet ALTERNATING kinds — even rows a
    * RAW packet of per-pixel values, odd rows an RLE packet repeating
    * one pixel across the row — so a decoder that confuses the packet
    * kinds, mis-steps the run copy, or drops the BGR order changes the
    * luminance total. Channel c of pixel (y, x):
    * `(seed·23 + (y·w + x)·7 + c·11) mod 256` with c = 0/1/2 = R/G/B
    * (serialized B,G,R per the spec); RLE rows repeat the x = 0 pixel.
    * Pure column expressions through the hex codec; row-local.
    */
  def tgaMedia(ids: DataFrame, idCol: String, seedCol: String): DataFrame = {
    def f(y: String, x: String, c: Int): String =
      s"pmod(seed * 23 + (($y) * w + ($x)) * 7 + $c * 11, 256)"
    def bgrHex(y: String, x: String): String =
      Seq(2, 1, 0).map(c =>
        s"element_at(${Multimodal.hexLutSql}, CAST(${f(y, x, c)} AS INT) + 1)")
        .mkString("concat(", ", ", ")")
    val rowHex =
      s"""IF(y % 2 = 0,
         |  concat(lpad(hex(w - 1), 2, '0'),
         |    array_join(transform(sequence(0, w - 1), x ->
         |      ${bgrHex("y", "x")}), '')),
         |  concat(lpad(hex(128 + w - 1), 2, '0'), ${bgrHex("y", "0")}))"""
        .stripMargin
    val base = Spread.ifNarrow(
        ids.select(col(idCol).as("doc_id"), col(seedCol).as("seed")))
      .withColumn("w", (col("seed") % 13 + 8).cast("int"))
      .withColumn("hh", (col("seed") % 11 + 8).cast("int"))
    base
      .withColumn("hdr_hex", expr(
        """concat('00', '00', '0A', '0000000000', '0000', '0000',
          |  lpad(hex(w % 256), 2, '0'), lpad(hex(w div 256), 2, '0'),
          |  lpad(hex(hh % 256), 2, '0'), lpad(hex(hh div 256), 2, '0'),
          |  '18', '20')""".stripMargin))
      .withColumn("px_hex", expr(
        s"""array_join(transform(sequence(0, hh - 1), y -> $rowHex), '')"""))
      .select(col("doc_id"), unhex(concat(col("hdr_hex"), col("px_hex")))
        .as("data"))
      .select(col("doc_id"), col("data"),
        struct(lit("image/x-tga").as("mime"),
          octet_length(col("data")).cast("long").as("n_bytes")).as("meta"))
  }
}

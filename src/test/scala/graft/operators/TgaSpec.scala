package graft.operators

import graft.SparkTestBase

/** TGA (packet-RLE) codec: packet-kind decode exactness, BGR and
  * bottom-up/top-down routing, refusal contract, refuse-never-crash
  * fuzz.
  */
class TgaSpec extends SparkTestBase {

  private def header(w: Int, h: Int, imgType: Int, desc: Int,
                     idLen: Int = 0): Array[Byte] =
    Array[Byte](idLen.toByte, 0, imgType.toByte, 0, 0, 0, 0, 0,
      0, 0, 0, 0,
      (w & 0xFF).toByte, ((w >> 8) & 0xFF).toByte,
      (h & 0xFF).toByte, ((h >> 8) & 0xFF).toByte,
      24, desc.toByte)

  test("decode: raw + RLE packets reassemble exactly (top-down), " +
      "bottom-up default flags, type-2 literal block, id-field skip") {
    // 3x2 top-down: row 0 = raw packet of 3 distinct pixels, row 1 =
    // one RLE packet repeating a single pixel
    val rowsRle = Array[Byte](
      2, // raw packet, count 3
      10, 20, 30, 40, 50, 60, 70, 80, 90, // 3 BGR pixels
      (0x80 | 2).toByte, // RLE packet, count 3
      1, 2, 3)
    val p1 = header(3, 2, 10, 0x20) ++ rowsRle
    val got = Tga.decode(p1)
    assert(got.isDefined, "valid RLE TGA must decode")
    val (info, px) = got.get
    assert((info.width, info.height, info.channels) == ((3, 2, 3)))
    assert(!info.bottomUp && info.bgr)
    assert(px.toSeq == Seq[Byte](10, 20, 30, 40, 50, 60, 70, 80, 90,
      1, 2, 3, 1, 2, 3, 1, 2, 3))
    // default descriptor (no bit 5) = bottom-up, like BMP
    val p2 = header(3, 2, 10, 0x00) ++ rowsRle
    assert(Tga.decode(p2).get._1.bottomUp)
    // type 2: literal BGR block, with a 4-byte image-ID field to skip
    val lit = Array.tabulate[Byte](3 * 2 * 3)(i => (i * 5 + 1).toByte)
    val p3 = header(3, 2, 2, 0x20, idLen = 4) ++
      Array[Byte](9, 9, 9, 9) ++ lit
    assert(Tga.decode(p3).get._2.toSeq == lit.toSeq)
    // trailing footer bytes are ignored
    assert(Tga.decode(p1 ++ Array.fill[Byte](26)(0)).isDefined)
  }

  test("refusals: color-mapped, wrong depth, overrunning packet, " +
      "truncated payloads; fuzz never throws") {
    val rowsRle = Array[Byte](2, 10, 20, 30, 40, 50, 60, 70, 80, 90,
      (0x80 | 2).toByte, 1, 2, 3)
    val good = header(3, 2, 10, 0x20) ++ rowsRle
    val cm = good.clone(); cm(1) = 1
    assert(Tga.decode(cm).isEmpty, "color-mapped refuses")
    val d16 = good.clone(); d16(16) = 16
    assert(Tga.decode(d16).isEmpty, "16-bit depth refuses")
    val t3 = good.clone(); t3(2) = 3
    assert(Tga.decode(t3).isEmpty, "grayscale type refuses")
    // an RLE packet that overruns the pixel count refuses
    val overrun = header(3, 1, 10, 0x20) ++
      Array[Byte]((0x80 | 5).toByte, 1, 2, 3)
    assert(Tga.decode(overrun).isEmpty)
    (0 until good.length).foreach(n => Tga.decode(good.take(n)))
    val rnd = new scala.util.Random(42)
    (1 to 300).foreach { _ =>
      Tga.decode(Array.fill[Byte](rnd.nextInt(200))(rnd.nextInt(256).toByte))
    }
  }

  test("fixture parity: tgaMedia decodes through decodePixels to the " +
      "closed-form luminance total with both packet kinds in play") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val ids = spark.range(0, 24).select(col("id").as("doc_id"))
    val media = Tga.tgaMedia(ids, "doc_id", "doc_id")
      .select(col("doc_id"), col("data"), col("meta.mime").as("mime"),
        col("meta.n_bytes").as("n_bytes")).as[Multimodal.MediaRow]
    val got = Multimodal.decodePixels(media).collect()
      .map(r => r.doc_id -> (r.width, r.height, r.lum_total)).toMap
    assert(got.size == 24)
    (0L until 24L).foreach { seed =>
      val w = (seed % 13 + 8).toInt; val h = (seed % 11 + 8).toInt
      def f(y: Int, x: Int, c: Int): Long =
        (seed * 23 + (y.toLong * w + x) * 7 + c * 11) % 256
      var lum = 0L
      for (y <- 0 until h; x <- 0 until w) {
        val xe = if (y % 2 == 0) x else 0 // RLE rows repeat pixel x=0
        lum += 299 * f(y, xe, 0) + 587 * f(y, xe, 1) + 114 * f(y, xe, 2)
      }
      assert(got(seed) == ((w, h, lum)), s"seed $seed")
    }
  }
}

package graft.operators

import graft.SparkTestBase

/** QOI (chunk-op) codec: op-class decode exactness including the
  * running-index replay and RGBA alpha carry, mod-256 wrap, refusal
  * contract, refuse-never-crash fuzz, fixture parity.
  */
class QoiSpec extends SparkTestBase {

  private def header(w: Int, h: Int, ch: Int): Array[Byte] =
    Array[Byte]('q', 'o', 'i', 'f',
      ((w >> 24) & 0xFF).toByte, ((w >> 16) & 0xFF).toByte,
      ((w >> 8) & 0xFF).toByte, (w & 0xFF).toByte,
      ((h >> 24) & 0xFF).toByte, ((h >> 16) & 0xFF).toByte,
      ((h >> 8) & 0xFF).toByte, (h & 0xFF).toByte,
      ch.toByte, 0)

  private val endMarker = Array[Byte](0, 0, 0, 0, 0, 0, 0, 1)

  test("decode: RGB, DIFF, INDEX and RUN ops; index replay hits the " +
      "hashed slot; LUMA and alpha carry on a 4-channel stream") {
    // 4x1 RGB: explicit pixel, -2 diff, index replay of pixel 0, run
    val p1 = header(4, 1, 3) ++ Array[Byte](
      0xFE.toByte, 10, 20, 30, // QOI_OP_RGB (10,20,30) -> slot 9
      0x40, // QOI_OP_DIFF (-2,-2,-2) -> (8,18,28)
      0x09, // QOI_OP_INDEX slot 9 -> (10,20,30)
      0xC0.toByte) ++ endMarker // QOI_OP_RUN(1) repeats (10,20,30)
    val got = Qoi.decode(p1)
    assert(got.isDefined, "valid QOI must decode")
    val (info, px) = got.get
    assert((info.width, info.height, info.channels) == ((4, 1, 3)))
    assert(!info.bottomUp && !info.bgr)
    assert(px.toSeq == Seq[Byte](10, 20, 30, 8, 18, 28, 10, 20, 30,
      10, 20, 30))
    // 2x1 RGBA: explicit RGBA, then LUMA (vg=-32, dr=db=-40); alpha
    // carries across the LUMA op untouched
    val p2 = header(2, 1, 4) ++ Array[Byte](
      0xFF.toByte, 1, 2, 3, 4,
      0x80.toByte, 0x00) ++ endMarker
    val (i2, px2) = Qoi.decode(p2).get
    assert(i2.channels == 4)
    assert(px2.map(_ & 0xFF).toSeq == Seq(1, 2, 3, 4, 217, 226, 219, 4))
    // DIFF wraps mod 256 off the (0,0,0,255) seed register
    val p3 = header(1, 1, 3) ++ Array[Byte](0x40) ++ endMarker
    assert(Qoi.decode(p3).get._2.map(_ & 0xFF).toSeq == Seq(254, 254, 254))
  }

  test("refusals: magic, channels, zero dims, run overrun, truncated " +
      "chunk, missing/wrong end marker; fuzz never throws") {
    val good = header(4, 1, 3) ++ Array[Byte](
      0xFE.toByte, 10, 20, 30, 0x40, 0x09, 0xC0.toByte) ++ endMarker
    assert(Qoi.decode(good).isDefined)
    val badMagic = good.clone(); badMagic(0) = 'Q'
    assert(Qoi.decode(badMagic).isEmpty, "wrong magic refuses")
    val ch2 = good.clone(); ch2(12) = 2
    assert(Qoi.decode(ch2).isEmpty, "channels=2 refuses")
    assert(Qoi.decode(header(0, 1, 3) ++ endMarker).isEmpty,
      "zero width refuses")
    // hostile u32 dims near 2^32: the per-dimension cap must refuse
    // BEFORE the area product could wrap Long negative and slip the check
    assert(Qoi.dims(header(-1, -1, 3) ++ endMarker).isEmpty,
      "w=h=0xFFFFFFFF refuses at the header, no fabricated geometry")
    assert(Qoi.dims(header(0x7FFFFFFF, 0x7FFFFFFF, 4) ++ endMarker).isEmpty)
    assert(Qoi.decode(header(-1, -1, 3) ++ endMarker).isEmpty)
    // a run longer than the remaining pixel count refuses
    val overrun = header(1, 1, 3) ++ Array[Byte](0xC1.toByte) ++ endMarker
    assert(Qoi.decode(overrun).isEmpty)
    // LUMA with its second byte cut off refuses
    val cutLuma = header(1, 1, 3) ++ Array[Byte](0x80.toByte)
    assert(Qoi.decode(cutLuma).isEmpty)
    // end marker must be present and exact
    assert(Qoi.decode(good.dropRight(8)).isEmpty, "missing end marker")
    val badEnd = good.clone(); badEnd(badEnd.length - 1) = 2
    assert(Qoi.decode(badEnd).isEmpty, "wrong end marker byte")
    (0 until good.length).foreach(n => Qoi.decode(good.take(n)))
    val rnd = new scala.util.Random(43)
    (1 to 300).foreach { _ =>
      Qoi.decode(Array.fill[Byte](rnd.nextInt(200))(rnd.nextInt(256).toByte))
    }
    (1 to 100).foreach { _ => // header-valid, hostile chunk streams
      val body = Array.fill[Byte](rnd.nextInt(60))(rnd.nextInt(256).toByte)
      Qoi.decode(header(4, 3, 3) ++ body)
    }
  }

  test("fixture parity: qoiMedia decodes through decodePixels to the " +
      "closed-form luminance total with all four fixture ops in play") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val ids = spark.range(0, 24).select(col("id").as("doc_id"))
    val media = Qoi.qoiMedia(ids, "doc_id", "doc_id")
      .select(col("doc_id"), col("data"), col("meta.mime").as("mime"),
        col("meta.n_bytes").as("n_bytes")).as[Multimodal.MediaRow]
    val got = Multimodal.decodePixels(media).collect()
      .map(r => r.doc_id -> (r.width, r.height, r.lum_total)).toMap
    assert(got.size == 24)
    (0L until 24L).foreach { seed =>
      val w = (seed % 13 + 8).toInt; val h = ((seed % 5 + 2) * 4).toInt
      var lum = 0L
      (0 until w * h / 4).foreach { k =>
        def v(c: Int, add: Int): Long = (seed * 29 + k * 13 + c * 85 + add) % 256
        lum += 299 * (v(0, 0) + v(0, 1) + 2 * v(0, 2)) +
          587 * (v(1, 0) + v(1, 1) + 2 * v(1, 4)) +
          114 * (v(2, 0) + v(2, 1) + 2 * v(2, 5))
      }
      assert(got(seed) == ((w, h, lum)), s"seed $seed")
    }
  }
}

package graft.operators

import graft.SparkTestBase

/** Baseline JPEG codec: exactness of the closed-form fixture classes, the
  * entropy/bitstream layer against crafted coefficient blocks, IDCT
  * accuracy against a double-precision reference, restart/stuffing edges,
  * refusal of non-baseline modes, and refuse-never-crash fuzz (the
  * decodePng precedent).
  */
class JpegSpec extends SparkTestBase {

  private val StdZigzag = Array(
    0, 1, 8, 16, 9, 2, 3, 10,
    17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63)

  test("generated zigzag order matches the T.81 figure (independent transcription)") {
    assert(Jpeg.Zigzag.toSeq == StdZigzag.toSeq)
  }

  test("IDCT reconstructs a DC-only block exactly for every sample value 0..255") {
    val coef = new Array[Int](64)
    val out = new Array[Int](64)
    (0 to 255).foreach { v =>
      java.util.Arrays.fill(coef, 0)
      coef(0) = 8 * (v - 128)
      Jpeg.idctBlock(coef, out)
      assert(out.forall(_ == v), s"DC-only block of $v must decode to constant $v")
    }
  }

  test("IDCT is within 1 of the double-precision reference on random blocks") {
    val rnd = new scala.util.Random(42)
    val coef = new Array[Int](64)
    val out = new Array[Int](64)
    (1 to 200).foreach { _ =>
      var i = 0
      while (i < 64) { coef(i) = rnd.nextInt(401) - 200; i += 1 }
      Jpeg.idctBlock(coef, out)
      var y = 0
      while (y < 8) {
        var x = 0
        while (x < 8) {
          var acc = 0.0
          var v = 0
          while (v < 8) {
            var u = 0
            while (u < 8) {
              val cu = if (u == 0) 1.0 / math.sqrt(2) else 1.0
              val cv = if (v == 0) 1.0 / math.sqrt(2) else 1.0
              acc += cu * cv * coef(v * 8 + u) *
                math.cos((2 * x + 1) * u * math.Pi / 16) *
                math.cos((2 * y + 1) * v * math.Pi / 16)
              u += 1
            }
            v += 1
          }
          val ref = math.max(0, math.min(255, math.round(acc / 4 + 128).toInt))
          assert(math.abs(out(y * 8 + x) - ref) <= 1,
            s"IDCT at ($x,$y): fixed-point ${out(y * 8 + x)} vs reference $ref")
          x += 1
        }
        y += 1
      }
    }
  }

  test("grayscale fixture decodes to the closed-form per-block pixels exactly") {
    Seq(0L, 1L, 7L, 12L, 1234567L).foreach { seed =>
      val data = Jpeg.grayFixture(seed)
      val (info, px) = Jpeg.decode(data).getOrElse(fail(s"seed $seed refused"))
      val w = (seed % 13 + 17).toInt
      val h = (seed % 11 + 17).toInt
      assert((info.width, info.height, info.channels) == (w, h, 1))
      val bw = (w + 7) / 8
      for (y <- 0 until h; x <- 0 until w) {
        val b = (y / 8).toLong * bw + (x / 8)
        val expect = ((seed * 7 + b * 29) % 256).toInt
        assert((px(y * w + x) & 0xFF) == expect,
          s"seed $seed pixel ($x,$y): got ${px(y * w + x) & 0xFF}, want $expect")
      }
    }
  }

  test("4:2:0 color fixture decodes to the closed-form fixed-point RGB exactly " +
      "(restart markers, predictor resets, chroma upsampling)") {
    def fxp(a: Int): Int = ((a + 32768 + 1073741824) >> 16) - 16384
    def clamp(v: Int): Int = math.max(0, math.min(255, v))
    Seq(0L, 3L, 11L, 999L, 424242L).foreach { seed =>
      val data = Jpeg.colorFixture(seed)
      val (info, px) = Jpeg.decode(data).getOrElse(fail(s"seed $seed refused"))
      val w = (seed % 17 + 20).toInt
      val h = (seed % 13 + 20).toInt
      assert((info.width, info.height, info.channels) == (w, h, 3))
      val mcusX = (w + 15) / 16
      val ybw = 2 * mcusX
      for (y <- 0 until h; x <- 0 until w) {
        val yb = (y / 8).toLong * ybw + (x / 8)
        val m = (y / 16).toLong * mcusX + (x / 16)
        val yv = ((seed * 11 + yb * 23) % 256).toInt
        val cbp = ((seed * 13 + m * 37) % 256).toInt - 128
        val crp = ((seed * 17 + m * 41) % 256).toInt - 128
        val er = clamp(yv + fxp(91881 * crp))
        val eg = clamp(yv - fxp(22554 * cbp + 46802 * crp))
        val eb = clamp(yv + fxp(116130 * cbp))
        val o = (y * w + x) * 3
        assert((px(o) & 0xFF, px(o + 1) & 0xFF, px(o + 2) & 0xFF) == ((er, eg, eb)),
          s"seed $seed pixel ($x,$y)")
      }
    }
  }

  test("restart interval does not change decoded pixels (same image with and " +
      "without DRI)") {
    val w = 36; val h = 33
    val mcusX = (w + 15) / 16
    val ybw = 2 * mcusX
    def yv(bx: Int, by: Int) = (by * ybw + bx) * 19 % 256
    def cb(m: Int) = (m * 31 + 7) % 256
    def cr(m: Int) = (m * 53 + 3) % 256
    val plain = Jpeg.decode(Jpeg.encodeColor420(w, h, yv, cb, cr, 0))
    val restarted = Jpeg.decode(Jpeg.encodeColor420(w, h, yv, cb, cr, 1))
    assert(plain.isDefined && restarted.isDefined)
    assert(plain.get._2.toSeq == restarted.get._2.toSeq,
      "DRI=1 (a restart after every MCU) must reproduce the DRI=0 pixels")
  }

  test("AC coefficients travel the bitstream exactly: runs, ZRL, EOB, negative " +
      "amplitudes reproduce idctBlock's output") {
    // one 8×8 image, one crafted block: a long zero run forcing ZRL, high
    // zigzag positions, ± amplitudes at several sizes, early EOB
    val coef = new Array[Int](64)
    coef(0) = 8 * (200 - 128) // DC
    coef(Jpeg.Zigzag(1)) = -1 // size 1, negative
    coef(Jpeg.Zigzag(5)) = 255 // size 8
    coef(Jpeg.Zigzag(22)) = -512 // size 10, negative (16-zero run → ZRL)
    coef(Jpeg.Zigzag(40)) = 3 // another ZRL stretch
    val expected = new Array[Int](64)
    Jpeg.idctBlock(coef, expected)
    val data = Jpeg.encodeGrayCoeffs(8, 8, Array(coef))
    val (info, px) = Jpeg.decode(data).getOrElse(fail("crafted block refused"))
    assert((info.width, info.height, info.channels) == (8, 8, 1))
    assert(px.map(_ & 0xFF).toSeq == expected.toSeq,
      "decoded pixels must equal the direct IDCT of the crafted coefficients")
  }

  test("byte stuffing round-trips: blocks whose entropy stream contains 0xFF " +
      "bytes decode exactly") {
    // scan many DC values so some huffman+amplitude byte patterns hit 0xFF
    val blocks = Array.tabulate(64) { i =>
      val c = new Array[Int](64)
      c(0) = 8 * (i * 4 - 128)
      c(Jpeg.Zigzag(1)) = (i % 16) - 8
      c
    }
    val data = Jpeg.encodeGrayCoeffs(64, 64, blocks)
    assert(Jpeg.decode(data).isDefined)
  }

  test("unsupported modes refuse: extended-sequential SOF1, arithmetic " +
      "SOF9, 12-bit precision, unknown sampling; a baseline stream " +
      "relabeled SOF2 decodes as a one-scan progressive file") {
    val base = Jpeg.grayFixture(5L)
    // locate SOF0 and mutate the marker / precision bytes
    def findMarker(d: Array[Byte], m: Int): Int = {
      var i = 2
      while (i + 4 <= d.length) {
        if ((d(i) & 0xFF) == 0xFF && (d(i + 1) & 0xFF) == m) return i
        val len = ((d(i + 2) & 0xFF) << 8) | (d(i + 3) & 0xFF)
        i += 2 + len
      }
      -1
    }
    val sof = findMarker(base, 0xC0)
    assert(sof > 0)
    val extSeq = base.clone(); extSeq(sof + 1) = 0xC1.toByte
    assert(Jpeg.decode(extSeq).isEmpty, "SOF1 must refuse")
    val arith = base.clone(); arith(sof + 1) = 0xC9.toByte
    assert(Jpeg.decode(arith).isEmpty, "SOF9 arithmetic must refuse")
    val twelveBit = base.clone(); twelveBit(sof + 4) = 12.toByte
    assert(Jpeg.decode(twelveBit).isEmpty, "12-bit precision must refuse")
    val badSampling = base.clone(); badSampling(sof + 10) = 0x31.toByte
    assert(Jpeg.decode(badSampling).isEmpty, "H=3 sampling must refuse")
    assert(Jpeg.dims(extSeq).isEmpty && Jpeg.dims(twelveBit).isEmpty)
    // SOF2 is SUPPORTED now: the relabeled stream enters the
    // progressive scan walk, whose validator still refuses it cleanly —
    // a baseline SOS carries spectral bounds 0..63, illegal for a
    // progressive scan (Ss=0 requires Se=0)
    val relabel = base.clone(); relabel(sof + 1) = 0xC2.toByte
    assert(Jpeg.decode(relabel).isEmpty,
      "baseline scan header inside SOF2 refuses via scan validation")
    assert(Jpeg.dims(relabel).contains(Jpeg.dims(base).get),
      "SOF2 dims now parse through the header path")
  }

  test("4:2:2 and 4:4:4 sampling decode exactly (generalized MCU geometry " +
      "and per-mode chroma upsampling)") {
    def fxp(a: Int): Int = ((a + 32768 + 1073741824) >> 16) - 16384
    def clamp(v: Int): Int = math.max(0, math.min(255, v))
    for ((hs, vs) <- Seq((2, 1), (1, 1))) {
      val w = 37; val h = 21 // partial edge MCUs in both axes
      val mcuW = 8 * hs; val mcuH = 8 * vs
      val mcusX = (w + mcuW - 1) / mcuW
      val ybw = hs * mcusX
      def yv(bx: Int, by: Int) = (by * ybw + bx) * 29 % 256
      def cb(m: Int) = (m * 17 + 40) % 256
      def cr(m: Int) = (m * 23 + 90) % 256
      val data = Jpeg.encodeColorSub(w, h, hs, vs, yv, cb, cr)
      val (info, px) = Jpeg.decode(data).getOrElse(fail(s"$hs x $vs refused"))
      assert((info.width, info.height, info.channels) == (w, h, 3))
      for (y <- 0 until h; x <- 0 until w) {
        val yval = yv(x / 8, y / 8)
        val m = (y / mcuH) * mcusX + (x / mcuW)
        val cbp = cb(m) - 128; val crp = cr(m) - 128
        val er = clamp(yval + fxp(91881 * crp))
        val eg = clamp(yval - fxp(22554 * cbp + 46802 * crp))
        val eb = clamp(yval + fxp(116130 * cbp))
        val o = (y * w + x) * 3
        assert((px(o) & 0xFF, px(o + 1) & 0xFF, px(o + 2) & 0xFF) == ((er, eg, eb)),
          s"$hs x $vs pixel ($x,$y)")
      }
    }
  }

  test("non-trivial quantization table: the decoder multiplies each " +
      "coefficient by ITS zigzag-positioned quant entry") {
    // quant entries vary by position so a transposed/linear-indexed
    // dequant lookup changes pixels
    val quant = Array.tabulate(64)(k => (k % 7) + 1) // zigzag order
    val coefQ = new Array[Int](64) // quantized values, natural order
    coefQ(0) = 40 // dequant → 40 * quant(0) = 40
    coefQ(Jpeg.Zigzag(3)) = 5 // dequant → 5 * quant(3) = 5*4
    coefQ(Jpeg.Zigzag(10)) = -7 // dequant → -7 * quant(10) = -7*4
    coefQ(Jpeg.Zigzag(30)) = 2 // → 2 * quant(30) = 2*3
    val dequant = new Array[Int](64)
    (0 until 64).foreach(k => dequant(Jpeg.Zigzag(k)) = coefQ(Jpeg.Zigzag(k)) * quant(k))
    val expected = new Array[Int](64)
    Jpeg.idctBlock(dequant, expected)
    val data = Jpeg.encodeGrayCoeffs(8, 8, Array(coefQ), quant = quant)
    val (_, px) = Jpeg.decode(data).getOrElse(fail("quantized block refused"))
    assert(px.map(_ & 0xFF).toSeq == expected.toSeq,
      "pixels must reflect per-zigzag-position dequantization")
  }

  test("variable-length canonical Huffman tables decode identically to the " +
      "flat tables (general Annex-C table build, not a fixed-width shortcut)") {
    // DC: 12 symbols over lengths 2/3/4/5; AC: 162 over lengths 6/7/8/9 —
    // both satisfy Kraft and neither assigns an all-ones code
    val dcCounts = Array(0, 1, 2, 3, 6, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0)
    val dcVals = (0 to 11).toArray
    val acCounts = Array(0, 0, 0, 0, 0, 10, 40, 80, 32, 0, 0, 0, 0, 0, 0, 0)
    val acVals = (0x00 +: 0xF0 +: (for (r <- 0 to 15; s <- 1 to 10)
      yield (r << 4) | s)).toArray
    val blocks = Array.tabulate(12) { i =>
      val c = new Array[Int](64)
      c(0) = 8 * (i * 20 - 100)
      c(Jpeg.Zigzag(1 + i % 5)) = i * 13 - 60
      c(Jpeg.Zigzag(40)) = -3 - i
      c
    }
    val flat = Jpeg.decode(Jpeg.encodeGrayCoeffs(32, 24, blocks))
      .getOrElse(fail("flat-table image refused"))
    val varlen = Jpeg.decode(Jpeg.encodeGrayCoeffs(32, 24, blocks,
        dcCounts = dcCounts, dcVals = dcVals,
        acCounts = acCounts, acVals = acVals))
      .getOrElse(fail("variable-length-table image refused"))
    assert(varlen._2.toSeq == flat._2.toSeq,
      "pixel output must be table-shape independent")
  }

  test("decode never throws on arbitrary bytes, truncations, or bit flips of " +
      "a valid payload (refuse-never-crash)") {
    val rnd = new scala.util.Random(20260814)
    (1 to 300).foreach { _ =>
      val n = rnd.nextInt(300)
      val junk = Array.fill[Byte](n)(rnd.nextInt(256).toByte)
      Jpeg.decode(junk) // must not throw
      Jpeg.decode(Array(0xFF.toByte, 0xD8.toByte) ++ junk)
      Jpeg.dims(Array(0xFF.toByte, 0xD8.toByte) ++ junk)
    }
    val valid = Jpeg.colorFixture(17L)
    assert(Jpeg.decode(valid).isDefined)
    (0 until valid.length).foreach { cut =>
      Jpeg.decode(valid.take(cut)) // every prefix
    }
    (1 to 500).foreach { _ =>
      val mut = valid.clone()
      mut(rnd.nextInt(mut.length)) =
        (mut(rnd.nextInt(mut.length)) ^ (1 << rnd.nextInt(8))).toByte
      Jpeg.decode(mut) // refuse or decode, never crash
    }
  }

  test("jpegMedia flows through decodeImages + decodePixels partition-wise " +
      "(geometry parsed, luminance over REAL decoded pixels)") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val ids = spark.range(0, 40).select(col("id").as("doc_id"))
    val media = Jpeg.jpegMedia(ids, "doc_id", "doc_id", color = true)
      .select(col("doc_id"), col("data"), col("meta.mime").as("mime"),
        col("meta.n_bytes").as("n_bytes")).as[Multimodal.MediaRow]
    val decoded = Multimodal.decodeImages(media).collect()
    assert(decoded.length == 40)
    decoded.foreach { d =>
      assert(d.width == (d.doc_id % 17 + 20).toInt &&
        d.height == (d.doc_id % 13 + 20).toInt && d.channels == 3,
        s"doc ${d.doc_id} geometry")
    }
    val stats = Multimodal.decodePixels(media).collect()
    assert(stats.length == 40)
    // spot-check one luminance total against the closed form
    def fxp(a: Int): Int = ((a + 32768 + 1073741824) >> 16) - 16384
    def clamp(v: Int): Int = math.max(0, math.min(255, v))
    val s7 = stats.find(_.doc_id == 7L).get
    val seed = 7L
    val w = (seed % 17 + 20).toInt; val h = (seed % 13 + 20).toInt
    val mcusX = (w + 15) / 16; val ybw = 2 * mcusX
    var lum = 0L
    for (y <- 0 until h; x <- 0 until w) {
      val yb = (y / 8).toLong * ybw + (x / 8)
      val m = (y / 16).toLong * mcusX + (x / 16)
      val yv = ((seed * 11 + yb * 23) % 256).toInt
      val cbp = ((seed * 13 + m * 37) % 256).toInt - 128
      val crp = ((seed * 17 + m * 41) % 256).toInt - 128
      lum += 299L * clamp(yv + fxp(91881 * crp)) +
        587L * clamp(yv - fxp(22554 * cbp + 46802 * crp)) +
        114L * clamp(yv + fxp(116130 * cbp))
    }
    assert(s7.lum_total == lum, "decodePixels luminance must match closed form")
  }

  test("EXIF-in-JPEG: APP1 tag 274 parses (LE and BE TIFF blobs, absent " +
      "tag defaults to 1, no-APP1 yields None); exifRotate applies the " +
      "correcting turns and refuses mirrored forms") {
    import spark.implicits._
    val w = 18; val h = 11; val bw = (w + 7) / 8
    def v(bx: Int, by: Int) = ((7 * 13 + (by * bw + bx) * 31) % 256)
    // orientation parse: all four rotation values round-trip
    for (ori <- Seq(1, 3, 6, 8))
      assert(Jpeg.exifOrientation(
        Jpeg.encodeGrayExif(w, h, v, ori)).contains(ori))
    // plain JPEG (no APP1): None
    assert(Jpeg.exifOrientation(Jpeg.encodeGray(w, h, v)).isEmpty)
    // BE (MM) TIFF blob: hand-assemble APP1 with big-endian layout
    locally {
      val base = Jpeg.encodeGray(w, h, v)
      val tiff = Array[Byte]('M', 'M', 0, 42, 0, 0, 0, 8,
        0, 1, 1, 18, 0, 3, 0, 0, 0, 1, 0, 6, 0, 0, 0, 0, 0, 0)
      val app1Body = "Exif".getBytes("US-ASCII") ++ Array[Byte](0, 0) ++ tiff
      val len = app1Body.length + 2
      val jpg = base.take(2) ++ Array[Byte](0xFF.toByte, 0xE1.toByte,
        ((len >> 8) & 0xFF).toByte, (len & 0xFF).toByte) ++ app1Body ++
        base.drop(2)
      assert(Jpeg.exifOrientation(jpg).contains(6), "MM byte order")
    }
    // EXIF blob WITHOUT tag 274: spec default orientation 1
    locally {
      val base = Jpeg.encodeGray(w, h, v)
      val tiff = Array[Byte]('I', 'I', 42, 0, 8, 0, 0, 0,
        1, 0, 0x1A, 1, 3, 0, 1, 0, 0, 0, 72, 0, 0, 0, // XResolution-ish
        0, 0, 0, 0)
      val app1Body = "Exif".getBytes("US-ASCII") ++ Array[Byte](0, 0) ++ tiff
      val len = app1Body.length + 2
      val jpg = base.take(2) ++ Array[Byte](0xFF.toByte, 0xE1.toByte,
        ((len >> 8) & 0xFF).toByte, (len & 0xFF).toByte) ++ app1Body ++
        base.drop(2)
      assert(Jpeg.exifOrientation(jpg).contains(1))
    }
    // rotate: ori 6 swaps dims and moves the bottom-left block to tl
    locally {
      val media = Seq(Multimodal.MediaRow(1L,
        Jpeg.encodeGrayExif(w, h, v, 6), "image/jpeg", 0L)).toDS()
      val row = Jpeg.exifRotate(media).collect().head
      assert(row.out_w == h && row.out_h == w && row.orientation == 6)
      assert(row.tl == 1000L * v(0, (h - 1) / 8),
        "tl after one CW turn = original bottom-left")
    }
    // mirrored orientation (2): no row, never a wrong rotation
    locally {
      val media = Seq(Multimodal.MediaRow(2L,
        Jpeg.encodeGrayExif(w, h, v, 2), "image/jpeg", 0L)).toDS()
      assert(Jpeg.exifRotate(media).count() == 0L)
    }
  }
}

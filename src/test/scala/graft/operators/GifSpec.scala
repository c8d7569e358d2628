package graft.operators

import scala.util.Random

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** GIF codec laws. The fixture leg (clear-code-heavy byte-aligned LZW)
  * is what the oracle checks; THIS spec pins the general decoder on
  * real dictionary-growing streams via a reference encoder: compress →
  * [[Gif.decode]] must reproduce the exact palette-expanded pixels,
  * across width growth, KwKwK, dictionary resets at 4096, and sub-block
  * fragmentation. Refusal edges (interlace, truncation, palette
  * overrun, missing table) and container edges (extension skipping,
  * first-frame-of-animation) are pinned explicitly.
  */
class GifSpec extends SparkTestBase {

  /** Reference GIF-LZW encoder: grows code width exactly when the
    * decoder does (avail hits 2^codeSize), emits CLEAR + resets at
    * dictionary exhaustion.
    */
  private def lzwEncode(idx: Array[Byte], minCodeSize: Int): Array[Byte] = {
    val clear = 1 << minCodeSize
    val eoi = clear + 1
    val bos = new java.io.ByteArrayOutputStream()
    var bitBuf = 0L
    var nBits = 0
    var codeSize = minCodeSize + 1
    def put(code: Int): Unit = {
      bitBuf |= code.toLong << nBits
      nBits += codeSize
      while (nBits >= 8) {
        bos.write((bitBuf & 0xFF).toInt); bitBuf >>>= 8; nBits -= 8
      }
    }
    var dict = collection.mutable.HashMap[(Int, Byte), Int]()
    var avail = eoi + 1
    def reset(): Unit = { dict = collection.mutable.HashMap(); avail = eoi + 1 }
    put(clear)
    var cur = -1
    idx.foreach { b =>
      if (cur < 0) cur = b & 0xFF
      else dict.get((cur, b)) match {
        case Some(c) => cur = c
        case None =>
          put(cur)
          dict((cur, b)) = avail
          avail += 1
          // the encoder's free-code counter leads the decoder's by one
          // (the decoder inserts nothing for the first post-clear code),
          // so the width grows one insert later than the decoder's
          // avail == 2^codeSize check — the canonical GIF off-by-one
          if (avail == (1 << codeSize) + 1 && codeSize < 12) codeSize += 1
          if (avail == 4096) {
            put(clear); codeSize = minCodeSize + 1; reset()
          }
          cur = b & 0xFF
      }
    }
    if (cur >= 0) put(cur)
    put(eoi)
    if (nBits > 0) bos.write((bitBuf & 0xFF).toInt)
    bos.toByteArray
  }

  /** Assemble a complete single-image GIF89a around an encoded stream. */
  private def buildGif(w: Int, h: Int, palBits: Int, pal: Array[Byte],
                       idx: Array[Byte], interlaced: Boolean = false,
                       prependExt: Boolean = false): Array[Byte] = {
    val minCodeSize = math.max(2, palBits)
    val lzw = lzwEncode(idx, minCodeSize)
    val bos = new java.io.ByteArrayOutputStream()
    def le16(v: Int): Unit = { bos.write(v & 0xFF); bos.write((v >> 8) & 0xFF) }
    bos.write("GIF89a".getBytes("US-ASCII"))
    le16(w); le16(h)
    bos.write(0x80 | (palBits - 1)) // GCT present, 2^palBits entries
    bos.write(0); bos.write(0)
    bos.write(pal, 0, 3 * (1 << palBits))
    if (prependExt) { // graphic-control extension to skip
      bos.write(Array[Byte](0x21, 0xF9.toByte, 4, 0, 0, 0, 0, 0), 0, 8)
    }
    bos.write(0x2C); le16(0); le16(0); le16(w); le16(h)
    bos.write(if (interlaced) 0x40 else 0x00)
    bos.write(minCodeSize)
    var off = 0
    while (off < lzw.length) {
      val n = math.min(255, lzw.length - off)
      bos.write(n); bos.write(lzw, off, n); off += n
    }
    bos.write(0); bos.write(0x3B)
    bos.toByteArray
  }

  private def expand(pal: Array[Byte], idx: Array[Byte]): Array[Byte] =
    idx.flatMap(i => Seq(pal(3 * (i & 0xFF)), pal(3 * (i & 0xFF) + 1),
      pal(3 * (i & 0xFF) + 2)))

  private def randPal(bits: Int, rnd: Random): Array[Byte] =
    Array.fill(3 * (1 << bits))(rnd.nextInt(256).toByte)

  test("random streams round-trip the real encoder: width growth, " +
      "sub-block fragmentation, 4096-reset") {
    val rnd = new Random(7)
    // 100x80 = 8000 px over 16 colors: dictionary passes 512/1024
    // entries (width 10+), stream spans many 255-byte sub-blocks
    for ((w, h, bits) <- Seq((100, 80, 4), (37, 23, 6), (9, 8, 2))) {
      val pal = randPal(bits, rnd)
      val idx = Array.fill(w * h)(rnd.nextInt(1 << bits).toByte)
      val gif = buildGif(w, h, bits, pal, idx)
      val Some((info, px)) = Gif.decode(gif)
      assert((info.width, info.height, info.channels) == (w, h, 3))
      assert(px.sameElements(expand(pal, idx)), s"${w}x$h/$bits px mismatch")
      assert(Gif.dims(gif).contains((w, h, 3)))
    }
  }

  test("run-heavy stream exercises the KwKwK (code == avail) path") {
    val pal = randPal(2, new Random(1))
    // constant image: encoder immediately emits KwKwK chains
    val idx = Array.fill(40 * 30)(3.toByte)
    val Some((_, px)) = Gif.decode(buildGif(40, 30, 2, pal, idx))
    assert(px.sameElements(expand(pal, idx)))
    // alternating pairs: mixed fresh/KwKwK inserts
    val idx2 = Array.tabulate(64 * 64)(i => ((i / 3) % 4).toByte)
    val Some((_, px2)) = Gif.decode(buildGif(64, 64, 2, pal, idx2))
    assert(px2.sameElements(expand(pal, idx2)))
  }

  test("forced dictionary exhaustion resets cleanly mid-image") {
    val rnd = new Random(42)
    val pal = randPal(7, rnd)
    // 128 colors, 120x110 = 13200 px of noise: dictionary hits 4096,
    // encoder clears, decode must resynchronize
    val idx = Array.fill(120 * 110)(rnd.nextInt(128).toByte)
    val Some((_, px)) = Gif.decode(buildGif(120, 110, 7, pal, idx))
    assert(px.sameElements(expand(pal, idx)))
  }

  test("extension blocks are skipped; animations decode the first frame") {
    val rnd = new Random(3)
    val pal = randPal(4, rnd)
    val idx = Array.fill(12 * 10)(rnd.nextInt(16).toByte)
    val withExt = buildGif(12, 10, 4, pal, idx, prependExt = true)
    val Some((_, px)) = Gif.decode(withExt)
    assert(px.sameElements(expand(pal, idx)))
    // splice a second frame before the trailer: first frame must win
    val f1 = withExt.dropRight(1)
    val f2 = buildGif(12, 10, 4, pal,
      Array.fill(12 * 10)(rnd.nextInt(16).toByte)).drop(13 + 3 * 16)
    val anim = f1 ++ f2
    val Some((_, pxA)) = Gif.decode(anim)
    assert(pxA.sameElements(expand(pal, idx)), "must decode FIRST frame")
  }

  test("refusals: interlace, truncation, palette overrun, no color table") {
    val rnd = new Random(9)
    val pal = randPal(4, rnd)
    val idx = Array.fill(16 * 16)(rnd.nextInt(16).toByte)
    assert(Gif.decode(buildGif(16, 16, 4, pal, idx,
      interlaced = true)).isEmpty, "interlaced must refuse")
    val good = buildGif(16, 16, 4, pal, idx)
    for (cut <- Seq(good.length / 2, good.length - 3))
      assert(Gif.decode(good.take(cut)).isEmpty, s"truncated at $cut")
    // code stream references index 5 with a 4-entry palette
    val overrun = buildGif(4, 4, 2, randPal(2, rnd),
      Array.fill(16)(3.toByte))
    // patch palette size down: packed 0x80|1 => 4 entries stays; craft
    // directly instead: minCodeSize 7 stream over a 4-entry table
    val bos = new java.io.ByteArrayOutputStream()
    bos.write("GIF89a".getBytes("US-ASCII"))
    bos.write(Array[Byte](4, 0, 4, 0, 0x81.toByte, 0, 0)) // GCT 4 entries
    bos.write(new Array[Byte](12)) // palette
    bos.write(Array[Byte](0x2C, 0, 0, 0, 0, 4, 0, 4, 0, 0))
    bos.write(7) // minCodeSize 7: literals up to 127 exceed the table
    val lzw = (0 until 16).flatMap(_ => Seq(0x80.toByte, 5.toByte)) :+
      0x81.toByte
    bos.write(lzw.length); bos.write(lzw.toArray)
    bos.write(0); bos.write(0x3B)
    assert(Gif.decode(bos.toByteArray).isEmpty, "palette overrun")
    assert(Gif.decode(overrun).nonEmpty, "control: in-range indices decode")
    // header claims no GCT and the image has no LCT
    val noTable = good.clone()
    noTable(10) = (noTable(10) & 0x7F).toByte
    assert(Gif.decode(noTable).isEmpty, "missing color table")
  }

  /** Assemble a multi-frame GIF89a with per-frame GCE (disposal, delay,
    * transparency) around REAL dictionary-growing LZW streams.
    */
  private def buildAnim(sw: Int, sh: Int, palBits: Int, pal: Array[Byte],
      frames: Seq[(Int, Int, Int, Int, Array[Byte], Int, Int, Int)])
      : Array[Byte] = {
    // frame = (left, top, w, h, indices, disposal, delayCs, transparent)
    val minCodeSize = math.max(2, palBits)
    val bos = new java.io.ByteArrayOutputStream()
    def le16(v: Int): Unit = { bos.write(v & 0xFF); bos.write((v >> 8) & 0xFF) }
    bos.write("GIF89a".getBytes("US-ASCII"))
    le16(sw); le16(sh)
    bos.write(0x80 | (palBits - 1))
    bos.write(0); bos.write(0) // background index 0
    bos.write(pal, 0, 3 * (1 << palBits))
    frames.foreach { case (l, t, w, h, idx, disp, delay, trans) =>
      bos.write(0x21); bos.write(0xF9); bos.write(4)
      bos.write((disp << 2) | (if (trans >= 0) 1 else 0))
      le16(delay)
      bos.write(math.max(trans, 0)); bos.write(0)
      bos.write(0x2C); le16(l); le16(t); le16(w); le16(h); bos.write(0)
      bos.write(minCodeSize)
      val lzw = lzwEncode(idx, minCodeSize)
      var off = 0
      while (off < lzw.length) {
        val n = math.min(255, lzw.length - off)
        bos.write(n); bos.write(lzw, off, n); off += n
      }
      bos.write(0)
    }
    bos.write(0x3B)
    bos.toByteArray
  }

  /** Reference compositor mirroring the GIF89a disposal semantics. */
  private def refComposite(sw: Int, sh: Int, pal: Array[Byte], bg: Int,
      frames: Seq[(Int, Int, Int, Int, Array[Byte], Int, Int, Int)])
      : Seq[Array[Byte]] = {
    val screen = Array.tabulate(sw * sh * 3)(i =>
      pal(3 * bg + i % 3))
    val out = collection.mutable.ArrayBuffer.empty[Array[Byte]]
    frames.foreach { case (l, t, w, h, idx, disp, _, trans) =>
      val before = screen.clone()
      for (q <- idx.indices) {
        val j = idx(q) & 0xFF
        if (j != trans) {
          val o = ((t + q / w) * sw + (l + q % w)) * 3
          screen(o) = pal(3 * j); screen(o + 1) = pal(3 * j + 1)
          screen(o + 2) = pal(3 * j + 2)
        }
      }
      out += screen.clone()
      if (disp == 2) {
        for (yy <- t until t + h; xx <- l until l + w) {
          val o = (yy * sw + xx) * 3
          screen(o) = pal(3 * bg); screen(o + 1) = pal(3 * bg + 1)
          screen(o + 2) = pal(3 * bg + 2)
        }
      } else if (disp == 3) {
        System.arraycopy(before, 0, screen, 0, screen.length)
      }
    }
    out.toSeq
  }

  test("decodeFrames composites multi-frame animations exactly: keep, " +
      "restore-to-background, restore-to-previous, transparency — " +
      "against the reference compositor on dictionary-growing streams") {
    val rnd = new Random(4242L)
    val pal = randPal(5, rnd)
    for (trial <- 1 to 6) {
      val sw = 14 + rnd.nextInt(8)
      val sh = 12 + rnd.nextInt(6)
      def rect(maxW: Int, maxH: Int) = {
        val w = 2 + rnd.nextInt(maxW - 2)
        val h = 2 + rnd.nextInt(maxH - 2)
        (rnd.nextInt(sw - w), rnd.nextInt(sh - h), w, h)
      }
      val frames = (0 until 4).map { k =>
        val (l, t, w, h) =
          if (k == 0) (0, 0, sw, sh) else rect(sw / 2 + 2, sh / 2 + 2)
        val idx = Array.fill(w * h)(rnd.nextInt(32).toByte)
        val disp = Seq(1, 2, 3, 0)(k)
        val trans = if (k == 2) 7 else -1
        (l, t, w, h, idx, disp, 10 * (k + 1), trans)
      }
      val bytes = buildAnim(sw, sh, 5, pal, frames)
      val got = Gif.decodeFrames(bytes)
      assert(got.isDefined, s"trial $trial refused")
      val (gw, gh, fs) = got.get
      assert(gw == sw && gh == sh && fs.length == 4)
      assert(fs.map(_.delayCs) == Seq(10, 20, 30, 40))
      val expect = refComposite(sw, sh, pal, 0, frames)
      fs.zip(expect).zipWithIndex.foreach { case ((f, e), k) =>
        assert(java.util.Arrays.equals(f.px, e),
          s"trial $trial frame $k composite differs")
      }
      // first-frame contract unchanged: decode() sees frame 0's image
      val single = Gif.decode(bytes)
      assert(single.isDefined)
      assert(java.util.Arrays.equals(single.get._2, expect.head))
    }
  }

  test("animFixture decodes to 3 frames with the closed-form composited " +
      "values and survives truncation/bit-flip fuzz") {
    for (seed <- 0L to 8L) {
      val bytes = Gif.animFixture(seed)
      val (w, h, fs) = Gif.decodeFrames(bytes).get
      assert(w == (seed % 5 + 10).toInt && h == (seed % 4 + 10).toInt)
      assert(fs.map(_.delayCs) == Seq(10, 20, 30))
      def palAt(j: Int): (Int, Int, Int) =
        ((j * 2 + 5) % 256, (j * 7 + 11) % 256, (j * 13 + 17) % 256)
      // frame-2 pixel (x, y): latest covering frame wins, transparent 13
      // falls through — the oracle CASE replicated here per pixel
      val f2 = fs(2).px
      for (y <- 0 until h; x <- 0 until w) {
        val p = y * w + x
        val j =
          if (x >= 1 && x < w - 1 && y >= 1 && y < 5 &&
              (seed * 37 + ((y - 1) * (w - 2) + (x - 1)) * 17 + 3) % 128 != 13)
            ((seed * 37 + ((y - 1) * (w - 2) + (x - 1)) * 17 + 3) % 128).toInt
          else if (x >= 2 && x < w - 2 && y >= 3 && y < h - 2)
            ((seed * 31 + ((y - 3) * (w - 4) + (x - 2)) * 19 + 7) % 128).toInt
          else ((seed * 29 + p * 23) % 128).toInt
        val (r, g, b) = palAt(j)
        assert((f2(p * 3) & 0xFF) == r && (f2(p * 3 + 1) & 0xFF) == g &&
          (f2(p * 3 + 2) & 0xFF) == b, s"seed=$seed ($x,$y)")
      }
    }
    // refuse-never-crash over the animated container
    val base = Gif.animFixture(3L)
    for (len <- 0 until base.length by 5) {
      val t = java.util.Arrays.copyOf(base, len)
      try Gif.decodeFrames(t) catch {
        case e: Throwable => fail(s"truncation at $len threw $e")
      }
    }
    val rnd = new Random(7L)
    for (_ <- 1 to 300) {
      val c = base.clone()
      val i = rnd.nextInt(c.length)
      c(i) = (c(i) ^ (1 << rnd.nextInt(8))).toByte
      try Gif.decodeFrames(c) catch {
        case e: Throwable => fail(s"bit flip at $i threw $e")
      }
    }
  }

  test("gifMedia fixtures decode to the closed-form pixels the oracle sums") {
    import spark.implicits._
    val ids = Seq(5L, 17L, 123L).toDF("doc_id")
    val media = Gif.gifMedia(ids, "doc_id", "doc_id")
      .select(col("doc_id"), col("data")).collect()
    media.foreach { r =>
      val seed = r.getLong(0)
      val data = r.getAs[Array[Byte]](1)
      val (w, h) = ((seed % 5 + 8).toInt, (seed % 4 + 8).toInt)
      val Some((info, px)) = Gif.decode(data)
      assert((info.width, info.height) == (w, h))
      var lum = 0L
      var expLum = 0L
      px.grouped(3).zipWithIndex.foreach { case (rgb, i) =>
        lum += 299L * (rgb(0) & 0xFF) + 587L * (rgb(1) & 0xFF) +
          114L * (rgb(2) & 0xFF)
        val j = ((seed * 29 + i * 23 + (seed * i) % 127) % 128).toInt
        expLum += 299L * ((j * 2 + 5) % 256) + 587L * ((j * 7 + 11) % 256) +
          114L * ((j * 13 + 17) % 256)
      }
      assert(lum == expLum, s"doc $seed luminance")
    }
  }
}

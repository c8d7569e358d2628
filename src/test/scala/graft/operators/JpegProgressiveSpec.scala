package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** Progressive (SOF2) JPEG: Annex-G scan machinery pinned against the
  * baseline decoder on identical coefficient content.
  */
class JpegProgressiveSpec extends AnyFunSuite {

  private def rng(seed: Long): () => Long = {
    var s = seed
    () => { s = s * 6364136223846793005L + 1442695040888963407L; s >>> 16 }
  }

  private def randomBlocks(seed: Long, n: Int, maxAbs: Int,
                           density: Int): Array[Array[Int]] = {
    val r = rng(seed)
    Array.fill(n) {
      val c = new Array[Int](64)
      c(0) = (r() % (2 * maxAbs + 1)).toInt - maxAbs
      var i = 1
      while (i < 64) {
        if (r() % 100 < density)
          c(i) = ((r() % (2 * maxAbs + 1)).toInt - maxAbs) match {
            case 0 => 1
            case v => v
          }
        i += 1
      }
      c
    }
  }

  test("progressive decode equals baseline decode on random coefficient " +
      "grids (bands, successive approximation, restarts)") {
    for (seed <- 1L to 12L) {
      val w = (seed % 13 + 17).toInt
      val h = (seed % 11 + 17).toInt
      val n = ((w + 7) / 8) * ((h + 7) / 8)
      val blocks = randomBlocks(seed * 77, n, maxAbs = 200,
        density = (4 + seed % 30).toInt)
      val base = Jpeg.decode(Jpeg.encodeGrayCoeffs(w, h, blocks))
      assert(base.isDefined, s"baseline decode failed seed=$seed")
      val variants = Seq(
        Jpeg.encodeGrayProgressiveCoeffs(w, h, blocks),
        Jpeg.encodeGrayProgressiveCoeffs(w, h, blocks,
          bands = Seq((1, 5), (6, 20), (21, 63)), dcAl = 2, acAl = 2),
        Jpeg.encodeGrayProgressiveCoeffs(w, h, blocks,
          bands = Seq((1, 63)), dcAl = 0, acAl = 0),
        Jpeg.encodeGrayProgressiveCoeffs(w, h, blocks,
          bands = Seq((1, 2), (3, 63)), dcAl = 3, acAl = 1,
          restartInterval = 2))
      variants.zipWithIndex.foreach { case (bytes, vi) =>
        val got = Jpeg.decode(bytes)
        assert(got.isDefined, s"progressive decode refused seed=$seed v$vi")
        assert(got.get._1 == base.get._1, s"info mismatch seed=$seed v$vi")
        assert(java.util.Arrays.equals(got.get._2, base.get._2),
          s"pixels differ seed=$seed variant=$vi")
      }
    }
  }

  test("progressive color 4:2:0 (interleaved DC + per-component AC " +
      "scans) equals the baseline color encoding") {
    for (seed <- 1L to 6L) {
      val w = (seed % 17 + 20).toInt
      val h = (seed % 13 + 20).toInt
      val mcusX = (w + 15) / 16
      val ybw = 2 * mcusX
      def yv(bx: Int, by: Int) =
        ((seed * 11 + (by.toLong * ybw + bx) * 23) % 256).toInt
      def cb(m: Int) = ((seed * 13 + m.toLong * 37) % 256).toInt
      def cr(m: Int) = ((seed * 17 + m.toLong * 41) % 256).toInt
      val base = Jpeg.decode(Jpeg.encodeColor420(w, h, yv, cb, cr))
      val prog = Jpeg.decode(Jpeg.encodeColorProgressive420(w, h, yv, cb, cr))
      assert(base.isDefined && prog.isDefined, s"decode refused seed=$seed")
      assert(prog.get._1 == base.get._1)
      assert(java.util.Arrays.equals(prog.get._2, base.get._2),
        s"color pixels differ seed=$seed")
    }
  }

  test("progressive fixture decodes to the closed-form block constants " +
      "and reports SOF2 dims through the header path") {
    for (seed <- 0L to 20L) {
      val bytes = Jpeg.progressiveGrayFixture(seed)
      val w = (seed % 12 + 17).toInt
      val h = (seed % 10 + 17).toInt
      assert(Jpeg.dims(bytes).contains((w, h, 1)))
      val (info, px) = Jpeg.decode(bytes).get
      assert(info.width == w && info.height == h && info.channels == 1)
      val bw = (w + 7) / 8
      for (y <- 0 until h; x <- 0 until w) {
        val expect = ((seed * 19 + ((y / 8) * bw + x / 8).toLong * 31) % 256).toInt
        assert((px(y * w + x) & 0xFF) == expect,
          s"seed=$seed ($x,$y): got ${px(y * w + x) & 0xFF}, want $expect")
      }
    }
  }

  test("progressive refuse-never-crash: truncation prefixes and bit " +
      "flips return None, never throw") {
    val base = Jpeg.progressiveGrayFixture(5L)
    // every truncation prefix
    for (len <- 0 until base.length by 7) {
      val t = java.util.Arrays.copyOf(base, len)
      try Jpeg.decode(t) catch {
        case e: Throwable => fail(s"truncation at $len threw $e")
      }
    }
    // scattered bit flips
    val r = rng(99L)
    for (_ <- 1 to 400) {
      val c = base.clone()
      val i = (r() % c.length).toInt
      c(i) = (c(i) ^ (1 << (r() % 8).toInt)).toByte
      try Jpeg.decode(c) catch {
        case e: Throwable => fail(s"bit flip at $i threw $e")
      }
    }
  }
}

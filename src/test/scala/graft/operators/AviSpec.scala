package graft.operators

import graft.SparkTestBase

/** Pins for the AVI/MJPEG container leg: fixture decode against the
  * closed form, container-walk details (word alignment, audio-chunk
  * skip, `rec ` recursion, idx1 indifference), the non-MJPEG refusal
  * contract, and refuse-never-crash fuzz (the PNG/JPEG precedent).
  */
class AviSpec extends SparkTestBase {

  /** Driver-side replay of the fixture's closed form. */
  private def expectedLum(seed: Long, f: Int): Long = {
    val w = (seed % 13 + 17).toInt
    val h = (seed % 11 + 17).toInt
    val bw = (w + 7) / 8
    var lum = 0L
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val blk = (y / 8) * bw + x / 8
        lum += 1000L * ((((seed * 7 + blk.toLong * 29) % 96) + f +
          (if (f >= 2) 128 else 0)))
        x += 1
      }
      y += 1
    }
    lum
  }

  test("fixture decodes to 4 frames matching the closed form; geometry " +
      "and frame rate come from avih") {
    for (seed <- Seq(1L, 7L, 42L, 1001L)) {
      val v = Avi.decodeFrames(Avi.aviFixture(seed))
        .getOrElse(fail(s"fixture $seed refused"))
      assert(v.width == (seed % 13 + 17).toInt)
      assert(v.height == (seed % 11 + 17).toInt)
      assert(v.usPerFrame == 40000)
      assert(v.frames.size == 4)
      v.frames.zipWithIndex.foreach { case (jpeg, f) =>
        val (info, buf) = Jpeg.decode(jpeg)
          .getOrElse(fail(s"frame $f of seed $seed refused"))
        assert(info.width == v.width && info.height == v.height)
        var lum = 0L
        var i = 0
        while (i < v.width * v.height) {
          lum += 1000L * (buf(info.pixelOffset +
            (i / v.width) * info.rowStride + i % v.width) & 0xFF)
          i += 1
        }
        assert(lum == expectedLum(seed, f),
          s"frame $f of seed $seed: per-block closed form")
      }
    }
  }

  test("the walk skips the odd JUNK chunk word-aligned and the " +
      "interleaved audio chunk; idx1 never contributes frames") {
    // the fixture already embeds all three — a walker that forgets the
    // alignment pad or treats 01wb/idx1 entries as video frames yields
    // a different frame count or refuses
    val v = Avi.decodeFrames(Avi.aviFixture(9L)).get
    assert(v.frames.size == 4)
  }

  test("frames inside a nested LIST 'rec ' are found (the interleaved-" +
      "chunk grouping real muxers emit)") {
    // rebuild the fixture with the movi frames wrapped in rec lists
    val base = Avi.aviFixture(3L)
    val v0 = Avi.decodeFrames(base).get
    // hand-build: RIFF(AVI (LIST hdrl ...)(LIST movi (LIST rec (00dc))×4))
    val out = new java.io.ByteArrayOutputStream()
    def cc(s: String): Unit = out.write(s.getBytes("US-ASCII"), 0, 4)
    def le32(x: Int): Unit = {
      out.write(x & 0xFF); out.write((x >> 8) & 0xFF)
      out.write((x >> 16) & 0xFF); out.write((x >> 24) & 0xFF)
    }
    val inner = new java.io.ByteArrayOutputStream()
    def icc(s: String): Unit = inner.write(s.getBytes("US-ASCII"), 0, 4)
    def ile32(x: Int): Unit = {
      inner.write(x & 0xFF); inner.write((x >> 8) & 0xFF)
      inner.write((x >> 16) & 0xFF); inner.write((x >> 24) & 0xFF)
    }
    // reuse the original hdrl LIST bytes: locate it in the fixture
    val hdrlStart = 12
    val hdrlLen = ((base(hdrlStart + 4) & 0xFF) |
      ((base(hdrlStart + 5) & 0xFF) << 8) |
      ((base(hdrlStart + 6) & 0xFF) << 16) |
      ((base(hdrlStart + 7) & 0xFF) << 24)) + 8
    icc("movi")
    v0.frames.foreach { j =>
      val rec = new java.io.ByteArrayOutputStream()
      rec.write("rec ".getBytes("US-ASCII"), 0, 4)
      rec.write("00dc".getBytes("US-ASCII"), 0, 4)
      var x = j.length
      rec.write(x & 0xFF); rec.write((x >> 8) & 0xFF)
      rec.write((x >> 16) & 0xFF); rec.write((x >> 24) & 0xFF)
      rec.write(j, 0, j.length)
      if ((j.length & 1) == 1) rec.write(0)
      icc("LIST"); ile32(rec.size())
      rec.writeTo(inner)
      if ((rec.size() & 1) == 1) inner.write(0)
    }
    val riffBody = new java.io.ByteArrayOutputStream()
    riffBody.write("AVI ".getBytes("US-ASCII"), 0, 4)
    riffBody.write(base, hdrlStart, hdrlLen + (hdrlLen & 1))
    riffBody.write("LIST".getBytes("US-ASCII"), 0, 4)
    val mv = inner.toByteArray
    riffBody.write(mv.length & 0xFF); riffBody.write((mv.length >> 8) & 0xFF)
    riffBody.write((mv.length >> 16) & 0xFF); riffBody.write((mv.length >> 24) & 0xFF)
    riffBody.write(mv, 0, mv.length)
    cc("RIFF"); le32(riffBody.size())
    riffBody.writeTo(out)
    val v = Avi.decodeFrames(out.toByteArray)
      .getOrElse(fail("rec-wrapped clip refused"))
    assert(v.frames.size == 4)
    assert(v.frames.zip(v0.frames).forall { case (a, b) =>
      java.util.Arrays.equals(a, b) })
  }

  test("a non-MJPG video handler refuses — never fabricates frames") {
    val base = Avi.aviFixture(5L)
    // strh's handler fourcc follows its 'vids' type: patch MJPG → cvid
    val s = new String(base, "ISO-8859-1")
    val at = s.indexOf("vids")
    assert(at > 0 && s.startsWith("MJPG", at + 4))
    val patched = base.clone()
    "cvid".getBytes("US-ASCII").copyToArray(patched, at + 4)
    assert(Avi.decodeFrames(patched).isEmpty)
  }

  test("a clip whose k-th frame JPEG is corrupt yields the refusal " +
      "marker, not shorter footage") {
    import spark.implicits._
    val base = Avi.aviFixture(11L)
    // clobber the LAST frame's SOI marker — that frame must REFUSE
    val v = Avi.decodeFrames(base).get
    val lastFrame = v.frames.last
    val pos = indexOfSub(base, lastFrame)
    val bad = base.clone()
    bad(pos) = 0x00
    val df = Avi.videoFrames(
      Seq((11L, bad)).toDF("doc_id", "data"))
    val rows = df.collect()
    assert(rows.length == 1 && rows(0).getAs[Int]("frame_idx") == -1)
  }

  private def indexOfSub(hay: Array[Byte], needle: Array[Byte]): Int = {
    var i = 0
    while (i + needle.length <= hay.length) {
      var j = 0
      while (j < needle.length && hay(i + j) == needle(j)) j += 1
      if (j == needle.length) return i
      i += 1
    }
    -1
  }

  test("refuse-never-crash fuzz: random bytes, truncations, and " +
      "bit flips of a valid clip always return None or decode") {
    val rnd = new scala.util.Random(20260815L)
    // pure noise
    (1 to 200).foreach { _ =>
      val b = new Array[Byte](rnd.nextInt(400))
      rnd.nextBytes(b)
      Avi.decodeFrames(b) // must not throw
    }
    val base = Avi.aviFixture(13L)
    // truncations at every boundary class
    (1 to 200).foreach { _ =>
      Avi.decodeFrames(java.util.Arrays.copyOf(base, rnd.nextInt(base.length)))
    }
    // single-byte flips
    (1 to 400).foreach { _ =>
      val b = base.clone()
      b(rnd.nextInt(b.length)) = (rnd.nextInt(256) - 128).toByte
      Avi.decodeFrames(b).foreach { v =>
        v.frames.foreach(Jpeg.decode) // frame decodes must not throw either
      }
      Avi.decodeAudio(b) // audio walk shares the refuse-never-crash bar
    }
  }

  // ---- audio track -------------------------------------------------------

  test("audio track decodes the closed-form PCM stream across the two " +
      "interleaved 01wb chunks; the undeclared-stream 03wb chunk " +
      "contributes nothing") {
    for (seed <- Seq(0L, 7L, 49L)) {
      val a = Avi.decodeAudio(Avi.aviFixture(seed)).get
      assert(a.channels == 1 && a.sampleRate == 8000)
      val n = (seed % 50 + 40).toInt
      assert(a.samples.length == n, s"seed=$seed")
      (0 until n).foreach { k =>
        val want = ((seed * 31 + k * 17) % 4001).toInt - 2000
        assert(a.samples(k) == want, s"seed=$seed sample $k")
      }
    }
  }

  test("a non-PCM wFormatTag (MP3 0x55), non-16-bit depth, and a torn " +
      "(odd-byte) payload each refuse — never fabricated samples") {
    val base = Avi.aviFixture(11L)
    // WAVEFORMATEX begins right after the audio strl's strf header; find
    // it via the auds fourcc: strh body starts at auds, strf chunk
    // follows 56-byte body + pad
    val s0 = new String(base, "ISO-8859-1")
    val at = s0.indexOf("auds")
    assert(at > 0)
    val strfBody = at + 56 + 8 // strh body(56) + strf id+len(8)
    assert(base(strfBody) == 1 && base(strfBody + 1) == 0, "PCM tag")
    locally { // MP3 tag
      val b = base.clone(); b(strfBody) = 0x55.toByte
      assert(Avi.decodeAudio(b).isEmpty)
      assert(Avi.decodeFrames(b).isDefined, "video leg unaffected")
    }
    locally { // 8-bit depth
      val b = base.clone(); b(strfBody + 14) = 8
      assert(Avi.decodeAudio(b).isEmpty)
    }
    locally { // torn payload: shrink the first 01wb chunk len to odd
      val wb = s0.indexOf("01wb")
      assert(wb > 0)
      val b = base.clone()
      // keep container consistent: bump len down by 1 making it odd and
      // leaving one stray byte the walk treats as the alignment pad
      val len = (b(wb + 4) & 0xFF) | ((b(wb + 5) & 0xFF) << 8)
      b(wb + 4) = ((len - 1) & 0xFF).toByte
      assert(Avi.decodeAudio(b).isEmpty)
    }
  }

  test("videoAudio joins both tracks per clip and emits the refusal " +
      "marker when the audio stream is broken") {
    import spark.implicits._
    val good = Seq((1L, Avi.aviFixture(5L))).toDF("doc_id", "data")
    val row = Avi.videoAudio(good).collect().head
    assert(row.getAs[Int]("n_frames") == 4 &&
      row.getAs[Int]("video_ms") == 160 &&
      row.getAs[Int]("sample_rate") == 8000 &&
      row.getAs[Long]("n_samples") == 45L &&
      row.getAs[Long]("audio_ms") == 5L)
    val broken = Avi.aviFixture(5L)
    val s1 = new String(broken, "ISO-8859-1")
    broken(s1.indexOf("auds") + 56 + 8) = 0x55.toByte
    val bad = Seq((2L, broken)).toDF("doc_id", "data")
    assert(Avi.videoAudio(bad).collect().head.getAs[Int]("n_frames") == -1)
  }
}

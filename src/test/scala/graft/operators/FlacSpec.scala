package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** Pins for the FLAC leg: lossless round-trip properties over random
  * 16-bit signals in every supported channel assignment, cross-format
  * parity with the WAV fixture's closed form, CRC tamper refusal, the
  * LPC / wasted-bits refusal contract, the Rice escape path, and
  * refuse-never-crash fuzz.
  */
class FlacSpec extends AnyFunSuite {

  private def roundTrip(channels: Int, samples: Array[Short],
                        mode: Int = 8): Flac.FlacAudio = {
    val enc = Flac.encode(channels, 8000, samples, mode)
    Flac.decode(enc).getOrElse(fail("round trip refused"))
  }

  test("lossless round trip: random signals, mono and all three stereo " +
      "decorrelations, including full-range extremes") {
    val rnd = new scala.util.Random(0xF1AC)
    for (mode <- Seq(8, 9, 10); trial <- 1 to 5) {
      val ch = if (trial % 2 == 0) 1 else 2
      val n = (50 + rnd.nextInt(300)) * ch
      val s = Array.tabulate[Short](n)(_ => rnd.nextInt(65536).toShort)
      // plant the extremes so sign handling is pinned at the edges
      s(0) = Short.MinValue; s(n - 1) = Short.MaxValue
      val a = roundTrip(ch, s, mode)
      assert(a.channels == ch && a.nFrames == n / ch)
      assert(a.samples.map(_.toShort).sameElements(s),
        s"mode $mode trial $trial must be bit-exact")
    }
  }

  test("smooth signals take the Rice path, noise the escape path — " +
      "both decode exactly") {
    // a ramp has tiny order-2 residuals (pure Rice); alternating
    // extremes have |residual| ~ 2^17 and must escape to raw
    val ramp = Array.tabulate[Short](300)(i => (i - 150).toShort)
    assert(roundTrip(1, ramp).samples.map(_.toShort).sameElements(ramp))
    val wild = Array.tabulate[Short](300)(i =>
      if (i % 2 == 0) Short.MinValue else Short.MaxValue)
    assert(roundTrip(1, wild).samples.map(_.toShort).sameElements(wild))
  }

  test("the FLAC fixture reproduces the WAV fixture's samples exactly " +
      "(cross-format parity — the mm_flac_decode contract)") {
    for (seed <- Seq(0L, 1L, 2L, 3L, 4L, 5L)) {
      val flac = Flac.decode(Flac.flacFixture(seed)).get
      val wav = Wav.wavFixture(seed)
      val info = Wav.decodeHeader(wav).get
      assert(flac.channels == info.channels)
      assert(flac.sampleRate == info.sampleRate)
      assert(flac.nFrames == info.nFrames)
      var i = 0
      while (i < flac.samples.length) {
        val p = info.dataOffset + 2 * i
        val w = ((wav(p) & 0xFF) | (wav(p + 1) << 8)).toShort.toInt
        assert(flac.samples(i) == w, s"seed $seed sample $i")
        i += 1
      }
    }
  }

  test("a flipped bit anywhere in a frame fails its CRC and refuses — " +
      "never returns silently wrong samples") {
    val enc = Flac.encode(1, 8000,
      Array.tabulate[Short](200)(i => (i * 37).toShort))
    // find the first frame (after fLaC + STREAMINFO(38) + PADDING(9))
    val frameStart = 4 + 38 + 9
    assert((enc(frameStart) & 0xFF) == 0xFF, "frame sync position")
    var refused = 0
    for (off <- frameStart + 5 until math.min(frameStart + 40, enc.length)) {
      val bad = enc.clone()
      bad(off) = (bad(off) ^ 0x10).toByte
      if (Flac.decode(bad).isEmpty) refused += 1
      // a corruption that happens to keep both CRCs valid is
      // statistically impossible over this range; any decode here
      // would mean the CRCs are not actually checked
    }
    assert(refused == math.min(frameStart + 40, enc.length) - frameStart - 5)
  }

  test("LPC subframes and wasted bits refuse (documented subset), " +
      "never fabricate") {
    val enc = Flac.encode(1, 8000,
      Array.tabulate[Short](64)(i => i.toShort))
    val frameStart = 4 + 38 + 9
    // subframe header is the byte right after the 6-byte frame header
    // (sync 2 + codes 2 + frameno 1 + blocksize 1) + crc8 1 = offset 7
    val sub = frameStart + 7
    val orig = enc(sub)
    // FIXED order 2 = 0x14 (00 101000 >> 1): type bits live at bits 6..1
    assert(((orig >> 1) & 0x3F) == 10, "fixture emits FIXED order 2")
    val lpc = enc.clone()
    lpc(sub) = ((0x20 << 1) | (orig & 0x81)).toByte // LPC order 1
    assert(Flac.decode(lpc).isEmpty, "LPC must refuse")
    val wasted = enc.clone()
    wasted(sub) = (orig | 0x01).toByte // wasted-bits flag
    assert(Flac.decode(wasted).isEmpty, "wasted bits must refuse")
  }

  test("refuse-never-crash fuzz: noise, truncations, bit flips") {
    val rnd = new scala.util.Random(20260816L)
    (1 to 200).foreach { _ =>
      val b = new Array[Byte](rnd.nextInt(300))
      rnd.nextBytes(b)
      if (b.length > 4) { b(0) = 'f'; b(1) = 'L'; b(2) = 'a'; b(3) = 'C' }
      Flac.decode(b) // must not throw
    }
    val base = Flac.flacFixture(17L)
    (1 to 200).foreach { _ =>
      Flac.decode(java.util.Arrays.copyOf(base, rnd.nextInt(base.length)))
    }
    (1 to 400).foreach { _ =>
      val b = base.clone()
      b(rnd.nextInt(b.length)) = (rnd.nextInt(256) - 128).toByte
      Flac.decode(b) // refuse or decode, never crash
    }
  }
}

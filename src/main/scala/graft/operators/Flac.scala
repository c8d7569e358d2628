package graft.operators

import java.io.ByteArrayOutputStream

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** FLAC codec — the COMPRESSED audio leg beside [[Wav]]'s raw PCM
  * container, written from the public specification (the xiph format
  * description / RFC 9639) on zero media libraries. FLAC is the house
  * oracle style made into a file format: fixed linear predictors over
  * integers plus Rice-coded residuals — every step exact 64-bit integer
  * arithmetic, so decoded samples are bit-identical to the encoder
  * input and the same closed-form sample oracle that pins
  * `mm_wav_decode` pins the compressed leg.
  *
  * Decoder scope (refuse, never fabricate): `fLaC` magic + metadata
  * block walk (STREAMINFO parsed, others skipped), frames with the
  * 15-bit sync + CRC-8-verified headers and CRC-16-verified bodies,
  * UTF-8-coded frame numbers, 8/16-bit block-size fields and the
  * 576/256-tier tables, 16-bit samples only, subframe types CONSTANT /
  * VERBATIM / FIXED orders 0–4 (LPC subframes and wasted bits REFUSE —
  * the predictors whose reconstruction is exactly defined by small
  * integer recurrences), Rice methods 4- and 5-bit with partitioned
  * parameters and the escape-to-raw form, channel assignments
  * independent / left-side / right-side / mid-side.
  *
  * Scale: decode is partition-wise ([[flacStats]]) — per-payload frame
  * walk, nothing shuffles; per-doc features (energy, peak) accumulate
  * in the same pass.
  */
object Flac {

  // ---- CRCs (the spec's polynomials) --------------------------------------

  private val Crc8Table: Array[Int] = Array.tabulate(256) { i =>
    var c = i
    var k = 0
    while (k < 8) { c = if ((c & 0x80) != 0) ((c << 1) ^ 0x07) & 0xFF else (c << 1) & 0xFF; k += 1 }
    c
  }

  private val Crc16Table: Array[Int] = Array.tabulate(256) { i =>
    var c = i << 8
    var k = 0
    while (k < 8) {
      c = if ((c & 0x8000) != 0) ((c << 1) ^ 0x8005) & 0xFFFF
          else (c << 1) & 0xFFFF
      k += 1
    }
    c
  }

  private def crc8(d: Array[Byte], from: Int, until: Int): Int = {
    var c = 0
    var i = from
    while (i < until) { c = Crc8Table((c ^ d(i)) & 0xFF); i += 1 }
    c
  }

  private def crc16(d: Array[Byte], from: Int, until: Int): Int = {
    var c = 0
    var i = from
    while (i < until) {
      c = ((c << 8) ^ Crc16Table(((c >> 8) ^ (d(i) & 0xFF)) & 0xFF)) & 0xFFFF
      i += 1
    }
    c
  }

  // ---- bit IO (MSB-first, the FLAC bit order) -----------------------------

  private final class BitWriter {
    private val out = new ByteArrayOutputStream()
    private var acc = 0
    private var nBits = 0
    def bits(v: Long, n: Int): Unit = {
      var k = n - 1
      while (k >= 0) {
        acc = (acc << 1) | ((v >> k) & 1L).toInt
        nBits += 1
        if (nBits == 8) { out.write(acc); acc = 0; nBits = 0 }
        k -= 1
      }
    }
    def unary(q: Int): Unit = { bits(0L, q); bits(1L, 1) }
    def alignByte(): Unit = if (nBits > 0) bits(0L, 8 - nBits)
    def toByteArray: Array[Byte] = { alignByte(); out.toByteArray }
  }

  private final class BitReader(d: Array[Byte], var pos: Int) {
    private var bit = 0
    def bitPos: Long = pos.toLong * 8 + bit
    def read(n: Int): Long = {
      var v = 0L
      var k = 0
      while (k < n) {
        if (pos >= d.length) throw new Refused("eof")
        v = (v << 1) | ((d(pos) >> (7 - bit)) & 1)
        bit += 1
        if (bit == 8) { bit = 0; pos += 1 }
        k += 1
      }
      v
    }
    def readUnary(): Int = {
      var q = 0
      while (read(1) == 0L) {
        q += 1
        if (q > (1 << 20)) throw new Refused("runaway unary")
      }
      q
    }
    def alignByte(): Unit = if (bit != 0) { bit = 0; pos += 1 }
  }

  private final class Refused(msg: String) extends RuntimeException(msg)

  // ---- decoder -------------------------------------------------------------

  /** Decoded stream: interleaved samples, one Int per channel sample. */
  final case class FlacAudio(channels: Int, sampleRate: Int, nFrames: Int,
                             samples: Array[Int])

  private val BlockSizes = Array(-1, 192, 576, 1152, 2304, 4608, -8, -16,
    256, 512, 1024, 2048, 4096, 8192, 16384, 32768)

  /** The FIXED predictor reconstruction — the binomial-coefficient
    * recurrences the spec defines exactly over integers.
    */
  private def unpredict(order: Int, x: Array[Int], n: Int): Unit = {
    var i = order
    order match {
      case 0 =>
      case 1 => while (i < n) { x(i) += x(i - 1); i += 1 }
      case 2 => while (i < n) { x(i) += 2 * x(i - 1) - x(i - 2); i += 1 }
      case 3 => while (i < n) {
        x(i) += 3 * x(i - 1) - 3 * x(i - 2) + x(i - 3); i += 1 }
      case _ => while (i < n) {
        x(i) += 4 * x(i - 1) - 6 * x(i - 2) + 4 * x(i - 3) - x(i - 4); i += 1 }
    }
  }

  private def readUtf8Number(br: BitReader): Long = {
    val b0 = br.read(8).toInt
    if ((b0 & 0x80) == 0) return b0.toLong
    var cont = 0
    var mask = 0x40
    while ((b0 & mask) != 0) { cont += 1; mask >>= 1 }
    if (cont < 1 || cont > 6) throw new Refused("bad utf8 number")
    var v = (b0 & (mask - 1)).toLong
    var k = 0
    while (k < cont) {
      val b = br.read(8).toInt
      if ((b & 0xC0) != 0x80) throw new Refused("bad utf8 continuation")
      v = (v << 6) | (b & 0x3F)
      k += 1
    }
    v
  }

  /** One subframe: `bps`-bit samples into `out(0 until n)`. */
  private def readSubframe(br: BitReader, n: Int, bps: Int,
                           out: Array[Int]): Unit = {
    if (br.read(1) != 0L) throw new Refused("subframe pad bit")
    val tpe = br.read(6).toInt
    if (br.read(1) != 0L) throw new Refused("wasted bits unsupported")
    def signed(v: Long, bits: Int): Int = {
      val shift = 64 - bits
      ((v << shift) >> shift).toInt
    }
    if (tpe == 0) { // CONSTANT
      val v = signed(br.read(bps), bps)
      java.util.Arrays.fill(out, 0, n, v)
    } else if (tpe == 1) { // VERBATIM
      var i = 0
      while (i < n) { out(i) = signed(br.read(bps), bps); i += 1 }
    } else if (tpe >= 8 && tpe <= 12) { // FIXED order 0..4
      val order = tpe - 8
      var i = 0
      while (i < order) { out(i) = signed(br.read(bps), bps); i += 1 }
      readResiduals(br, n, order, out)
      unpredict(order, out, n)
    } else throw new Refused(s"subframe type $tpe unsupported (LPC)")
  }

  private def readResiduals(br: BitReader, n: Int, order: Int,
                            out: Array[Int]): Unit = {
    val method = br.read(2).toInt
    if (method > 1) throw new Refused("reserved residual method")
    val paramBits = if (method == 0) 4 else 5
    val escape = (1 << paramBits) - 1
    val partOrder = br.read(4).toInt
    val parts = 1 << partOrder
    if (n % parts != 0 || n / parts <= order)
      throw new Refused("bad partition order")
    var idx = order
    var p = 0
    while (p < parts) {
      val cnt = (n >> partOrder) - (if (p == 0) order else 0)
      val param = br.read(paramBits).toInt
      if (param == escape) {
        val raw = br.read(5).toInt
        var i = 0
        while (i < cnt) {
          val v = if (raw == 0) 0L else br.read(raw)
          val shift = 64 - math.max(raw, 1)
          out(idx) = if (raw == 0) 0 else ((v << shift) >> shift).toInt
          idx += 1; i += 1
        }
      } else {
        var i = 0
        while (i < cnt) {
          val q = br.readUnary()
          val r = if (param == 0) 0L else br.read(param)
          val u = (q.toLong << param) | r
          out(idx) = ((u >>> 1) ^ -(u & 1L)).toInt // zigzag unfold
          idx += 1; i += 1
        }
      }
      p += 1
    }
  }

  /** Full-stream decode; None on anything malformed or out of scope. */
  def decode(data: Array[Byte]): Option[FlacAudio] =
    try Some(decodeOrRefuse(data))
    catch {
      case _: Refused | _: ArrayIndexOutOfBoundsException |
           _: NegativeArraySizeException => None
    }

  private def decodeOrRefuse(data: Array[Byte]): FlacAudio = {
    if (data.length < 42 || data(0) != 'f' || data(1) != 'L' ||
        data(2) != 'a' || data(3) != 'C') throw new Refused("magic")
    // metadata walk: STREAMINFO mandatory first, others skipped
    var p = 4
    var sampleRate = -1
    var channels = -1
    var bps = -1
    var total = -1L
    var last = false
    var first = true
    while (!last) {
      if (p + 4 > data.length) throw new Refused("metadata eof")
      val hdr = data(p) & 0xFF
      last = (hdr & 0x80) != 0
      val tpe = hdr & 0x7F
      val len = ((data(p + 1) & 0xFF) << 16) | ((data(p + 2) & 0xFF) << 8) |
        (data(p + 3) & 0xFF)
      if (p + 4 + len > data.length) throw new Refused("metadata length")
      if (first) {
        if (tpe != 0 || len < 34) throw new Refused("no streaminfo")
        val br = new BitReader(data, p + 4)
        br.read(16); br.read(16) // min/max block size
        br.read(24); br.read(24) // min/max frame size
        sampleRate = br.read(20).toInt
        channels = br.read(3).toInt + 1
        bps = br.read(5).toInt + 1
        total = br.read(36)
        if (sampleRate <= 0 || bps != 16) throw new Refused("non-16-bit")
        first = false
      }
      p += 4 + len
    }
    if (total <= 0 || total > (1L << 31) / channels)
      throw new Refused("stream length")
    val samples = new Array[Int](total.toInt * channels)
    var got = 0L
    while (got < total) {
      val frameStart = p
      val br = new BitReader(data, p)
      if (br.read(14) != 0x3FFE) throw new Refused("sync")
      if (br.read(1) != 0L) throw new Refused("reserved bit")
      br.read(1) // blocking strategy
      val bsCode = br.read(4).toInt
      val srCode = br.read(4).toInt
      val chAsgn = br.read(4).toInt
      val ssCode = br.read(3).toInt
      if (br.read(1) != 0L) throw new Refused("reserved bit 2")
      readUtf8Number(br)
      val blockSize = bsCode match {
        case 0 => throw new Refused("reserved block size")
        case 6 => br.read(8).toInt + 1
        case 7 => br.read(16).toInt + 1
        case c => BlockSizes(c)
      }
      if (srCode == 15) throw new Refused("invalid sample rate code")
      if (ssCode != 4 && ssCode != 0) throw new Refused("non-16-bit frame")
      // CRC-8 covers the header bytes read so far
      br.alignByte()
      val hdrCrc = br.read(8).toInt
      if (crc8(data, frameStart, br.pos - 1) != hdrCrc)
        throw new Refused("header crc")
      val nCh = if (chAsgn < 8) chAsgn + 1 else 2
      if (nCh != channels) throw new Refused("channel count mismatch")
      if (chAsgn > 10) throw new Refused("reserved channel assignment")
      val bs = math.min(blockSize.toLong, total - got).toInt
      if (bs != blockSize) throw new Refused("padded final frame")
      val chan = Array.ofDim[Int](nCh, blockSize)
      var c = 0
      while (c < nCh) {
        // side channels carry one extra bit of range
        val extra = chAsgn match {
          case 8 if c == 1 => 1 // left/side
          case 9 if c == 0 => 1 // right/side
          case 10 if c == 1 => 1 // mid/side
          case _ => 0
        }
        readSubframe(br, blockSize, bps + extra, chan(c))
        c += 1
      }
      br.alignByte()
      val bodyCrc = br.read(16).toInt
      if (crc16(data, frameStart, br.pos - 2) != bodyCrc)
        throw new Refused("frame crc")
      // channel decorrelation (the spec's exact integer reconstruction)
      var i = 0
      while (i < blockSize) {
        chAsgn match {
          case 8 => // left/side: right = left - side
            val l = chan(0)(i); val s = chan(1)(i)
            chan(1)(i) = l - s
          case 9 => // right/side: left = right + side
            val r = chan(1)(i); val s = chan(0)(i)
            chan(0)(i) = r + s; chan(1)(i) = r
          case 10 => // mid/side
            val s = chan(1)(i)
            var m = (chan(0)(i) << 1) | (s & 1)
            chan(0)(i) = (m + s) >> 1
            chan(1)(i) = (m - s) >> 1
          case _ =>
        }
        var cc = 0
        while (cc < nCh) {
          samples((got.toInt + i) * nCh + cc) = chan(cc)(i)
          cc += 1
        }
        i += 1
      }
      got += blockSize
      p = br.pos
    }
    FlacAudio(channels, sampleRate, total.toInt, samples)
  }

  // ---- encoder (reference fixture surface) ---------------------------------

  /** Encode 16-bit PCM losslessly: STREAMINFO + a skippable PADDING
    * block, fixed 64-sample frames (8-bit block-size field), FIXED
    * order-2 subframes with single-partition Rice residuals (escape
    * form when residuals need it), stereo as LEFT/SIDE. Exact by
    * construction — decode(encode(x)) == x for every 16-bit signal.
    */
  def encode(channels: Int, sampleRate: Int, samples: Array[Short],
             stereoMode: Int = 8): Array[Byte] = {
    require(channels >= 1 && channels <= 2)
    require(stereoMode >= 8 && stereoMode <= 10)
    require(samples.length % channels == 0)
    val nFrames = samples.length / channels
    val out = new ByteArrayOutputStream()
    out.write("fLaC".getBytes("US-ASCII"), 0, 4)
    // STREAMINFO (not last)
    val si = new BitWriter
    si.bits(64, 16); si.bits(64, 16) // min/max block size
    si.bits(0, 24); si.bits(0, 24)   // min/max frame size (unknown)
    si.bits(sampleRate.toLong, 20)
    si.bits(channels - 1L, 3)
    si.bits(15L, 5) // bps - 1
    si.bits(nFrames.toLong, 36)
    val md5 = java.security.MessageDigest.getInstance("MD5")
    samples.foreach { s => md5.update((s & 0xFF).toByte)
      md5.update(((s >> 8) & 0xFF).toByte) }
    val siBytes = si.toByteArray ++ md5.digest()
    out.write(0x00); out.write(0); out.write(0); out.write(siBytes.length)
    out.write(siBytes, 0, siBytes.length)
    // PADDING block (last) — decoders must walk past it
    out.write(0x81); out.write(0); out.write(0); out.write(5)
    out.write(new Array[Byte](5), 0, 5)

    val blockSize = 64
    var frameNo = 0L
    var off = 0
    while (off < nFrames) {
      val bs = math.min(blockSize, nFrames - off)
      val chAsgn = if (channels == 1) 0 else stereoMode
      val chanData: Array[Array[Int]] =
        if (channels == 1)
          Array(Array.tabulate(bs)(i => samples(off + i).toInt))
        else {
          val l = Array.tabulate(bs)(i => samples((off + i) * 2).toInt)
          val r = Array.tabulate(bs)(i => samples((off + i) * 2 + 1).toInt)
          val side = Array.tabulate(bs)(i => l(i) - r(i))
          stereoMode match {
            case 8 => Array(l, side) // left/side
            case 9 => Array(side, r) // right/side
            case _ => // mid/side: mid = floor((l+r)/2)
              Array(Array.tabulate(bs)(i => (l(i) + r(i)) >> 1), side)
          }
        }
      val bw = new BitWriter
      bw.bits(0x3FFE, 14); bw.bits(0, 1); bw.bits(0, 1) // sync, res, fixed
      bw.bits(6, 4)  // block size: 8-bit field follows
      bw.bits(0, 4)  // sample rate: from STREAMINFO
      bw.bits(chAsgn.toLong, 4)
      bw.bits(4, 3)  // sample size: 16-bit
      bw.bits(0, 1)
      writeUtf8Number(bw, frameNo)
      bw.bits(bs - 1L, 8)
      val hdrBytes = bw.toByteArray // byte-aligned already
      val hdr = new ByteArrayOutputStream()
      hdr.write(hdrBytes, 0, hdrBytes.length)
      hdr.write(crc8(hdrBytes, 0, hdrBytes.length))
      val body = new BitWriter
      var c = 0
      while (c < channels) {
        // the side channel carries one extra bit of range (the decoder's
        // mirror rule): 8 → channel 1, 9 → channel 0, 10 → channel 1
        val extra = chAsgn match {
          case 8 | 10 if c == 1 => 1
          case 9 if c == 0 => 1
          case _ => 0
        }
        writeFixedSubframe(body, chanData(c), 16 + extra)
        c += 1
      }
      val frame = hdr.toByteArray ++ body.toByteArray
      val fc = crc16(frame, 0, frame.length)
      out.write(frame, 0, frame.length)
      out.write((fc >> 8) & 0xFF); out.write(fc & 0xFF)
      frameNo += 1
      off += bs
    }
    out.toByteArray
  }

  private def writeUtf8Number(bw: BitWriter, v: Long): Unit =
    if (v < 0x80) bw.bits(v, 8)
    else if (v < 0x800) {
      bw.bits(0xC0L | (v >> 6), 8); bw.bits(0x80L | (v & 0x3F), 8)
    } else {
      bw.bits(0xE0L | (v >> 12), 8)
      bw.bits(0x80L | ((v >> 6) & 0x3F), 8)
      bw.bits(0x80L | (v & 0x3F), 8)
    }

  /** FIXED order-2 subframe (order 0 for blocks too short), one Rice
    * partition, parameter sized to the residual range (escape to raw
    * when even param 14 would blow up the unary run).
    */
  private def writeFixedSubframe(bw: BitWriter, x: Array[Int],
                                 bps: Int): Unit = {
    val n = x.length
    val order = if (n > 2) 2 else 0
    bw.bits(0, 1)
    bw.bits(8L + order, 6)
    bw.bits(0, 1) // no wasted bits
    var i = 0
    while (i < order) { bw.bits(x(i).toLong & ((1L << bps) - 1), bps); i += 1 }
    val res = new Array[Long](n - order)
    i = order
    while (i < n) {
      val pred = order match {
        case 0 => 0L
        case _ => 2L * x(i - 1) - x(i - 2)
      }
      res(i - order) = x(i) - pred
      i += 1
    }
    var maxU = 0L
    res.foreach { r => val u = (r << 1) ^ (r >> 63); if (u > maxU) maxU = u }
    var param = 0
    while ((maxU >> param) > 15 && param < 14) param += 1
    bw.bits(0, 2) // 4-bit rice method
    bw.bits(0, 4) // partition order 0
    if ((maxU >> param) > 15) { // escape to raw
      val rawBits = 64 - java.lang.Long.numberOfLeadingZeros(
        math.max(1L, maxU)) + 1
      bw.bits(15, 4)
      bw.bits(rawBits.toLong, 5)
      res.foreach(r => bw.bits(r & ((1L << rawBits) - 1), rawBits.toInt))
    } else {
      bw.bits(param.toLong, 4)
      res.foreach { r =>
        val u = (r << 1) ^ (r >> 63)
        bw.unary((u >>> param).toInt)
        if (param > 0) bw.bits(u & ((1L << param) - 1), param)
      }
    }
  }

  // ---- the query surface ----------------------------------------------------

  final case class FlacStatsRow(doc_id: Long, channels: Int,
                                sample_rate: Int, n_frames: Long,
                                energy: Long, peak: Int)

  /** Partition-wise decode + the [[Wav.wavStats]] features over the
    * reconstructed samples — identical output contract, compressed
    * input.
    */
  def flacStats(media: Dataset[Multimodal.MediaRow]): Dataset[FlacStatsRow] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.flatMap { r =>
        decode(r.data).map { a =>
          var energy = 0L
          var peak = 0
          var i = 0
          while (i < a.samples.length) {
            val s = a.samples(i)
            energy += s.toLong * s
            val m = math.abs(s)
            if (m > peak) peak = m
            i += 1
          }
          FlacStatsRow(r.doc_id, a.channels, a.sampleRate,
            a.nFrames.toLong, energy, peak)
        }
      }
    }
  }

  /** Fixture: the SAME closed-form samples as [[Wav.wavFixture]]
    * (channels = 1 + seed mod 2, rate = 8000 + 4000·(seed mod 3),
    * frames = 200 + seed mod 50, interleaved word i =
    * `((seed·13 + i·29) mod 65536) − 32768`) round-tripped through the
    * reference encoder — so the WAV oracle IS the FLAC oracle, and any
    * predictor/Rice/CRC/decorrelation mistake breaks the parity.
    */
  def flacFixture(seed: Long): Array[Byte] = {
    val channels = (1 + seed % 2).toInt
    val rate = (8000 + 4000 * (seed % 3)).toInt
    val frames = (200 + seed % 50).toInt
    val samples = Array.tabulate[Short](frames * channels)(i =>
      (((seed * 13 + i.toLong * 29) % 65536) - 32768).toShort)
    encode(channels, rate, samples)
  }

  /** Deterministic FLAC payload column (the [[Wav.wavMedia]] shape). */
  def flacMedia(ids: DataFrame, idCol: String, seedCol: String): DataFrame = {
    val spark = ids.sparkSession
    import spark.implicits._
    Spread.ifNarrow(ids.select(
        col(idCol).cast("long").as("doc_id"),
        col(seedCol).cast("long").as("seed")))
      .as[(Long, Long)]
      .mapPartitions(_.map { case (id, seed) => (id, flacFixture(seed)) })
      .toDF("doc_id", "data")
      .select(col("doc_id"), col("data"),
        struct(lit("audio/flac").as("mime"),
          octet_length(col("data")).cast("long").as("n_bytes")).as("meta"))
  }
}

package graft.operators

import java.io.ByteArrayOutputStream

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Baseline JFIF (JPEG) codec on public JVM APIs only — the dominant
  * real-world media format and the compressed-DCT leg of the real-decode
  * pipeline ([[Multimodal]] holds the raw PPM/BMP and PNG legs).
  *
  * Everything here is the public ITU-T T.81 baseline sequential process:
  * canonical Huffman tables built from DHT exactly as Annex C specifies,
  * zigzag coefficient order generated from the diagonal walk, per-block
  * dequantization, a fixed-point integer IDCT, 2×2/1×1 chroma subsampling
  * with sample-replication upsampling, and the fixed-point BT.601
  * YCbCr→RGB conversion. No media library exists in this environment, so
  * the codec is written from the spec — which is also what makes it
  * oracle-gateable: every arithmetic step is integer-exact, so an external
  * engine reproduces decoded pixels in closed form for fixtures built from
  * per-block-constant images (a constant block survives
  * quantize(1)/dequantize/IDCT bit-exactly, see [[idctBlock]]).
  *
  * Decoder contract (the [[Multimodal.decodePng]] convention): REFUSE,
  * never fabricate and never throw — malformed framing, non-baseline
  * modes (progressive SOF2, arithmetic coding, 12-bit precision, unknown
  * sampling factors), truncated entropy data, or out-of-bound dimensions
  * all return None. Supported surface: SOF0 baseline, 8-bit, 1 component
  * (grayscale) or 3 components (YCbCr) with sampling factors in {1, 2}
  * (covers 4:4:4, 4:2:2, 4:2:0), restart markers, byte stuffing, multiple
  * tables per DQT/DHT segment, APPn/COM skipping.
  *
  * Scale: decode runs partition-wise inside [[Multimodal.decodePixels]]'s
  * iterator loop — one table build per image, all work row-local, nothing
  * shuffles; a 100 TB media lake decodes embarrassingly parallel.
  */
object Jpeg {

  /** Internal refusal signal — caught at the decode boundary. Stackless:
    * refusals are the expected path on malformed input, not diagnostics.
    */
  private final class Refused extends RuntimeException(null, null, false, false)
  private def refuse(): Nothing = throw new Refused

  /** Zigzag scan order: entry k is the natural (row-major v·8+u) index of
    * the k-th coefficient in scan order. Generated from the diagonal walk
    * (odd diagonals top→down-left, even diagonals bottom→up-right) rather
    * than transcribed — the generator IS the spec's figure.
    */
  private[operators] val Zigzag: Array[Int] = {
    val out = for {
      d <- 0 to 14
      vs = math.max(0, d - 7) to math.min(7, d)
      v <- if (d % 2 == 1) vs else vs.reverse
    } yield v * 8 + (d - v)
    out.toArray
  }

  /** Fixed-point IDCT basis: `W(u)(x) = round(C(u)·cos((2x+1)uπ/16)·2048)`
    * with C(0)=1/√2. Scale 2048 keeps the full 2-D sum in Long
    * (|F| ≤ ~2^18 after dequant, 64 terms × 2048² → < 2^44) and makes the
    * DC-only case exact: a block whose only coefficient is F(0,0)=8c
    * reconstructs to exactly c for every c ∈ [−128, 127] (W(0)·W(0)·8 =
    * 16773632 ≈ 2^24 with error < 2^−11, inside the rounding bias) — the
    * property the closed-form oracle fixtures rely on. StrictMath pins the
    * table bit-for-bit on any JVM.
    */
  private[operators] val W: Array[Array[Long]] = Array.tabulate(8, 8) { (u, x) =>
    val c = if (u == 0) 1.0 / StrictMath.sqrt(2.0) else 1.0
    Math.round(StrictMath.cos(StrictMath.PI * (2 * x + 1) * u / 16.0) * c * 2048.0)
  }

  /** Integer IDCT of one 8×8 block (natural-order dequantized
    * coefficients) → level-shifted, clamped samples 0..255.
    * `s(x,y) = clamp(128 + (Σ F(u,v)·W(u)(x)·W(v)(y) + 2^23) >> 24)` —
    * the direct O(64²) form: exactness analysis stays one line, and at
    * fixture scale (≤ 40×40 px) the separable two-pass rewrite is noise.
    */
  private[operators] def idctBlock(coef: Array[Int], out: Array[Int]): Unit = {
    var y = 0
    while (y < 8) {
      var x = 0
      while (x < 8) {
        var acc = 0L
        var v = 0
        while (v < 8) {
          val wv = W(v)(y)
          var u = 0
          val rowBase = v * 8
          while (u < 8) {
            val f = coef(rowBase + u)
            if (f != 0) acc += f * W(u)(x) * wv
            u += 1
          }
          v += 1
        }
        val s = 128 + ((acc + (1L << 23)) >> 24).toInt
        out(y * 8 + x) = if (s < 0) 0 else if (s > 255) 255 else s
        x += 1
      }
      y += 1
    }
  }

  // ---------------------------------------------------------------------
  // Canonical Huffman tables (T.81 Annex C build, shared encode/decode)
  // ---------------------------------------------------------------------

  /** counts(i) = number of codes of length i+1 (i ∈ 0..15); vals in
    * code-increasing order. Canonical assignment: codes of each length are
    * consecutive, starting from (prev end) << 1.
    */
  private[operators] final class HuffTable(counts: Array[Int], vals: Array[Int]) {
    require(counts.length == 16 && counts.sum == vals.length)
    private val minCode = new Array[Int](17)
    private val maxCode = Array.fill(17)(-1) // -1 = no codes at this length
    private val valPtr = new Array[Int](17)
    // symbol → (code, len) for the encoder
    private val encCode = new Array[Int](256)
    private val encLen = new Array[Int](256)
    locally {
      var code = 0
      var k = 0
      var len = 1
      while (len <= 16) {
        valPtr(len) = k
        minCode(len) = code
        var i = 0
        while (i < counts(len - 1)) {
          val sym = vals(k) & 0xFF
          encCode(sym) = code
          encLen(sym) = len
          code += 1; k += 1; i += 1
        }
        if (counts(len - 1) > 0) maxCode(len) = code - 1
        code <<= 1
        len += 1
      }
    }
    def decode(br: BitReader): Int = {
      var code = 0
      var len = 0
      while (len < 16) {
        code = (code << 1) | br.bit()
        len += 1
        if (maxCode(len) >= 0 && code <= maxCode(len))
          return vals(valPtr(len) + code - minCode(len)) & 0xFF
      }
      refuse()
    }
    def write(bw: BitWriter, sym: Int): Unit = {
      val l = encLen(sym)
      if (l == 0) refuse() // symbol not in table — fixture bug, not data
      bw.put(encCode(sym), l)
    }
  }

  /** Flat canonical tables for the ENCODER (any valid DHT works — the
    * decoder always builds its tables from the file): DC categories 0..11
    * as twelve 4-bit codes; the full AC alphabet (EOB, ZRL, all
    * (run 0..15, size 1..10)) as 162 eight-bit codes. Neither assigns an
    * all-ones code, satisfying the T.81 constraint.
    */
  private val DcCounts: Array[Int] =
    Array(0, 0, 0, 12, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0)
  private val DcVals: Array[Int] = (0 to 11).toArray
  private val AcCounts: Array[Int] =
    Array(0, 0, 0, 0, 0, 0, 0, 162, 0, 0, 0, 0, 0, 0, 0, 0)
  private val AcVals: Array[Int] =
    (0x00 +: 0xF0 +: (for (r <- 0 to 15; s <- 1 to 10) yield (r << 4) | s)).toArray
  private val DcEnc = new HuffTable(DcCounts, DcVals)
  private val AcEnc = new HuffTable(AcCounts, AcVals)

  /** Progressive AC alphabet: the baseline 162 symbols plus the EOBn
    * run-length codes (r«4, r = 1..14) Annex G adds — 176 eight-bit
    * codes, still clear of the all-ones constraint.
    */
  private val AcProgCounts: Array[Int] =
    Array(0, 0, 0, 0, 0, 0, 0, 176, 0, 0, 0, 0, 0, 0, 0, 0)
  private val AcProgVals: Array[Int] =
    AcVals ++ (1 to 14).map(_ << 4)
  private val AcProgEnc = new HuffTable(AcProgCounts, AcProgVals)

  // ---------------------------------------------------------------------
  // Bit I/O with 0xFF byte stuffing
  // ---------------------------------------------------------------------

  private[operators] final class BitReader(data: Array[Byte], var pos: Int) {
    private var cur = 0
    private var n = 0
    def bit(): Int = {
      if (n == 0) {
        if (pos >= data.length) refuse()
        var b = data(pos) & 0xFF; pos += 1
        if (b == 0xFF) {
          if (pos >= data.length) refuse()
          if ((data(pos) & 0xFF) == 0x00) pos += 1 // stuffed 0xFF data byte
          else refuse() // marker inside entropy data: malformed scan
        }
        cur = b; n = 8
      }
      n -= 1
      (cur >> n) & 1
    }
    def bits(len: Int): Int = {
      var v = 0; var i = 0
      while (i < len) { v = (v << 1) | bit(); i += 1 }
      v
    }
    /** Byte-align and consume the expected RSTm marker. */
    def restartMarker(m: Int): Unit = {
      n = 0
      if (pos + 2 > data.length) refuse()
      if ((data(pos) & 0xFF) != 0xFF ||
          (data(pos + 1) & 0xFF) != (0xD0 + (m & 7))) refuse()
      pos += 2
    }
    /** Byte-align and verify the scan terminates at EOI (0xFF fill bytes
      * before the marker are legal padding).
      */
    def expectEoi(): Unit = {
      n = 0
      var p = pos
      while (p + 1 < data.length && (data(p) & 0xFF) == 0xFF &&
          (data(p + 1) & 0xFF) == 0xFF) p += 1
      if (p + 2 > data.length) refuse()
      if ((data(p) & 0xFF) != 0xFF || (data(p + 1) & 0xFF) != 0xD9) refuse()
    }
  }

  private[operators] final class BitWriter(out: ByteArrayOutputStream) {
    private var acc = 0
    private var n = 0
    def put(v: Int, len: Int): Unit = {
      var i = len - 1
      while (i >= 0) {
        acc = (acc << 1) | ((v >> i) & 1)
        n += 1
        if (n == 8) {
          out.write(acc & 0xFF)
          if ((acc & 0xFF) == 0xFF) out.write(0x00) // byte stuffing
          acc = 0; n = 0
        }
        i -= 1
      }
    }
    /** Pad the final partial byte with 1-bits (the spec's fill). */
    def flushPad(): Unit = while (n != 0) put(1, 1)
  }

  // ---------------------------------------------------------------------
  // Decoder
  // ---------------------------------------------------------------------

  private final case class Component(id: Int, h: Int, v: Int, tq: Int) {
    var dcTab: HuffTable = _
    var acTab: HuffTable = _
    var plane: Array[Int] = _
    var planeW: Int = 0
    var planeH: Int = 0
    var pred: Int = 0
    // progressive: RAW (unquantized) coefficients accumulated across
    // scans, 64 ints per block over the frame's MCU-padded block grid
    var coefs: Array[Int] = _
    var blocksW: Int = 0
    var blocksH: Int = 0
  }

  /** SOF dimensions only (the [[Multimodal.decodeImages]] header path):
    * (width, height, channels) without entropy decode.
    */
  def dims(data: Array[Byte]): Option[(Int, Int, Int)] =
    try {
      val st = parseHeaders(data, headerOnly = true)
      Some((st.w, st.h, st.comps.length))
    } catch { case _: Refused | _: IndexOutOfBoundsException => None }

  private final class State {
    var w = 0
    var h = 0
    var comps: Array[Component] = _
    var restartInterval = 0
    var scanStart = 0 // baseline: entropy offset after SOS;
                      // progressive: offset OF the first SOS marker
    var progressive = false
    val quant = new Array[Array[Int]](4)
    val huffDc = new Array[HuffTable](4)
    val huffAc = new Array[HuffTable](4)
    var scanOrder: Array[Component] = _
  }

  private def u16(d: Array[Byte], p: Int): Int =
    ((d(p) & 0xFF) << 8) | (d(p + 1) & 0xFF)

  /** DQT body: one or more 65-byte (8-bit precision) tables. Shared by
    * the header walk and the progressive between-scan walk.
    */
  private def parseDqt(data: Array[Byte], body: Int, bodyLen: Int,
                       st: State): Unit = {
    var q = body
    while (q < body + bodyLen) {
      val pq = (data(q) & 0xF0) >> 4
      val tq = data(q) & 0x0F
      if (pq != 0 || tq > 3) refuse() // 8-bit precision only
      if (q + 65 > body + bodyLen) refuse()
      val t = new Array[Int](64)
      var i = 0
      while (i < 64) { t(i) = data(q + 1 + i) & 0xFF; i += 1 }
      st.quant(tq) = t
      q += 65
    }
    if (q != body + bodyLen) refuse()
  }

  /** DHT body: one or more tables (class/id header, 16 counts, values).
    * Shared by the header walk and the progressive between-scan walk
    * (progressive files re-define tables between scans).
    */
  private def parseDht(data: Array[Byte], body: Int, bodyLen: Int,
                       st: State): Unit = {
    var q = body
    while (q < body + bodyLen) {
      val tc = (data(q) & 0xF0) >> 4
      val th = data(q) & 0x0F
      if (tc > 1 || th > 3) refuse()
      if (q + 17 > body + bodyLen) refuse()
      val counts = Array.tabulate(16)(i => data(q + 1 + i) & 0xFF)
      val nv = counts.sum
      if (nv == 0 || nv > 256 || q + 17 + nv > body + bodyLen) refuse()
      val vals = Array.tabulate(nv)(i => data(q + 17 + i) & 0xFF)
      val tab = new HuffTable(counts, vals)
      if (tc == 0) st.huffDc(th) = tab else st.huffAc(th) = tab
      q += 17 + nv
    }
    if (q != body + bodyLen) refuse()
  }

  /** Marker-segment walk up to (and through) SOS. Refuses non-baseline
    * SOFs, arithmetic coding, and any structural violation.
    */
  private def parseHeaders(data: Array[Byte], headerOnly: Boolean): State = {
    if (data.length < 4 || (data(0) & 0xFF) != 0xFF ||
        (data(1) & 0xFF) != 0xD8) refuse()
    val st = new State
    var p = 2
    var sofSeen = false
    while (true) {
      if (p + 4 > data.length) refuse()
      if ((data(p) & 0xFF) != 0xFF) refuse()
      val marker = data(p + 1) & 0xFF
      val len = u16(data, p + 2)
      if (len < 2 || p + 2 + len > data.length) refuse()
      val body = p + 4
      val bodyLen = len - 2
      marker match {
        case m if m >= 0xE0 && m <= 0xEF => // APPn: skip
        case 0xFE => // COM: skip
        case 0xDB => parseDqt(data, body, bodyLen, st)
        case 0xC4 => parseDht(data, body, bodyLen, st)
        case m @ (0xC0 | 0xC2) => // SOF0 baseline / SOF2 progressive
          if (sofSeen || bodyLen < 6) refuse()
          sofSeen = true
          st.progressive = m == 0xC2
          if ((data(body) & 0xFF) != 8) refuse() // 8-bit samples only
          st.h = u16(data, body + 1)
          st.w = u16(data, body + 3)
          val nc = data(body + 5) & 0xFF
          if (st.w <= 0 || st.h <= 0 || (nc != 1 && nc != 3)) refuse()
          // decode-target bound BEFORE allocating (hostile headers must
          // not OOM the task — the decodePng 64 MB convention)
          if (st.w.toLong * st.h * nc > (64L << 20)) refuse()
          if (bodyLen != 6 + 3 * nc) refuse()
          st.comps = Array.tabulate(nc) { i =>
            val o = body + 6 + 3 * i
            val hv = data(o + 1) & 0xFF
            val c = Component(data(o) & 0xFF, (hv >> 4) & 0xF, hv & 0xF,
              data(o + 2) & 0x0F)
            if (c.h < 1 || c.h > 2 || c.v < 1 || c.v > 2) refuse()
            c
          }
        case m if (m >= 0xC1 && m <= 0xCF) && m != 0xC4 =>
          refuse() // extended/arithmetic/lossless/DAC: unsupported
        case 0xDD => // DRI
          if (bodyLen != 2) refuse()
          st.restartInterval = u16(data, body)
        case 0xDA if st.progressive => // first SOS of a multi-scan file:
          if (!sofSeen) refuse()      // the scan walk re-parses from here
          st.scanStart = p
          return st
        case 0xDA => // SOS
          if (!sofSeen) refuse()
          val ns = data(body) & 0xFF
          if (ns != st.comps.length || bodyLen != 1 + 2 * ns + 3) refuse()
          st.scanOrder = Array.tabulate(ns) { i =>
            val cid = data(body + 1 + 2 * i) & 0xFF
            val c = st.comps.find(_.id == cid).getOrElse(refuse())
            val tt = data(body + 2 + 2 * i) & 0xFF
            c.dcTab = st.huffDc((tt >> 4) & 0xF)
            c.acTab = st.huffAc(tt & 0xF)
            if (c.dcTab == null || c.acTab == null) refuse()
            if (st.quant(c.tq) == null) refuse()
            c
          }
          // baseline spectral selection 0..63, no successive approximation
          if ((data(body + 1 + 2 * ns) & 0xFF) != 0 ||
              (data(body + 2 + 2 * ns) & 0xFF) != 63 ||
              (data(body + 3 + 2 * ns) & 0xFF) != 0) refuse()
          st.scanStart = body + bodyLen
          return st
        case _ => refuse()
      }
      p = body + bodyLen
      if (headerOnly && sofSeen) return st
    }
    st // unreachable
  }

  private def extend(v: Int, s: Int): Int =
    if (s == 0) 0 else if (v < (1 << (s - 1))) v - (1 << s) + 1 else v

  /** Decode one entropy-coded block: DC diff + AC run/size into
    * natural-order DEQUANTIZED coefficients.
    */
  private def decodeBlock(br: BitReader, c: Component, q: Array[Int],
                          coef: Array[Int]): Unit = {
    java.util.Arrays.fill(coef, 0)
    val t = c.dcTab.decode(br)
    if (t > 11) refuse()
    c.pred += extend(br.bits(t), t)
    coef(0) = c.pred * q(0)
    var k = 1
    while (k < 64) {
      val rs = c.acTab.decode(br)
      val s = rs & 0x0F
      if (s == 0) {
        if (rs == 0x00) k = 64 // EOB
        else if (rs == 0xF0) k += 16 // ZRL
        else refuse()
      } else {
        k += (rs >> 4) & 0x0F
        if (k > 63) refuse()
        coef(Zigzag(k)) = extend(br.bits(s), s) * q(k)
        k += 1
      }
    }
  }

  /** Full baseline decode → top-down, RGB (3 components) or grayscale
    * (1 component) pixel buffer with the [[Multimodal.ImageInfo]] over it,
    * the [[Multimodal.decodeToPixels]] contract. None on anything
    * malformed or unsupported.
    */
  def decode(data: Array[Byte]): Option[(Multimodal.ImageInfo, Array[Byte])] =
    try Some(decodeOrRefuse(data))
    catch {
      case _: Refused | _: IndexOutOfBoundsException |
           _: NegativeArraySizeException => None
    }

  private def decodeOrRefuse(
      data: Array[Byte]): (Multimodal.ImageInfo, Array[Byte]) = {
    val st = parseHeaders(data, headerOnly = false)
    if (st.progressive) return decodeProgressiveOrRefuse(data, st)
    val comps = st.comps
    val hMax = comps.map(_.h).max
    val vMax = comps.map(_.v).max
    val interleaved = comps.length > 1
    // MCU grid; single-component scans use the component's own 8×8 grid
    val (mcusX, mcusY) =
      if (interleaved) ((st.w + 8 * hMax - 1) / (8 * hMax),
        (st.h + 8 * vMax - 1) / (8 * vMax))
      else ((st.w + 7) / 8, (st.h + 7) / 8)
    comps.foreach { c =>
      c.planeW = if (interleaved) mcusX * c.h * 8 else mcusX * 8
      c.planeH = if (interleaved) mcusY * c.v * 8 else mcusY * 8
      if (c.planeW.toLong * c.planeH > (64L << 20)) refuse()
      c.plane = new Array[Int](c.planeW * c.planeH)
      c.pred = 0
    }
    val br = new BitReader(data, st.scanStart)
    val coef = new Array[Int](64)
    val px = new Array[Int](64)
    var rst = 0
    var sinceRestart = 0
    val totalMcus = mcusX * mcusY
    var m = 0
    while (m < totalMcus) {
      if (st.restartInterval > 0 && sinceRestart == st.restartInterval) {
        br.restartMarker(rst)
        rst = (rst + 1) & 7
        sinceRestart = 0
        comps.foreach(_.pred = 0)
      }
      val mx = m % mcusX
      val my = m / mcusX
      var ci = 0
      while (ci < st.scanOrder.length) {
        val c = st.scanOrder(ci)
        val q = st.quant(c.tq)
        val (bh, bv) = if (interleaved) (c.h, c.v) else (1, 1)
        var by = 0
        while (by < bv) {
          var bx = 0
          while (bx < bh) {
            decodeBlock(br, c, q, coef)
            idctBlock(coef, px)
            val ox = (mx * bh + bx) * 8
            val oy = (my * bv + by) * 8
            var yy = 0
            while (yy < 8) {
              val dst = (oy + yy) * c.planeW + ox
              var xx = 0
              while (xx < 8) { c.plane(dst + xx) = px(yy * 8 + xx); xx += 1 }
              yy += 1
            }
            bx += 1
          }
          by += 1
        }
        ci += 1
      }
      sinceRestart += 1
      m += 1
    }
    br.expectEoi()
    planesToPixels(st)
  }

  /** Component sample planes → the top-down RGB/grayscale output buffer
    * (replication upsampling + fixed-point BT.601). Shared by the
    * baseline and progressive paths.
    */
  private def planesToPixels(
      st: State): (Multimodal.ImageInfo, Array[Byte]) = {
    val comps = st.comps
    val hMax = comps.map(_.h).max
    val vMax = comps.map(_.v).max
    val w = st.w; val h = st.h
    val ch = comps.length
    val out = new Array[Byte](w * h * ch)
    if (ch == 1) {
      val c = comps(0)
      var y = 0
      while (y < h) {
        val src = y * c.planeW
        val dst = y * w
        var x = 0
        while (x < w) { out(dst + x) = c.plane(src + x).toByte; x += 1 }
        y += 1
      }
    } else {
      val cy = comps(0); val cb = comps(1); val cr = comps(2)
      // fixed-point BT.601, floor semantics made engine-portable by a
      // 2^30 bias (operands stay non-negative, so Java >> and any SQL
      // integer division agree); clamp to 0..255
      def fxp(a: Int): Int = ((a + 32768 + 1073741824) >> 16) - 16384
      def clamp(v: Int): Int = if (v < 0) 0 else if (v > 255) 255 else v
      var y = 0
      while (y < h) {
        val yRow = y * cy.planeW
        val bRow = (y * cb.v / vMax) * cb.planeW
        val rRow = (y * cr.v / vMax) * cr.planeW
        val dstRow = y * w * 3
        var x = 0
        while (x < w) {
          val yv = cy.plane(yRow + x * cy.h / hMax)
          val cbp = cb.plane(bRow + x * cb.h / hMax) - 128
          val crp = cr.plane(rRow + x * cr.h / hMax) - 128
          val d = dstRow + x * 3
          out(d) = clamp(yv + fxp(91881 * crp)).toByte
          out(d + 1) = clamp(yv - fxp(22554 * cbp + 46802 * crp)).toByte
          out(d + 2) = clamp(yv + fxp(116130 * cbp)).toByte
          x += 1
        }
        y += 1
      }
    }
    (Multimodal.ImageInfo(w, h, ch, 0, w * ch, bottomUp = false, bgr = false),
      out)
  }

  // ---------------------------------------------------------------------
  // Progressive decode (T.81 Annex G, spectral selection + successive
  // approximation, Huffman coding). Coefficients accumulate RAW across
  // scans in per-component block buffers; dequantize + IDCT run once at
  // EOI. DC scans may be interleaved; AC scans are single-component (the
  // spec's G.1.1.1.1 constraint, enforced).
  // ---------------------------------------------------------------------

  /** Per-scan mutable entropy state: the EOB run counter shared by AC
    * first/refinement passes (reset at scan start and at every restart
    * marker, like the DC predictors).
    */
  private final class ScanCtx {
    var eobrun = 0
  }

  private def decodeProgressiveOrRefuse(
      data: Array[Byte], st: State): (Multimodal.ImageInfo, Array[Byte]) = {
    val comps = st.comps
    val nc = comps.length
    val hMax = comps.map(_.h).max
    val vMax = comps.map(_.v).max
    val mcusX = (st.w + 8 * hMax - 1) / (8 * hMax)
    val mcusY = (st.h + 8 * vMax - 1) / (8 * vMax)
    comps.foreach { c =>
      c.blocksW = if (nc > 1) mcusX * c.h else (st.w + 7) / 8
      c.blocksH = if (nc > 1) mcusY * c.v else (st.h + 7) / 8
      // 64 ints/block = 1 int per padded pixel: the baseline plane bound
      if (c.blocksW.toLong * c.blocksH * 64 > (64L << 20)) refuse()
      c.coefs = new Array[Int](c.blocksW * c.blocksH * 64)
      c.pred = 0
    }
    var p = st.scanStart // at the 0xFF of the first SOS
    var sawEoi = false
    while (!sawEoi) {
      if (p + 2 > data.length) refuse()
      if ((data(p) & 0xFF) != 0xFF) refuse()
      val marker = data(p + 1) & 0xFF
      if (marker == 0xD9) sawEoi = true // EOI
      else {
        if (p + 4 > data.length) refuse()
        val len = u16(data, p + 2)
        if (len < 2 || p + 2 + len > data.length) refuse()
        val body = p + 4
        val bodyLen = len - 2
        marker match {
          case m if m >= 0xE0 && m <= 0xEF => p = body + bodyLen
          case 0xFE => p = body + bodyLen
          case 0xDB => parseDqt(data, body, bodyLen, st); p = body + bodyLen
          case 0xC4 => parseDht(data, body, bodyLen, st); p = body + bodyLen
          case 0xDD =>
            if (bodyLen != 2) refuse()
            st.restartInterval = u16(data, body)
            p = body + bodyLen
          case 0xDA =>
            p = decodeProgressiveScan(data, body, bodyLen, st, mcusX, mcusY)
          case _ => refuse()
        }
      }
    }
    // dequantize (quant stored in zigzag order, coefs in natural) + IDCT
    // every block into the MCU-padded sample planes, then the shared
    // plane→pixel conversion
    val dq = new Array[Int](64)
    val px = new Array[Int](64)
    comps.foreach { c =>
      val q = st.quant(c.tq)
      if (q == null) refuse()
      c.planeW = c.blocksW * 8
      c.planeH = c.blocksH * 8
      c.plane = new Array[Int](c.planeW * c.planeH)
      var b = 0
      val nBlocks = c.blocksW * c.blocksH
      while (b < nBlocks) {
        val base = b * 64
        var k = 0
        while (k < 64) {
          val nat = Zigzag(k)
          dq(nat) = c.coefs(base + nat) * q(k)
          k += 1
        }
        idctBlock(dq, px)
        val ox = (b % c.blocksW) * 8
        val oy = (b / c.blocksW) * 8
        var yy = 0
        while (yy < 8) {
          val dst = (oy + yy) * c.planeW + ox
          var xx = 0
          while (xx < 8) { c.plane(dst + xx) = px(yy * 8 + xx); xx += 1 }
          yy += 1
        }
        b += 1
      }
    }
    planesToPixels(st)
  }

  /** Decode one progressive SOS (header + entropy data); returns the
    * offset of the next marker. Validates the Annex-G scan constraints:
    * DC scans have Ss=Se=0 and may interleave; AC scans have ns=1 and
    * 1 ≤ Ss ≤ Se ≤ 63; refinements step the point transform by exactly
    * one bit (Ah = Al + 1).
    */
  private def decodeProgressiveScan(data: Array[Byte], body: Int,
                                    bodyLen: Int, st: State,
                                    mcusX: Int, mcusY: Int): Int = {
    val nc = st.comps.length
    val ns = data(body) & 0xFF
    if (ns < 1 || ns > nc || bodyLen != 1 + 2 * ns + 3) refuse()
    val scanComps = Array.tabulate(ns) { i =>
      val cid = data(body + 1 + 2 * i) & 0xFF
      val c = st.comps.find(_.id == cid).getOrElse(refuse())
      val tt = data(body + 2 + 2 * i) & 0xFF
      c.dcTab = st.huffDc((tt >> 4) & 0xF)
      c.acTab = st.huffAc(tt & 0xF)
      c
    }
    val ss = data(body + 1 + 2 * ns) & 0xFF
    val se = data(body + 2 + 2 * ns) & 0xFF
    val ahal = data(body + 3 + 2 * ns) & 0xFF
    val ah = (ahal >> 4) & 0xF
    val al = ahal & 0xF
    val isDc = ss == 0
    if (isDc) { if (se != 0) refuse() }
    else if (ns != 1 || se < ss || se > 63) refuse()
    if (al > 13 || (ah != 0 && ah != al + 1)) refuse()
    if (isDc && ah == 0) scanComps.foreach { c =>
      if (c.dcTab == null) refuse()
    }
    if (!isDc) { if (scanComps(0).acTab == null) refuse() }
    scanComps.foreach(_.pred = 0)
    val br = new BitReader(data, body + bodyLen)
    val ctx = new ScanCtx
    var rst = 0
    var sinceRestart = 0
    def maybeRestart(): Unit =
      if (st.restartInterval > 0 && sinceRestart == st.restartInterval) {
        br.restartMarker(rst)
        rst = (rst + 1) & 7
        sinceRestart = 0
        ctx.eobrun = 0
        scanComps.foreach(_.pred = 0)
      }
    if (isDc && ns > 1) {
      // interleaved DC scan: MCU order over the frame grid
      var m = 0
      val total = mcusX * mcusY
      while (m < total) {
        maybeRestart()
        val mx = m % mcusX
        val my = m / mcusX
        var ci = 0
        while (ci < ns) {
          val c = scanComps(ci)
          var by = 0
          while (by < c.v) {
            var bx = 0
            while (bx < c.h) {
              val blk = (my * c.v + by) * c.blocksW + (mx * c.h + bx)
              decodeDcProgressive(br, c, blk * 64, ah, al)
              bx += 1
            }
            by += 1
          }
          ci += 1
        }
        sinceRestart += 1
        m += 1
      }
    } else {
      // non-interleaved: the component's own sub-grid of blocks covering
      // its ceil(w·h_i/hMax) × ceil(h·v_i/vMax) sample region
      val c = scanComps(0)
      val hMax = st.comps.map(_.h).max
      val vMax = st.comps.map(_.v).max
      val cw = (st.w * c.h + hMax - 1) / hMax
      val chh = (st.h * c.v + vMax - 1) / vMax
      val nbw = (cw + 7) / 8
      val nbh = (chh + 7) / 8
      var by = 0
      while (by < nbh) {
        var bx = 0
        while (bx < nbw) {
          maybeRestart()
          val base = (by * c.blocksW + bx) * 64
          if (isDc) decodeDcProgressive(br, c, base, ah, al)
          else if (ah == 0) decodeAcFirst(br, c, base, ss, se, al, ctx)
          else decodeAcRefine(br, c, base, ss, se, al, ctx)
          sinceRestart += 1
          bx += 1
        }
        by += 1
      }
    }
    // byte-align (pad bits are inside the last consumed byte) and locate
    // the next marker; 0xFF fill bytes before it are legal padding
    var q = br.pos
    while (q + 1 < data.length && (data(q) & 0xFF) == 0xFF &&
        (data(q + 1) & 0xFF) == 0xFF) q += 1
    if (q + 2 > data.length) refuse()
    if ((data(q) & 0xFF) != 0xFF) refuse()
    q
  }

  /** DC coefficient, first pass (diff-coded magnitude shifted left by
    * Al) or refinement (one appended bit at position Al).
    */
  private def decodeDcProgressive(br: BitReader, c: Component, base: Int,
                                  ah: Int, al: Int): Unit =
    if (ah == 0) {
      val t = c.dcTab.decode(br)
      if (t > 11) refuse()
      c.pred += extend(br.bits(t), t)
      c.coefs(base) = c.pred << al
    } else {
      if (br.bit() == 1) c.coefs(base) |= 1 << al
    }

  /** AC band, first pass: run/size symbols with EOBn run-length codes
    * (an EOB run of (1«r)+received(r) blocks ends at the current block).
    */
  private def decodeAcFirst(br: BitReader, c: Component, base: Int,
                            ss: Int, se: Int, al: Int, ctx: ScanCtx): Unit = {
    if (ctx.eobrun > 0) { ctx.eobrun -= 1; return }
    var k = ss
    while (k <= se) {
      val rs = c.acTab.decode(br)
      val r = (rs >> 4) & 0x0F
      val s = rs & 0x0F
      if (s == 0) {
        if (r < 15) {
          // EOBn: total run (1<<r)+bits(r); this block consumes one
          ctx.eobrun = (1 << r) - 1 + (if (r > 0) br.bits(r) else 0)
          k = 64
        } else k += 16 // ZRL
      } else {
        k += r
        if (k > se) refuse()
        c.coefs(base + Zigzag(k)) = extend(br.bits(s), s) << al
        k += 1
      }
    }
  }

  /** AC band, refinement pass (Annex G.1.2.3 / the classic structure):
    * newly-nonzero coefficients arrive as (run, size 1) + sign; every
    * history-nonzero coefficient passed over contributes one correction
    * bit; EOBn covers the block tail and whole subsequent blocks with
    * correction bits only.
    */
  private def decodeAcRefine(br: BitReader, c: Component, base: Int,
                             ss: Int, se: Int, al: Int, ctx: ScanCtx): Unit = {
    val p1 = 1 << al
    val m1 = -1 << al
    def correct(z: Int): Unit =
      if (br.bit() == 1 && (c.coefs(z) & p1) == 0)
        c.coefs(z) += (if (c.coefs(z) >= 0) p1 else m1)
    var k = ss
    if (ctx.eobrun == 0) {
      var done = false
      while (k <= se && !done) {
        val rs = c.acTab.decode(br)
        var r = (rs >> 4) & 0x0F
        val s = rs & 0x0F
        var newval = 0
        if (s != 0) {
          if (s != 1) refuse() // refinement codes only size-1 amplitudes
          newval = if (br.bit() == 1) p1 else m1
        } else if (r < 15) {
          ctx.eobrun = (1 << r) + (if (r > 0) br.bits(r) else 0)
          done = true // tail of this block handled below; eobrun-- there
        }
        if (!done) {
          // advance: corrections at nonzero-history positions, the run
          // counts zero positions; place the new value where it expires
          var placed = false
          while (k <= se && !placed) {
            val z = base + Zigzag(k)
            if (c.coefs(z) != 0) correct(z)
            else if (r == 0) {
              if (s != 0) c.coefs(z) = newval
              placed = true
            } else r -= 1
            k += 1
          }
          if (s != 0 && !placed) refuse() // no zero slot for the new value
        }
      }
    }
    if (ctx.eobrun > 0) {
      while (k <= se) {
        val z = base + Zigzag(k)
        if (c.coefs(z) != 0) correct(z)
        k += 1
      }
      ctx.eobrun -= 1
    }
  }

  // ---------------------------------------------------------------------
  // Encoder (fixture + spec surface)
  // ---------------------------------------------------------------------

  private def seg(out: ByteArrayOutputStream, marker: Int,
                  body: Array[Byte]): Unit = {
    out.write(0xFF); out.write(marker)
    val len = body.length + 2
    out.write((len >> 8) & 0xFF); out.write(len & 0xFF)
    out.write(body, 0, body.length)
  }

  private def dhtBody(tc: Int, th: Int, counts: Array[Int],
                      vals: Array[Int]): Array[Byte] = {
    val b = new ByteArrayOutputStream()
    b.write((tc << 4) | th)
    counts.foreach(b.write)
    vals.foreach(b.write)
    b.toByteArray
  }

  private def writeCommonHeader(out: ByteArrayOutputStream): Unit = {
    out.write(0xFF); out.write(0xD8) // SOI
    seg(out, 0xE0, Array[Byte]('J', 'F', 'I', 'F', 0, 1, 1, 0, 0, 1, 0, 1, 0, 0))
  }

  /** Encode one block of QUANTIZED coefficients (natural order; the
    * fixture quant tables are all-ones so these are the dequantized values
    * too). Returns the new DC predictor.
    */
  private def encodeBlock(bw: BitWriter, coef: Array[Int], pred: Int,
                          dcT: HuffTable = DcEnc, acT: HuffTable = AcEnc): Int = {
    val dc = coef(0)
    val diff = dc - pred
    var s = 0
    var a = math.abs(diff)
    while (a != 0) { s += 1; a >>= 1 }
    if (s > 11) refuse()
    dcT.write(bw, s)
    if (s > 0) bw.put(if (diff < 0) diff + (1 << s) - 1 else diff, s)
    var k = 1
    var run = 0
    while (k < 64) {
      val c = coef(Zigzag(k))
      if (c == 0) run += 1
      else {
        while (run >= 16) { acT.write(bw, 0xF0); run -= 16 }
        var sz = 0
        var ac = math.abs(c)
        while (ac != 0) { sz += 1; ac >>= 1 }
        if (sz > 10) refuse()
        acT.write(bw, (run << 4) | sz)
        bw.put(if (c < 0) c + (1 << sz) - 1 else c, sz)
        run = 0
      }
      k += 1
    }
    if (run > 0) acT.write(bw, 0x00) // EOB
    dc
  }

  /** Baseline grayscale from per-8×8-block QUANTIZED coefficient arrays
    * (natural order), raster block order. The spec surface for exercising
    * AC runs/ZRL/EOB/negative amplitudes through the real bitstream.
    * `quant` is written to the DQT in zigzag order and used by the
    * DECODER only (the blocks here are already-quantized values);
    * `dcTables`/`acTables` let specs drive DIFFERENT canonical Huffman
    * shapes through the general Annex-C table build (variable code
    * lengths, not just the flat 4/8-bit fixture tables).
    */
  private[operators] def encodeGrayCoeffs(w: Int, h: Int,
      blocks: Array[Array[Int]],
      quant: Array[Int] = Array.fill(64)(1),
      dcCounts: Array[Int] = DcCounts, dcVals: Array[Int] = DcVals,
      acCounts: Array[Int] = AcCounts, acVals: Array[Int] = AcVals): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    writeCommonHeader(out)
    seg(out, 0xDB, (0 +: quant.toSeq).map(_.toByte).toArray) // zigzag order
    seg(out, 0xC0, Array[Byte](8, ((h >> 8) & 0xFF).toByte, (h & 0xFF).toByte,
      ((w >> 8) & 0xFF).toByte, (w & 0xFF).toByte, 1, 1, 0x11, 0))
    seg(out, 0xC4, dhtBody(0, 0, dcCounts, dcVals))
    seg(out, 0xC4, dhtBody(1, 0, acCounts, acVals))
    seg(out, 0xDA, Array[Byte](1, 1, 0x00, 0, 63, 0))
    val bw = new BitWriter(out)
    val dcT = new HuffTable(dcCounts, dcVals)
    val acT = new HuffTable(acCounts, acVals)
    var pred = 0
    blocks.foreach { b => pred = encodeBlock(bw, b, pred, dcT, acT) }
    bw.flushPad()
    out.write(0xFF); out.write(0xD9) // EOI
    out.toByteArray
  }

  // ---------------------------------------------------------------------
  // Progressive encoder (Annex G shape: spectral bands + successive
  // approximation) — the fixture/spec surface that lets the decoder be
  // pinned equal to baseline on arbitrary coefficient grids.
  // ---------------------------------------------------------------------

  /** Progressive scan-emission state shared across blocks of one AC
    * scan: the pending EOB run and (refinement only) correction bits
    * buffered behind the next emitted symbol.
    */
  private final class AcEncCtx(bw: BitWriter, acT: HuffTable) {
    var eobrun = 0
    private val buf = new scala.collection.mutable.ArrayBuffer[Int]()
    def buffer(bit: Int): Unit = buf += bit
    def emitBuffered(): Unit = { buf.foreach(b => bw.put(b, 1)); buf.clear() }
    /** EOBn: r = ⌊log2 run⌋, extra = run − 2^r in r bits; buffered
      * correction bits of the covered blocks follow the symbol.
      */
    def flushEobrun(): Unit = if (eobrun > 0) {
      var r = 0
      while ((eobrun >> (r + 1)) != 0) r += 1
      acT.write(bw, r << 4)
      if (r > 0) bw.put(eobrun - (1 << r), r)
      eobrun = 0
      emitBuffered()
    }
  }

  /** One block of a first AC scan at point transform `al` over band
    * [ss, se]: sign-magnitude shifted values, ZRL runs, trailing zeros
    * fold into the shared EOB run.
    */
  private def encodeAcFirstBlock(bw: BitWriter, acT: HuffTable,
                                 coef: Array[Int], ss: Int, se: Int,
                                 al: Int, ctx: AcEncCtx): Unit = {
    var r = 0
    var k = ss
    var any = false
    while (k <= se) {
      val cv = coef(Zigzag(k))
      val av = math.abs(cv) >> al
      if (av == 0) r += 1
      else {
        ctx.flushEobrun()
        while (r > 15) { acT.write(bw, 0xF0); r -= 16 }
        var sz = 0
        var a = av
        while (a != 0) { sz += 1; a >>= 1 }
        if (sz > 10) refuse()
        acT.write(bw, (r << 4) | sz)
        val t = if (cv < 0) -av else av
        bw.put(if (t < 0) t + (1 << sz) - 1 else t, sz)
        r = 0
        any = true
      }
      k += 1
    }
    if (r > 0 || !any) {
      ctx.eobrun += 1
      if (ctx.eobrun == 0x7FFF) ctx.flushEobrun()
    }
  }

  /** One block of a refinement AC scan (Ah = al+1 → al): newly-nonzero
    * values (|v|»al == 1) emit (run,1)+sign; history-nonzero
    * coefficients contribute one buffered correction bit each; the tail
    * past the last newly-nonzero position joins the EOB run.
    */
  private def encodeAcRefineBlock(bw: BitWriter, acT: HuffTable,
                                  coef: Array[Int], ss: Int, se: Int,
                                  al: Int, ctx: AcEncCtx): Unit = {
    def abv(k: Int): Int = math.abs(coef(Zigzag(k))) >> al
    var kEob = ss - 1 // last newly-nonzero position; band tail after it
    var k = ss
    while (k <= se) { if (abv(k) == 1) kEob = k; k += 1 }
    // events since the last emitted symbol, in POSITION order: −1 marks
    // a zero-history position, 0/1 a history coefficient's correction
    // bit. Each symbol's segment gets exactly ITS span's corrections —
    // a ZRL carries the bits interleaved among its 16 zero-histories,
    // matching the decoder's walk (G.1.2.3: "appended immediately
    // following the code word"), not a block-global buffer.
    val ev = new scala.collection.mutable.ArrayBuffer[Int]()
    var r = 0
    k = ss
    while (k <= kEob) {
      val a = abv(k)
      if (a == 0) { ev += -1; r += 1 }
      else if (a > 1) ev += (a & 1) // history-nonzero: correction bit
      else {
        ctx.flushEobrun()
        while (r > 15) {
          acT.write(bw, 0xF0)
          var zs = 0
          while (zs < 16) {
            val e = ev.remove(0)
            if (e < 0) zs += 1 else bw.put(e, 1)
          }
          r -= 16
        }
        acT.write(bw, (r << 4) | 1)
        bw.put(if (coef(Zigzag(k)) < 0) 0 else 1, 1)
        ev.foreach(e => if (e >= 0) bw.put(e, 1))
        ev.clear()
        r = 0
      }
      k += 1
    }
    if (kEob < se) {
      // tail rides the EOB run: corrections buffered behind the EOBn
      ev.foreach(e => if (e >= 0) ctx.buffer(e))
      ev.clear()
      k = math.max(ss, kEob + 1)
      while (k <= se) { if (abv(k) > 1) ctx.buffer(abv(k) & 1); k += 1 }
      ctx.eobrun += 1
      if (ctx.eobrun == 0x7FFF) ctx.flushEobrun()
    }
  }

  /** Progressive grayscale from per-block QUANTIZED coefficient arrays
    * (natural order, raster block order — the [[encodeGrayCoeffs]]
    * input): DC first at `dcAl` + refinements down to 0, then per
    * spectral band an AC first at `acAl` + refinements down to 0.
    * Optional restart interval applies to every scan (predictors and
    * EOB runs reset, RSTm between block groups). Decodes to exactly the
    * baseline encoding of the same blocks.
    */
  private[operators] def encodeGrayProgressiveCoeffs(
      w: Int, h: Int, blocks: Array[Array[Int]],
      quant: Array[Int] = Array.fill(64)(1),
      bands: Seq[(Int, Int)] = Seq((1, 63)),
      dcAl: Int = 1, acAl: Int = 1,
      restartInterval: Int = 0): Array[Byte] = {
    require(dcAl >= 0 && acAl >= 0 && bands.forall { case (a, b) =>
      a >= 1 && a <= b && b <= 63 })
    val out = new ByteArrayOutputStream()
    writeCommonHeader(out)
    seg(out, 0xDB, (0 +: quant.toSeq).map(_.toByte).toArray)
    seg(out, 0xC2, Array[Byte](8, ((h >> 8) & 0xFF).toByte, (h & 0xFF).toByte,
      ((w >> 8) & 0xFF).toByte, (w & 0xFF).toByte, 1, 1, 0x11, 0))
    seg(out, 0xC4, dhtBody(0, 0, DcCounts, DcVals))
    seg(out, 0xC4, dhtBody(1, 0, AcProgCounts, AcProgVals))
    if (restartInterval > 0)
      seg(out, 0xDD, Array[Byte](((restartInterval >> 8) & 0xFF).toByte,
        (restartInterval & 0xFF).toByte))
    // one scan = SOS header + entropy over all blocks with restarts
    def scan(ss: Int, se: Int, ah: Int, al: Int)(
        perBlock: (BitWriter, AcEncCtx, Array[Int], Int) => Unit): Unit = {
      seg(out, 0xDA, Array[Byte](1, 1, 0x00, ss.toByte, se.toByte,
        ((ah << 4) | al).toByte))
      var bw = new BitWriter(out)
      var ctx = new AcEncCtx(bw, AcProgEnc)
      var pred = 0
      var rst = 0
      var since = 0
      var i = 0
      while (i < blocks.length) {
        if (restartInterval > 0 && since == restartInterval) {
          ctx.flushEobrun()
          bw.flushPad()
          out.write(0xFF); out.write(0xD0 + (rst & 7))
          rst = (rst + 1) & 7
          since = 0
          pred = 0
          bw = new BitWriter(out)
          ctx = new AcEncCtx(bw, AcProgEnc)
        }
        perBlock(bw, ctx, blocks(i), pred)
        // DC-first scans thread the predictor through the closure result
        // channel below; recompute here instead (cheap, keeps perBlock pure)
        if (ss == 0 && ah == 0) pred = blocks(i)(0) >> al
        since += 1
        i += 1
      }
      ctx.flushEobrun()
      bw.flushPad()
    }
    // DC first: diff-coded (dc >> dcAl)
    scan(0, 0, 0, dcAl) { (bw, _, coef, pred) =>
      val v = coef(0) >> dcAl
      val diff = v - pred
      var s = 0
      var a = math.abs(diff)
      while (a != 0) { s += 1; a >>= 1 }
      if (s > 11) refuse()
      DcEnc.write(bw, s)
      if (s > 0) bw.put(if (diff < 0) diff + (1 << s) - 1 else diff, s)
    }
    // DC refinements: one bit per block per position
    var al = dcAl - 1
    while (al >= 0) {
      val a0 = al
      scan(0, 0, a0 + 1, a0) { (bw, _, coef, _) =>
        bw.put((coef(0) >> a0) & 1, 1)
      }
      al -= 1
    }
    bands.foreach { case (ss, se) =>
      scan(ss, se, 0, acAl) { (bw, ctx, coef, _) =>
        encodeAcFirstBlock(bw, AcProgEnc, coef, ss, se, acAl, ctx)
      }
      var al2 = acAl - 1
      while (al2 >= 0) {
        val a0 = al2
        scan(ss, se, a0 + 1, a0) { (bw, ctx, coef, _) =>
          encodeAcRefineBlock(bw, AcProgEnc, coef, ss, se, a0, ctx)
        }
        al2 -= 1
      }
    }
    out.write(0xFF); out.write(0xD9)
    out.toByteArray
  }

  /** DC size-category + extend-bits emission shared by the baseline and
    * progressive DC encoders; returns the value as the new predictor.
    */
  private def encodeDcDiff(bw: BitWriter, dcT: HuffTable, v: Int,
                           pred: Int): Int = {
    val diff = v - pred
    var s = 0
    var a = math.abs(diff)
    while (a != 0) { s += 1; a >>= 1 }
    if (s > 11) refuse()
    dcT.write(bw, s)
    if (s > 0) bw.put(if (diff < 0) diff + (1 << s) - 1 else diff, s)
    v
  }

  /** Progressive 4:2:0 color sibling of [[encodeColor420]]: one
    * INTERLEAVED DC scan (Y₀Y₁Y₂Y₃ Cb Cr per MCU, Al=0) followed by one
    * AC first scan per component over its own non-interleaved block
    * sub-grid — the scan-script shape real progressive encoders emit.
    * DC-only fixture blocks make every AC scan a pure EOB run, and the
    * decode equals the baseline encoding's pixels exactly.
    */
  def encodeColorProgressive420(w: Int, h: Int, yBlockVal: (Int, Int) => Int,
                                cbVal: Int => Int,
                                crVal: Int => Int): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    writeCommonHeader(out)
    seg(out, 0xDB, ((0 +: Array.fill(64)(1)) ++ (1 +: Array.fill(64)(1)))
      .map(_.toByte))
    seg(out, 0xC2, Array[Byte](8, ((h >> 8) & 0xFF).toByte, (h & 0xFF).toByte,
      ((w >> 8) & 0xFF).toByte, (w & 0xFF).toByte, 3,
      1, 0x22, 0, 2, 0x11, 1, 3, 0x11, 1))
    seg(out, 0xC4, dhtBody(0, 0, DcCounts, DcVals))
    seg(out, 0xC4, dhtBody(1, 0, AcProgCounts, AcProgVals))
    seg(out, 0xC4, dhtBody(0, 1, DcCounts, DcVals))
    seg(out, 0xC4, dhtBody(1, 1, AcProgCounts, AcProgVals))
    val mcusX = (w + 15) / 16
    val mcusY = (h + 15) / 16
    // scan 1: interleaved DC, all three components
    seg(out, 0xDA, Array[Byte](3, 1, 0x00, 2, 0x10, 3, 0x10, 0, 0, 0))
    var bw = new BitWriter(out)
    var predY = 0; var predCb = 0; var predCr = 0
    var m = 0
    while (m < mcusX * mcusY) {
      val mx = m % mcusX
      val my = m / mcusX
      var by = 0
      while (by < 2) {
        var bx = 0
        while (bx < 2) {
          predY = encodeDcDiff(bw, DcEnc,
            8 * (yBlockVal(2 * mx + bx, 2 * my + by) - 128), predY)
          bx += 1
        }
        by += 1
      }
      predCb = encodeDcDiff(bw, DcEnc, 8 * (cbVal(m) - 128), predCb)
      predCr = encodeDcDiff(bw, DcEnc, 8 * (crVal(m) - 128), predCr)
      m += 1
    }
    bw.flushPad()
    // scans 2-4: per-component AC first over the component's sub-grid —
    // all blocks are AC-empty here, so each scan is one EOBn run
    def acScan(compId: Int, tableId: Int, nbw: Int, nbh: Int): Unit = {
      seg(out, 0xDA, Array[Byte](1, compId.toByte, tableId.toByte, 1, 63, 0))
      bw = new BitWriter(out)
      val ctx = new AcEncCtx(bw, AcProgEnc)
      val empty = new Array[Int](64)
      var i = 0
      while (i < nbw * nbh) {
        encodeAcFirstBlock(bw, AcProgEnc, empty, 1, 63, 0, ctx)
        i += 1
      }
      ctx.flushEobrun()
      bw.flushPad()
    }
    acScan(1, 0x00, (w + 7) / 8, (h + 7) / 8)
    val cw = (w + 1) / 2
    val chh = (h + 1) / 2
    acScan(2, 0x11, (cw + 7) / 8, (chh + 7) / 8)
    acScan(3, 0x11, (cw + 7) / 8, (chh + 7) / 8)
    out.write(0xFF); out.write(0xD9)
    out.toByteArray
  }

  /** Baseline grayscale where every 8×8 block is the constant
    * `blockVal(bx, by)` ∈ [0, 255] — DC = 8·(v−128), zero AC, which
    * round-trips bit-exactly through quant(1)/IDCT (see [[W]]), so an
    * external oracle predicts every decoded pixel in closed form.
    */
  def encodeGray(w: Int, h: Int, blockVal: (Int, Int) => Int): Array[Byte] = {
    val bw = (w + 7) / 8
    val bh = (h + 7) / 8
    val blocks = Array.tabulate(bw * bh) { i =>
      val c = new Array[Int](64)
      c(0) = 8 * (blockVal(i % bw, i / bw) - 128)
      c
    }
    encodeGrayCoeffs(w, h, blocks)
  }

  /** Baseline 4:2:0 YCbCr: luma constant per 8×8 block
    * (`yBlockVal(bx, by)` over the padded 2·mcusX-wide block grid), chroma
    * constant per 16×16 MCU (`cbVal(m)`, `crVal(m)`, m in raster MCU
    * order), interleaved Y₀Y₁Y₂Y₃ Cb Cr scan, optional restart interval
    * (exercises RSTm + DC predictor reset). Per-MCU-constant chroma keeps
    * the decode exact under ANY upsampler; per-block-constant luma keeps
    * the IDCT exact — together the oracle predicts every RGB pixel.
    */
  def encodeColor420(w: Int, h: Int, yBlockVal: (Int, Int) => Int,
                     cbVal: Int => Int, crVal: Int => Int,
                     restartInterval: Int = 0): Array[Byte] =
    encodeColorSub(w, h, 2, 2, yBlockVal, cbVal, crVal, restartInterval)

  /** Generalized chroma subsampling: luma samples at `hs`×`vs` per MCU
    * (hs, vs ∈ {1, 2} — 1×1 = 4:4:4, 2×1 = 4:2:2, 2×2 = 4:2:0), chroma
    * one block per MCU. The Y block grid is `hs·mcusX` wide; chroma stays
    * constant per MCU so the decode remains closed-form exact under ANY
    * upsampler at every sampling mode.
    */
  def encodeColorSub(w: Int, h: Int, hs: Int, vs: Int,
                     yBlockVal: (Int, Int) => Int,
                     cbVal: Int => Int, crVal: Int => Int,
                     restartInterval: Int = 0): Array[Byte] = {
    require(hs >= 1 && hs <= 2 && vs >= 1 && vs <= 2)
    val out = new ByteArrayOutputStream()
    writeCommonHeader(out)
    // two quant tables in ONE DQT segment (multi-table parse coverage)
    seg(out, 0xDB, ((0 +: Array.fill(64)(1)) ++ (1 +: Array.fill(64)(1)))
      .map(_.toByte))
    seg(out, 0xC0, Array[Byte](8, ((h >> 8) & 0xFF).toByte, (h & 0xFF).toByte,
      ((w >> 8) & 0xFF).toByte, (w & 0xFF).toByte, 3,
      1, ((hs << 4) | vs).toByte, 0, // Y: hs×vs sampling, quant 0
      2, 0x11, 1, // Cb: 1×1, quant 1
      3, 0x11, 1)) // Cr: 1×1, quant 1
    seg(out, 0xC4, dhtBody(0, 0, DcCounts, DcVals))
    seg(out, 0xC4, dhtBody(1, 0, AcCounts, AcVals))
    seg(out, 0xC4, dhtBody(0, 1, DcCounts, DcVals))
    seg(out, 0xC4, dhtBody(1, 1, AcCounts, AcVals))
    if (restartInterval > 0)
      seg(out, 0xDD, Array[Byte](((restartInterval >> 8) & 0xFF).toByte,
        (restartInterval & 0xFF).toByte))
    seg(out, 0xDA, Array[Byte](3, 1, 0x00, 2, 0x11, 3, 0x11, 0, 63, 0))
    val mcuW = 8 * hs
    val mcuH = 8 * vs
    val mcusX = (w + mcuW - 1) / mcuW
    val mcusY = (h + mcuH - 1) / mcuH
    var bw = new BitWriter(out)
    val coef = new Array[Int](64)
    var predY = 0; var predCb = 0; var predCr = 0
    var rst = 0
    var sinceRestart = 0
    var m = 0
    while (m < mcusX * mcusY) {
      if (restartInterval > 0 && sinceRestart == restartInterval) {
        bw.flushPad()
        out.write(0xFF); out.write(0xD0 + (rst & 7))
        rst = (rst + 1) & 7
        sinceRestart = 0
        predY = 0; predCb = 0; predCr = 0
        bw = new BitWriter(out)
      }
      val mx = m % mcusX
      val my = m / mcusX
      var by = 0
      while (by < vs) {
        var bx = 0
        while (bx < hs) {
          java.util.Arrays.fill(coef, 0)
          coef(0) = 8 * (yBlockVal(hs * mx + bx, vs * my + by) - 128)
          predY = encodeBlock(bw, coef, predY)
          bx += 1
        }
        by += 1
      }
      java.util.Arrays.fill(coef, 0)
      coef(0) = 8 * (cbVal(m) - 128)
      predCb = encodeBlock(bw, coef, predCb)
      java.util.Arrays.fill(coef, 0)
      coef(0) = 8 * (crVal(m) - 128)
      predCr = encodeBlock(bw, coef, predCr)
      sinceRestart += 1
      m += 1
    }
    bw.flushPad()
    out.write(0xFF); out.write(0xD9)
    out.toByteArray
  }

  // ---------------------------------------------------------------------
  // Deterministic fixtures + the DataFrame generator
  // ---------------------------------------------------------------------

  /** Grayscale fixture: w = seed%13+17, h = seed%11+17 (non-multiples of 8
    * exercise edge-block cropping), block value
    * `(seed·7 + blockIdx·29) mod 256` over the ceil(w/8)-wide grid.
    */
  def grayFixture(seed: Long): Array[Byte] = {
    val w = (seed % 13 + 17).toInt
    val h = (seed % 11 + 17).toInt
    val bw = (w + 7) / 8
    encodeGray(w, h,
      (bx, by) => ((seed * 7 + (by.toLong * bw + bx) * 29) % 256).toInt)
  }

  /** PROGRESSIVE grayscale fixture: w = seed%12+17, h = seed%10+17
    * (partial edge blocks), block value `(seed·19 + blockIdx·31) mod 256`
    * over the ceil(w/8)-wide grid — the same per-block-constant closed
    * form as [[grayFixture]], emitted as a 7-scan progressive file: DC
    * first at Al=4 (so the al=3 refinement scan carries REAL bits —
    * DC = 8·(v−128) has bit 3 = (v−128)&1), three more DC refinements,
    * and per spectral band (1–5, 6–63) an AC first + refinement at Al=1
    * (pure EOB-run traffic for DC-only blocks), restart interval 3 in
    * every scan. Decodes to exactly the baseline pixels, so the oracle
    * stays closed-form while the engine must run the whole Annex-G
    * scan machinery to reproduce it.
    */
  def progressiveGrayFixture(seed: Long): Array[Byte] = {
    val w = (seed % 12 + 17).toInt
    val h = (seed % 10 + 17).toInt
    val bw = (w + 7) / 8
    val bh = (h + 7) / 8
    val blocks = Array.tabulate(bw * bh) { i =>
      val c = new Array[Int](64)
      c(0) = 8 * (((seed * 19 + i.toLong * 31) % 256).toInt - 128)
      c
    }
    encodeGrayProgressiveCoeffs(w, h, blocks, bands = Seq((1, 5), (6, 63)),
      dcAl = 4, acAl = 1, restartInterval = 3)
  }

  /** Deterministic progressive-JPEG payload column — the [[jpegMedia]]
    * shape over [[progressiveGrayFixture]] bytes.
    */
  def jpegProgressiveMedia(ids: DataFrame, idCol: String,
                           seedCol: String): DataFrame = {
    val spark = ids.sparkSession
    import spark.implicits._
    val base = Spread.ifNarrow(ids.select(
      col(idCol).cast("long").as("doc_id"),
      col(seedCol).cast("long").as("seed")))
    base.as[(Long, Long)]
      .mapPartitions(it => it.map { case (id, seed) =>
        (id, progressiveGrayFixture(seed))
      })
      .toDF("doc_id", "data")
      .select(col("doc_id"), col("data"),
        struct(lit("image/jpeg").as("mime"),
          octet_length(col("data")).cast("long").as("n_bytes")).as("meta"))
  }

  /** 4:2:0 color fixture: w = seed%17+20, h = seed%13+20 (partial edge
    * MCUs), per-block luma `(seed·11 + blockIdx·23) mod 256` over the
    * 2·mcusX-wide padded grid, per-MCU chroma
    * `(seed·13 + m·37) / (seed·17 + m·41) mod 256`, restart interval 3.
    */
  def colorFixture(seed: Long): Array[Byte] = {
    val w = (seed % 17 + 20).toInt
    val h = (seed % 13 + 20).toInt
    val mcusX = (w + 15) / 16
    val ybw = 2 * mcusX
    encodeColor420(w, h,
      (bx, by) => ((seed * 11 + (by.toLong * ybw + bx) * 23) % 256).toInt,
      m => ((seed * 13 + m.toLong * 37) % 256).toInt,
      m => ((seed * 17 + m.toLong * 41) % 256).toInt,
      restartInterval = 3)
  }

  /** Deterministic JPEG payload column, the [[Multimodal.pngMedia]] shape:
    * one row-local typed map (no shuffle; [[Spread.ifNarrow]] fans narrow
    * inputs across the cluster first). Bitstream bytes are generated in
    * the JVM — unlike the PNG/BMP fixtures the ORACLE never needs the
    * bytes, only the closed-form DECODED pixels.
    */
  /** EXIF orientation of a JPEG: walk the marker segments for APP1
    * (0xFFE1) whose body opens with the "Exif\0\0" identifier, then
    * read tag 274 from IFD0 of the embedded TIFF blob
    * ([[Tiff.orientationOnly]] — the EXIF container IS a TIFF, one
    * parser for both carriers). None when no Exif APP1 exists or the
    * structure is malformed; a JPEG without the tag reports 1.
    */
  def exifOrientation(data: Array[Byte]): Option[Int] = {
    if (data.length < 4 || (data(0) & 0xFF) != 0xFF ||
        (data(1) & 0xFF) != 0xD8) return None
    var p = 2
    while (p + 4 <= data.length) {
      if ((data(p) & 0xFF) != 0xFF) return None
      val marker = data(p + 1) & 0xFF
      if (marker == 0xDA || marker == 0xD9) return None // scan/EOI: no APP1
      val len = u16(data, p + 2)
      if (len < 2 || p + 2 + len > data.length) return None
      val body = p + 4
      val bodyLen = len - 2
      if (marker == 0xE1 && bodyLen > 6 &&
          data(body) == 'E' && data(body + 1) == 'x' &&
          data(body + 2) == 'i' && data(body + 3) == 'f' &&
          data(body + 4) == 0 && data(body + 5) == 0)
        return Tiff.orientationOnly(
          java.util.Arrays.copyOfRange(data, body + 6, body + bodyLen))
      p = body + bodyLen
    }
    None
  }

  /** [[encodeGray]] with an EXIF APP1 carrying tag 274 — the form every
    * camera emits (orientation rides in metadata; the raster stays in
    * sensor order). The APP1 is a minimal big-endian-free TIFF: `II*\0`,
    * one IFD0 entry, no next IFD.
    */
  def encodeGrayExif(w: Int, h: Int, blockVal: (Int, Int) => Int,
                     orientation: Int): Array[Byte] = {
    val base = encodeGray(w, h, blockVal)
    val tiff = Array[Byte](
      'I', 'I', 42, 0, 8, 0, 0, 0, // header, IFD at 8
      1, 0,                        // one entry
      18, 1,                       // tag 274 (0x0112) LE
      3, 0,                        // SHORT
      1, 0, 0, 0,                  // count 1
      orientation.toByte, 0, 0, 0, // value
      0, 0, 0, 0)                  // next IFD
    val app1Body = "Exif".getBytes("US-ASCII") ++ Array[Byte](0, 0) ++ tiff
    val len = app1Body.length + 2
    val app1 = Array[Byte](0xFF.toByte, 0xE1.toByte,
      ((len >> 8) & 0xFF).toByte, (len & 0xFF).toByte) ++ app1Body
    base.take(2) ++ app1 ++ base.drop(2)
  }

  /** EXIF-ORIENTATION auto-rotate over JPEG payloads — the
    * [[Tiff.exifRotate]] contract on the dominant carrier: read tag 274
    * from APP1, decode, apply the correcting 90°-CW rotations (1/3/6/8;
    * mirrored forms and tag-less payloads refuse), emit the
    * [[Tiff.ExifRow]] probes that pin WHICH rotation ran. Partition-wise,
    * nothing shuffles.
    */
  def exifRotate(media: org.apache.spark.sql.Dataset[Multimodal.MediaRow])
      : org.apache.spark.sql.Dataset[Tiff.ExifRow] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.flatMap { r =>
        exifOrientation(r.data).flatMap { ori =>
          val k = ori match {
            case 1 => Some(0); case 3 => Some(2); case 6 => Some(1)
            case 8 => Some(3); case _ => None // mirrored forms refuse
          }
          k.flatMap { turns =>
            decode(r.data).map { case (ii0, buf0) =>
              var cur = (ii0, buf0)
              var i = 0
              while (i < turns) {
                cur = Multimodal.rotate90cw(cur._1, cur._2); i += 1
              }
              val (ii, buf) = cur
              val w = ii.width; val h = ii.height
              def lum(x: Int, y: Int): Long = {
                val row = if (ii.bottomUp) h - 1 - y else y
                val b = ii.pixelOffset + row * ii.rowStride + x * ii.channels
                1000L * (buf(b) & 0xFF) // grayscale leg
              }
              var tot = 0L
              var y = 0
              while (y < h) {
                var x = 0
                while (x < w) { tot += lum(x, y); x += 1 }
                y += 1
              }
              var row0 = 0L
              var x = 0
              while (x < w) { row0 += lum(x, 0); x += 1 }
              Tiff.ExifRow(r.doc_id, ori, w, h, tot, lum(0, 0), row0)
            }
          }
        }
      }
    }
  }

  /** Fixture corpus for the EXIF-JPEG leg: per-block-constant grayscale
    * (`val = (seed·13 + blk·31) mod 256`, w = seed%12+10, h = seed%10+9)
    * with orientation cycling 1/3/6/8 by seed mod 4 in a real APP1.
    */
  def exifJpegMedia(ids: DataFrame, idCol: String, seedCol: String): DataFrame = {
    val spark = ids.sparkSession
    import spark.implicits._
    val base = Spread.ifNarrow(ids.select(
      col(idCol).cast("long").as("doc_id"),
      col(seedCol).cast("long").as("seed")))
    base.as[(Long, Long)]
      .mapPartitions { it =>
        it.map { case (id, seed) =>
          val w = (seed % 12 + 10).toInt
          val h = (seed % 10 + 9).toInt
          val bw = (w + 7) / 8
          val ori = (seed % 4) match {
            case 0 => 1; case 1 => 3; case 2 => 6; case _ => 8
          }
          (id, encodeGrayExif(w, h,
            (bx, by) => ((seed * 13 + (by.toLong * bw + bx) * 31) % 256).toInt,
            ori))
        }
      }
      .toDF("doc_id", "data")
      .select(col("doc_id"), col("data"),
        struct(lit("image/jpeg").as("mime"),
          octet_length(col("data")).cast("long").as("n_bytes")).as("meta"))
  }

  def jpegMedia(ids: DataFrame, idCol: String, seedCol: String,
                color: Boolean): DataFrame = {
    val spark = ids.sparkSession
    import spark.implicits._
    val base = Spread.ifNarrow(ids.select(
      col(idCol).cast("long").as("doc_id"),
      col(seedCol).cast("long").as("seed")))
    base.as[(Long, Long)]
      .mapPartitions { it =>
        it.map { case (id, seed) =>
          (id, if (color) colorFixture(seed) else grayFixture(seed))
        }
      }
      .toDF("doc_id", "data")
      .select(col("doc_id"), col("data"),
        struct(lit("image/jpeg").as("mime"),
          octet_length(col("data")).cast("long").as("n_bytes")).as("meta"))
  }
}

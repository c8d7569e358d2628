package graft.operators

import org.apache.spark.sql.functions._

import graft.{SparkTestBase, Tables}

class MultimodalSpec extends SparkTestBase {

  private lazy val docs = Tables.load(spark, sfDir, "documents")

  test("mmBinaryDedup collapses identical payloads onto the min id") {
    import spark.implicits._
    val docs = Seq((1L, "same bytes"), (2L, "same bytes"), (3L, "other"))
      .toDF("doc_id", "text")
    val spark2 = spark
    val got = LlmQueries.mmBinaryDedup(spark2, sfDir) // registered form runs
    assert(got.columns.toSeq ==
      Seq("content_md5", "keep_id", "n_copies", "total_bytes"))
    // synthetic duplicate check through the same operator chain
    val dup = Multimodal.attachBinary(docs, "doc_id", "text")
      .groupBy(org.apache.spark.sql.functions.md5(col("data")).as("h"))
      .agg(org.apache.spark.sql.functions.min(col("doc_id")).as("keep"),
        org.apache.spark.sql.functions.count(
          org.apache.spark.sql.functions.lit(1)).as("n"))
      .collect().map(r => r.getLong(1) -> r.getLong(2)).toMap
    assert(dup == Map(1L -> 2L, 3L -> 1L))
  }

  test("attachBinary produces the binary+metadata schema contract") {
    val m = Multimodal.attachBinary(docs, "doc_id", "text")
    val s = m.schema
    assert(s("data").dataType.typeName == "binary")
    assert(s("meta").dataType.typeName == "struct")
    val row = m.filter(col("doc_id") === 0).head()
    val meta = row.getStruct(row.fieldIndex("meta"))
    assert(meta.getAs[Long]("n_bytes") ==
      row.getAs[Array[Byte]]("data").length.toLong)
  }

  test("decodeImages parses real PPM geometry partition-wise; " +
      "non-image payloads are refused with zero dims") {
    import spark.implicits._
    val media = Multimodal.ppmMedia(docs, "doc_id", "doc_id")
      .select(col("doc_id"), col("data"), col("meta.mime").as("mime"),
        col("meta.n_bytes").as("n_bytes"))
      .repartition(4)
      .as[Multimodal.MediaRow]
    val decoded = Multimodal.decodeImages(media).collect()
    assert(decoded.length == docs.count())
    decoded.foreach { d =>
      assert(d.width == (d.doc_id % 13 + 8).toInt, s"doc ${d.doc_id}")
      assert(d.height == (d.doc_id % 11 + 8).toInt)
      assert(d.channels == 3)
    }
    // raw text bytes are not an image: refused, not fabricated
    val raw = Multimodal.attachBinary(docs.limit(3), "doc_id", "text")
      .select(col("doc_id"), col("data"), col("meta.mime").as("mime"),
        col("meta.n_bytes").as("n_bytes"))
      .as[Multimodal.MediaRow]
    Multimodal.decodeImages(raw).collect().foreach { d =>
      assert(d.width == 0 && d.height == 0 && d.channels == 0)
    }
  }

  test("decodeHeader: PPM with comments and multi-digit dims; BMP 24bpp " +
      "bottom-up with row padding; truncated/invalid payloads refused") {
    // hand-built P6: comment inside header whitespace, 10x2 image
    val ppmHeader = "P6\n# a comment\n10 2\n255\n".getBytes("UTF-8")
    val ppm = ppmHeader ++ Array.fill[Byte](10 * 2 * 3)(7)
    val pi = Multimodal.decodeHeader(ppm).get
    assert((pi.width, pi.height, pi.channels) == ((10, 2, 3)))
    assert(pi.pixelOffset == ppmHeader.length && !pi.bottomUp && !pi.bgr)
    // truncated pixel array: refused
    assert(Multimodal.decodeHeader(ppm.dropRight(1)).isEmpty)
    // hand-built BMP: 3x2, 24bpp, BI_RGB, positive height (bottom-up),
    // rows pad 9 -> 12 bytes
    def le32(v: Int) = Array[Byte](v.toByte, (v >> 8).toByte,
      (v >> 16).toByte, (v >> 24).toByte)
    def le16(v: Int) = Array[Byte](v.toByte, (v >> 8).toByte)
    val bmp = "BM".getBytes("UTF-8") ++ le32(54 + 24) ++ le32(0) ++ le32(54) ++
      le32(40) ++ le32(3) ++ le32(2) ++ le16(1) ++ le16(24) ++ le32(0) ++
      le32(24) ++ Array.fill[Byte](16)(0) ++ Array.fill[Byte](24)(3)
    val bi = Multimodal.decodeHeader(bmp).get
    assert((bi.width, bi.height, bi.channels) == ((3, 2, 3)))
    assert(bi.pixelOffset == 54 && bi.rowStride == 12 && bi.bottomUp && bi.bgr)
    // compressed BMP (BI_RLE8 = 1): refused
    val rle = bmp.clone(); rle(30) = 1
    assert(Multimodal.decodeHeader(rle).isEmpty)
    assert(Multimodal.decodeHeader("not an image".getBytes("UTF-8")).isEmpty)
  }

  test("decodePixels: aHash bits follow cell luminance exactly " +
      "(half-dark / half-bright image)") {
    import spark.implicits._
    // 16x16 P6: left half black, right half white -> cells 0..3 of every
    // cell row dark (bit 0), cells 4..7 bright (bit 1)
    val header = "P6\n16 16\n255\n".getBytes("UTF-8")
    val px = Array.tabulate[Byte](16 * 16 * 3) { i =>
      val x = (i / 3) % 16
      if (x < 8) 0x00.toByte else 0xFF.toByte
    }
    val media = Seq(Multimodal.MediaRow(1L, header ++ px, "image/ppm",
      (header.length + px.length).toLong)).toDS()
    val got = Multimodal.decodePixels(media).collect().head
    val expected = (0 until 64).map { k =>
      if (k % 8 >= 4) 1L << k else 0L }.sum
    assert(got.ah == expected, f"ah=${got.ah}%016x expected=$expected%016x")
    assert(got.width == 16 && got.height == 16 && got.channels == 3)
    assert(got.lum_total == 8 * 16 * 1000L * 255)
    // DCT pHash on a pure left/right step: the horizontal-frequency
    // spectrum carries all the energy, so every bit in the u=0 row
    // (pure vertical frequencies, coefficients exactly 0) agrees with
    // the sign of the AC sum, and the hash is non-degenerate
    assert(got.ph != 0L && got.ph != -1L)
  }

  test("decodePng: real Deflater stream, all five filters reversed, " +
      "RGBA accepted, malformed payloads refused") {
    import spark.implicits._
    def be32(v: Int) = Array[Byte]((v >> 24).toByte, (v >> 16).toByte,
      (v >> 8).toByte, v.toByte)
    def chunk(ctype: String, body: Array[Byte]): Array[Byte] =
      be32(body.length) ++ ctype.getBytes("US-ASCII") ++ body ++ be32(0)
    val sig = Array(0x89, 'P', 'N', 'G', 0x0D, 0x0A, 0x1A, 0x0A)
      .map(_.toByte)
    def png(w: Int, h: Int, colorType: Int, scanlines: Array[Byte]): Array[Byte] = {
      val ihdr = be32(w) ++ be32(h) ++
        Array[Byte](8, colorType.toByte, 0, 0, 0)
      // REAL zlib compression — the decoder must handle an arbitrary
      // deflate stream, not just the stored blocks the fixture emits
      val d = new java.util.zip.Deflater()
      d.setInput(scanlines); d.finish()
      val buf = new Array[Byte](scanlines.length + 64)
      val zn = d.deflate(buf); d.end()
      sig ++ chunk("IHDR", ihdr) ++ chunk("IDAT", buf.take(zn)) ++
        chunk("IEND", Array.emptyByteArray)
    }
    // 4x2 RGB exercising every filter type on known pixels:
    // row 0 Paeth(4) (degenerates to Sub on the first row),
    // row 1 Average(3)
    val w = 4; val h = 2; val stride = w * 3
    val raw = Array.tabulate(h, stride)((y, x) => (10 + y * 40 + x * 7) % 256)
    def u(v: Int) = v & 0xFF
    val rows = Array.tabulate(h) { y =>
      val f = if (y == 0) 4 else 3
      f.toByte +: Array.tabulate(stride) { x =>
        val a = if (x >= 3) raw(y)(x - 3) else 0
        val b = if (y > 0) raw(y - 1)(x) else 0
        val c = if (y > 0 && x >= 3) raw(y - 1)(x - 3) else 0
        val pred = if (f == 4) {
          val p = a + b - c
          if (math.abs(p - a) <= math.abs(p - b) &&
              math.abs(p - a) <= math.abs(p - c)) a
          else if (math.abs(p - b) <= math.abs(p - c)) b else c
        } else (a + b) >> 1
        ((raw(y)(x) - pred) & 0xFF).toByte
      }
    }
    val payload = png(w, h, 2, rows.flatten)
    val got = Multimodal.decodePng(payload)
    assert(got.isDefined, "valid PNG must decode")
    val (info, px) = got.get
    assert((info.width, info.height, info.channels) == ((4, 2, 3)))
    for (y <- 0 until h; x <- 0 until stride)
      assert(u(px(y * stride + x)) == raw(y)(x),
        s"pixel byte ($y, $x) defiltered wrong")
    // RGBA (colorType 6): filter Sub with bpp = 4
    val rawA = Array.tabulate(16)(i => (5 + i * 11) % 256)
    val rowA = 1.toByte +: Array.tabulate(16) { x =>
      ((rawA(x) - (if (x >= 4) rawA(x - 4) else 0)) & 0xFF).toByte
    }
    val gotA = Multimodal.decodePng(png(4, 1, 6, rowA))
    assert(gotA.isDefined && gotA.get._1.channels == 4)
    assert((0 until 16).forall(x => u(gotA.get._2(x)) == rawA(x)))
    // ancillary chunks between IHDR and IDAT (tEXt here) must be
    // skipped, not refused — real encoders emit them routinely
    val withText = sig ++ chunk("IHDR",
        be32(w) ++ be32(h) ++ Array[Byte](8, 2, 0, 0, 0)) ++
      chunk("tEXt", "Comment hello".getBytes("US-ASCII")) ++ {
        val d2 = new java.util.zip.Deflater()
        d2.setInput(rows.flatten); d2.finish()
        val b2 = new Array[Byte](rows.flatten.length + 64)
        val z2 = d2.deflate(b2); d2.end()
        chunk("IDAT", b2.take(z2))
      } ++ chunk("IEND", Array.emptyByteArray)
    val gotT = Multimodal.decodePng(withText)
    assert(gotT.isDefined, "ancillary chunks must be skipped")
    assert(gotT.get._2.sameElements(got.get._2))
    // grayscale (colorType 0): 1 channel, Sub filter with bpp = 1,
    // luma = 1000 * sample through decodePixels' walks
    val rawG = Array.tabulate(8 * 8)(i => (i * 29 + 3) % 256)
    val rowsG = Array.tabulate(8) { y =>
      1.toByte +: Array.tabulate(8) { x =>
        val a = if (x >= 1) rawG(y * 8 + x - 1) else 0
        ((rawG(y * 8 + x) - a) & 0xFF).toByte
      }
    }
    val gotG = Multimodal.decodePng(png(8, 8, 0, rowsG.flatten))
    assert(gotG.isDefined && gotG.get._1.channels == 1)
    assert((0 until 64).forall(i => u(gotG.get._2(i)) == rawG(i)))
    val gmedia = Seq(Multimodal.MediaRow(7L, png(8, 8, 0, rowsG.flatten),
      "image/png", 0L)).toDS()
    val gstats = Multimodal.decodePixels(gmedia).collect().head
    assert(gstats.lum_total == rawG.map(1000L * _).sum)
    // refusals: truncated IDAT, wrong dims (inflated length mismatch),
    // palette color type, non-PNG
    val truncated = payload.dropRight(20)
    assert(Multimodal.decodePng(truncated).isEmpty)
    val wrongDims = png(5, 2, 2, rows.flatten) // claims w=5, data is w=4
    assert(Multimodal.decodePng(wrongDims).isEmpty)
    assert(Multimodal.decodePng(png(4, 2, 3, rows.flatten)).isEmpty,
      "palette PNGs refuse")
    assert(Multimodal.decodePng("not a png".getBytes("UTF-8")).isEmpty)
    // decodePixels end-to-end on a >=8x8 fixture payload
    val ids = Seq(3L).toDF("doc_id")
    val m = Multimodal.pngMedia(ids, "doc_id", "doc_id")
      .select(col("doc_id"), col("data"), col("meta.mime").as("mime"),
        col("meta.n_bytes").as("n_bytes")).as[Multimodal.MediaRow]
    val st = Multimodal.decodePixels(m).collect()
    assert(st.length == 1 && st.head.width == 11 && st.head.height == 11)
  }

  test("decodePng Adam7: hand-serialized passes (with EMPTY passes) " +
      "reassemble exactly; fixture parity with the sequential leg") {
    import spark.implicits._
    def be32(v: Int) = Array[Byte]((v >> 24).toByte, (v >> 16).toByte,
      (v >> 8).toByte, v.toByte)
    def chunk(ctype: String, body: Array[Byte]): Array[Byte] =
      be32(body.length) ++ ctype.getBytes("US-ASCII") ++ body ++ be32(0)
    val sig = Array(0x89, 'P', 'N', 'G', 0x0D, 0x0A, 0x1A, 0x0A)
      .map(_.toByte)
    // 4x2 RGB: passes 2 (xs=4), 3 (ys=4), 5 (ys=2) are EMPTY at this
    // geometry and serialize nothing (PNG spec) — a decoder that
    // allocates or reads them desyncs the stream
    val w = 4; val h = 2
    val raw = Array.tabulate(h, w * 3)((y, x) => (10 + y * 40 + x * 7) % 256)
    val passes = Seq((0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
      (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2))
    val scan = passes.flatMap { case (xs, ys, xst, yst) =>
      val wp = if (w > xs) (w - xs - 1) / xst + 1 else 0
      val hp0 = if (h > ys) (h - ys - 1) / yst + 1 else 0
      val hp = if (wp > 0) hp0 else 0 // zero-width passes serialize NOTHING
      (0 until hp).flatMap { yp =>
        0.toByte +: (0 until wp * 3).map { x =>
          raw(ys + yp * yst)((xs + (x / 3) * xst) * 3 + x % 3).toByte }
      }
    }.toArray
    val d = new java.util.zip.Deflater()
    d.setInput(scan); d.finish()
    val buf = new Array[Byte](scan.length + 64)
    val zn = d.deflate(buf); d.end()
    val ihdr = be32(w) ++ be32(h) ++ Array[Byte](8, 2, 0, 0, 1) // interlace 1
    val payload = sig ++ chunk("IHDR", ihdr) ++ chunk("IDAT", buf.take(zn)) ++
      chunk("IEND", Array.emptyByteArray)
    val got = Multimodal.decodePng(payload)
    assert(got.isDefined, "valid Adam7 PNG must decode")
    for (y <- 0 until h; x <- 0 until w * 3)
      assert((got.get._2(y * w * 3 + x) & 0xFF) == raw(y)(x),
        s"interlaced pixel byte ($y, $x)")
    // fixture parity: the interlaced fixture decodes to the SAME stats
    // as the sequential fixture over the same pixel field
    val ids = spark.range(0, 26).select(col("id").as("doc_id"))
    def stats(m: org.apache.spark.sql.DataFrame) =
      Multimodal.decodePixels(m
        .select(col("doc_id"), col("data"), col("meta.mime").as("mime"),
          col("meta.n_bytes").as("n_bytes")).as[Multimodal.MediaRow])
        .collect().map(r => r.doc_id ->
          (r.width, r.height, r.channels, r.lum_total, r.ph)).toMap
    val seq0 = stats(Multimodal.pngMedia(ids, "doc_id", "doc_id"))
    val il = stats(Multimodal.pngMediaInterlaced(ids, "doc_id", "doc_id"))
    assert(seq0.size == 26 && il == seq0,
      "Adam7 must reproduce the sequential decode bit-for-bit")
    // refuse-never-crash over the interlaced payload's truncations
    (0 until payload.length by 3).foreach(n =>
      Multimodal.decodePng(payload.take(n)))
  }

  test("decodePpmAscii: comments and multi-space tokens parse; parity " +
      "with the binary P6 decode on the same pixels; refusals and fuzz") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val ascii = ("P3\n# c1\n2 2 # trailing\n255\n10 20 30  40 50 60\n" +
      "70 80 90 100 110 120").getBytes("US-ASCII")
    val got = Multimodal.decodePpmAscii(ascii)
    assert(got.isDefined)
    assert(got.get._2.map(_ & 0xFF).toSeq ==
      Seq(10, 20, 30, 40, 50, 60, 70, 80, 90, 100, 110, 120))
    // parity: the ASCII fixture decodes to the SAME stats as the binary
    val ids = spark.range(0, 20).select(col("id").as("doc_id"))
    def stats(m: org.apache.spark.sql.DataFrame) =
      Multimodal.decodePixels(m
        .select(col("doc_id"), col("data"), col("meta.mime").as("mime"),
          col("meta.n_bytes").as("n_bytes")).as[Multimodal.MediaRow])
        .collect().map(r => r.doc_id ->
          (r.width, r.height, r.lum_total, r.ah, r.ph)).toMap
    val bin = stats(Multimodal.ppmMedia(ids, "doc_id", "doc_id"))
    val asc = stats(Multimodal.ppmAsciiMedia(ids, "doc_id", "doc_id"))
    assert(bin.size == 20 && asc == bin,
      "P3 must reproduce the P6 decode bit-for-bit")
    // refusals: out-of-range sample, short stream, maxval > 255
    assert(Multimodal.decodePpmAscii(
      "P3\n1 1\n255\n300 0 0".getBytes("US-ASCII")).isEmpty)
    assert(Multimodal.decodePpmAscii(
      "P3\n2 2\n255\n1 2 3".getBytes("US-ASCII")).isEmpty)
    assert(Multimodal.decodePpmAscii(
      "P3\n1 1\n65535\n1 2 3".getBytes("US-ASCII")).isEmpty)
    // refuse-never-crash
    (0 until ascii.length by 2).foreach(n =>
      Multimodal.decodePpmAscii(ascii.take(n)))
    val rnd = new scala.util.Random(9)
    (1 to 200).foreach { _ =>
      Multimodal.decodePpmAscii("P3".getBytes("US-ASCII") ++
        Array.fill[Byte](rnd.nextInt(100))(rnd.nextInt(256).toByte))
    }
  }

  test("decodePng: never throws on arbitrary bytes, truncations, or " +
      "bit flips of a valid payload (refuse-never-crash)") {
    val rnd = new scala.util.Random(1234)
    // pure noise (with and without a valid signature prefix)
    val sig = Array(0x89, 'P', 'N', 'G', 0x0D, 0x0A, 0x1A, 0x0A)
      .map(_.toByte)
    (1 to 300).foreach { _ =>
      val n = rnd.nextInt(200)
      val junk = Array.fill[Byte](n)(rnd.nextInt(256).toByte)
      Multimodal.decodePng(junk) // must not throw
      Multimodal.decodePng(sig ++ junk)
    }
    // a valid payload under every truncation length and scattered bit
    // flips: decode may refuse (or, for a flip confined to pixel data,
    // succeed with different pixels) but must never throw
    def be32(v: Int) = Array[Byte]((v >> 24).toByte, (v >> 16).toByte,
      (v >> 8).toByte, v.toByte)
    def chunk(t: String, body: Array[Byte]) =
      be32(body.length) ++ t.getBytes("US-ASCII") ++ body ++ be32(0)
    val scan = Array.tabulate(10)(y =>
      0.toByte +: Array.fill[Byte](9 * 3)(((y * 31) % 256).toByte))
      .flatten
    val d = new java.util.zip.Deflater(); d.setInput(scan); d.finish()
    val zb = new Array[Byte](scan.length + 64)
    val zn = d.deflate(zb); d.end()
    val valid = sig ++
      chunk("IHDR", be32(9) ++ be32(10) ++ Array[Byte](8, 2, 0, 0, 0)) ++
      chunk("IDAT", zb.take(zn)) ++ chunk("IEND", Array.emptyByteArray)
    assert(Multimodal.decodePng(valid).isDefined)
    (0 until valid.length).foreach { cut =>
      Multimodal.decodePng(valid.take(cut)) // every prefix
    }
    (1 to 500).foreach { _ =>
      val mut = valid.clone()
      mut(rnd.nextInt(mut.length)) =
        (mut(rnd.nextInt(mut.length)) ^ (1 << rnd.nextInt(8))).toByte
      Multimodal.decodePng(mut)
    }
  }

  test("dctPhash64: exactly invariant to uniform brightness shift, " +
      "small hamming under a smooth gradient") {
    import spark.implicits._
    // 16x12 P6 with mid-range pixels (60..195) so +40 never wraps
    val w = 16; val h = 12
    def ppm(f: Int => Int): Array[Byte] = {
      val header = s"P6\n$w $h\n255\n".getBytes("UTF-8")
      header ++ Array.tabulate[Byte](w * h * 3)(i => f(i).toByte)
    }
    def basePx(i: Int): Int = 60 + (i * 37 + (i * i) % 89) % 136
    val media = Seq(
      Multimodal.MediaRow(1L, ppm(basePx), "image/ppm", 0L),
      Multimodal.MediaRow(2L, ppm(i => basePx(i) + 40), "image/ppm", 0L),
      // vertical gradient: row-linear 0..44 luminance ramp
      Multimodal.MediaRow(3L, ppm(i => basePx(i) + (i / (3 * w)) * 44 / h),
        "image/ppm", 0L)).toDS()
    val sig = Multimodal.decodePixels(media)
      .collect().map(r => r.doc_id -> (r.ah, r.ph)).toMap
    assert(sig(1L)._2 == sig(2L)._2,
      "DCT mean-centering must cancel a uniform shift exactly")
    assert(sig(1L)._1 == sig(2L)._1,
      "aHash mean-relative bits are also shift-invariant")
    val dctHam = java.lang.Long.bitCount(sig(1L)._2 ^ sig(3L)._2)
    val ahHam = java.lang.Long.bitCount(sig(1L)._1 ^ sig(3L)._1)
    assert(dctHam < ahHam,
      s"a smooth gradient must perturb the DCT spectrum less than the " +
        s"block means (dct=$dctHam ahash=$ahHam)")
  }

  test("deltaDctNearDups: equals the batch pair set restricted to " +
      "delta-involving pairs, consuming only precomputed lake signatures") {
    import spark.implicits._
    val ids = (1L to 30L).toDF("doc_id")
    def rows(df: org.apache.spark.sql.DataFrame) = df
      .select(col("doc_id"), col("data"), col("meta.mime").as("mime"),
        col("meta.n_bytes").as("n_bytes")).as[Multimodal.MediaRow]
    val lake = rows(Multimodal.ppmMedia(ids, "doc_id", "doc_id"))
    val delta = rows(Multimodal.ppmMedia(
      ids.select((col("doc_id") + 1000000).as("doc_id"),
        col("doc_id").as("seed")),
      "doc_id", "seed", deltaSql = "IF(i < 6, 8, 0)"))
    val lakeSig = Multimodal.decodePixels(lake).toDF()
      .select(col("doc_id"), col("ph")).localCheckpoint(true)
    val got = Multimodal.deltaDctNearDups(lakeSig, delta)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val batch = Multimodal.dctNearDups(lake.unionByName(delta))
      .filter(col("b") >= 1000000)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got === batch,
      "incremental pair set must equal the batch delta-involving subset")
    assert(got.nonEmpty, "perturbed copies must pair with their originals")
  }

  test("decodePixels on BMP: bottom-up row order maps to IMAGE-space " +
      "cells (top half dark in image space = low bits 0)") {
    import spark.implicits._
    // 8x8 24bpp BMP, positive height = bottom-up storage. We store the
    // BRIGHT rows FIRST in the file (file rows 0..3), which bottom-up
    // means they are the BOTTOM of the image — so image-space top half
    // is dark: aHash bits for cell rows 0..3 must be 0, rows 4..7 must
    // be 1. A decoder that forgets the flip gets the complement.
    def le32(v: Int) = Array[Byte](v.toByte, (v >> 8).toByte,
      (v >> 16).toByte, (v >> 24).toByte)
    def le16(v: Int) = Array[Byte](v.toByte, (v >> 8).toByte)
    val rowStride = 8 * 3 // 24 bytes, already 4-aligned
    val px = Array.tabulate[Byte](rowStride * 8) { i =>
      val fileRow = i / rowStride
      if (fileRow < 4) 0xFF.toByte else 0x00.toByte
    }
    val bmp = "BM".getBytes("UTF-8") ++ le32(54 + px.length) ++ le32(0) ++
      le32(54) ++ le32(40) ++ le32(8) ++ le32(8) ++ le16(1) ++ le16(24) ++
      le32(0) ++ le32(px.length) ++ Array.fill[Byte](16)(0) ++ px
    val media = Seq(Multimodal.MediaRow(1L, bmp, "image/bmp",
      bmp.length.toLong)).toDS()
    val got = Multimodal.decodePixels(media).collect().head
    val expected = (0 until 64).map { k =>
      if (k / 8 >= 4) 1L << k else 0L }.sum
    assert(got.ah == expected,
      f"bottom-up flip wrong: ah=${got.ah}%016x expected=$expected%016x")
  }

  test("dctNearDups: identical images pair at hamming 0, banding " +
      "equals brute force at hamming <= 3, sub-8x8 images are excluded") {
    import spark.implicits._
    val ids = (1L to 40L).toDF("doc_id")
    val orig = Multimodal.ppmMedia(ids, "doc_id", "doc_id")
    // doc 41 = exact copy of doc 1's image (same seed)
    val copy = Multimodal.ppmMedia(
      ids.filter(col("doc_id") === 1)
        .select((col("doc_id") + 40).as("doc_id"), col("doc_id").as("seed")),
      "doc_id", "seed")
    val media = orig.unionByName(copy)
      .select(col("doc_id"), col("data"), col("meta.mime").as("mime"),
        col("meta.n_bytes").as("n_bytes"))
      .as[Multimodal.MediaRow]
    val sig = Multimodal.decodePixels(media)
      .collect().map(r => r.doc_id -> r.ph).toMap
    assert(sig(1L) == sig(41L), "same pixels must hash identically")
    val got = Multimodal.dctNearDups(media)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val brute = (for {
      (a, pa) <- sig.toSeq; (b, pb) <- sig.toSeq if a < b
      h = java.lang.Long.bitCount(pa ^ pb) if h <= 3
    } yield (a, b, h.toLong)).toSet
    assert(got === brute, "banding must equal brute-force hamming<=3")
    assert(got.contains((1L, 41L, 0L)))
    // a 4x4 image is below the 8x8 grid: no signature, no pairs
    val tinyHeader = "P6\n4 4\n255\n".getBytes("UTF-8")
    val tiny = Seq(Multimodal.MediaRow(99L,
      tinyHeader ++ Array.fill[Byte](48)(1), "image/ppm", 63L)).toDS()
    assert(Multimodal.decodePixels(tiny).collect().isEmpty)
  }

  test("frameDct: constant frames have an all-zero spectrum (DC " +
      "cancellation), a planted cosine concentrates in its coefficient") {
    import spark.implicits._
    val flat = Array.fill[Byte](64)(77)
    // frame of a slow cosine at frequency u=2 around a bias: the u=2
    // coefficient must dominate every other
    val wave = Array.tabulate[Byte](32) { x =>
      (128 + Math.round(90 * StrictMath.cos(
        StrictMath.PI * (2 * x + 1) * 2 / 64.0))).toByte
    }
    val media = Seq(
      (1L, flat, "application/octet-stream", 64L),
      (2L, wave, "application/octet-stream", 32L))
      .toDF("doc_id", "data", "mime", "n_bytes")
    val got = Multimodal.frameDct(media).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getString(2)).toMap
    assert(got((1L, 0L)) == "0,0,0,0,0,0,0" &&
      got((1L, 1L)) == "0,0,0,0,0,0,0",
      "a constant frame must transform to exactly zero")
    val coeffs = got((2L, 0L)).split(",").map(_.toLong) // u = 1..7
    val dominant = coeffs.map(math.abs).zipWithIndex.maxBy(_._1)._2 + 1
    assert(dominant == 2, s"planted u=2 cosine, spectrum ${coeffs.toSeq}")
    assert(math.abs(coeffs(1)) > 5L * coeffs.zipWithIndex
      .collect { case (c, i) if i != 1 => math.abs(c) }.max,
      "the planted frequency must dominate by a wide margin")
  }

  test("byte sampling strides deterministically") {
    val m = Multimodal.attachBinary(docs.limit(5), "doc_id", "text")
    val out = Multimodal.sampleBytes(m, stride = 10).select("doc_id", "data", "sampled").collect()
    out.foreach { r =>
      val data = r.getAs[Array[Byte]]("data")
      val sampled = r.getSeq[Array[Byte]](r.fieldIndex("sampled"))
      assert(sampled.length == (data.length + 9) / 10)
      assert(sampled.head.head == data(0))
      sampled.zipWithIndex.foreach { case (b, i) => assert(b.head == data(i * 10)) }
    }
  }

  test("frameEnergy: overlapping frames with byte-sum energy and peak") {
    import spark.implicits._
    // "aaaabbbb" (8 bytes), frameLen 4, hop 2 → 3 frames:
    //   [97,97,97,97]=388/97, [97,97,98,98]=390/98, [98,98,98,98]=392/98
    val m = Multimodal.attachBinary(
      Seq((1L, "aaaabbbb"), (2L, "xyz")).toDF("doc_id", "text"),
      "doc_id", "text")
    val got = Multimodal.frameEnergy(m, frameLen = 4, hop = 2)
      .orderBy("doc_id", "frame_idx").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    // doc 2 is shorter than a frame → dropped entirely
    assert(got.toSeq == Seq(
      (1L, 0L, 0L, 388L, 97L),
      (1L, 1L, 2L, 390L, 98L),
      (1L, 2L, 4L, 392L, 98L)))
  }

  test("metadata-only projection does not touch payload bytes") {
    val m = Multimodal.attachBinary(docs, "doc_id", "text")
    val metaOnly = m.select(col("doc_id"), col("meta.n_bytes"))
    assert(metaOnly.count() == docs.count())
  }

  test("cdcChunks: chunks partition the payload losslessly, identical " +
      "payloads chunk identically, a prefix edit re-aligns the tail") {
    import spark.implicits._
    val body = "the quick brown fox jumps over the lazy dog and keeps going " * 4
    val docs = Seq((1L, body), (2L, body), (3L, "PREFIX " + body))
      .toDF("doc_id", "text")
    val ch = Multimodal.cdcChunks(
        Multimodal.attachBinary(docs, "doc_id", "text"), "doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
    // lossless partition: chunk lengths sum to the payload byte length
    val lens = ch.groupBy(_._1).view.mapValues(_.map(_._4).sum).toMap
    assert(lens(1L) === body.length.toLong)
    assert(lens(3L) === body.length.toLong + 7)
    // determinism: identical payloads produce identical chunk sequences
    val seq1 = ch.filter(_._1 == 1L).sortBy(_._2).map(c => (c._3, c._4)).toSeq
    val seq2 = ch.filter(_._1 == 2L).sortBy(_._2).map(c => (c._3, c._4)).toSeq
    assert(seq1 === seq2)
    // content-defined re-alignment: the prefixed copy still shares most
    // distinct chunk hashes with the original (fixed-size would share ~0)
    val h1 = ch.filter(_._1 == 1L).map(_._3).toSet
    val h3 = ch.filter(_._1 == 3L).map(_._3).toSet
    assert((h1 & h3).size.toDouble / h1.size > 0.6,
      s"resync too low: ${(h1 & h3).size}/${h1.size}")
  }

  test("cdcChunks: payloads shorter than the 4-byte rolling window yield " +
      "one whole-payload chunk, empty payloads yield none") {
    import spark.implicits._
    val docs = Seq((1L, ""), (2L, "a"), (3L, "abc"), (4L, "abcd"))
      .toDF("doc_id", "text")
    val ch = Multimodal.cdcChunks(
        Multimodal.attachBinary(docs, "doc_id", "text"), "doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(3)))
    // empty payload: no chunk rows; 1..4-byte payloads: exactly one chunk
    // spanning the whole payload (no cut candidate exists under 4 bytes,
    // and a 4-byte payload's single candidate rarely fires — but if it
    // does the chunks still sum to the payload length)
    assert(!ch.exists(_._1 == 1L))
    assert(ch.filter(_._1 == 2L).toSeq == Seq((2L, 1L)))
    assert(ch.filter(_._1 == 3L).toSeq == Seq((3L, 3L)))
    assert(ch.filter(_._1 == 4L).map(_._2).sum == 4L)
  }

  test("phash: identical payloads at hamming 0, localized edit stays near, " +
      "banding is exhaustive to hamming 3") {
    import spark.implicits._
    // payloads long enough that one block ≈ 2 bytes; doc 2 is a copy of
    // doc 1, doc 3 edits a single byte, the rest are unrelated
    val base = "the quick brown fox jumps over the lazy dog again and again " * 2
    val corpus = (Seq(
      (1L, base), (2L, base), (3L, base.updated(5, 'X').toString)) ++
      (4L to 40L).map(i => (i, s"unrelated payload number $i " * (i.toInt % 5 + 2))))
      .toDF("doc_id", "text")
    val media = Multimodal.attachBinary(corpus, "doc_id", "text")
    val sig = Multimodal.phashSignatures(media, "doc_id")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sig(1L) == sig(2L), "identical payloads must hash identically")
    assert(java.lang.Long.bitCount(sig(1L) ^ sig(3L)) <= 2,
      "a one-byte edit may flip at most the touched block's bit (plus a " +
        "grid-boundary neighbor)")
    // banding finds EVERY pair within hamming 3 (pigeonhole over 4 bands)
    // — among payloads >= 60 bytes; shorter payloads haven't 60
    // informative blocks (trailing zero bits would alias unrelated short
    // docs into candidates) and are excluded by the operator's domain
    // restriction
    val lens = corpus.collect()
      .map(r => r.getLong(0) -> r.getString(1).getBytes("UTF-8").length)
      .toMap
    val longIds = lens.filter(_._2 >= 60).keySet
    val got = Multimodal.phashNearDups(media, "doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val brute = (for {
      (a, pa) <- sig.toSeq if longIds(a)
      (b, pb) <- sig.toSeq if longIds(b) && a < b
      h = java.lang.Long.bitCount(pa ^ pb) if h <= 3
    } yield (a, b, h.toLong)).toSet
    assert(got === brute, "banding must equal brute-force hamming<=3")
    assert(lens.exists(_._2 < 60),
      "corpus must exercise the short-payload exclusion")
    got.foreach { case (a, b, _) =>
      assert(longIds(a) && longIds(b), "short payloads must never pair") }
  }

  test("rotate90cw: exact pixel permutation on a hand image, four " +
      "rotations are the identity, BGR/bottom-up inputs normalize") {
    // 2x3 RGB image, every pixel distinct: rows (by value of R)
    //   (10)(20)   layout w=2, h=3
    //   (30)(40)
    //   (50)(60)
    def px(v: Int) = Seq(v, v + 1, v + 2).map(_.toByte)
    val buf = Seq(10, 20, 30, 40, 50, 60).flatMap(px).toArray
    val info = Multimodal.ImageInfo(2, 3, 3, 0, 6,
      bottomUp = false, bgr = false)
    val (ri, rb) = Multimodal.rotate90cw(info, buf)
    assert(ri.width == 3 && ri.height == 2)
    // CW: new row 0 = old column 0 bottom-up = 50, 30, 10
    //     new row 1 = old column 1 bottom-up = 60, 40, 20
    val wantR = Seq(50, 30, 10, 60, 40, 20)
    assert((0 until 6).forall(p => (rb(p * 3) & 0xFF) == wantR(p)),
      s"rotated R channel: ${rb.grouped(3).map(_(0) & 0xFF).toSeq}")
    // four CW rotations = identity (packed layout)
    var cur = (info.copy(), buf)
    for (_ <- 1 to 4) cur = Multimodal.rotate90cw(cur._1, cur._2)
    assert(cur._1.width == 2 && cur._1.height == 3)
    assert(cur._2.sameElements(buf), "4 rotations must be the identity")
    // bottom-up BGR input (the BMP layout) normalizes to the same
    // rotated RGB output as the equivalent top-down RGB input
    val bgrBuf = Seq(50, 60, 30, 40, 10, 20) // rows reversed (bottom-up)
      .flatMap(v => Seq(v + 2, v + 1, v).map(_.toByte)).toArray
    val bgrInfo = Multimodal.ImageInfo(2, 3, 3, 0, 6,
      bottomUp = true, bgr = true)
    val (_, rb2) = Multimodal.rotate90cw(bgrInfo, bgrBuf)
    assert(rb2.sameElements(rb), "layout normalization must agree")
  }

  test("bilinear 16x16: corners anchor exactly (align-corners), a " +
      "constant image sums trivially, a linear ramp interpolates to " +
      "the closed form") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    def p6(w: Int, h: Int, v: (Int, Int) => Int): Array[Byte] =
      s"P6\n$w $h\n255\n".getBytes("US-ASCII") ++
        (0 until h).flatMap(y => (0 until w).flatMap(x =>
          Seq.fill(3)(v(x, y).toByte))).toArray
    def run(payload: Array[Byte]) = {
      val media = Seq((1L, payload)).toDF("doc_id", "data")
        .select(col("doc_id"), col("data"), lit("image/ppm").as("mime"),
          octet_length(col("data")).cast("long").as("n_bytes"))
        .as[Multimodal.MediaRow]
      val r = Multimodal.bilinearStats(media).collect().head
      (r.resize_total, r.tl225, r.br225)
    }
    // constant 7: every cell is 225 * 7000
    assert(run(p6(5, 4, (_, _) => 7)) ==
      ((256L * 225 * 7000, 225L * 7000, 225L * 7000)))
    // v = x on 4x3: out225(i, j) = 15000 * i * (w-1), summed = 28.8e6*(w-1)
    assert(run(p6(4, 3, (x, _) => x)) ==
      ((28800000L * 3, 0L, 225L * 3000)))
  }

  test("otsu: hand histograms pin the argmax, candidate set, and " +
      "tiebreak; a constant image emits no row") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    def p6g(vals: Seq[Int]): Array[Byte] =
      s"P6\n${vals.length} 1\n255\n".getBytes("US-ASCII") ++
        vals.flatMap(v => Seq.fill(3)(v.toByte)).toArray
    def run(payload: Array[Byte]) = {
      val media = Seq((1L, payload)).toDF("doc_id", "data")
        .select(col("doc_id"), col("data"), lit("image/ppm").as("mime"),
          octet_length(col("data")).cast("long").as("n_bytes"))
        .as[Multimodal.MediaRow]
      Multimodal.otsuStats(media).collect()
        .map(r => (r.threshold, r.n_below, r.sum_below)).toSeq
    }
    // bimodal: the only valid cut is at the lower level
    assert(run(p6g(Seq(10, 10, 200, 200))) == Seq((10, 2L, 20L)))
    // trimodal: t=100 scores 565^2/3 > t=0's 455^2/3
    assert(run(p6g(Seq(0, 100, 100, 255))) == Seq((100, 3L, 200L)))
    // constant image: both classes can never be non-empty
    assert(run(p6g(Seq(7, 7, 7, 7))).isEmpty)
  }

  test("sobel: pure-x and pure-y gradients excite exactly one kernel; " +
      "linear fixtures match the closed form") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    def p6(w: Int, h: Int, v: (Int, Int) => Int): Array[Byte] =
      s"P6\n$w $h\n255\n".getBytes("US-ASCII") ++
        (0 until h).flatMap(y => (0 until w).flatMap(x =>
          Seq.fill(3)(v(x, y).toByte))).toArray
    def run(payload: Array[Byte]) = {
      val media = Seq((1L, payload)).toDF("doc_id", "data")
        .select(col("doc_id"), col("data"), lit("image/ppm").as("mime"),
          octet_length(col("data")).cast("long").as("n_bytes"))
        .as[Multimodal.MediaRow]
      val r = Multimodal.sobelStats(media).collect().head
      (r.n_interior, r.gx_total, r.gy_total, r.grad_wsum)
    }
    // v = x on 4x3: two interior pixels, Gx = 8000 each, Gy = 0
    assert(run(p6(4, 3, (x, _) => x)) ==
      ((2L, 16000L, 0L, 8000L * 5 + 8000L * 6)))
    // v = y on 3x4: the transposed response — a swapped kernel fails here
    assert(run(p6(3, 4, (_, y) => y)) ==
      ((2L, 0L, 16000L, 8000L * 4 + 8000L * 7)))
    // linear fixture parity against the closed form
    val ids = spark.range(0, 24).select(col("id").as("doc_id"))
    val media = Multimodal.ppmMediaLinear(ids, "doc_id", "doc_id")
      .select(col("doc_id"), col("data"), col("meta.mime").as("mime"),
        col("meta.n_bytes").as("n_bytes")).as[Multimodal.MediaRow]
    val got = Multimodal.sobelStats(media).collect()
      .map(r => r.doc_id ->
        ((r.n_interior, r.gx_total, r.gy_total, r.grad_wsum))).toMap
    (0L until 24L).foreach { seed =>
      val w = (seed % 13 + 8).toInt; val h = (seed % 11 + 8).toInt
      val a = seed % 3 + 1; val b = seed % 2 + 1
      val n = (w - 2L) * (h - 2)
      var wsum = 0L
      for (y <- 1 until h - 1; x <- 1 until w - 1)
        wsum += (8000 * a + 8000 * b) * (y.toLong * w + x)
      assert(got(seed) == ((n, 8000 * a * n, 8000 * b * n, wsum)),
        s"seed $seed")
    }
  }

  test("decodePng palette: PLTE expansion at depths 8/4/2/1 with packed-" +
      "byte filtering, tRNS alpha (255 past its length), and the " +
      "ordering/index refusal edges") {
    def be32(v: Int) = Array[Byte]((v >> 24).toByte, (v >> 16).toByte,
      (v >> 8).toByte, v.toByte)
    def chunk(ctype: String, body: Array[Byte]): Array[Byte] =
      be32(body.length) ++ ctype.getBytes("US-ASCII") ++ body ++ be32(0)
    val sig = Array(0x89, 'P', 'N', 'G', 0x0D, 0x0A, 0x1A, 0x0A)
      .map(_.toByte)
    def deflate(raw: Array[Byte]): Array[Byte] = {
      val d = new java.util.zip.Deflater()
      d.setInput(raw); d.finish()
      val buf = new Array[Byte](raw.length + 64)
      val zn = d.deflate(buf); d.end()
      buf.take(zn)
    }
    // indices -> packed filtered scanlines (even rows None, odd Sub@1B)
    def pack(w: Int, h: Int, depth: Int, idx: (Int, Int) => Int): Array[Byte] = {
      val rb = (w * depth + 7) / 8
      (0 until h).flatMap { y =>
        val packedRow = Array.tabulate(rb) { k =>
          var v = 0
          var bit = 0
          while (bit < 8) {
            val x = (k * 8 + bit) / depth
            val inPix = bit % depth == 0 && x < w
            if (inPix) v |= (idx(x, y) & ((1 << depth) - 1)) << (8 - depth - bit)
            bit += 1
          }
          v.toByte
        }
        val f = if (y % 2 == 0) 0 else 1
        val bytes = if (f == 0) packedRow
          else Array.tabulate(rb)(k => ((packedRow(k) -
            (if (k > 0) packedRow(k - 1) else 0)) & 0xFF).toByte)
        f.toByte +: bytes
      }.toArray
    }
    def pngPal(w: Int, h: Int, depth: Int, plte: Array[Byte],
               trns: Option[Array[Byte]], idx: (Int, Int) => Int,
               trnsBeforePlte: Boolean = false): Array[Byte] = {
      val ihdr = be32(w) ++ be32(h) ++ Array[Byte](depth.toByte, 3, 0, 0, 0)
      val tc = trns.map(chunk("tRNS", _)).getOrElse(Array.emptyByteArray)
      val pc = chunk("PLTE", plte)
      sig ++ chunk("IHDR", ihdr) ++
        (if (trnsBeforePlte) tc ++ pc else pc ++ tc) ++
        chunk("IDAT", deflate(pack(w, h, depth, idx))) ++
        chunk("IEND", Array.emptyByteArray)
    }
    val plte4 = Array[Byte](10, 20, 30, 40, 50, 60, 70, 80, 90,
      100, 110, 120) // 4 entries
    // depth 8, 5x3, index = (x + y) % 4: exact RGB expansion
    locally {
      val got = Multimodal.decodePng(
        pngPal(5, 3, 8, plte4, None, (x, y) => (x + y) % 4))
      assert(got.isDefined, "depth-8 palette must decode")
      val (info, buf) = got.get
      assert(info.channels == 3 && info.width == 5 && info.height == 3)
      for (y <- 0 until 3; x <- 0 until 5; c <- 0 until 3)
        assert((buf((y * 5 + x) * 3 + c) & 0xFF) ==
          plte4(3 * ((x + y) % 4) + c),
          s"pixel ($x,$y,$c)")
    }
    // sub-byte depths: the SAME index field must expand identically
    for (depth <- Seq(1, 2, 4)) {
      val m = 1 << math.min(depth, 2) // indices within palette
      val got = Multimodal.decodePng(
        pngPal(7, 4, depth, plte4, None, (x, y) => (x + y) % m))
      assert(got.isDefined, s"depth-$depth palette must decode")
      val (info, buf) = got.get
      for (y <- 0 until 4; x <- 0 until 7; c <- 0 until 3)
        assert((buf((y * 7 + x) * 3 + c) & 0xFF) ==
          plte4(3 * ((x + y) % m) + c),
          s"depth=$depth pixel ($x,$y,$c)")
    }
    // tRNS: RGBA out, alpha = trns(idx) below its length, 255 past it
    locally {
      val trns = Array[Byte](33, 66) // entries 0,1 translucent; 2,3 opaque
      val got = Multimodal.decodePng(
        pngPal(5, 3, 8, plte4, Some(trns), (x, y) => (x + y) % 4))
      assert(got.isDefined)
      val (info, buf) = got.get
      assert(info.channels == 4, "tRNS upgrades the decode to RGBA")
      for (y <- 0 until 3; x <- 0 until 5) {
        val j = (x + y) % 4
        val a = buf((y * 5 + x) * 4 + 3) & 0xFF
        assert(a == (if (j < 2) trns(j) & 0xFF else 255), s"alpha ($x,$y)")
      }
    }
    // refusal edges
    locally { // no PLTE at all
      val noPlte = {
        val ihdr = be32(5) ++ be32(3) ++ Array[Byte](8, 3, 0, 0, 0)
        sig ++ chunk("IHDR", ihdr) ++
          chunk("IDAT", deflate(pack(5, 3, 8, (x, y) => (x + y) % 4))) ++
          chunk("IEND", Array.emptyByteArray)
      }
      assert(Multimodal.decodePng(noPlte).isEmpty, "palette without PLTE")
    }
    assert(Multimodal.decodePng(
      pngPal(5, 3, 8, plte4, None, (_, _) => 4)).isEmpty,
      "index past the palette refuses, never fabricates")
    assert(Multimodal.decodePng(
      pngPal(5, 3, 8, plte4, Some(Array[Byte](1, 2)), (x, y) => (x + y) % 4,
        trnsBeforePlte = true)).isEmpty, "tRNS before PLTE refuses")
    assert(Multimodal.decodePng(
      pngPal(5, 3, 8, plte4, Some(new Array[Byte](5)),
        (x, y) => (x + y) % 4)).isEmpty,
      "tRNS longer than the palette refuses")
  }
}

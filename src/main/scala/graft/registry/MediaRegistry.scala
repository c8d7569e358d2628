package graft.registry

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.operators._

/** Multimodal tier: mm_* — codec decodes (JPEG/GIF/TIFF/WAV/FLAC/AVI),
  * frame/feature extraction, perceptual hashing.
  *
  * Split from the monolithic SparkEntry registry (round-12 hygiene);
  * keys and SQL are unchanged.
  */
object MediaRegistry {
  import OracleSql._

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "mm_binary_meta"        -> (LlmQueries.mmBinaryMeta _),
    "mm_decode"             -> (LlmQueries.mmDecode _),
    "mm_frame_sample"       -> (LlmQueries.mmFrameSample _),
    "mm_audio_frames"       -> (LlmQueries.mmAudioFrames _),
    "mm_scene_detect"       -> (LlmQueries.mmSceneDetect _),
    "mm_resize"             -> (LlmQueries.mmResize _),
    "mm_binary_dedup"       -> (LlmQueries.mmBinaryDedup _),
    "mm_phash_neardup"      -> (LlmQueries.mmPhashNearDup _),
    "mm_phash_recall"       -> (LlmQueries.mmPhashRecall _),
    "mm_png_decode"         -> (LlmQueries.mmPngDecode _),
    "mm_png_palette"        -> (LlmQueries.mmPngPalette _),
    "mm_jpeg_exif"          -> (LlmQueries.mmJpegExif _),
    "mm_png_interlaced"     -> (LlmQueries.mmPngInterlaced _),
    "mm_jpeg_decode"        -> (LlmQueries.mmJpegDecode _),
    "mm_jpeg_color"         -> (LlmQueries.mmJpegColor _),
    "mm_jpeg_progressive"   -> (LlmQueries.mmJpegProgressive _),
    "mm_gif_frames"         -> (LlmQueries.mmGifFrames _),
    "mm_video_frames"       -> (LlmQueries.mmVideoFrames _),
    "mm_video_audio"        -> (LlmQueries.mmVideoAudio _),
    "mm_gif_scene"          -> (LlmQueries.mmGifScene _),
    "mm_wav_decode"         -> (LlmQueries.mmWavDecode _),
    "mm_flac_decode"        -> (LlmQueries.mmFlacDecode _),
    "mm_wav_frames"         -> (LlmQueries.mmWavFrames _),
    "mm_audio_resample"     -> (LlmQueries.mmAudioResample _),
    "mm_audio_mulaw"        -> (LlmQueries.mmAudioMulaw _),
    "mm_audio_adpcm"        -> (LlmQueries.mmAudioAdpcm _),
    "mm_audio_downmix"      -> (LlmQueries.mmAudioDownmix _),
    "mm_audio_trim"         -> (LlmQueries.mmAudioTrim _),
    "mm_stft_power"         -> (LlmQueries.mmStftPower _),
    "mm_rotate90"           -> (LlmQueries.mmRotate90 _),
    "mm_frame_dct"          -> (LlmQueries.mmFrameDct _),
    "mm_bmp_decode"         -> (LlmQueries.mmBmpDecode _),
    "mm_gif_decode"         -> (LlmQueries.mmGifDecode _),
    "mm_tiff_decode"        -> (LlmQueries.mmTiffDecode _),
    "mm_tga_decode"         -> (LlmQueries.mmTgaDecode _),
    "mm_qoi_decode"         -> (LlmQueries.mmQoiDecode _),
    "mm_sobel"              -> (LlmQueries.mmSobel _),
    "mm_otsu"               -> (LlmQueries.mmOtsu _),
    "mm_resize_bilinear"    -> (LlmQueries.mmResizeBilinear _),
    "mm_ico_decode"         -> (LlmQueries.mmIcoDecode _),
    "mm_ppm_ascii"          -> (LlmQueries.mmPpmAscii _),
    "mm_pgm_decode"         -> (LlmQueries.mmPgmDecode _),
    "mm_exif_rotate"        -> (LlmQueries.mmExifRotate _),
    "mm_incremental_phash"  -> (LlmQueries.mmIncrementalPhash _),
    "mm_cdc_chunking"       -> (LlmQueries.mmCdcDedup _),
  )

  def oracleSql: Map[String, String] = Map(
    "mm_binary_meta" ->
      """SELECT doc_id, 'application/octet-stream' AS mime,
        |  CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
        |  CAST(ascii(substr(text, 1, 1)) AS BIGINT) AS first_byte,
        |  md5(text) AS fp
        |FROM documents ORDER BY doc_id""".stripMargin,
    "mm_binary_dedup" ->
      """SELECT md5(text) AS content_md5, MIN(doc_id) AS keep_id,
        |  COUNT(*) AS n_copies,
        |  CAST(SUM(octet_length(encode(text))) AS BIGINT) AS total_bytes
        |FROM documents GROUP BY md5(text) ORDER BY keep_id""".stripMargin,
    // Same base-31 polynomial cut rule over the trailing 4 bytes, same
    // prefix-sum chunk ids, same ordered reassembly + md5 — chunking and
    // overlap recomputed fully.
    "mm_cdc_chunking" ->
      """WITH base AS (SELECT doc_id, text FROM documents),
        |corpus AS (SELECT doc_id, text FROM base
        |           UNION ALL SELECT doc_id + 1000000, 'XY ' || text FROM base),
        |d AS (SELECT doc_id, hex(encode(text)) AS hx,
        |        list_transform(range(1, CAST(octet_length(encode(text)) AS BIGINT) + 1),
        |          p -> ('0x' || substr(hex(encode(text)),
        |            CAST((p - 1) * 2 + 1 AS BIGINT), 2))::BIGINT) AS bv
        |      FROM corpus),
        |b AS (SELECT doc_id, g.p AS p,
        |        substr(hx, CAST((g.p - 1) * 2 + 1 AS BIGINT), 2) AS hp,
        |        CASE WHEN g.p >= 4 AND
        |          (bv[CAST(g.p - 3 AS BIGINT)] * 29791
        |           + bv[CAST(g.p - 2 AS BIGINT)] * 961
        |           + bv[CAST(g.p - 1 AS BIGINT)] * 31
        |           + bv[CAST(g.p AS BIGINT)]) % 16 = 0
        |        THEN 1 ELSE 0 END AS cut
        |      FROM d, LATERAL (SELECT unnest(range(1,
        |        CAST(len(hx) / 2 AS BIGINT) + 1)) AS p) g),
        |c AS (SELECT doc_id, p, hp,
        |        COALESCE(SUM(cut) OVER (PARTITION BY doc_id ORDER BY p
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cid
        |      FROM b),
        |ch AS (SELECT doc_id, cid, md5(string_agg(hp, '' ORDER BY p)) AS h
        |       FROM c GROUP BY doc_id, cid),
        |o AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_chunks_orig,
        |        CAST(COUNT(DISTINCT h) AS BIGINT) AS nd_orig
        |      FROM ch WHERE doc_id < 1000000 GROUP BY doc_id),
        |oh AS (SELECT DISTINCT doc_id, h FROM ch WHERE doc_id < 1000000),
        |sh AS (SELECT DISTINCT doc_id - 1000000 AS doc_id, h
        |       FROM ch WHERE doc_id >= 1000000),
        |sn AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS nd_shift
        |       FROM sh GROUP BY doc_id),
        |sj AS (SELECT oh.doc_id, CAST(COUNT(*) AS BIGINT) AS n_shared
        |       FROM oh JOIN sh ON oh.doc_id = sh.doc_id AND oh.h = sh.h
        |       GROUP BY oh.doc_id)
        |SELECT o.doc_id, n_chunks_orig, nd_orig, nd_shift,
        |  CAST(COALESCE(n_shared, 0) AS BIGINT) AS n_shared,
        |  ROUND(COALESCE(n_shared, 0) / CAST(nd_orig AS DOUBLE), 4) AS resync_ratio
        |FROM o JOIN sn ON o.doc_id = sn.doc_id
        |LEFT JOIN sj ON o.doc_id = sj.doc_id
        |ORDER BY o.doc_id""".stripMargin,
    // DCT pHash over REAL decoded pixels: the engine parses actual P6
    // bytes, the oracle replays the integer signature pipeline from the
    // generator formula — same nearest-sample 32x32 luma grid, same
    // mean-centering, the SAME fixed-point cosine table (interpolated
    // from Multimodal.DctT), same 63*F > sumAC threshold, same 4x16-bit
    // banding + exact-hamming verify.
    "mm_phash_neardup" -> phashDctOracleSql(deltaInvolving = false),
    // The delta-involving subset of the mm_phash_neardup pair class
    // (the greater id of any such pair is a delta doc): the engine only
    // DECODES the delta and reads the persisted lake signature artifact;
    // the oracle recomputes both sides from the generator formula.
    "mm_incremental_phash" -> phashDctOracleSql(deltaInvolving = true),
    // Robustness contrast under a smooth luminance gradient: both
    // integer hash pipelines replayed bit-for-bit; recall per method.
    "mm_phash_recall" -> phashRecallOracleSql,
    // Same byte stream, same mean-centering (32·b − Σb, DC cancels),
    // the SAME interpolated cosine table — every coefficient reproduces.
    "mm_frame_dct" ->
      s"""WITH m AS (
         |  SELECT doc_id, encode(text) AS data,
         |    octet_length(encode(text)) AS n
         |  FROM documents WHERE octet_length(encode(text)) >= 32),
         |fr AS (
         |  SELECT doc_id, data,
         |    unnest(range(0, CAST(floor((n - 32) / 32) AS INT) + 1)) AS fi
         |  FROM m),
         |b AS (
         |  SELECT doc_id, fi, g.i - 1 AS x,
         |    ('0x' || substr(hex(data), 2 * (fi * 32 + g.i) - 1, 2))::BIGINT
         |      AS bv
         |  FROM fr, LATERAL (SELECT unnest(range(1, 33)) AS i) g),
         |c AS (SELECT doc_id, fi, SUM(bv) AS fsum FROM b GROUP BY 1, 2),
         |dct AS (SELECT * FROM (VALUES ${graft.operators.Multimodal.dctTableSql})
         |  v(u, x, t)),
         |co AS (SELECT b.doc_id, b.fi, d.u,
         |    SUM(d.t * (32 * b.bv - c.fsum)) AS coeff
         |  FROM b JOIN c USING (doc_id, fi)
         |  JOIN dct d ON d.x = b.x AND d.u >= 1
         |  GROUP BY 1, 2, 3)
         |SELECT doc_id, CAST(fi AS BIGINT) AS frame_idx,
         |  string_agg(CAST(coeff AS VARCHAR), ',' ORDER BY u) AS spec_csv
         |FROM co GROUP BY 1, 2 ORDER BY doc_id, frame_idx""".stripMargin,
    "mm_audio_frames" ->
      """WITH m AS (
        |  SELECT doc_id, encode(text) AS data, octet_length(encode(text)) AS n
        |  FROM documents WHERE octet_length(encode(text)) >= 64),
        |fr AS (
        |  SELECT doc_id, data,
        |    unnest(range(0, CAST(floor((n - 64) / 32) AS INT) + 1)) AS fi
        |  FROM m),
        |b AS (
        |  SELECT doc_id, fi,
        |    ('0x' || substr(hex(data), 2 * (fi * 32 + g.i) - 1, 2))::BIGINT AS bv
        |  FROM fr, LATERAL (SELECT unnest(range(1, 65)) AS i) g)
        |SELECT doc_id, CAST(fi AS BIGINT) AS frame_idx,
        |  CAST(fi * 32 AS BIGINT) AS f_start,
        |  CAST(SUM(bv) AS BIGINT) AS energy, CAST(MAX(bv) AS BIGINT) AS peak
        |FROM b GROUP BY doc_id, fi ORDER BY doc_id, frame_idx""".stripMargin,
    "mm_scene_detect" ->
      """WITH m AS (
        |  SELECT doc_id, encode(text) AS data, octet_length(encode(text)) AS n
        |  FROM documents WHERE octet_length(encode(text)) >= 64),
        |f0 AS (
        |  SELECT doc_id, data,
        |    unnest(range(0, CAST(floor((n - 64) / 32) AS INT) + 1)) AS fi
        |  FROM m),
        |b AS (
        |  SELECT doc_id, fi,
        |    ('0x' || substr(hex(data), 2 * (fi * 32 + g.i) - 1, 2))::BIGINT AS bv
        |  FROM f0, LATERAL (SELECT unnest(range(1, 65)) AS i) g),
        |fr AS (SELECT doc_id, CAST(fi AS BIGINT) AS frame_idx,
        |         CAST(SUM(bv) AS BIGINT) AS energy
        |       FROM b GROUP BY doc_id, fi),
        |lg AS (SELECT doc_id, frame_idx, energy,
        |         LAG(energy) OVER (PARTITION BY doc_id ORDER BY frame_idx) AS prev_e
        |       FROM fr)
        |SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_frames,
        |  CAST(SUM(CASE WHEN prev_e IS NULL OR abs(energy - prev_e) > 300
        |       THEN 1 ELSE 0 END) AS BIGINT) AS n_scenes,
        |  CAST(MAX(abs(energy - COALESCE(prev_e, energy))) AS BIGINT) AS max_jump
        |FROM lg GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    // The engine PARSES real P6 bytes partition-wise; the oracle
    // recomputes the closed-form generator (w = id%13+8, h = id%11+8,
    // pixel byte i = (id*31 + i*17 + (id*i mod 251) + 40*((i div 3w)
    // mod 6)) % 256) — a green row proves the parsed geometry and the
    // decoded pixel features match the bytes' actual content.
    "mm_decode" ->
      """WITH d AS (SELECT doc_id,
        |    CAST(doc_id % 13 + 8 AS BIGINT) AS w,
        |    CAST(doc_id % 11 + 8 AS BIGINT) AS h
        |  FROM documents),
        |f AS (
        |  SELECT doc_id, g.i % 4 AS j,
        |    SUM((doc_id * 31 + g.i * 17 + (doc_id * g.i) % 251
        |         + 40 * ((g.i // (w * 3)) % 6)) % 256) AS fv
        |  FROM d, LATERAL (SELECT unnest(range(0, w * h * 3)) AS i) g
        |  GROUP BY doc_id, g.i % 4)
        |SELECT d.doc_id,
        |  CAST(d.w AS INT) AS width,
        |  CAST(d.h AS INT) AS height,
        |  CAST(3 AS INT) AS channels,
        |  (SELECT string_agg(CAST(fv AS BIGINT), ',' ORDER BY j) FROM f
        |   WHERE f.doc_id = d.doc_id) AS features_csv
        |FROM d ORDER BY d.doc_id""".stripMargin,
    // BMP leg: geometry from the little-endian header, luminance total
    // over the padded bottom-up BGR pixel walk — the oracle recomputes
    // from the generator (byte i of the pixel area is data when
    // i mod rowStride < 3w, value (id*37 + i*13) % 256, else padding;
    // BGR weight by in-row byte position; bottom-up order is
    // irrelevant to a SUM, stride and channel order are not).
    "mm_bmp_decode" ->
      """WITH d AS (SELECT doc_id,
        |    CAST(doc_id % 9 + 8 AS BIGINT) AS w,
        |    CAST(doc_id % 7 + 8 AS BIGINT) AS h,
        |    ((doc_id % 9 + 8) * 3 + 3) // 4 * 4 AS rs
        |  FROM documents),
        |l AS (SELECT doc_id, SUM(
        |    (CASE (g.i % rs) % 3 WHEN 0 THEN 114 WHEN 1 THEN 587
        |          ELSE 299 END) *
        |    ((doc_id * 37 + g.i * 13) % 256)) AS lum_total
        |  FROM d, LATERAL (SELECT unnest(range(0, rs * h)) AS i) g
        |  WHERE g.i % rs < w * 3
        |  GROUP BY doc_id)
        |SELECT d.doc_id, CAST(d.w AS INT) AS width, CAST(d.h AS INT) AS height,
        |  CAST(3 AS INT) AS channels, CAST(l.lum_total AS BIGINT) AS lum_total
        |FROM d JOIN l USING (doc_id) ORDER BY d.doc_id""".stripMargin,
    // PNG leg: the oracle sums the closed-form RAW pixel formula — the
    // engine only reproduces it by concatenating IDAT framing, inflating
    // the stored-block zlib stream, and reversing the Sub/Up row filters.
    // the oracle replays the closed-form index stream through the
    // closed-form palette; the engine must LZW-decode to match
    "mm_gif_decode" ->
      """WITH d AS (SELECT doc_id, doc_id AS seed,
        |    CAST(doc_id % 5 + 8 AS BIGINT) AS w,
        |    CAST(doc_id % 4 + 8 AS BIGINT) AS h
        |  FROM documents),
        |px AS (SELECT d.doc_id,
        |    (d.seed * 29 + g.i * 23 + (d.seed * g.i) % 127) % 128 AS j
        |  FROM d, LATERAL (SELECT unnest(range(0, d.w * d.h)) AS i) g),
        |l AS (SELECT doc_id, SUM(
        |    299 * ((j * 2 + 5) % 256) + 587 * ((j * 7 + 11) % 256)
        |    + 114 * ((j * 13 + 17) % 256)) AS lum_total
        |  FROM px GROUP BY doc_id)
        |SELECT d.doc_id, CAST(d.w AS INT) AS width, CAST(d.h AS INT) AS height,
        |  CAST(3 AS INT) AS channels, CAST(l.lum_total AS BIGINT) AS lum_total
        |FROM d JOIN l USING (doc_id) ORDER BY d.doc_id""".stripMargin,
    // animated GIF: per-frame COMPOSITED screen luminance — the oracle's
    // per-pixel CASE picks the latest covering frame (frame 2's
    // transparent index 13 falls through to the underlying composite);
    // the engine must LZW-decode all three frames and composite them
    "mm_gif_frames" ->
      """WITH d AS (SELECT doc_id, doc_id AS seed,
        |    CAST(doc_id % 5 + 10 AS BIGINT) AS w,
        |    CAST(doc_id % 4 + 10 AS BIGINT) AS h
        |  FROM documents),
        |px AS (SELECT doc_id, seed, w, h, k.k AS frame_idx,
        |    g.p % w AS x, g.p // w AS y, g.p AS p
        |  FROM d,
        |    LATERAL (SELECT unnest(range(0, w * h)) AS p) g,
        |    LATERAL (SELECT unnest(range(0, 3)) AS k) k),
        |eff AS (SELECT doc_id, frame_idx, w, h,
        |    CASE
        |      WHEN frame_idx >= 2 AND x >= 1 AND x < w - 1
        |        AND y >= 1 AND y < 5
        |        AND (seed * 37 + ((y - 1) * (w - 2) + (x - 1)) * 17 + 3)
        |          % 128 <> 13
        |      THEN (seed * 37 + ((y - 1) * (w - 2) + (x - 1)) * 17 + 3) % 128
        |      WHEN frame_idx >= 1 AND x >= 2 AND x < w - 2
        |        AND y >= 3 AND y < h - 2
        |      THEN (seed * 31 + ((y - 3) * (w - 4) + (x - 2)) * 19 + 7) % 128
        |      ELSE (seed * 29 + p * 23) % 128
        |    END AS j
        |  FROM px),
        |l AS (SELECT doc_id, frame_idx, w, h,
        |    SUM(299 * ((j * 2 + 5) % 256) + 587 * ((j * 7 + 11) % 256)
        |      + 114 * ((j * 13 + 17) % 256)) AS lum_total
        |  FROM eff GROUP BY 1, 2, 3, 4)
        |SELECT doc_id, CAST(frame_idx AS INT) AS frame_idx,
        |  CAST(CASE frame_idx WHEN 0 THEN 10 WHEN 1 THEN 20 ELSE 30 END
        |    AS INT) AS delay_cs,
        |  CAST(w AS INT) AS width, CAST(h AS INT) AS height,
        |  CAST(lum_total AS BIGINT) AS lum_total
        |FROM l ORDER BY doc_id, frame_idx""".stripMargin,
    // scene cuts over REAL decoded GIF frames: gray-ramp palette makes
    // per-frame luminance n_px·2000·idx exactly; the lag rule flags the
    // guaranteed >=75-slot jump at frame 3 and nothing else
    "mm_gif_scene" ->
      """WITH d AS (SELECT doc_id, doc_id AS seed,
        |    CAST(doc_id % 5 + 10 AS BIGINT) AS w,
        |    CAST(doc_id % 4 + 10 AS BIGINT) AS h
        |  FROM documents),
        |f AS (SELECT doc_id, w * h AS n_px, k.k AS frame_idx,
        |    (CASE WHEN k.k < 3 THEN 8 + seed % 6
        |          ELSE 88 + seed % 6 END + k.k) AS idx
        |  FROM d, LATERAL (SELECT unnest(range(0, 6)) AS k) k),
        |g AS (SELECT doc_id, frame_idx, n_px,
        |    n_px * 2000 * idx AS lum_total,
        |    COALESCE(n_px * 2000 * idx - LAG(n_px * 2000 * idx) OVER
        |      (PARTITION BY doc_id ORDER BY frame_idx), 0) AS lum_diff
        |  FROM f)
        |SELECT doc_id, CAST(frame_idx AS INT) AS frame_idx,
        |  CAST(lum_total AS BIGINT) AS lum_total,
        |  CAST(lum_diff AS BIGINT) AS lum_diff,
        |  (abs(lum_diff) > 40 * 2000 * n_px) AS is_cut
        |FROM g ORDER BY doc_id, frame_idx""".stripMargin,
    // gray-8 TIFF through real MSB-first/early-change LZW; the oracle
    // sums the closed-form pixel bytes (1000x gray luminance)
    "mm_tiff_decode" ->
      """WITH d AS (SELECT doc_id, doc_id AS seed,
        |    CAST((doc_id % 3 + 2) * 4 AS BIGINT) AS w,
        |    CAST(doc_id % 5 + 8 AS BIGINT) AS h
        |  FROM documents),
        |l AS (SELECT doc_id, SUM(1000 *
        |    ((seed * 19 + g.i * 31 + (seed * g.i) % 251) % 256)) AS lum_total
        |  FROM d, LATERAL (SELECT unnest(range(0, d.w * d.h)) AS i) g
        |  GROUP BY doc_id)
        |SELECT d.doc_id, CAST(d.w AS INT) AS width, CAST(d.h AS INT) AS height,
        |  CAST(1 AS INT) AS channels, CAST(l.lum_total AS BIGINT) AS lum_total
        |FROM d JOIN l USING (doc_id) ORDER BY d.doc_id""".stripMargin,
    // TGA RLE leg: even rows raw packets (per-pixel closed form), odd
    // rows one RLE packet repeating the x=0 pixel across the row; BGR
    // serialization, so lum uses the UNSWAPPED R/G/B formula values
    "mm_tga_decode" ->
      """WITH d AS (SELECT doc_id, doc_id AS seed,
        |    CAST(doc_id % 13 + 8 AS BIGINT) AS w,
        |    CAST(doc_id % 11 + 8 AS BIGINT) AS h
        |  FROM documents),
        |cells AS (SELECT doc_id, seed, w, g.y AS y, g2.x AS x
        |  FROM d,
        |  LATERAL (SELECT unnest(range(0, h)) AS y) g,
        |  LATERAL (SELECT unnest(range(0, w)) AS x) g2),
        |l AS (SELECT doc_id, SUM(
        |    CASE WHEN y % 2 = 0 THEN
        |      299 * ((seed * 23 + (y * w + x) * 7 + 0) % 256)
        |      + 587 * ((seed * 23 + (y * w + x) * 7 + 11) % 256)
        |      + 114 * ((seed * 23 + (y * w + x) * 7 + 22) % 256)
        |    ELSE
        |      299 * ((seed * 23 + (y * w) * 7 + 0) % 256)
        |      + 587 * ((seed * 23 + (y * w) * 7 + 11) % 256)
        |      + 114 * ((seed * 23 + (y * w) * 7 + 22) % 256)
        |    END) AS lum_total
        |  FROM cells GROUP BY doc_id)
        |SELECT d.doc_id, CAST(d.w AS INT) AS width, CAST(d.h AS INT) AS height,
        |  CAST(3 AS INT) AS channels, CAST(l.lum_total AS BIGINT) AS lum_total
        |FROM d JOIN l USING (doc_id) ORDER BY d.doc_id""".stripMargin,
    // QOI chunk-op leg: n/4 four-pixel groups RGB/DIFF/LUMA/RUN with
    // per-group base v = (seed*29 + k*13 + c*85) % 256 and deltas
    // (+1,+1,+1) then (+1,+3,+4), run repeating -> per-channel terms
    // v, v+1, 2*(v + 2/4/5), each mod 256
    "mm_qoi_decode" ->
      """WITH d AS (SELECT doc_id, doc_id AS seed,
        |    CAST(doc_id % 13 + 8 AS BIGINT) AS w,
        |    CAST((doc_id % 5 + 2) * 4 AS BIGINT) AS h
        |  FROM documents),
        |l AS (SELECT doc_id, SUM(
        |    299 * (((seed*29 + g.k*13) % 256) + ((seed*29 + g.k*13 + 1) % 256)
        |         + 2 * ((seed*29 + g.k*13 + 2) % 256))
        |  + 587 * (((seed*29 + g.k*13 + 85) % 256)
        |         + ((seed*29 + g.k*13 + 86) % 256)
        |         + 2 * ((seed*29 + g.k*13 + 89) % 256))
        |  + 114 * (((seed*29 + g.k*13 + 170) % 256)
        |         + ((seed*29 + g.k*13 + 171) % 256)
        |         + 2 * ((seed*29 + g.k*13 + 175) % 256))) AS lum_total
        |  FROM d, LATERAL (SELECT unnest(range(0, w * h // 4)) AS k) g
        |  GROUP BY doc_id)
        |SELECT d.doc_id, CAST(d.w AS INT) AS width, CAST(d.h AS INT) AS height,
        |  CAST(3 AS INT) AS channels, CAST(l.lum_total AS BIGINT) AS lum_total
        |FROM d JOIN l USING (doc_id) ORDER BY d.doc_id""".stripMargin,
    // ICO directory: per entry the BMP-family byte formula with BGR
    // weights by position-in-triple, pad bytes excluded; transparency
    // is 0 (opaque mask) / w*h (all-FF mask, width-bounded count)
    "mm_ico_decode" ->
      """WITH d AS (SELECT doc_id, doc_id AS seed,
        |    CAST(doc_id % 6 + 6 AS BIGINT) AS w0,
        |    CAST(doc_id % 5 + 6 AS BIGINT) AS h0,
        |    CAST(doc_id % 3 + 4 AS BIGINT) AS w1,
        |    CAST(doc_id % 2 + 4 AS BIGINT) AS h1
        |  FROM documents),
        |e AS (SELECT doc_id, seed, 0 AS img_idx, w0 AS w, h0 AS h,
        |        CAST(0 AS BIGINT) AS transp FROM d
        |      UNION ALL
        |      SELECT doc_id, seed, 1, w1, h1, w1 * h1 FROM d),
        |l AS (SELECT doc_id, img_idx, w, h, transp,
        |    SUM(CASE ((g.i % (((3*w+3)//4)*4)) % 3)
        |          WHEN 0 THEN 114 WHEN 1 THEN 587 ELSE 299 END
        |        * ((seed*37 + g.i*13 + img_idx*77) % 256)) AS lum
        |  FROM e, LATERAL (SELECT unnest(range(0, (((3*w+3)//4)*4) * h))
        |                   AS i) g
        |  WHERE (g.i % (((3*w+3)//4)*4)) < 3*w
        |  GROUP BY doc_id, img_idx, w, h, transp)
        |SELECT doc_id, CAST(img_idx AS INT) AS img_idx,
        |  CAST(w AS INT) AS width, CAST(h AS INT) AS height,
        |  CAST(lum AS BIGINT) AS lum_total,
        |  CAST(transp AS BIGINT) AS n_transparent
        |FROM l ORDER BY doc_id, img_idx""".stripMargin,
    // bilinear replayed exactly: per-pixel luminance from the byte
    // field once, then the 16x16 grid joins its 4 neighbors and sums
    // the 1/225-unit weights -- integers end to end
    "mm_resize_bilinear" ->
      """WITH d AS (SELECT doc_id, doc_id AS seed,
        |    CAST(doc_id % 13 + 8 AS BIGINT) AS w,
        |    CAST(doc_id % 11 + 8 AS BIGINT) AS h
        |  FROM documents),
        |pix AS (SELECT doc_id, g.q % w AS x, g.q // w AS y,
        |    299 * ((seed*31 + (3*g.q)*17 + (seed*(3*g.q)) % 251
        |       + 40 * ((3*g.q // (w*3)) % 6)) % 256)
        |  + 587 * ((seed*31 + (3*g.q+1)*17 + (seed*(3*g.q+1)) % 251
        |       + 40 * (((3*g.q+1) // (w*3)) % 6)) % 256)
        |  + 114 * ((seed*31 + (3*g.q+2)*17 + (seed*(3*g.q+2)) % 251
        |       + 40 * (((3*g.q+2) // (w*3)) % 6)) % 256) AS l
        |  FROM d, LATERAL (SELECT unnest(range(0, w * h)) AS q) g),
        |grid AS (SELECT d.doc_id, gi.i, gj.j,
        |    (gi.i * (w - 1)) // 15 AS x0, (gi.i * (w - 1)) % 15 AS fx,
        |    LEAST((gi.i * (w - 1)) // 15 + 1, w - 1) AS x1,
        |    (gj.j * (h - 1)) // 15 AS y0, (gj.j * (h - 1)) % 15 AS fy,
        |    LEAST((gj.j * (h - 1)) // 15 + 1, h - 1) AS y1
        |  FROM d, LATERAL (SELECT unnest(range(0, 16)) AS i) gi,
        |          LATERAL (SELECT unnest(range(0, 16)) AS j) gj),
        |v AS (SELECT g.doc_id, g.i, g.j,
        |    (15 - fx) * (15 - fy) * p00.l + fx * (15 - fy) * p10.l
        |    + (15 - fx) * fy * p01.l + fx * fy * p11.l AS out225
        |  FROM grid g
        |  JOIN pix p00 ON p00.doc_id = g.doc_id
        |    AND p00.x = g.x0 AND p00.y = g.y0
        |  JOIN pix p10 ON p10.doc_id = g.doc_id
        |    AND p10.x = g.x1 AND p10.y = g.y0
        |  JOIN pix p01 ON p01.doc_id = g.doc_id
        |    AND p01.x = g.x0 AND p01.y = g.y1
        |  JOIN pix p11 ON p11.doc_id = g.doc_id
        |    AND p11.x = g.x1 AND p11.y = g.y1)
        |SELECT doc_id, CAST(SUM(out225) AS BIGINT) AS resize_total,
        |  CAST(SUM(CASE WHEN i = 0 AND j = 0 THEN out225 END) AS BIGINT)
        |    AS tl225,
        |  CAST(SUM(CASE WHEN i = 15 AND j = 15 THEN out225 END) AS BIGINT)
        |    AS br225
        |FROM v GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    // Otsu replayed exactly: gray from the closed-form byte triple,
    // score (s0*c1 - s1*c0)^2 / (c0*c1) at observed levels, min-t ties
    "mm_otsu" ->
      """WITH d AS (SELECT doc_id, doc_id AS seed,
        |    CAST(doc_id % 13 + 8 AS BIGINT) AS w,
        |    CAST(doc_id % 11 + 8 AS BIGINT) AS h
        |  FROM documents),
        |px AS (SELECT doc_id,
        |    (299 * ((seed*31 + (3*g.p)*17 + (seed*(3*g.p)) % 251
        |       + 40 * ((3*g.p // (w*3)) % 6)) % 256)
        |   + 587 * ((seed*31 + (3*g.p+1)*17 + (seed*(3*g.p+1)) % 251
        |       + 40 * (((3*g.p+1) // (w*3)) % 6)) % 256)
        |   + 114 * ((seed*31 + (3*g.p+2)*17 + (seed*(3*g.p+2)) % 251
        |       + 40 * (((3*g.p+2) // (w*3)) % 6)) % 256)) // 1000 AS gray
        |  FROM d, LATERAL (SELECT unnest(range(0, w * h)) AS p) g),
        |hist AS (SELECT doc_id, gray, COUNT(*) AS c
        |         FROM px GROUP BY doc_id, gray),
        |cum AS (SELECT doc_id, gray AS t,
        |    SUM(c) OVER (PARTITION BY doc_id ORDER BY gray) AS c0,
        |    SUM(gray * c) OVER (PARTITION BY doc_id ORDER BY gray) AS s0,
        |    SUM(c) OVER (PARTITION BY doc_id) AS n,
        |    SUM(gray * c) OVER (PARTITION BY doc_id) AS s
        |  FROM hist),
        |sc AS (SELECT doc_id, t, c0, s0,
        |    CAST(s0 * (n - c0) - (s - s0) * c0 AS DOUBLE)
        |      * (s0 * (n - c0) - (s - s0) * c0)
        |      / (c0 * (n - c0)) AS score
        |  FROM cum WHERE c0 > 0 AND c0 < n),
        |r AS (SELECT doc_id, t, c0, s0,
        |    ROW_NUMBER() OVER (PARTITION BY doc_id
        |      ORDER BY score DESC, t) AS rn
        |  FROM sc)
        |SELECT doc_id, CAST(t AS INT) AS threshold,
        |  CAST(c0 AS BIGINT) AS n_below, CAST(s0 AS BIGINT) AS sum_below
        |FROM r WHERE rn = 1 ORDER BY doc_id""".stripMargin,
    // Sobel over a linear field responds 8a/8b per interior pixel
    // (kernel first moments), x1000 for the luminance micro-unit
    "mm_sobel" ->
      """WITH d AS (SELECT doc_id, doc_id AS seed,
        |    CAST(doc_id % 13 + 8 AS BIGINT) AS w,
        |    CAST(doc_id % 11 + 8 AS BIGINT) AS h,
        |    doc_id % 3 + 1 AS a, doc_id % 2 + 1 AS b
        |  FROM documents),
        |s AS (SELECT doc_id,
        |    SUM((8000 * a + 8000 * b) * (g.y * w + g2.x)) AS wsum,
        |    COUNT(*) AS n_int
        |  FROM d, LATERAL (SELECT unnest(range(1, h - 1)) AS y) g,
        |          LATERAL (SELECT unnest(range(1, w - 1)) AS x) g2
        |  GROUP BY doc_id)
        |SELECT d.doc_id, CAST(s.n_int AS BIGINT) AS n_interior,
        |  CAST(8000 * d.a * s.n_int AS BIGINT) AS gx_total,
        |  CAST(8000 * d.b * s.n_int AS BIGINT) AS gy_total,
        |  CAST(s.wsum AS BIGINT) AS grad_wsum
        |FROM d JOIN s USING (doc_id) ORDER BY d.doc_id""".stripMargin,
    // EXIF auto-rotate: probes replayed via the rotation index maps --
    // tl and row0 pick different source cells per orientation, so the
    // wrong (or missing) rotation fails while lum_total stays invariant
    "mm_exif_rotate" ->
      """WITH d AS (SELECT doc_id, doc_id AS seed,
        |    CAST(doc_id % 6 + 6 AS BIGINT) AS w,
        |    CAST(doc_id % 5 + 6 AS BIGINT) AS h,
        |    CASE CAST(doc_id % 4 AS INT) WHEN 0 THEN 1 WHEN 1 THEN 3
        |         WHEN 2 THEN 6 ELSE 8 END AS ori
        |  FROM documents),
        |tot AS (SELECT doc_id,
        |    SUM(1000 * ((seed*23 + g.i*7) % 256)) AS lum
        |  FROM d, LATERAL (SELECT unnest(range(0, w*h)) AS i) g
        |  GROUP BY doc_id),
        |r0 AS (SELECT d.doc_id,
        |    SUM(1000 * ((seed*23 + (CASE ori
        |      WHEN 1 THEN g.t
        |      WHEN 3 THEN (h-1)*w + g.t
        |      WHEN 6 THEN g.t*w
        |      ELSE g.t*w + (w-1) END)*7) % 256)) AS row0
        |  FROM d, LATERAL (SELECT unnest(range(0,
        |    CASE WHEN ori IN (6, 8) THEN h ELSE w END)) AS t) g
        |  GROUP BY d.doc_id)
        |SELECT d.doc_id, CAST(d.ori AS INT) AS orientation,
        |  CAST(CASE WHEN ori IN (6, 8) THEN h ELSE w END AS INT) AS out_w,
        |  CAST(CASE WHEN ori IN (6, 8) THEN w ELSE h END AS INT) AS out_h,
        |  CAST(tot.lum AS BIGINT) AS lum_total,
        |  CAST(1000 * ((seed*23 + (CASE ori
        |    WHEN 1 THEN 0 WHEN 3 THEN (h-1)*w + (w-1)
        |    WHEN 6 THEN (h-1)*w ELSE w-1 END)*7) % 256) AS BIGINT) AS tl,
        |  CAST(r0.row0 AS BIGINT) AS row0
        |FROM d JOIN tot USING (doc_id) JOIN r0 USING (doc_id)
        |ORDER BY d.doc_id""".stripMargin,
    // P5 grayscale leg: 1000x gray per the single-channel lum rule
    "mm_pgm_decode" ->
      """WITH d AS (SELECT doc_id, doc_id AS seed,
        |    CAST(doc_id % 13 + 8 AS BIGINT) AS w,
        |    CAST(doc_id % 11 + 8 AS BIGINT) AS h
        |  FROM documents),
        |l AS (SELECT doc_id, SUM(1000 *
        |    ((seed * 41 + g.i * 19 + (seed * g.i) % 239) % 256)) AS lum_total
        |  FROM d, LATERAL (SELECT unnest(range(0, d.w * d.h)) AS i) g
        |  GROUP BY doc_id)
        |SELECT d.doc_id, CAST(d.w AS INT) AS width, CAST(d.h AS INT) AS height,
        |  CAST(1 AS INT) AS channels, CAST(l.lum_total AS BIGINT) AS lum_total
        |FROM d JOIN l USING (doc_id) ORDER BY d.doc_id""".stripMargin,
    // P3 ASCII leg: SAME pixel field as the binary PPM/PNG legs -> the
    // sequential closed-form luminance oracle verbatim
    "mm_ppm_ascii" ->
      """WITH d AS (SELECT doc_id, doc_id AS seed,
        |    CAST(doc_id % 13 + 8 AS BIGINT) AS w,
        |    CAST(doc_id % 11 + 8 AS BIGINT) AS h
        |  FROM documents),
        |l AS (SELECT doc_id, SUM(
        |    (CASE g.b % 3 WHEN 0 THEN 299 WHEN 1 THEN 587 ELSE 114 END) *
        |    ((seed * 31 + g.b * 17 + (seed * g.b) % 251
        |      + 40 * ((g.b // (w * 3)) % 6)) % 256)) AS lum_total
        |  FROM d, LATERAL (SELECT unnest(range(0, w * h * 3)) AS b) g
        |  GROUP BY doc_id)
        |SELECT d.doc_id, CAST(d.w AS INT) AS width, CAST(d.h AS INT) AS height,
        |  CAST(3 AS INT) AS channels, CAST(l.lum_total AS BIGINT) AS lum_total
        |FROM d JOIN l USING (doc_id) ORDER BY d.doc_id""".stripMargin,
    "mm_png_decode" ->
      """WITH d AS (SELECT doc_id, doc_id AS seed,
        |    CAST(doc_id % 13 + 8 AS BIGINT) AS w,
        |    CAST(doc_id % 11 + 8 AS BIGINT) AS h
        |  FROM documents),
        |l AS (SELECT doc_id, SUM(
        |    (CASE g.b % 3 WHEN 0 THEN 299 WHEN 1 THEN 587 ELSE 114 END) *
        |    ((seed * 31 + g.b * 17 + (seed * g.b) % 251
        |      + 40 * ((g.b // (w * 3)) % 6)) % 256)) AS lum_total
        |  FROM d, LATERAL (SELECT unnest(range(0, w * h * 3)) AS b) g
        |  GROUP BY doc_id)
        |SELECT d.doc_id, CAST(d.w AS INT) AS width, CAST(d.h AS INT) AS height,
        |  CAST(3 AS INT) AS channels, CAST(l.lum_total AS BIGINT) AS lum_total
        |FROM d JOIN l USING (doc_id) ORDER BY d.doc_id""".stripMargin,
    // Palette leg: depth-4 packed indices expanded through the
    // closed-form PLTE; luminance over the EXPANDED RGB; channels = 4
    // exactly when the seed-parity tRNS chunk is present
    "mm_png_palette" ->
      """WITH d AS (SELECT doc_id, doc_id AS seed,
        |    CAST(doc_id % 9 + 12 AS BIGINT) AS w,
        |    CAST(doc_id % 7 + 10 AS BIGINT) AS h
        |  FROM documents),
        |l AS (SELECT doc_id, SUM(
        |    299 * (((((g.i % w) + (g.i // w) * 3 + seed) % 16) * 37
        |            + seed * 11) % 256)
        |    + 587 * (((((g.i % w) + (g.i // w) * 3 + seed) % 16) * 59
        |              + seed * 7) % 256)
        |    + 114 * (((((g.i % w) + (g.i // w) * 3 + seed) % 16) * 83
        |              + seed * 3) % 256)) AS lum_total
        |  FROM d, LATERAL (SELECT unnest(range(0, w * h)) AS i) g
        |  GROUP BY doc_id)
        |SELECT d.doc_id, CAST(d.w AS INT) AS width,
        |  CAST(d.h AS INT) AS height,
        |  CAST(CASE WHEN d.seed % 2 = 1 THEN 4 ELSE 3 END AS INT)
        |    AS channels,
        |  CAST(l.lum_total AS BIGINT) AS lum_total
        |FROM d JOIN l USING (doc_id) ORDER BY d.doc_id""".stripMargin,
    // Adam7 leg: SAME decoded pixel field as mm_png_decode (the
    // interlace only permutes the serialization), so the oracle is the
    // sequential leg's closed form verbatim
    "mm_png_interlaced" ->
      """WITH d AS (SELECT doc_id, doc_id AS seed,
        |    CAST(doc_id % 13 + 8 AS BIGINT) AS w,
        |    CAST(doc_id % 11 + 8 AS BIGINT) AS h
        |  FROM documents),
        |l AS (SELECT doc_id, SUM(
        |    (CASE g.b % 3 WHEN 0 THEN 299 WHEN 1 THEN 587 ELSE 114 END) *
        |    ((seed * 31 + g.b * 17 + (seed * g.b) % 251
        |      + 40 * ((g.b // (w * 3)) % 6)) % 256)) AS lum_total
        |  FROM d, LATERAL (SELECT unnest(range(0, w * h * 3)) AS b) g
        |  GROUP BY doc_id)
        |SELECT d.doc_id, CAST(d.w AS INT) AS width, CAST(d.h AS INT) AS height,
        |  CAST(3 AS INT) AS channels, CAST(l.lum_total AS BIGINT) AS lum_total
        |FROM d JOIN l USING (doc_id) ORDER BY d.doc_id""".stripMargin,
    // Baseline-JPEG grayscale leg: per-8×8-block-constant fixtures decode
    // EXACTLY (DC-only blocks survive quant(1)/integer-IDCT bit-for-bit),
    // so the oracle sums the closed-form block values; the engine only
    // reproduces it via real huffman + differential-DC + IDCT + crop.
    // Video (MJPEG-in-AVI) leg: 4 per-block-constant grayscale JPEG
    // frames per clip — value ((seed·7 + blk·29) mod 96) + f + 128·[f≥2],
    // 25 fps — with the scene-cut lag rule over the frame table; any
    // container-walk, alignment, per-frame JPEG or lag mistake changes
    // a row.
    "mm_video_frames" ->
      """WITH d AS (SELECT doc_id, doc_id AS seed,
        |    CAST(doc_id % 13 + 17 AS BIGINT) AS w,
        |    CAST(doc_id % 11 + 17 AS BIGINT) AS h,
        |    CAST((doc_id % 13 + 17 + 7) // 8 AS BIGINT) AS bw
        |  FROM documents),
        |fr AS (SELECT doc_id, seed, w, h, bw, CAST(fx.f AS INT) AS frame_idx
        |  FROM d, LATERAL (SELECT unnest(range(0, 4)) AS f) fx),
        |l AS (SELECT doc_id, frame_idx, MAX(w) AS w, MAX(h) AS h,
        |    SUM(1000 * (((seed * 7 +
        |        ((g.i // (w * 8)) * bw + (g.i % w) // 8) * 29) % 96)
        |      + frame_idx + CASE WHEN frame_idx >= 2 THEN 128 ELSE 0 END))
        |      AS lum_total
        |  FROM fr, LATERAL (SELECT unnest(range(0, w * h)) AS i) g
        |  GROUP BY doc_id, frame_idx),
        |x AS (SELECT doc_id, frame_idx, w, h, lum_total,
        |    COALESCE(lum_total - LAG(lum_total) OVER
        |      (PARTITION BY doc_id ORDER BY frame_idx), 0) AS lum_diff
        |  FROM l)
        |SELECT doc_id, frame_idx, CAST(40 AS INT) AS frame_ms,
        |  CAST(w AS INT) AS width, CAST(h AS INT) AS height,
        |  CAST(lum_total AS BIGINT) AS lum_total,
        |  CAST(lum_diff AS BIGINT) AS lum_diff,
        |  (ABS(lum_diff) > 40000 * w * h) AS is_cut
        |FROM x ORDER BY doc_id, frame_idx""".stripMargin,
    // Audio track of the AVI clips: closed-form PCM16 stream (n =
    // seed%50+40 samples, s_k = ((seed*31 + k*17) mod 4001) - 2000)
    // interleaved across two 01wb chunks; energy/peak recomputed
    // directly, durations from the two stream clocks.
    "mm_video_audio" ->
      """WITH d AS (SELECT doc_id, doc_id AS seed,
        |    CAST(doc_id % 50 + 40 AS BIGINT) AS n
        |  FROM documents),
        |a AS (SELECT doc_id, MAX(n) AS n,
        |    SUM(CAST(((seed * 31 + g.k * 17) % 4001) - 2000 AS BIGINT)
        |      * (((seed * 31 + g.k * 17) % 4001) - 2000)) AS energy,
        |    MAX(ABS(((seed * 31 + g.k * 17) % 4001) - 2000)) AS peak
        |  FROM d, LATERAL (SELECT unnest(range(0, n)) AS k) g
        |  GROUP BY doc_id)
        |SELECT doc_id, CAST(4 AS INT) AS n_frames,
        |  CAST(160 AS INT) AS video_ms,
        |  CAST(8000 AS INT) AS sample_rate, CAST(1 AS INT) AS channels,
        |  CAST(n AS BIGINT) AS n_samples,
        |  CAST(n * 1000 // 8000 AS BIGINT) AS audio_ms,
        |  CAST(energy AS BIGINT) AS energy, CAST(peak AS INT) AS peak
        |FROM a ORDER BY doc_id""".stripMargin,
    // EXIF-in-JPEG rotation probes: block-constant value field under
    // the inverse maps of 0/2/1/3 CW turns (ori 1/3/6/8 by seed mod 4)
    "mm_jpeg_exif" ->
      """WITH d AS (SELECT doc_id, doc_id AS seed,
        |    CAST(doc_id % 12 + 10 AS BIGINT) AS w,
        |    CAST(doc_id % 10 + 9 AS BIGINT) AS h,
        |    CAST((doc_id % 12 + 10 + 7) // 8 AS BIGINT) AS bw,
        |    CASE CAST(doc_id % 4 AS INT) WHEN 0 THEN 1 WHEN 1 THEN 3
        |         WHEN 2 THEN 6 ELSE 8 END AS ori
        |  FROM documents),
        |tot AS (SELECT doc_id,
        |    SUM(1000 * ((seed*13 + ((g.i // w) // 8 * bw
        |      + (g.i % w) // 8) * 31) % 256)) AS lum
        |  FROM d, LATERAL (SELECT unnest(range(0, w*h)) AS i) g
        |  GROUP BY doc_id),
        |r0 AS (SELECT d.doc_id,
        |    SUM(1000 * ((seed*13 + (((CASE ori
        |      WHEN 1 THEN g.t
        |      WHEN 3 THEN (h-1)*w + g.t
        |      WHEN 6 THEN g.t*w
        |      ELSE g.t*w + (w-1) END) // w) // 8 * bw
        |      + ((CASE ori
        |      WHEN 1 THEN g.t
        |      WHEN 3 THEN (h-1)*w + g.t
        |      WHEN 6 THEN g.t*w
        |      ELSE g.t*w + (w-1) END) % w) // 8) * 31) % 256)) AS row0
        |  FROM d, LATERAL (SELECT unnest(range(0,
        |    CASE WHEN ori IN (6, 8) THEN h ELSE w END)) AS t) g
        |  GROUP BY d.doc_id)
        |SELECT d.doc_id, CAST(d.ori AS INT) AS orientation,
        |  CAST(CASE WHEN ori IN (6, 8) THEN h ELSE w END AS INT) AS out_w,
        |  CAST(CASE WHEN ori IN (6, 8) THEN w ELSE h END AS INT) AS out_h,
        |  CAST(tot.lum AS BIGINT) AS lum_total,
        |  CAST(1000 * ((seed*13 + (((CASE ori
        |    WHEN 1 THEN 0 WHEN 3 THEN (h-1)*w + (w-1)
        |    WHEN 6 THEN (h-1)*w ELSE w-1 END) // w) // 8 * bw
        |    + ((CASE ori
        |    WHEN 1 THEN 0 WHEN 3 THEN (h-1)*w + (w-1)
        |    WHEN 6 THEN (h-1)*w ELSE w-1 END) % w) // 8) * 31) % 256)
        |    AS BIGINT) AS tl,
        |  CAST(r0.row0 AS BIGINT) AS row0
        |FROM d JOIN tot USING (doc_id) JOIN r0 USING (doc_id)
        |ORDER BY d.doc_id""".stripMargin,
    "mm_jpeg_decode" ->
      """WITH d AS (SELECT doc_id, doc_id AS seed,
        |    CAST(doc_id % 13 + 17 AS BIGINT) AS w,
        |    CAST(doc_id % 11 + 17 AS BIGINT) AS h,
        |    CAST((doc_id % 13 + 17 + 7) // 8 AS BIGINT) AS bw
        |  FROM documents),
        |l AS (SELECT doc_id, SUM(1000 * ((seed * 7 +
        |      ((g.i // (w * 8)) * bw + (g.i % w) // 8) * 29) % 256)) AS lum_total
        |  FROM d, LATERAL (SELECT unnest(range(0, w * h)) AS i) g
        |  GROUP BY doc_id)
        |SELECT d.doc_id, CAST(d.w AS INT) AS width, CAST(d.h AS INT) AS height,
        |  CAST(1 AS INT) AS channels, CAST(l.lum_total AS BIGINT) AS lum_total
        |FROM d JOIN l USING (doc_id) ORDER BY d.doc_id""".stripMargin,
    // Progressive (SOF2) leg: the 7-scan successive-approximation file
    // decodes to the same per-block-constant closed form — the oracle is
    // the baseline shape with the progressive fixture's dims/values; the
    // engine can only reproduce it through the full Annex-G scan loop.
    "mm_jpeg_progressive" ->
      """WITH d AS (SELECT doc_id, doc_id AS seed,
        |    CAST(doc_id % 12 + 17 AS BIGINT) AS w,
        |    CAST(doc_id % 10 + 17 AS BIGINT) AS h,
        |    CAST((doc_id % 12 + 17 + 7) // 8 AS BIGINT) AS bw
        |  FROM documents),
        |l AS (SELECT doc_id, SUM(1000 * ((seed * 19 +
        |      ((g.i // (w * 8)) * bw + (g.i % w) // 8) * 31) % 256)) AS lum_total
        |  FROM d, LATERAL (SELECT unnest(range(0, w * h)) AS i) g
        |  GROUP BY doc_id)
        |SELECT d.doc_id, CAST(d.w AS INT) AS width, CAST(d.h AS INT) AS height,
        |  CAST(1 AS INT) AS channels, CAST(l.lum_total AS BIGINT) AS lum_total
        |FROM d JOIN l USING (doc_id) ORDER BY d.doc_id""".stripMargin,
    // 4:2:0 color leg: per-MCU-constant chroma + per-block-constant luma
    // stay exact through subsampling/upsampling; the oracle applies the
    // SAME fixed-point BT.601 conversion (2^30 bias keeps every integer
    // division non-negative, so DuckDB // equals the JVM's >> 16).
    "mm_jpeg_color" ->
      """WITH d AS (SELECT doc_id, doc_id AS seed,
        |    CAST(doc_id % 17 + 20 AS BIGINT) AS w,
        |    CAST(doc_id % 13 + 20 AS BIGINT) AS h,
        |    CAST((doc_id % 17 + 20 + 15) // 16 AS BIGINT) AS mcx
        |  FROM documents),
        |c AS (SELECT doc_id,
        |    (seed * 11 + ((g.i // (w * 8)) * 2 * mcx + (g.i % w) // 8) * 23)
        |      % 256 AS yy,
        |    (seed * 13 + ((g.i // (w * 16)) * mcx + (g.i % w) // 16) * 37)
        |      % 256 - 128 AS cbp,
        |    (seed * 17 + ((g.i // (w * 16)) * mcx + (g.i % w) // 16) * 41)
        |      % 256 - 128 AS crp
        |  FROM d, LATERAL (SELECT unnest(range(0, w * h)) AS i) g),
        |l AS (SELECT doc_id, SUM(
        |    299 * least(255, greatest(0,
        |      yy + ((91881 * crp + 32768 + 1073741824) // 65536) - 16384)) +
        |    587 * least(255, greatest(0,
        |      yy - ((22554 * cbp + 46802 * crp + 32768 + 1073741824) // 65536)
        |         + 16384)) +
        |    114 * least(255, greatest(0,
        |      yy + ((116130 * cbp + 32768 + 1073741824) // 65536) - 16384))
        |    ) AS lum_total
        |  FROM c GROUP BY doc_id)
        |SELECT d.doc_id, CAST(d.w AS INT) AS width, CAST(d.h AS INT) AS height,
        |  CAST(3 AS INT) AS channels, CAST(l.lum_total AS BIGINT) AS lum_total
        |FROM d JOIN l USING (doc_id) ORDER BY d.doc_id""".stripMargin,
    // WAV leg: the oracle recomputes the closed-form PCM16 sample stream;
    // the engine only reproduces it via the real RIFF chunk walk (odd
    // LIST chunk skipped word-aligned) + signed LE 16-bit decode.
    // FLAC leg: the SAME samples as mm_wav_decode round-tripped through
    // the reference FLAC encoder — lossless, so the WAV oracle is the
    // FLAC oracle verbatim (cross-format parity, the strongest pin).
    "mm_flac_decode" ->
      """WITH d AS (SELECT doc_id, doc_id AS seed,
        |    CAST(1 + doc_id % 2 AS INT) AS channels,
        |    CAST(8000 + 4000 * (doc_id % 3) AS INT) AS sample_rate,
        |    CAST(200 + doc_id % 50 AS BIGINT) AS n_frames
        |  FROM documents),
        |e AS (SELECT doc_id, SUM(s * s) AS energy, MAX(abs(s)) AS peak
        |  FROM (SELECT doc_id, ((seed * 13 + g.i * 29) % 65536) - 32768 AS s
        |        FROM d, LATERAL (SELECT unnest(range(0, n_frames * channels))
        |                         AS i) g)
        |  GROUP BY doc_id)
        |SELECT d.doc_id, d.channels, d.sample_rate, d.n_frames,
        |  CAST(e.energy AS BIGINT) AS energy, CAST(e.peak AS INT) AS peak
        |FROM d JOIN e USING (doc_id) ORDER BY d.doc_id""".stripMargin,
    "mm_wav_decode" ->
      """WITH d AS (SELECT doc_id, doc_id AS seed,
        |    CAST(1 + doc_id % 2 AS INT) AS channels,
        |    CAST(8000 + 4000 * (doc_id % 3) AS INT) AS sample_rate,
        |    CAST(200 + doc_id % 50 AS BIGINT) AS n_frames
        |  FROM documents),
        |e AS (SELECT doc_id, SUM(s * s) AS energy, MAX(abs(s)) AS peak
        |  FROM (SELECT doc_id, ((seed * 13 + g.i * 29) % 65536) - 32768 AS s
        |        FROM d, LATERAL (SELECT unnest(range(0, n_frames * channels))
        |                         AS i) g)
        |  GROUP BY doc_id)
        |SELECT d.doc_id, d.channels, d.sample_rate, d.n_frames,
        |  CAST(e.energy AS BIGINT) AS energy, CAST(e.peak AS INT) AS peak
        |FROM d JOIN e USING (doc_id) ORDER BY d.doc_id""".stripMargin,
    // 3:2 linear resample over decoded channel-0 PCM: output i sits at
    // input position i*2/3; idx/rem by integer division, the
    // interpolation is one FLOOR of an exact quotient (engine floorDiv)
    // and the rem=0 branch needs no neighbor, so (x1-x0)*0 covers it
    "mm_audio_resample" ->
      """WITH d AS (SELECT doc_id, doc_id AS seed,
        |    CAST(1 + doc_id % 2 AS BIGINT) AS ch,
        |    CAST(200 + doc_id % 50 AS BIGINT) AS nf
        |  FROM documents),
        |o AS (SELECT doc_id, seed, ch, nf, g.i AS i,
        |        (g.i * 2) // 3 AS idx, (g.i * 2) % 3 AS rem
        |      FROM d, LATERAL (SELECT unnest(range(0, ((nf - 1) * 3) // 2 + 1))
        |                       AS i) g),
        |s AS (SELECT doc_id, nf,
        |        x0 + CAST(FLOOR((x1 - x0) * rem / 3.0) AS BIGINT) AS o
        |      FROM (SELECT doc_id, nf, rem,
        |              ((seed * 13 + (idx * ch) * 29) % 65536) - 32768 AS x0,
        |              ((seed * 13 + ((idx + 1) * ch) * 29) % 65536) - 32768 AS x1
        |            FROM o))
        |SELECT doc_id, MAX(nf) AS n_in, CAST(COUNT(*) AS BIGINT) AS n_out,
        |  CAST(SUM(o * o) AS BIGINT) AS energy,
        |  CAST(MAX(ABS(o)) AS INT) AS peak
        |FROM s GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    // trim: scan the same padded closed-form signal for the first/last
    // nonzero -- robust even if a core edge sample is coincidentally 0
    "mm_audio_trim" ->
      """WITH d AS (SELECT doc_id, doc_id AS seed,
        |    CAST(doc_id % 20 + 4 AS BIGINT) AS lead,
        |    CAST(200 + doc_id % 50 AS BIGINT) AS n,
        |    CAST(doc_id % 15 + 4 AS BIGINT) AS tail
        |  FROM documents),
        |s AS (SELECT doc_id, g.j,
        |    CASE WHEN g.j < lead OR g.j >= lead + n THEN 0
        |         ELSE ((seed*13 + (g.j - lead)*29) % 65536) - 32768
        |    END AS v
        |  FROM d, LATERAL (SELECT unnest(range(0, lead + n + tail)) AS j) g),
        |a AS (SELECT doc_id,
        |    MIN(CASE WHEN v <> 0 THEN j END) AS first,
        |    MAX(CASE WHEN v <> 0 THEN j END) AS last,
        |    SUM(v * v) AS energy, MAX(abs(v)) AS peak
        |  FROM s GROUP BY doc_id)
        |SELECT d.doc_id, CAST(d.lead + d.n + d.tail AS BIGINT) AS n_in,
        |  CAST(COALESCE(a.first, -1) AS BIGINT) AS trim_start,
        |  CAST(CASE WHEN a.first IS NULL THEN 0
        |       ELSE a.last - a.first + 1 END AS BIGINT) AS trim_len,
        |  CAST(a.energy AS BIGINT) AS energy, CAST(a.peak AS INT) AS peak
        |FROM d JOIN a USING (doc_id) ORDER BY d.doc_id""".stripMargin,
    // downmix: floor((L+R)/2) per frame -- DuckDB's // TRUNCATES for
    // negatives (unlike Java floorDiv), so the oracle floors an exact
    // double division instead; mono passthrough
    "mm_audio_downmix" ->
      """WITH d AS (SELECT doc_id, doc_id AS seed,
        |    CAST(1 + doc_id % 2 AS BIGINT) AS ch,
        |    CAST(200 + doc_id % 50 AS BIGINT) AS nf
        |  FROM documents),
        |s AS (SELECT doc_id,
        |    CASE WHEN ch = 1
        |      THEN ((seed*13 + g.t*29) % 65536) - 32768
        |      ELSE CAST(FLOOR(((((seed*13 + (2*g.t)*29) % 65536) - 32768)
        |          + (((seed*13 + (2*g.t+1)*29) % 65536) - 32768)) / 2.0)
        |        AS BIGINT)
        |    END AS m
        |  FROM d, LATERAL (SELECT unnest(range(0, nf)) AS t) g),
        |a AS (SELECT doc_id, SUM(m*m) AS energy, MAX(abs(m)) AS peak
        |      FROM s GROUP BY doc_id)
        |SELECT d.doc_id, CAST(d.ch AS INT) AS channels,
        |  CAST(d.nf AS BIGINT) AS n_frames,
        |  CAST(a.energy AS BIGINT) AS energy, CAST(a.peak AS INT) AS peak
        |FROM d JOIN a USING (doc_id) ORDER BY d.doc_id""".stripMargin,
    // IMA ADPCM with the fixture's constant step walk: block b decodes
    // to p_b, then 4x(p_b+2) at odd / 4x(p_b+1) at even positions
    // (index 8 start, nibbles 0,8 alternating -> deltas +2,-1,+1,...)
    "mm_audio_adpcm" ->
      """WITH d AS (SELECT doc_id, doc_id AS seed,
        |    CAST(doc_id % 7 + 6 AS BIGINT) AS nb
        |  FROM documents),
        |s AS (SELECT doc_id, ((seed * 37 + g.b * 101) % 4000) - 2000 AS p
        |      FROM d, LATERAL (SELECT unnest(range(0, nb)) AS b) g),
        |l AS (SELECT doc_id,
        |        SUM(p*p + 4*(p+2)*(p+2) + 4*(p+1)*(p+1)) AS energy,
        |        MAX(GREATEST(abs(p), abs(p+1), abs(p+2))) AS peak
        |      FROM s GROUP BY doc_id)
        |SELECT d.doc_id, CAST(d.nb * 9 AS BIGINT) AS n_samples,
        |  CAST(l.energy AS BIGINT) AS energy, CAST(l.peak AS INT) AS peak
        |FROM d JOIN l USING (doc_id) ORDER BY d.doc_id""".stripMargin,
    // G.711 mu-law companding replayed bit-for-bit: 14-bit magnitude
    // clipped to 8158, +33 bias, segment by leading-bit position above
    // bit 5, 4-bit mantissa, expansion ((m*8+132)<<seg)-132 with the
    // sign restored — the engine round-trips through the complemented
    // codeword byte; the oracle composes encode∘decode arithmetic
    "mm_audio_mulaw" ->
      """WITH d AS (SELECT doc_id, doc_id AS seed,
        |    CAST(1 + doc_id % 2 AS BIGINT) AS ch,
        |    CAST(200 + doc_id % 50 AS BIGINT) AS nf
        |  FROM documents),
        |s AS (SELECT doc_id, nf,
        |        ((seed * 13 + g.t * ch * 29) % 65536) - 32768 AS x
        |      FROM d, LATERAL (SELECT unnest(range(0, nf)) AS t) g),
        |c AS (SELECT doc_id, nf, x,
        |        CASE WHEN x < 0 THEN -1 ELSE 1 END AS sgn,
        |        LEAST(abs(x) // 4, 8158) + 33 AS v
        |      FROM s),
        |q AS (SELECT doc_id, nf, x, sgn, v,
        |        CASE WHEN v < 64 THEN 0 WHEN v < 128 THEN 1
        |             WHEN v < 256 THEN 2 WHEN v < 512 THEN 3
        |             WHEN v < 1024 THEN 4 WHEN v < 2048 THEN 5
        |             WHEN v < 4096 THEN 6 ELSE 7 END AS seg
        |      FROM c),
        |y AS (SELECT doc_id, nf, x,
        |        sgn * ((((v >> (seg + 1)) & 15) * 8 + 132) * (1 << seg)
        |               - 132) AS y
        |      FROM q)
        |SELECT doc_id, MAX(nf) AS n_samples,
        |  CAST(SUM(y * y) AS BIGINT) AS energy,
        |  CAST(MAX(abs(y)) AS INT) AS peak,
        |  CAST(MAX(abs(y - x)) AS INT) AS max_err
        |FROM y GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    // framing over DECODED channel-0 PCM: frame f covers per-channel
    // sample indices [f*32, f*32+64); interleaved word index = i*ch
    "mm_wav_frames" ->
      """WITH d AS (SELECT doc_id, doc_id AS seed,
        |    CAST(1 + doc_id % 2 AS BIGINT) AS ch,
        |    CAST(200 + doc_id % 50 AS BIGINT) AS nf
        |  FROM documents),
        |f AS (SELECT doc_id, g.f AS frame_id, seed, ch
        |  FROM d, LATERAL (SELECT unnest(range(0, (nf - 64) // 32 + 1)) AS f) g),
        |e AS (SELECT doc_id, frame_id, SUM(s * s) AS energy,
        |    MAX(abs(s)) AS peak
        |  FROM (SELECT doc_id, frame_id,
        |          ((seed * 13 + (frame_id * 32 + h.i) * ch * 29) % 65536)
        |            - 32768 AS s
        |        FROM f, LATERAL (SELECT unnest(range(0, 64)) AS i) h)
        |  GROUP BY doc_id, frame_id)
        |SELECT doc_id, CAST(frame_id AS BIGINT) AS frame_id,
        |  CAST(energy AS BIGINT) AS energy, CAST(peak AS INT) AS peak
        |FROM e ORDER BY doc_id, frame_id""".stripMargin,
    // closed-form rotation probes: 90-deg CW sends old bottom-left to the
    // new top-left corner, the old first COLUMN to the new first row,
    // and leaves the luminance total invariant
    "mm_rotate90" -> {
      def f(i: String) =
        s"((seed * 31 + ($i) * 17 + (seed * ($i)) % 251" +
          s" + 40 * ((($i) // (w * 3)) % 6)) % 256)"
      def lum(p: String) =
        s"(299 * ${f(s"($p) * 3")} + 587 * ${f(s"($p) * 3 + 1")}" +
          s" + 114 * ${f(s"($p) * 3 + 2")})"
      s"""WITH d AS (SELECT doc_id, doc_id AS seed,
         |    CAST(doc_id % 13 + 8 AS BIGINT) AS w,
         |    CAST(doc_id % 11 + 8 AS BIGINT) AS h
         |  FROM documents),
         |tot AS (
         |  SELECT doc_id, SUM(${lum("g.p")}) AS lum_total
         |  FROM d, LATERAL (SELECT unnest(range(0, w * h)) AS p) g
         |  GROUP BY doc_id),
         |r0 AS (
         |  SELECT doc_id, SUM(${lum("g.q * w")}) AS row0
         |  FROM d, LATERAL (SELECT unnest(range(0, h)) AS q) g
         |  GROUP BY doc_id)
         |SELECT d.doc_id, CAST(d.h AS INT) AS width, CAST(d.w AS INT) AS height,
         |  CAST(tot.lum_total AS BIGINT) AS lum_total,
         |  CAST(${lum("(h - 1) * w")} AS BIGINT) AS tl,
         |  CAST(${lum("0")} AS BIGINT) AS tr,
         |  CAST(${lum("(h - 1) * w + (w - 1)")} AS BIGINT) AS bl,
         |  CAST(${lum("w - 1")} AS BIGINT) AS br,
         |  CAST(r0.row0 AS BIGINT) AS row0
         |FROM d JOIN tot USING (doc_id) JOIN r0 USING (doc_id)
         |ORDER BY d.doc_id""".stripMargin
    },
    // closed-form channel-0 samples against the engine's interpolated
    // fixed-point DFT basis (Wav.stftTableSql) — integer-exact powers
    "mm_stft_power" ->
      s"""WITH d AS (SELECT doc_id, doc_id AS seed,
         |    CAST(1 + doc_id % 2 AS BIGINT) AS ch,
         |    CAST(200 + doc_id % 50 AS BIGINT) AS nf
         |  FROM documents),
         |tbl(k, i, c, s) AS (VALUES ${graft.operators.Wav.stftTableSql}),
         |f AS (SELECT doc_id, g.f AS frame_id, seed, ch
         |  FROM d, LATERAL (SELECT unnest(range(0, (nf - 16) // 8 + 1)) AS f) g),
         |r AS (SELECT doc_id, frame_id, t.k,
         |    SUM((((seed * 13 + (frame_id * 8 + t.i) * ch * 29) % 65536)
         |      - 32768) * t.c) AS re,
         |    SUM((((seed * 13 + (frame_id * 8 + t.i) * ch * 29) % 65536)
         |      - 32768) * t.s) AS im
         |  FROM f, tbl t GROUP BY doc_id, frame_id, t.k),
         |p AS (SELECT doc_id, k AS bin, SUM(re * re + im * im) AS power,
         |    COUNT(*) AS n_frames
         |  FROM r GROUP BY doc_id, k)
         |SELECT doc_id, CAST(bin AS INT) AS bin, CAST(power AS BIGINT) AS power,
         |  CAST(n_frames AS BIGINT) AS n_frames
         |FROM p ORDER BY doc_id, bin""".stripMargin,
    "mm_resize" ->
      """WITH d AS (SELECT doc_id, CAST(doc_id % 13 + 8 AS INT) AS width,
        |             CAST(doc_id % 11 + 8 AS INT) AS height FROM documents)
        |SELECT doc_id, width, height,
        |  CASE WHEN width * 224 <= height * 256
        |       THEN greatest(1, CAST(floor(width * 224 / height) AS INT))
        |       ELSE 256 END AS rw,
        |  CASE WHEN width * 224 <= height * 256
        |       THEN 224
        |       ELSE greatest(1, CAST(floor(height * 256 / width) AS INT)) END AS rh
        |FROM d ORDER BY doc_id""".stripMargin,
    "mm_frame_sample" ->
      """WITH m AS (
        |  SELECT doc_id, encode(text) AS data, octet_length(encode(text)) AS n
        |  FROM documents)
        |SELECT doc_id,
        |  CAST(floor((n - 1) / 7) + 1 AS BIGINT) AS n_samples,
        |  (SELECT string_agg(substr(hex(data), 2 * g.i - 1, 2), '' ORDER BY g.i)
        |   FROM (SELECT unnest(range(1, n + 1)) AS i) g
        |   WHERE (g.i - 1) % 7 = 0) AS sample_hex
        |FROM m ORDER BY doc_id""".stripMargin,
  )
}

package graft.registry

/** Shared oracle-SQL builders used by the media and text registries —
  * lifted verbatim from the pre-split SparkEntry.
  */
private[registry] object OracleSql {
  /** The standard PPM-generator byte value (the [[graft.operators.Multimodal
    * .ppmMedia]] formula) for oracle SQL, with `$b` the byte-index
    * variable; `seed`/`w`/`dlt` come from the surrounding dims CTE.
    */
  def stdByteSql(b: String): String =
    s"""(seed * 31 + $b * 17 + (seed * $b) % 251
       |      + 40 * (($b // (w * 3)) % 6)
       |      + CASE WHEN $b < 6 THEN dlt ELSE 0 END) % 256""".stripMargin

  /** The CLAMPED generator byte ([[graft.operators.Multimodal.ppmMediaClamped]]):
    * base compressed into 30..209, then a row-linear gradient of
    * amplitude `dlt` added OUTSIDE the mod (never wraps for dlt ≤ 46).
    */
  def clampedByteSql(b: String): String =
    s"""((seed * 31 + $b * 17 + (seed * $b) % 251
       |      + 40 * (($b // (w * 3)) % 6)) % 256) * 180 // 256 + 30
       |      + ($b // (w * 3)) * dlt // h""".stripMargin

  /** DuckDB replay of the integer DCT pHash ([[graft.operators.Multimodal]]
    * `dctPhash64`) from a `corpus(doc_id, seed, dlt)` CTE to per-doc
    * 4×16-bit `bands(doc_id, band, bv)`: 32×32 nearest-sample luma grid,
    * 1024·g − Σg mean-centering, two-stage DCT against the SAME
    * fixed-point cosine table the engine uses (interpolated from
    * [[graft.operators.Multimodal.DctT]]), 63·F > ΣAC threshold bits.
    */
  def dctBandsSql(byteSql: String => String): String =
    s"""dims AS (SELECT doc_id, seed, dlt,
       |  CAST(seed % 13 + 8 AS BIGINT) AS w,
       |  CAST(seed % 11 + 8 AS BIGINT) AS h FROM corpus),
       |grid AS MATERIALIZED (
       |  SELECT doc_id, seed, dlt, w, h, gx.cx, gy.cy,
       |    (gx.cx * w) // 32 AS px, (gy.cy * h) // 32 AS py
       |  FROM dims,
       |    LATERAL (SELECT unnest(range(0, 32)) AS cx) gx,
       |    LATERAL (SELECT unnest(range(0, 32)) AS cy) gy),
       |glum AS MATERIALIZED (
       |  SELECT doc_id, cx, cy, SUM(
       |    (CASE bb.b % 3 WHEN 0 THEN 299 WHEN 1 THEN 587 ELSE 114 END) *
       |    (${byteSql("bb.b")})) AS lum
       |  FROM grid, LATERAL (SELECT unnest(range(3 * (py * w + px),
       |    3 * (py * w + px) + 3)) AS b) bb
       |  GROUP BY 1, 2, 3),
       |gtot AS (SELECT doc_id, SUM(lum) AS gt FROM glum GROUP BY 1),
       |gcen AS (SELECT g.doc_id, cx, cy, 1024 * lum - gt AS v
       |  FROM glum g JOIN gtot USING (doc_id)),
       |dct AS (SELECT * FROM (VALUES ${graft.operators.Multimodal.dctTableSql})
       |  v(u, x, t)),
       |r1 AS (SELECT doc_id, d.u, gcen.cy AS cy, SUM(d.t * gcen.v) AS rv
       |  FROM gcen JOIN dct d ON d.x = gcen.cx GROUP BY 1, 2, 3),
       |fc AS MATERIALIZED (
       |  SELECT r1.doc_id, r1.u, d.u AS vfreq, SUM(d.t * r1.rv) AS fv
       |  FROM r1 JOIN dct d ON d.x = r1.cy GROUP BY 1, 2, 3),
       |ac AS (SELECT doc_id, SUM(fv) AS s FROM fc GROUP BY 1),
       |bits AS (SELECT fc.doc_id, (fc.u * 8 + fc.vfreq) // 16 AS band,
       |    CAST((fc.u * 8 + fc.vfreq) % 16 AS INT) AS bandbit,
       |    CASE WHEN 63 * fv > s THEN 1 ELSE 0 END AS bit
       |  FROM fc JOIN ac USING (doc_id)),
       |bands AS MATERIALIZED (SELECT doc_id, band,
       |    CAST(SUM(bit * (1::BIGINT << bandbit)) AS BIGINT) AS bv
       |  FROM bits GROUP BY 1, 2)""".stripMargin

  /** DuckDB replay of the 8×8 block-mean aHash (all-pixel walk) to
    * `abands(doc_id, band, bv)` — prefixed names so it composes with
    * [[dctBandsSql]] in one WITH chain (the recall oracle runs both).
    */
  def ahashBandsSql(byteSql: String => String): String =
    s"""adims AS (SELECT doc_id, seed, dlt,
       |  CAST(seed % 13 + 8 AS BIGINT) AS w,
       |  CAST(seed % 11 + 8 AS BIGINT) AS h FROM corpus),
       |apx AS MATERIALIZED (SELECT doc_id,
       |    (((g.b // 3) // w) * 8 // h) * 8 + (((g.b // 3) % w) * 8 // w)
       |      AS cell,
       |    (CASE g.b % 3 WHEN 0 THEN 299 WHEN 1 THEN 587 ELSE 114 END) *
       |    (${byteSql("g.b")}) AS lum
       |  FROM adims, LATERAL (SELECT unnest(range(0, w * h * 3)) AS b) g),
       |acells AS (SELECT doc_id, cell, SUM(lum) AS cs, COUNT(*) AS cc
       |  FROM apx GROUP BY 1, 2),
       |atot AS (SELECT doc_id, SUM(cs) AS ts, SUM(cc) AS tc
       |  FROM acells GROUP BY 1),
       |abits AS (SELECT c.doc_id, c.cell // 16 AS band,
       |    CAST(c.cell % 16 AS INT) AS bandbit,
       |    CASE WHEN c.cs * t.tc > t.ts * c.cc THEN 1 ELSE 0 END AS bit
       |  FROM acells c JOIN atot t USING (doc_id)),
       |abands AS MATERIALIZED (SELECT doc_id, band,
       |    CAST(SUM(bit * (1::BIGINT << bandbit)) AS BIGINT) AS bv
       |  FROM abits GROUP BY 1, 2)""".stripMargin

  /** Full oracle for the DCT near-dup rows: generator corpus (originals
    * + perturbed copies), [[dctBandsSql]] signatures, band-collision
    * candidates, exact-hamming verify. `deltaInvolving` restricts the
    * pair class to delta-involving pairs (the incremental surface).
    */
  def phashDctOracleSql(deltaInvolving: Boolean): String =
    s"""WITH ids AS (SELECT doc_id FROM documents),
       |corpus AS (
       |  SELECT doc_id, doc_id AS seed, 0 AS dlt FROM ids
       |  UNION ALL SELECT doc_id + 1000000, doc_id, 8 FROM ids),
       |${dctBandsSql(stdByteSql)},
       |cand AS (SELECT DISTINCT x.doc_id AS a, y.doc_id AS b
       |  FROM bands x JOIN bands y
       |    ON x.band = y.band AND x.bv = y.bv AND x.doc_id < y.doc_id
       |  ${if (deltaInvolving) "WHERE y.doc_id >= 1000000" else ""}),
       |hx AS (SELECT c.a, c.b, SUM(bit_count(xor(x.bv, y.bv))) AS hamming
       |  FROM cand c
       |  JOIN bands x ON x.doc_id = c.a
       |  JOIN bands y ON y.doc_id = c.b AND y.band = x.band
       |  GROUP BY 1, 2)
       |SELECT a, b, CAST(hamming AS BIGINT) AS hamming FROM hx
       |WHERE hamming <= 3 ORDER BY a, b""".stripMargin

  /** Oracle for mm_phash_recall: both signature pipelines over the
    * clamped gradient fixture; per-planted-pair hamming (banding is
    * exhaustive at ≤ 3, so direct hamming IS the banded operator's
    * recall); one row per method.
    */
  def phashRecallOracleSql: String =
    s"""WITH ids AS (SELECT doc_id FROM documents),
       |corpus AS (
       |  SELECT doc_id, doc_id AS seed, 0 AS dlt FROM ids
       |  UNION ALL SELECT doc_id + 1000000, doc_id, 12 FROM ids),
       |${dctBandsSql(clampedByteSql)},
       |${ahashBandsSql(clampedByteSql)},
       |n AS (SELECT COUNT(*) AS np FROM ids),
       |dham AS (SELECT i.doc_id AS a, SUM(bit_count(xor(x.bv, y.bv))) AS hm
       |  FROM ids i
       |  JOIN bands x ON x.doc_id = i.doc_id
       |  JOIN bands y ON y.doc_id = i.doc_id + 1000000 AND y.band = x.band
       |  GROUP BY 1),
       |aham AS (SELECT i.doc_id AS a, SUM(bit_count(xor(x.bv, y.bv))) AS hm
       |  FROM ids i
       |  JOIN abands x ON x.doc_id = i.doc_id
       |  JOIN abands y ON y.doc_id = i.doc_id + 1000000 AND y.band = x.band
       |  GROUP BY 1)
       |SELECT * FROM (
       |  SELECT 'ahash_block_mean' AS method, CAST(np AS BIGINT) AS n_planted,
       |    CAST((SELECT COUNT(*) FROM aham WHERE hm <= 3) AS BIGINT)
       |      AS n_found,
       |    ROUND((SELECT COUNT(*) FROM aham WHERE hm <= 3)
       |      / CAST(np AS DOUBLE), 4) AS recall
       |  FROM n
       |  UNION ALL
       |  SELECT 'phash_dct', CAST(np AS BIGINT),
       |    CAST((SELECT COUNT(*) FROM dham WHERE hm <= 3) AS BIGINT),
       |    ROUND((SELECT COUNT(*) FROM dham WHERE hm <= 3)
       |      / CAST(np AS DOUBLE), 4)
       |  FROM n)
       |ORDER BY method""".stripMargin

  /** The unrolled BPE-training recurrence as a DuckDB WITH chain:
    * `v0` = spaced distinct-token vocabulary with corpus counts, then per
    * round r: `p_r` (piece-pair counts over `v_{r-1}`), `m_r` (argmax
    * pair, lexicographic tie-break — the engine's exact rule), `v_r`
    * (exhaustive leftmost replace with BOTH piece boundaries guarded via
    * the double-space-and-pad spelling — the engine's
    * `TextAnalysis.mergeGuarded`, mirrored glyph-for-glyph).
    * MATERIALIZED per multi-referenced
    * CTE, or DuckDB's inlining explodes exponentially across rounds.
    */
  def bpeRecurrenceSql(rounds: Int): String = {
    val v0 =
      """toks AS (SELECT unnest(string_split(text, ' ')) AS tok FROM documents),
        |v0 AS MATERIALIZED (
        |  SELECT tok, trim(regexp_replace(tok, '(.)', '\1 ', 'g')) AS sp,
        |    CAST(COUNT(*) AS BIGINT) AS tc
        |  FROM toks GROUP BY 1, 2)""".stripMargin
    (v0 +: bpeRoundCtes(rounds)).mkString(",\n")
  }

  /** One merge round as CTEs (pair counts → argmax → guarded replace),
    * alphabet-agnostic: shared by the char-level and byte-level
    * recurrences — only `v0` differs.
    */
  private def bpeRoundCtes(rounds: Int): Seq[String] =
    (1 to rounds).map { r =>
      s"""p$r AS (SELECT t.sl[g.i] || ' ' || t.sl[g.i + 1] AS pair,
         |    SUM(tc) AS w
         |  FROM v${r - 1} v,
         |    LATERAL (SELECT string_split(v.sp, ' ') AS sl) t,
         |    LATERAL (SELECT unnest(range(1, len(t.sl))) AS i) g
         |  GROUP BY 1),
         |m$r AS MATERIALIZED (SELECT pair, w FROM p$r
         |  ORDER BY w DESC, pair LIMIT 1),
         |v$r AS MATERIALIZED (
         |  SELECT tok, replace(trim(replace(
         |      '  ' || replace(sp, ' ', '  ') || '  ',
         |      ' ' || replace((SELECT pair FROM m$r), ' ', '  ') || ' ',
         |      ' ' || replace((SELECT pair FROM m$r), ' ', '') || ' ')),
         |    '  ', ' ') AS sp, tc
         |  FROM v${r - 1})""".stripMargin
    }

  /** Oracle for text_bpe_bytes: the byte-level recurrence — GPT-2-style
    * regex pre-tokenization (the engine's exact pattern; both Java
    * regex and RE2 read \p{L}/\p{N} as Unicode categories), each
    * pre-token to its UTF-8 bytes via the hex(encode(...)) spelling,
    * fixed-width 3-digit byte symbols, then the SAME merge-round CTEs
    * as the char recurrence. `fixtureValues` is the multi-byte UTF-8
    * fixture appended to the corpus on both sides.
    */
  private def bpeBytesV0(fixtureValues: String): String = {
    val re = graft.operators.TextAnalysis.BytePretokenRegex
    s"""corpus AS (SELECT text FROM documents
       |  UNION ALL SELECT * FROM (VALUES $fixtureValues) f(text)),
       |ptoks AS (SELECT unnest(regexp_extract_all(text, '$re')) AS ptok
       |  FROM corpus),
       |v0 AS MATERIALIZED (
       |  SELECT ptok AS tok,
       |    array_to_string(list_transform(
       |      range(1, CAST(octet_length(encode(ptok)) AS BIGINT) + 1),
       |      p -> lpad(CAST(CAST(('0x' || substr(hex(encode(ptok)),
       |        CAST(2 * p - 1 AS INT), 2)) AS INT) AS VARCHAR), 3, '0')),
       |      ' ') AS sp,
       |    CAST(COUNT(*) AS BIGINT) AS tc
       |  FROM ptoks GROUP BY 1, 2)""".stripMargin
  }

  def bpeBytesTrainOracleSql(rounds: Int, fixtureValues: String): String =
    s"""WITH ${(bpeBytesV0(fixtureValues) +: bpeRoundCtes(rounds))
          .mkString(",\n")}
       |SELECT * FROM (
       |  ${(1 to rounds).map(r =>
            s"SELECT CAST($r AS BIGINT) AS round, pair AS merge, " +
              s"CAST(w AS BIGINT) AS weight FROM m$r")
            .mkString("\n  UNION ALL ")}
       |) ORDER BY round""".stripMargin

  /** Oracle for text_bpe_bytes_encode: the byte recurrence's final
    * vocabulary state (pre-token kept through every round) joined back
    * onto each document's pre-token stream — per-doc piece statistics.
    * Trainer and encoder share exhaustive guarded leftmost-replace
    * semantics, so a document pre-token's applied form equals its
    * v_rounds state (the char-level text_bpe_encode precedent; the
    * fixture rows train the merges but join to no document).
    */
  def bpeBytesEncodeOracleSql(rounds: Int, fixtureValues: String): String = {
    val re = graft.operators.TextAnalysis.BytePretokenRegex
    s"""WITH ${(bpeBytesV0(fixtureValues) +: bpeRoundCtes(rounds))
          .mkString(",\n")},
       |vf AS (SELECT tok, len(string_split(sp, ' ')) AS np,
       |  octet_length(encode(tok)) AS nb FROM v$rounds),
       |dt AS (SELECT doc_id, unnest(regexp_extract_all(text, '$re'))
       |  AS ptok FROM documents)
       |SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_pretokens,
       |  CAST(SUM(np) AS BIGINT) AS n_pieces,
       |  CAST(SUM(nb) AS BIGINT) AS n_bytes,
       |  ROUND(SUM(nb) / CAST(SUM(np) AS DOUBLE), 4) AS compression
       |FROM dt JOIN vf ON vf.tok = dt.ptok
       |GROUP BY doc_id ORDER BY doc_id""".stripMargin
  }

  /** Oracle for text_bpe_train: the learned `(round, merge, weight)` list
    * from the unrolled recurrence.
    */
  def bpeTrainOracleSql(rounds: Int): String =
    s"""WITH ${bpeRecurrenceSql(rounds)}
       |SELECT * FROM (
       |  ${(1 to rounds).map(r =>
           s"SELECT CAST($r AS BIGINT) AS round, pair AS merge, " +
             s"CAST(w AS BIGINT) AS weight FROM m$r")
           .mkString("\n  UNION ALL ")}
       |) ORDER BY round""".stripMargin

  /** Oracle for text_bpe_apply (trained list consumed end-to-end): the
    * recurrence's FINAL vocabulary state, counted piece-wise — trainer
    * and applier share exhaustive leftmost-replace semantics, so the
    * applied corpus equals `v_rounds` exactly.
    */
  def bpeApplyOracleSql(rounds: Int): String =
    s"""WITH ${bpeRecurrenceSql(rounds)},
       |pieces AS (SELECT unnest(string_split(sp, ' ')) AS piece, tc
       |  FROM v$rounds)
       |SELECT piece, CAST(SUM(tc) AS BIGINT) AS n_occ
       |FROM pieces GROUP BY piece ORDER BY n_occ DESC, piece LIMIT 20"""
      .stripMargin

  /** Oracle for text_bpe_encode: the recurrence's final vocabulary state
    * (token kept through every round) joined back onto each document's
    * token stream — per-doc piece statistics.
    */
  def bpeEncodeOracleSql(rounds: Int): String =
    s"""WITH ${bpeRecurrenceSql(rounds)},
       |vf AS (SELECT tok, len(string_split(sp, ' ')) AS np,
       |  length(tok) AS nc FROM v$rounds),
       |dt AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok
       |  FROM documents)
       |SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_tokens,
       |  CAST(SUM(np) AS BIGINT) AS n_pieces,
       |  CAST(SUM(nc) AS BIGINT) AS n_chars,
       |  ROUND(SUM(nc) / CAST(SUM(np) AS DOUBLE), 4) AS compression
       |FROM dt JOIN vf USING (tok)
       |GROUP BY doc_id ORDER BY doc_id""".stripMargin

  /** Oracle for text_utf8_validate: the identical Table 3-7 DFA as a
    * `list_reduce` fold. State and element must share one struct type
    * (list_reduce has no separate init parameter, so the init state is
    * list_prepend'ed): an ELEMENT carries its byte value in field `p`,
    * the STATE carries the byte position counter in `p`.
    */
  def utf8ValidateOracleSql(fixtureValues: String): String = {
    def nx(cps: String, exp: String, lo: String, hi: String, bad: String) =
      s"{'p': s.p + 1, 'cps': $cps, 'exp': $exp, 'lo': $lo, 'hi': $hi, " +
        s"'bad': $bad}"
    s"""WITH f(id, hx) AS (VALUES $fixtureValues),
       |dhx AS (SELECT doc_id + 1000000 AS id,
       |  upper(hex(encode(text))) AS hx FROM documents),
       |allr AS (SELECT id, upper(hx) AS hx FROM f
       |  UNION ALL SELECT id, hx FROM dhx),
       |b AS (SELECT id, length(hx) // 2 AS n_bytes,
       |    list_transform(range(1, length(hx) // 2 + 1),
       |      p -> CAST(('0x' || substr(hx, CAST(2 * p - 1 AS INT), 2))
       |        AS INT)) AS bl
       |  FROM allr),
       |st AS (SELECT id, n_bytes, list_reduce(list_prepend(
       |    {'p': 0, 'cps': 0, 'exp': 0, 'lo': 0, 'hi': 0, 'bad': -1}
       |      ::STRUCT(p INT, cps INT, exp INT, lo INT, hi INT, bad INT),
       |    list_transform(bl, x ->
       |      {'p': x, 'cps': 0, 'exp': 0, 'lo': 0, 'hi': 0, 'bad': 0}
       |      ::STRUCT(p INT, cps INT, exp INT, lo INT, hi INT, bad INT))),
       |  (s, e) -> CASE
       |    WHEN s.bad >= 0 THEN ${nx("s.cps", "s.exp", "s.lo", "s.hi",
              "s.bad")}
       |    WHEN s.exp > 0 THEN CASE WHEN e.p BETWEEN s.lo AND s.hi
       |      THEN ${nx("s.cps + CASE WHEN s.exp = 1 THEN 1 ELSE 0 END",
              "s.exp - 1", "128", "191", "-1")}
       |      ELSE ${nx("s.cps", "s.exp", "s.lo", "s.hi", "s.p")} END
       |    WHEN e.p < 128 THEN ${nx("s.cps + 1", "0", "0", "0", "-1")}
       |    WHEN e.p BETWEEN 194 AND 223
       |      THEN ${nx("s.cps", "1", "128", "191", "-1")}
       |    WHEN e.p = 224 THEN ${nx("s.cps", "2", "160", "191", "-1")}
       |    WHEN (e.p BETWEEN 225 AND 236) OR (e.p BETWEEN 238 AND 239)
       |      THEN ${nx("s.cps", "2", "128", "191", "-1")}
       |    WHEN e.p = 237 THEN ${nx("s.cps", "2", "128", "159", "-1")}
       |    WHEN e.p = 240 THEN ${nx("s.cps", "3", "144", "191", "-1")}
       |    WHEN e.p BETWEEN 241 AND 243
       |      THEN ${nx("s.cps", "3", "128", "191", "-1")}
       |    WHEN e.p = 244 THEN ${nx("s.cps", "3", "128", "143", "-1")}
       |    ELSE ${nx("s.cps", "0", "0", "0", "s.p")} END) AS fin
       |  FROM b),
       |per AS (SELECT id, CAST(n_bytes AS BIGINT) AS n_bytes,
       |    CAST(fin.cps AS BIGINT) AS n_codepoints,
       |    CAST(CASE WHEN fin.bad >= 0 THEN fin.bad
       |      WHEN fin.exp > 0 THEN n_bytes ELSE -1 END AS BIGINT)
       |      AS first_invalid
       |  FROM st)
       |SELECT id, n_bytes, n_codepoints, first_invalid,
       |  first_invalid = -1 AS is_valid FROM per WHERE id < 1000000
       |UNION ALL
       |SELECT CAST(999999 AS BIGINT), CAST(SUM(n_bytes) AS BIGINT),
       |  CAST(SUM(n_codepoints) AS BIGINT),
       |  MAX(first_invalid), MAX(first_invalid) = -1
       |FROM per WHERE id >= 1000000
       |ORDER BY id""".stripMargin
  }

  /** DuckDB oracle SQL per query (SURVEY §2.B; DuckDB spellings per its
    * footnotes: json_extract_string, list_dot_product with a DOUBLE[] cast
    * so float math matches Spark's double-precision HOF bit-for-bit).
    */
}

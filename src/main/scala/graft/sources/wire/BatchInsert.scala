package graft.sources.wire

import java.sql.{Connection, Types}

/** Server-side batched execution of multi-row literal INSERTs (round-15
  * verdict item 8).
  *
  * The wire CLIENTS already coalesce Spark's JDBC batch into multi-row
  * `INSERT INTO t VALUES (...),(...)` statements (one protocol frame per
  * 500 rows — [[WireJdbc]]). The embedded catalog, however, COMPILES that
  * statement: Derby's parser/compiler on a 500-row literal VALUES list
  * measured 2.0 s for a 15 000-row load where a prepared statement with
  * per-row binds takes 0.30 s (6.7×, DerbyBench round-16). This helper
  * re-parses the literal tuple list server-side — AFTER the wire protocol
  * has done its job, so the certified wire path is untouched — and
  * executes it as one prepared batch per statement.
  *
  * Strict-fallback contract: anything not provably the simple literal
  * shape (nested parens = function calls/CASTs, parameter markers,
  * unparsable numerics, arity mismatches) returns -1 WITHOUT touching the
  * backend, and the caller runs the statement verbatim as before. Binds
  * are typed from the backend's own ParameterMetaData so value semantics
  * match the literal parse: integral → setLong, floating → setDouble,
  * DECIMAL/NUMERIC → setBigDecimal (exact), everything else (VARCHAR,
  * DATE, TIMESTAMP, …) → setString, which the backend converts with the
  * same SQL cast rules it applies to a literal. The chunk stays atomic:
  * the batch runs under an explicit transaction, committed as one unit,
  * rolled back on failure — the same all-or-nothing a single multi-row
  * VALUES statement gives.
  */
object BatchInsert {

  /** Execute `sql` as a prepared batch when it is a multi-row literal
    * INSERT; return the applied row count, or -1 when the statement is
    * not that shape (caller falls back — the backend has not been
    * touched in that case).
    */
  def tryExecute(conn: Connection, sql: String): Int = {
    val parsed = parse(sql)
    if (parsed == null) return -1
    val (prefix, rows) = parsed
    if (rows.length < 2) return -1 // single-row: compile cost is fine
    val arity = rows(0).length
    val marks = Array.fill(arity)("?").mkString("(", ",", ")")
    val autoCommit = conn.getAutoCommit
    conn.setAutoCommit(false)
    var executed = false
    try {
      val ps = conn.prepareStatement(s"$prefix VALUES $marks")
      try {
        val pmd = ps.getParameterMetaData
        val kinds = (1 to arity).map(pmd.getParameterType).toArray
        // Bind every row BEFORE the single executeBatch: an unparsable
        // literal (scientific notation for a BIGINT, junk numeric) aborts
        // here with NOTHING executed, so the caller's verbatim fallback
        // stays correct.
        try {
          var r = 0
          while (r < rows.length) {
            val row = rows(r)
            var i = 0
            while (i < arity) {
              val v = row(i)
              if (v == null) ps.setNull(i + 1, kinds(i))
              else if (v.quoted) ps.setString(i + 1, v.text)
              else kinds(i) match {
                case Types.BIGINT | Types.INTEGER | Types.SMALLINT |
                     Types.TINYINT =>
                  ps.setLong(i + 1, java.lang.Long.parseLong(v.text))
                case Types.DOUBLE | Types.FLOAT | Types.REAL =>
                  ps.setDouble(i + 1, java.lang.Double.parseDouble(v.text))
                case Types.DECIMAL | Types.NUMERIC =>
                  ps.setBigDecimal(i + 1, new java.math.BigDecimal(v.text))
                case Types.BOOLEAN | Types.BIT =>
                  ps.setBoolean(i + 1, v.text.equalsIgnoreCase("true"))
                case _ => ps.setString(i + 1, v.text)
              }
              i += 1
            }
            ps.addBatch()
            r += 1
          }
        } catch { case _: NumberFormatException => return -1 }
        executed = true
        val counts = ps.executeBatch()
        conn.commit()
        var total = 0
        counts.foreach(c => total += math.max(c, 0))
        total
      } finally ps.close()
    } catch {
      case e: Throwable =>
        if (!executed) return -1 // nothing ran — verbatim fallback gives
                                 // the authentic backend error instead
        try conn.rollback() catch { case _: Throwable => () }
        throw e
    } finally {
      try conn.setAutoCommit(autoCommit) catch { case _: Throwable => () }
    }
  }

  /** One parsed literal: `text` is the unescaped string for quoted
    * values and the raw token for unquoted ones; a SQL NULL is
    * represented as a null array slot, not a Lit.
    */
  private final class Lit(val text: String, val quoted: Boolean)

  /** Parse `INSERT INTO <target> [(<cols>)] VALUES (lit, ...)[, ...]`.
    * Returns (prefix-before-VALUES, tuple rows) or null when the
    * statement is not provably that shape. The scanner honors '...'
    * and "..." spans with doubled-quote escapes; any '(' inside an
    * unquoted value (function call, CAST, subquery) aborts.
    */
  private def parse(sql: String): (String, Array[Array[Lit]]) = {
    val s = sql
    // cheap guard: must start with INSERT and carry no parameter marker
    var p = 0
    while (p < s.length && s.charAt(p).isWhitespace) p += 1
    if (!s.regionMatches(true, p, "INSERT", 0, 6)) return null
    val vi = valuesKeywordIndex(s)
    if (vi < 0) return null
    val prefix = s.substring(0, vi).trim
    if (prefix.indexOf('?') >= 0) return null
    var i = s.indexOf('(', vi) // the '(' of the first tuple
    val rows = scala.collection.mutable.ArrayBuffer.empty[Array[Lit]]
    var arity = -1
    while (i >= 0 && i < s.length) {
      val tuple = scala.collection.mutable.ArrayBuffer.empty[Lit]
      i += 1 // past '('
      var done = false
      while (!done) {
        // skip leading whitespace of the value
        while (i < s.length && s.charAt(i).isWhitespace) i += 1
        if (i >= s.length) return null
        s.charAt(i) match {
          case '\'' =>
            val sb = new java.lang.StringBuilder()
            i += 1
            var in = true
            while (in) {
              if (i >= s.length) return null
              val c = s.charAt(i); i += 1
              if (c == '\'') {
                if (i < s.length && s.charAt(i) == '\'') { sb.append('\''); i += 1 }
                else in = false
              } else sb.append(c)
            }
            tuple += new Lit(sb.toString, true)
          case _ =>
            val st = i
            while (i < s.length && s.charAt(i) != ',' && s.charAt(i) != ')') {
              val c = s.charAt(i)
              if (c == '(' || c == '\'' || c == '"') return null
              i += 1
            }
            if (i >= s.length) return null
            val raw = s.substring(st, i).trim
            if (raw.isEmpty) return null
            tuple += (if (raw.equalsIgnoreCase("NULL")) null
                      else new Lit(raw, false))
        }
        // after a value: ws then ',' (next value) or ')' (tuple end)
        while (i < s.length && s.charAt(i).isWhitespace) i += 1
        if (i >= s.length) return null
        s.charAt(i) match {
          case ',' => i += 1
          case ')' => i += 1; done = true
          case _ => return null
        }
      }
      if (arity < 0) arity = tuple.length
      else if (tuple.length != arity) return null
      rows += tuple.toArray
      // after a tuple: ws then ',' (next tuple) or end of statement
      while (i < s.length && s.charAt(i).isWhitespace) i += 1
      if (i >= s.length) i = -1 // clean end
      else if (s.charAt(i) == ',') { i = s.indexOf('(', i); if (i < 0) return null }
      else return null // trailing junk (';', RETURNING, …) — fall back
    }
    if (rows.isEmpty || arity <= 0) return null
    (prefix, rows.toArray)
  }

  /** Index of the first ` VALUES (` outside every quoted span — the
    * [[WireJdbc.valuesIndex]] scanner, duplicated here because that one
    * is client-side private and this is the server. */
  private def valuesKeywordIndex(sql: String): Int = {
    val kw = " VALUES ("
    var i = 0
    while (i < sql.length) {
      sql.charAt(i) match {
        case q @ ('\'' | '"') =>
          i += 1
          var inSpan = true
          while (inSpan && i < sql.length) {
            val c = sql.charAt(i); i += 1
            if (c == q) {
              if (i < sql.length && sql.charAt(i) == q) i += 1
              else inSpan = false
            }
          }
        case _ =>
          if (i + kw.length <= sql.length &&
              sql.regionMatches(true, i, kw, 0, kw.length)) return i
          i += 1
      }
    }
    -1
  }
}

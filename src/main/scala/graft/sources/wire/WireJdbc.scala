package graft.sources.wire

import java.lang.reflect.{InvocationHandler, Method, Proxy}
import java.sql.{Connection, DatabaseMetaData, PreparedStatement, ResultSet, ResultSetMetaData, SQLException, SQLFeatureNotSupportedException, Statement}

/** The protocol-independent half of a minimal wire JDBC driver: the
  * dynamic-proxy JDBC facade Spark's JDBC source talks to, parameterized
  * by a [[WireSession]]/[[WireCursor]] pair that speaks the actual
  * protocol (PostgreSQL v3 in `pgwire`, MySQL client/server in
  * `mysqlwire`). One implementation of statement handling, client-side
  * parameter interpolation, multi-row VALUES batch coalescing, and
  * text-format typed getters serves every protocol — the protocol
  * module's job is ONLY framing, handshake, and the type-descriptor →
  * [[WireField]] mapping.
  *
  * The facade implements exactly what Spark's JDBC relation calls and
  * fails loudly (`SQLFeatureNotSupportedException`) on anything else —
  * silent defaults would hide protocol gaps (the pgwire r9 contract).
  *
  * Scale: rows STREAM off the socket — `ResultSet.next()` pulls one
  * protocol frame at a time through the cursor, so a partitioned fact
  * export holds O(1) rows per cursor client-side, and N Spark partitions
  * open N independent wire sessions.
  *
  * Transaction semantics: backends autocommit and `commit`/`rollback`
  * are accepted no-ops, so WRITES ARE AT-LEAST-ONCE under retry — the
  * caller makes writes idempotent (truncate-then-append, the
  * `ensureCustomerWire` pattern).
  */
object WireJdbc {

  /** One result column as the facade needs it: JDBC type + display
    * metadata, already decoded from the protocol's type descriptor.
    */
  final case class WireField(name: String, jdbcType: Int, typeName: String,
                             precision: Int, scale: Int, signed: Boolean)

  /** A streaming row cursor over one in-flight query. `row` holds the
    * current row's TEXT-format cells (null = SQL NULL).
    */
  trait WireCursor {
    def fields: Array[WireField]
    def row: Array[String]
    def next(): Boolean
    def close(): Unit
  }

  /** One wire session: a strict single-outstanding query cycle. */
  trait WireSession {
    def closed: Boolean
    def query(sql: String): WireCursor
    def update(sql: String): Int
    def close(): Unit
  }

  /** Display identity of a concrete driver (DatabaseMetaData surface). */
  final case class Flavor(label: String, urlPrefix: String,
                          productName: String, dbMajor: Int, dbMinor: Int,
                          identifierQuote: String)

  private def proxy[T](iface: Class[T], label: String)(
      h: PartialFunction[(String, Array[AnyRef]), AnyRef]): T =
    Proxy.newProxyInstance(iface.getClassLoader, Array(iface),
      new InvocationHandler {
        override def invoke(p: AnyRef, m: Method, a: Array[AnyRef]): AnyRef = {
          val args = if (a == null) Array.empty[AnyRef] else a
          m.getName match {
            case "equals" => Boolean.box(p eq args(0))
            case "hashCode" => Int.box(System.identityHashCode(p))
            case "toString" => s"$label ${iface.getSimpleName}"
            case n if h.isDefinedAt((n, args)) => h((n, args))
            case n =>
              throw new SQLFeatureNotSupportedException(
                s"$label ${iface.getSimpleName}.$n")
          }
        }
      }).asInstanceOf[T]

  private val B_TRUE = Boolean.box(true)
  private val B_FALSE = Boolean.box(false)

  def connection(sess: WireSession, flavor: Flavor): Connection = {
    lazy val conn: Connection = proxy(classOf[Connection], flavor.label) {
      case ("prepareStatement", args) =>
        statementProxy(sess, conn, args(0).asInstanceOf[String], flavor)
      case ("createStatement", _) => statementProxy(sess, conn, null, flavor)
      case ("close", _) => sess.close(); null
      case ("isClosed", _) => Boolean.box(sess.closed)
      case ("isValid", _) => Boolean.box(!sess.closed)
      case ("getMetaData", _) => metaDataProxy(flavor)
      case ("setAutoCommit" | "commit" | "rollback" | "setReadOnly" |
            "setTransactionIsolation" | "clearWarnings" | "setCatalog" |
            "setSchema" | "abort" | "setNetworkTimeout", _) => null
      case ("getAutoCommit", _) => B_TRUE
      case ("isReadOnly", _) => B_FALSE
      case ("getTransactionIsolation", _) =>
        Int.box(Connection.TRANSACTION_NONE)
      case ("getWarnings" | "getCatalog" | "getSchema", _) => null
      case ("getNetworkTimeout", _) => Int.box(0)
      case ("isWrapperFor", _) => B_FALSE
    }
    conn
  }

  private def metaDataProxy(flavor: Flavor): DatabaseMetaData =
    proxy(classOf[DatabaseMetaData], flavor.label) {
      case ("supportsBatchUpdates", _) => B_TRUE
      case ("getDatabaseProductName", _) => flavor.productName
      case ("getDatabaseProductVersion" | "getDriverVersion", _) => "1.0"
      case ("getDriverName", _) => flavor.label
      case ("getURL", _) => flavor.urlPrefix
      case ("getUserName", _) => "graft"
      case ("getJDBCMajorVersion", _) => Int.box(4)
      case ("getJDBCMinorVersion", _) => Int.box(0)
      case ("getDatabaseMajorVersion", _) => Int.box(flavor.dbMajor)
      case ("getDatabaseMinorVersion", _) => Int.box(flavor.dbMinor)
      case ("getMaxColumnNameLength", _) => Int.box(128)
      case ("getDriverMajorVersion", _) => Int.box(1)
      case ("getDriverMinorVersion", _) => Int.box(0)
      case ("getDefaultTransactionIsolation", _) =>
        Int.box(Connection.TRANSACTION_NONE)
      case ("getResultSetHoldability", _) =>
        Int.box(ResultSet.CLOSE_CURSORS_AT_COMMIT)
      case ("getSQLStateType", _) => Int.box(DatabaseMetaData.sqlStateSQL)
      case ("getSQLKeywords" | "getNumericFunctions" | "getStringFunctions" |
            "getSystemFunctions" | "getTimeDateFunctions" |
            "getExtraNameCharacters", _) => ""
      case ("getSearchStringEscape", _) => "\\"
      case ("getCatalogSeparator", _) => "."
      case ("getSchemaTerm", _) => "schema"
      case ("getCatalogTerm", _) => "database"
      case ("getProcedureTerm", _) => "function"
      case ("getIdentifierQuoteString", _) => flavor.identifierQuote
      case (n, _) if n.startsWith("supports") || n.startsWith("stores") ||
        n.startsWith("is") || n.startsWith("null") ||
        n.startsWith("uses") || n.startsWith("does") ||
        n.startsWith("locators") || n.startsWith("auto") ||
        n.startsWith("insertsAre") || n.startsWith("deletesAre") ||
        n.startsWith("updatesAre") || n.startsWith("others") ||
        n.startsWith("own") || n.startsWith("allProcedures") ||
        n.startsWith("allTables") || n.startsWith("generatedKey") =>
        B_FALSE
      case (n, _) if n.startsWith("getMax") => Int.box(0)
    }

  /** Literal rendering for client-side parameter interpolation (no Bind
    * step in either simple-query subprotocol).
    */
  private def literal(v: AnyRef): String = v match {
    case null => "NULL"
    case s: String => "'" + s.replace("'", "''") + "'"
    case t: java.sql.Timestamp => s"TIMESTAMP('${t.toString}')"
    case d: java.sql.Date => s"DATE('${d.toString}')"
    case b: java.lang.Boolean => if (b) "TRUE" else "FALSE"
    case n: java.math.BigDecimal => n.toPlainString
    case other => other.toString // boxed numerics
  }

  /** Substitute `?` placeholders with rendered literals. Placeholders are
    * located by a quote-aware scan — a `?` inside a `'...'` string literal
    * or `"..."` quoted identifier is data, not a parameter slot (doubled
    * quotes are the in-span escape for both), so templates carrying literal
    * question marks never misalign their parameters.
    */
  private def interpolate(sql: String, params: Array[AnyRef]): String = {
    val sb = new StringBuilder(sql.length + 16 * params.length)
    var i = 0
    var p = 0
    while (i < sql.length) {
      sql.charAt(i) match {
        case '?' =>
          sb.append(literal(params(p))); p += 1; i += 1
        case q @ ('\'' | '"') =>
          // copy the quoted span verbatim; '' / "" escapes stay in-span
          sb.append(q); i += 1
          var inSpan = true
          while (inSpan && i < sql.length) {
            val c = sql.charAt(i)
            sb.append(c); i += 1
            if (c == q) {
              if (i < sql.length && sql.charAt(i) == q) { sb.append(q); i += 1 }
              else inSpan = false
            }
          }
        case c =>
          sb.append(c); i += 1
      }
    }
    sb.toString
  }

  /** Index of the first ` VALUES (` that sits OUTSIDE every `'...'` /
    * `"..."` span (doubled quotes are the in-span escape) — the
    * batch-coalescing split point. The naive uppercase `indexOf` would
    * split inside a quoted identifier or string literal that happens to
    * contain the keyword (e.g. `INSERT INTO " VALUES (x"` …) and emit
    * corrupted SQL for the whole chunk.
    */
  private[wire] def valuesIndex(sql: String): Int = {
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

  private def statementProxy(sess: WireSession, conn: Connection,
                             template: String,
                             flavor: Flavor): PreparedStatement = {
    val params = new java.util.ArrayList[AnyRef]()
    val batch = new java.util.ArrayList[String]()
    var current: ResultSet = null
    def setP(i: Int, v: AnyRef): AnyRef = {
      while (params.size < i) params.add(null)
      params.set(i - 1, v); null
    }
    def renderedSql(explicit: Array[AnyRef]): String =
      if (explicit.nonEmpty && explicit(0).isInstanceOf[String])
        explicit(0).asInstanceOf[String]
      else interpolate(template,
        params.toArray(new Array[AnyRef](params.size)))
    lazy val st: PreparedStatement =
      proxy(classOf[PreparedStatement], flavor.label) {
      case ("setNull", args) => setP(args(0).asInstanceOf[Int].intValue, null)
      case (n, args) if n.startsWith("set") &&
          Seq("setLong", "setInt", "setShort", "setByte", "setDouble",
            "setFloat", "setBoolean", "setString", "setBigDecimal",
            "setTimestamp", "setDate", "setObject").contains(n) =>
        setP(args(0).asInstanceOf[Int].intValue, args(1))
      case ("clearParameters", _) => params.clear(); null
      case ("addBatch", _) => batch.add(renderedSql(Array.empty)); null
      case ("clearBatch", _) => batch.clear(); null
      case ("executeBatch", _) =>
        // batched INSERTs off one template coalesce into multi-row VALUES
        // statements (500 rows per wire round-trip) — one protocol frame
        // and one backend compile per chunk instead of per row
        val n = batch.size
        val counts = Array.fill(n)(1)
        val vi = if (template == null) -1 else valuesIndex(template)
        if (vi > 0 && n > 0) {
          val prefix = batch.get(0).substring(0, vi + 8)
          var i = 0
          while (i < n) {
            val hi = math.min(i + 500, n)
            val sb = new StringBuilder(prefix)
            var j = i
            while (j < hi) {
              if (j > i) sb.append(',')
              sb.append(batch.get(j).substring(vi + 8))
              j += 1
            }
            // the server's update count carries the applied row count; a
            // chunk that silently applied fewer rows than it carried must
            // surface as a batch failure, not fabricated per-row 1s
            val applied = sess.update(sb.toString)
            if (applied != hi - i)
              throw new java.sql.BatchUpdateException(
                s"multi-row VALUES chunk applied $applied of ${hi - i} rows",
                counts.take(i), null)
            i = hi
          }
        } else {
          var i = 0
          while (i < n) { counts(i) = sess.update(batch.get(i)); i += 1 }
        }
        batch.clear()
        counts
      case ("executeQuery", args) =>
        current = resultSetProxy(sess.query(renderedSql(args)), st, flavor)
        current
      case ("executeUpdate", args) => Int.box(sess.update(renderedSql(args)))
      case ("execute", args) =>
        // Spark only routes row-returning SQL through executeQuery; the
        // generic execute is used for DDL / setup statements
        sess.update(renderedSql(args)); B_FALSE
      case ("getResultSet", _) => current
      case ("getUpdateCount", _) => Int.box(-1)
      case ("getMoreResults", _) => B_FALSE
      case ("getConnection", _) => conn
      case ("close", _) =>
        if (current != null) current.close()
        null
      case ("isClosed", _) => B_FALSE
      case ("setFetchSize" | "setFetchDirection" | "setQueryTimeout" |
            "setMaxRows" | "setLargeMaxRows" | "setEscapeProcessing" |
            "cancel" | "clearWarnings" | "closeOnCompletion", _) => null
      case ("getFetchSize" | "getQueryTimeout" | "getMaxRows", _) => Int.box(0)
      case ("getWarnings", _) => null
    }
    st
  }

  private def resultSetProxy(cur: WireCursor, st: Statement,
                             flavor: Flavor): ResultSet = {
    var wasNull = false
    var closed = false
    def cell(i: Int): String = {
      val v = cur.row(i - 1)
      wasNull = v == null
      v
    }
    proxy(classOf[ResultSet], flavor.label) {
      case ("next", _) => Boolean.box(cur.next())
      case ("close", _) => cur.close(); closed = true; null
      case ("isClosed", _) => Boolean.box(closed)
      case ("wasNull", _) => Boolean.box(wasNull)
      case ("getString" | "getNString", args) => cell(intArg(args, cur))
      case ("getLong", args) =>
        val v = cell(intArg(args, cur)); Long.box(if (v == null) 0L else v.toLong)
      case ("getInt", args) =>
        val v = cell(intArg(args, cur)); Int.box(if (v == null) 0 else v.toInt)
      case ("getShort", args) =>
        val v = cell(intArg(args, cur))
        Short.box(if (v == null) 0.toShort else v.toShort)
      case ("getByte", args) =>
        val v = cell(intArg(args, cur))
        Byte.box(if (v == null) 0.toByte else v.toByte)
      case ("getDouble", args) =>
        val v = cell(intArg(args, cur))
        Double.box(if (v == null) 0.0 else java.lang.Double.parseDouble(v))
      case ("getFloat", args) =>
        val v = cell(intArg(args, cur))
        Float.box(if (v == null) 0.0f else java.lang.Float.parseFloat(v))
      case ("getBoolean", args) =>
        val v = cell(intArg(args, cur))
        // text-format truth across protocols: PG "t"/"true", MySQL "1"
        Boolean.box(v == "t" || v == "true" || v == "1")
      case ("getBigDecimal", args) =>
        val v = cell(intArg(args, cur))
        if (v == null) null else new java.math.BigDecimal(v)
      case ("getTimestamp", args) =>
        val v = cell(intArg(args, cur))
        if (v == null) null else java.sql.Timestamp.valueOf(v)
      case ("getDate", args) =>
        val v = cell(intArg(args, cur))
        if (v == null) null else java.sql.Date.valueOf(v)
      case ("getObject", args) => cell(intArg(args, cur))
      case ("findColumn", args) =>
        val label = args(0).asInstanceOf[String]
        val i = cur.fields.indexWhere(_.name == label)
        if (i < 0) throw new SQLException(s"no column $label")
        Int.box(i + 1)
      case ("getMetaData", _) => rsMetaProxy(cur, flavor)
      case ("getStatement", _) => st
      case ("getType", _) => Int.box(ResultSet.TYPE_FORWARD_ONLY)
      case ("getConcurrency", _) => Int.box(ResultSet.CONCUR_READ_ONLY)
      case ("setFetchSize" | "clearWarnings", _) => null
      case ("getFetchSize", _) => Int.box(0)
      case ("getWarnings", _) => null
    }
  }

  /** Column args arrive as either an index or a label. */
  private def intArg(args: Array[AnyRef], cur: WireCursor): Int = args(0) match {
    case i: java.lang.Integer => i.intValue
    case s: String =>
      val i = cur.fields.indexWhere(_.name == s)
      if (i < 0) throw new SQLException(s"no column $s")
      i + 1
  }

  private def rsMetaProxy(cur: WireCursor, flavor: Flavor): ResultSetMetaData =
    proxy(classOf[ResultSetMetaData], flavor.label) {
      case ("getColumnCount", _) => Int.box(cur.fields.length)
      case ("getColumnName" | "getColumnLabel", args) =>
        cur.fields(args(0).asInstanceOf[Int].intValue - 1).name
      case ("getColumnType", args) =>
        Int.box(cur.fields(args(0).asInstanceOf[Int].intValue - 1).jdbcType)
      case ("getColumnTypeName", args) =>
        cur.fields(args(0).asInstanceOf[Int].intValue - 1).typeName
      case ("getPrecision", args) =>
        Int.box(cur.fields(args(0).asInstanceOf[Int].intValue - 1).precision)
      case ("getScale", args) =>
        Int.box(cur.fields(args(0).asInstanceOf[Int].intValue - 1).scale)
      case ("isSigned", args) =>
        Boolean.box(cur.fields(args(0).asInstanceOf[Int].intValue - 1).signed)
      case ("isNullable", _) =>
        Int.box(ResultSetMetaData.columnNullableUnknown)
      case ("isCaseSensitive" | "isCurrency" | "isAutoIncrement" |
            "isReadOnly" | "isWritable" | "isDefinitelyWritable" |
            "isSearchable", _) => B_FALSE
      case ("getColumnDisplaySize", _) => Int.box(0)
      case ("getColumnClassName", _) => "java.lang.String"
      case ("getCatalogName" | "getSchemaName" | "getTableName", _) => ""
    }
}

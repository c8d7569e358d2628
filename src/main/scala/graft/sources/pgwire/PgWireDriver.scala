package graft.sources.pgwire

import java.io.{BufferedInputStream, BufferedOutputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}
import java.lang.reflect.{InvocationHandler, Method, Proxy}
import java.net.Socket
import java.nio.charset.StandardCharsets.UTF_8
import java.sql.{Connection, DatabaseMetaData, Driver, DriverPropertyInfo, PreparedStatement, ResultSet, ResultSetMetaData, SQLException, SQLFeatureNotSupportedException, Statement, Types}
import java.util.Properties
import java.util.logging.Logger

/** A minimal JDBC driver speaking the PostgreSQL v3 wire protocol
  * (simple-query subprotocol) — the client half of [[PgWireServer]], so
  * Spark's JDBC source reads and writes THROUGH A REAL SOCKET with real
  * protocol framing instead of an in-process embedded handle. URL form:
  * `jdbc:graftpg://host:port/db`.
  *
  * Surface: exactly what Spark's JDBC relation needs — `connect`,
  * `prepareStatement` → `executeQuery`/`executeBatch`, streamed
  * `ResultSet` with typed getters driven by the RowDescription OIDs, and
  * `ResultSetMetaData` recovering DECIMAL precision/scale from the
  * documented `atttypmod` encoding. Parameters interpolate client-side
  * into SQL text (the simple-query protocol has no Bind step); strings
  * escape by quote doubling. The JDBC interfaces are implemented with
  * dynamic proxies dispatching the methods Spark calls and failing loudly
  * (`SQLFeatureNotSupportedException`) on anything else — a deliberate
  * contract: silent defaults would hide protocol gaps.
  *
  * Scale: rows STREAM off the socket — `ResultSet.next()` reads one
  * DataRow frame at a time, so a partitioned fact export holds O(1) rows
  * per cursor client-side, and N Spark partitions open N independent
  * wire sessions.
  *
  * Transaction semantics: the backend autocommits every statement and the
  * driver's `commit`/`rollback` are accepted no-ops, so WRITES ARE
  * AT-LEAST-ONCE under retry — Spark's savePartition rollback-on-failure
  * cannot undo rows a failed partition already inserted, and a re-run
  * appends them again. Callers that need overwrite semantics must make the
  * write idempotent themselves (DELETE/truncate before append, the
  * `ensureCustomerWire` pattern). Reads carry the same caveat trivially
  * (a retried partition re-issues its cursor query).
  */
final class PgWireDriver extends Driver {
  override def acceptsURL(url: String): Boolean =
    url != null && url.startsWith(PgWireDriver.Prefix)
  override def connect(url: String, info: Properties): Connection =
    if (!acceptsURL(url)) null
    else {
      val hp = url.stripPrefix(PgWireDriver.Prefix).takeWhile(_ != '/')
      val (host, port) = hp.split(':') match {
        case Array(h, p) => (h, p.toInt)
        case _ => throw new SQLException(s"bad pgwire url: $url")
      }
      PgWireClient.connect(host, port)
    }
  override def getMajorVersion: Int = 1
  override def getMinorVersion: Int = 0
  override def jdbcCompliant(): Boolean = false
  override def getParentLogger: Logger = Logger.getLogger("graft.pgwire")
  override def getPropertyInfo(url: String, info: Properties): Array[DriverPropertyInfo] =
    Array.empty
}

object PgWireDriver {
  val Prefix = "jdbc:graftpg://"
  // self-registration, the standard java.sql.Driver contract
  java.sql.DriverManager.registerDriver(new PgWireDriver)
  def ensureRegistered(): Unit = ()
}

/** One wire session: startup handshake, then a strict single-outstanding
  * simple-query cycle (the protocol's own sequencing rule).
  */
private[pgwire] final class PgSession(host: String, port: Int) {
  private val sock = new Socket(host, port)
  sock.setTcpNoDelay(true)
  private val in = new DataInputStream(new BufferedInputStream(sock.getInputStream))
  private val out = new DataOutputStream(new BufferedOutputStream(sock.getOutputStream))
  @volatile var closed = false
  /** The one cursor allowed in flight (protocol sequencing). */
  var openCursor: PgCursor = null

  // StartupMessage: int32 len, int32 196608, key\0value\0 … \0
  locally {
    val body = new ByteArrayOutputStream()
    val d = new DataOutputStream(body)
    d.writeInt(196608)
    Seq("user" -> "graft", "database" -> "graft").foreach { case (k, v) =>
      d.write(k.getBytes(UTF_8)); d.writeByte(0)
      d.write(v.getBytes(UTF_8)); d.writeByte(0)
    }
    d.writeByte(0)
    out.writeInt(4 + body.size()); body.writeTo(out); out.flush()
    var ready = false
    while (!ready) {
      val (t, p) = readMsg()
      t match {
        case 'R' =>
          val code = ((p(0) & 0xff) << 24) | ((p(1) & 0xff) << 16) |
            ((p(2) & 0xff) << 8) | (p(3) & 0xff)
          if (code != 0)
            throw new SQLException(s"unsupported auth request $code")
        case 'S' | 'K' | 'N' => // ParameterStatus / BackendKeyData / Notice
        case 'Z' => ready = true
        case 'E' => throw errorFrom(p)
        case other => throw new SQLException(s"unexpected startup msg '$other'")
      }
    }
  }

  def readMsg(): (Char, Array[Byte]) = {
    val t = in.readByte().toChar
    val len = in.readInt()
    val p = new Array[Byte](len - 4)
    in.readFully(p)
    (t, p)
  }

  private def errorFrom(p: Array[Byte]): SQLException = {
    // ErrorResponse: (field-type byte, cstring)* \0
    var i = 0; var state = "XX000"; var msg = "server error"
    while (i < p.length && p(i) != 0) {
      val f = p(i).toChar; i += 1
      val end = p.indexOf(0.toByte, i)
      val v = new String(p, i, end - i, UTF_8)
      if (f == 'C') state = v else if (f == 'M') msg = v
      i = end + 1
    }
    new SQLException(msg, state)
  }

  private def drainToReady(): Unit = {
    var done = false
    while (!done) {
      val (t, _) = readMsg()
      if (t == 'Z') done = true
    }
  }

  def sendQuery(sql: String): Unit = {
    require(openCursor == null, "pgwire: a cursor is already in flight")
    val b = sql.getBytes(UTF_8)
    out.writeByte('Q'.toInt)
    out.writeInt(4 + b.length + 1)
    out.write(b); out.writeByte(0)
    out.flush()
  }

  /** Run a statement that returns rows: send, parse RowDescription,
    * hand back a streaming cursor.
    */
  def query(sql: String): PgCursor = {
    sendQuery(sql)
    val (t, p) = readMsg()
    t match {
      case 'T' =>
        val c = new PgCursor(this, PgCursor.parseFields(p))
        openCursor = c
        c
      case 'C' => drainToReady()
        throw new SQLException(s"query returned no result set: $sql")
      case 'E' => val e = errorFrom(p); drainToReady(); throw e
      case other => drainToReady()
        throw new SQLException(s"unexpected response '$other'")
    }
  }

  /** Run a statement for its update count. */
  def update(sql: String): Int = {
    sendQuery(sql)
    var count = 0
    var err: SQLException = null
    var done = false
    while (!done) {
      val (t, p) = readMsg()
      t match {
        case 'C' =>
          val tag = new String(p, 0, p.length - 1, UTF_8)
          val last = tag.split(' ').last
          count = try last.toInt catch { case _: NumberFormatException => 0 }
        case 'E' => err = errorFrom(p)
        case 'Z' => done = true
        case 'T' | 'D' | 'I' | 'N' => // tolerated: SELECT via update path
        case other => throw new SQLException(s"unexpected response '$other'")
      }
    }
    if (err != null) throw err
    count
  }

  def close(): Unit = if (!closed) {
    closed = true
    try {
      if (openCursor != null) openCursor.close()
      out.writeByte('X'.toInt); out.writeInt(4); out.flush()
    } catch { case _: Exception => }
    try sock.close() catch { case _: Exception => }
  }
}

private[pgwire] object PgCursor {
  final case class Field(name: String, oid: Int, typmod: Int)

  def parseFields(p: Array[Byte]): Array[Field] = {
    val in = new DataInputStream(new java.io.ByteArrayInputStream(p))
    val n = in.readShort()
    (0 until n).map { _ =>
      // collect the name bytes and decode once as UTF-8 (byte-by-byte
      // toChar would mangle multi-byte column labels)
      val nmBytes = new java.io.ByteArrayOutputStream()
      var b = in.readByte()
      while (b != 0) { nmBytes.write(b.toInt); b = in.readByte() }
      val nm = new String(nmBytes.toByteArray, UTF_8)
      in.readInt(); in.readShort()         // table oid, attnum
      val oid = in.readInt()
      in.readShort()                       // typlen
      val typmod = in.readInt()
      in.readShort()                       // format
      Field(nm, oid, typmod)
    }.toArray
  }

  def jdbcType(oid: Int): Int = oid match {
    case 16 => Types.BOOLEAN
    case 21 => Types.SMALLINT
    case 23 => Types.INTEGER
    case 20 => Types.BIGINT
    case 700 => Types.REAL
    case 701 => Types.DOUBLE
    case 1700 => Types.DECIMAL
    case 1082 => Types.DATE
    case 1114 => Types.TIMESTAMP
    case 17 => Types.BINARY
    case _ => Types.VARCHAR // 1043 varchar, 25 text
  }

  def typeName(oid: Int): String = oid match {
    case 16 => "bool"; case 21 => "int2"; case 23 => "int4"
    case 20 => "int8"; case 700 => "float4"; case 701 => "float8"
    case 1700 => "numeric"; case 1082 => "date"; case 1114 => "timestamp"
    case 17 => "bytea"; case 1043 => "varchar"; case _ => "text"
  }
}

/** Streaming row cursor: each `next()` reads exactly one DataRow frame
  * off the socket; CommandComplete + ReadyForQuery end it.
  */
private[pgwire] final class PgCursor(sess: PgSession,
                                     val fields: Array[PgCursor.Field]) {
  var row: Array[String] = null
  private var done = false

  def next(): Boolean =
    if (done) false
    else {
      var got = false
      var fin = false
      while (!got && !fin) {
        val (t, p) = sess.readMsg()
        t match {
          case 'D' =>
            val in = new DataInputStream(new java.io.ByteArrayInputStream(p))
            val n = in.readShort()
            val r = new Array[String](n)
            var i = 0
            while (i < n) {
              val len = in.readInt()
              if (len >= 0) {
                val b = new Array[Byte](len); in.readFully(b)
                r(i) = new String(b, UTF_8)
              }
              i += 1
            }
            row = r; got = true
          case 'C' => // CommandComplete: ReadyForQuery follows
          case 'Z' => fin = true
          case 'E' =>
            finish(); throw new SQLException(new String(p, UTF_8))
          case 'N' => // notice: skip
          case other =>
            finish(); throw new SQLException(s"unexpected frame '$other'")
        }
      }
      if (fin) { finish(); false } else true
    }

  private def finish(): Unit = { done = true; sess.openCursor = null }

  def close(): Unit = if (!done) {
    // drain the remaining frames so the session returns to idle
    try { while (next()) () } catch { case _: SQLException => finish() }
  }
}

/** JDBC facade over [[PgSession]], built from dynamic proxies: handled
  * methods are the ones Spark's JDBC source actually calls; anything
  * else throws `SQLFeatureNotSupportedException` by design.
  */
private[pgwire] object PgWireClient {

  private def proxy[T](iface: Class[T])(
      h: PartialFunction[(String, Array[AnyRef]), AnyRef]): T =
    Proxy.newProxyInstance(iface.getClassLoader, Array(iface),
      new InvocationHandler {
        override def invoke(p: AnyRef, m: Method, a: Array[AnyRef]): AnyRef = {
          val args = if (a == null) Array.empty[AnyRef] else a
          m.getName match {
            case "equals" => Boolean.box(p eq args(0))
            case "hashCode" => Int.box(System.identityHashCode(p))
            case "toString" => s"graft-pgwire ${iface.getSimpleName}"
            case n if h.isDefinedAt((n, args)) => h((n, args))
            case n =>
              throw new SQLFeatureNotSupportedException(
                s"pgwire ${iface.getSimpleName}.$n")
          }
        }
      }).asInstanceOf[T]

  private val B_TRUE = Boolean.box(true)
  private val B_FALSE = Boolean.box(false)

  def connect(host: String, port: Int): Connection = {
    val sess = new PgSession(host, port)
    connectionProxy(sess)
  }

  private def connectionProxy(sess: PgSession): Connection = {
    lazy val conn: Connection = proxy(classOf[Connection]) {
      case ("prepareStatement", args) =>
        statementProxy(sess, conn, args(0).asInstanceOf[String])
      case ("createStatement", _) => statementProxy(sess, conn, null)
      case ("close", _) => sess.close(); null
      case ("isClosed", _) => Boolean.box(sess.closed)
      case ("isValid", _) => Boolean.box(!sess.closed)
      case ("getMetaData", _) => metaDataProxy(sess)
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

  private def metaDataProxy(sess: PgSession): DatabaseMetaData =
    proxy(classOf[DatabaseMetaData]) {
      case ("supportsBatchUpdates", _) => B_TRUE
      case ("getDatabaseProductName", _) => "PostgreSQL (graft pgwire)"
      case ("getDatabaseProductVersion" | "getDriverVersion", _) => "1.0"
      case ("getDriverName", _) => "graft-pgwire"
      case ("getURL", _) => PgWireDriver.Prefix
      case ("getUserName", _) => "graft"
      case ("getJDBCMajorVersion", _) => Int.box(4)
      case ("getJDBCMinorVersion", _) => Int.box(0)
      case ("getDatabaseMajorVersion", _) => Int.box(15)
      case ("getDatabaseMinorVersion", _) => Int.box(0)
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
      case ("getIdentifierQuoteString", _) => "\""
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

  /** Literal rendering for client-side parameter interpolation. */
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

  private def statementProxy(sess: PgSession, conn: Connection,
                             template: String): PreparedStatement = {
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
    lazy val st: PreparedStatement = proxy(classOf[PreparedStatement]) {
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
        val vi = if (template == null) -1
          else template.toUpperCase.indexOf(" VALUES (")
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
            // the server's INSERT tag carries the applied row count; a
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
        current = resultSetProxy(sess.query(renderedSql(args)), st)
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

  private def resultSetProxy(cur: PgCursor, st: Statement): ResultSet = {
    var wasNull = false
    var closed = false
    def cell(i: Int): String = {
      val v = cur.row(i - 1)
      wasNull = v == null
      v
    }
    proxy(classOf[ResultSet]) {
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
        Boolean.box(v == "t" || v == "true")
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
      case ("getMetaData", _) => rsMetaProxy(cur)
      case ("getStatement", _) => st
      case ("getType", _) => Int.box(ResultSet.TYPE_FORWARD_ONLY)
      case ("getConcurrency", _) => Int.box(ResultSet.CONCUR_READ_ONLY)
      case ("setFetchSize" | "clearWarnings", _) => null
      case ("getFetchSize", _) => Int.box(0)
      case ("getWarnings", _) => null
    }
  }

  /** Column args arrive as either an index or a label. */
  private def intArg(args: Array[AnyRef], cur: PgCursor): Int = args(0) match {
    case i: java.lang.Integer => i.intValue
    case s: String =>
      val i = cur.fields.indexWhere(_.name == s)
      if (i < 0) throw new SQLException(s"no column $s")
      i + 1
  }

  private def rsMetaProxy(cur: PgCursor): ResultSetMetaData =
    proxy(classOf[ResultSetMetaData]) {
      case ("getColumnCount", _) => Int.box(cur.fields.length)
      case ("getColumnName" | "getColumnLabel", args) =>
        cur.fields(args(0).asInstanceOf[Int].intValue - 1).name
      case ("getColumnType", args) =>
        Int.box(PgCursor.jdbcType(
          cur.fields(args(0).asInstanceOf[Int].intValue - 1).oid))
      case ("getColumnTypeName", args) =>
        PgCursor.typeName(
          cur.fields(args(0).asInstanceOf[Int].intValue - 1).oid)
      case ("getPrecision", args) =>
        val f = cur.fields(args(0).asInstanceOf[Int].intValue - 1)
        Int.box(f.oid match {
          case 1700 if f.typmod >= 4 => (f.typmod - 4) >> 16
          case 1043 if f.typmod >= 4 => f.typmod - 4
          case 20 | 701 => 19
          case 23 | 700 => 10
          case _ => 0
        })
      case ("getScale", args) =>
        val f = cur.fields(args(0).asInstanceOf[Int].intValue - 1)
        Int.box(if (f.oid == 1700 && f.typmod >= 4) (f.typmod - 4) & 0xffff
          else 0)
      case ("isSigned", args) =>
        val f = cur.fields(args(0).asInstanceOf[Int].intValue - 1)
        Boolean.box(Seq(20, 21, 23, 700, 701, 1700).contains(f.oid))
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

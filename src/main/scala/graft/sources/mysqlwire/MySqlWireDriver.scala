package graft.sources.mysqlwire

import java.io.{BufferedInputStream, BufferedOutputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}
import java.net.Socket
import java.nio.charset.StandardCharsets.UTF_8
import java.sql.{Connection, Driver, DriverPropertyInfo, SQLException, Types}
import java.util.Properties
import java.util.logging.Logger

import graft.sources.wire.WireJdbc
import graft.sources.wire.WireJdbc.{WireCursor, WireField, WireSession}

/** A minimal JDBC driver speaking the MySQL client/server wire protocol
  * (text protocol, COM_QUERY) — the client half of [[MySqlWireServer]],
  * mirroring the reference's primary source path (MySQL over a TCP
  * proxy). URL form: `jdbc:graftmy://host:port/db`. The JDBC facade is
  * the shared [[WireJdbc]] surface; this module is ONLY the protocol:
  * packet framing, handshake response, length-encoded integers/strings,
  * ColumnDefinition41 → [[WireField]] mapping, EOF/OK/ERR handling.
  *
  * MySQL-isms surfaced to the reader (the a04c dialect contract):
  * TINYINT(1) maps to JDBC BIT (the connector's tinyInt1isBit default),
  * UNSIGNED BIGINT maps to DECIMAL(20,0) so 2^64−1 survives, and
  * NEWDECIMAL precision/scale ride the column-definition bytes.
  */
final class MySqlWireDriver extends Driver {
  override def acceptsURL(url: String): Boolean =
    url != null && url.startsWith(MySqlWireDriver.Prefix)
  override def connect(url: String, info: Properties): Connection =
    if (!acceptsURL(url)) null
    else {
      val hp = url.stripPrefix(MySqlWireDriver.Prefix).takeWhile(_ != '/')
      val (host, port) = hp.split(':') match {
        case Array(h, p) => (h, p.toInt)
        case _ => throw new SQLException(s"bad mysqlwire url: $url")
      }
      // the `user` connection property doubles as the shared-secret
      // token when the server is network-bound; `ssl=true` negotiates
      // the CLIENT_SSL upgrade with the pinned fixture certificate
      val user = Option(info).flatMap(p => Option(p.getProperty("user")))
        .getOrElse("graft")
      val ssl = Option(info).flatMap(p => Option(p.getProperty("ssl")))
        .exists(_.equalsIgnoreCase("true"))
      WireJdbc.connection(new MySession(host, port, user, ssl),
        MySqlWireDriver.flavor)
    }
  override def getMajorVersion: Int = 1
  override def getMinorVersion: Int = 0
  override def jdbcCompliant(): Boolean = false
  override def getParentLogger: Logger = Logger.getLogger("graft.mysqlwire")
  override def getPropertyInfo(url: String, info: Properties): Array[DriverPropertyInfo] =
    Array.empty
}

object MySqlWireDriver {
  val Prefix = "jdbc:graftmy://"
  private[mysqlwire] val flavor = WireJdbc.Flavor(
    label = "graft-mysqlwire", urlPrefix = Prefix,
    productName = "MySQL (graft mysqlwire)", dbMajor = 8, dbMinor = 0,
    identifierQuote = "\"")
  // self-registration, the standard java.sql.Driver contract
  java.sql.DriverManager.registerDriver(new MySqlWireDriver)
  def ensureRegistered(): Unit = ()
}

/** One wire session: V10 handshake → HandshakeResponse41 → OK, then a
  * strict single-outstanding COM_QUERY cycle.
  */
private[mysqlwire] final class MySession(host: String, port: Int,
                                         user: String = "graft",
                                         ssl: Boolean = false)
    extends WireSession {
  private var sock = new Socket(host, port)
  sock.setTcpNoDelay(true)
  // a stalled read fails the one query instead of hanging the whole JVM
  // (a handshake race once froze a full bench run); 120 s is far above
  // any legitimate local pause and the server streams rows continuously
  sock.setSoTimeout(120000)
  private var in = new DataInputStream(new BufferedInputStream(sock.getInputStream))
  private var out = new DataOutputStream(new BufferedOutputStream(sock.getOutputStream))
  @volatile var closed = false
  private var seq = 0
  /** The one cursor allowed in flight (protocol sequencing). */
  var openCursor: MyCursor = null

  def readPacket(): Array[Byte] = {
    val a = in.readUnsignedByte()
    val b = in.readUnsignedByte()
    val c = in.readUnsignedByte()
    seq = (in.readUnsignedByte() + 1) & 0xFF
    val len = a | (b << 8) | (c << 16)
    // 0xFFFFFF = split-packet continuation (mandatory >=16MB rule) —
    // unimplemented in this subset; fail loudly, never desync silently
    if (len >= 0xFFFFFF)
      throw new SQLException("mysqlwire: >=16MB split packets unsupported")
    val p = new Array[Byte](len)
    in.readFully(p)
    p
  }

  private def writePacket(p: Array[Byte]): Unit = {
    if (p.length >= 0xFFFFFF)
      throw new SQLException(
        s"mysqlwire: packet of ${p.length} bytes needs >=16MB splitting (unimplemented)")
    out.write(p.length & 0xFF)
    out.write((p.length >> 8) & 0xFF)
    out.write((p.length >> 16) & 0xFF)
    out.write(seq)
    seq = (seq + 1) & 0xFF
    out.write(p)
    out.flush()
  }

  private[mysqlwire] def errFrom(p: Array[Byte]): SQLException = {
    // ERR: 0xFF, code 2 LE, '#', 5-byte state, message
    val code = (p(1) & 0xFF) | ((p(2) & 0xFF) << 8)
    val (state, msgOff) =
      if (p.length > 3 && p(3) == '#') (new String(p, 4, 5, UTF_8), 9)
      else ("HY000", 3)
    new SQLException(
      new String(p, msgOff, p.length - msgOff, UTF_8), state, code)
  }

  // connection phase
  locally {
    val hs = readPacket()
    if ((hs(0) & 0xFF) == 0xFF) throw errFrom(hs)
    if ((hs(0) & 0xFF) != 0x0A)
      throw new SQLException(s"unsupported protocol version ${hs(0)}")
    // 41|SECURE|WITH_DB|PLUGIN (+ CLIENT_SSL when negotiating TLS)
    val caps = 0x0200 | 0x8000 | 0x0008 | 0x80000 |
      (if (ssl) 0x0800 else 0)
    if (ssl) {
      // SSL Connection Request: the first 32 bytes of the response
      // (caps with CLIENT_SSL, max packet, charset, 23 zeros), then the
      // in-place TLS upgrade; the full HandshakeResponse41 follows
      // encrypted. A server without TLS answers with a plaintext ERR,
      // which fails the client handshake loudly — never a downgrade.
      val sb = new ByteArrayOutputStream()
      var i = 0
      while (i < 4) { sb.write((caps >> (8 * i)) & 0xFF); i += 1 }
      i = 0
      while (i < 4) { sb.write((0x1000000 >> (8 * i)) & 0xFF); i += 1 }
      sb.write(33)
      sb.write(new Array[Byte](23), 0, 23)
      writePacket(sb.toByteArray)
      sock = graft.sources.wire.WireTls.upgradeClient(sock, host, port)
      in = new DataInputStream(new BufferedInputStream(sock.getInputStream))
      out = new DataOutputStream(new BufferedOutputStream(sock.getOutputStream))
    }
    // HandshakeResponse41: caps, max packet, charset, 23 zeros, user,
    // 1-byte-len auth response (empty — trust), database, plugin name
    val b = new ByteArrayOutputStream()
    var i = 0
    while (i < 4) { b.write((caps >> (8 * i)) & 0xFF); i += 1 }
    i = 0
    while (i < 4) { b.write((0x1000000 >> (8 * i)) & 0xFF); i += 1 }
    b.write(33) // utf8_general_ci
    b.write(new Array[Byte](23), 0, 23)
    b.write(user.getBytes(UTF_8)); b.write(0)
    b.write(0) // empty auth response (length-prefixed)
    b.write("graft".getBytes(UTF_8)); b.write(0) // database
    b.write("mysql_native_password".getBytes(UTF_8)); b.write(0)
    writePacket(b.toByteArray)
    val resp = readPacket()
    (resp(0) & 0xFF) match {
      case 0x00 => // OK
      case 0xFF => throw errFrom(resp)
      case other => throw new SQLException(s"unexpected auth reply $other")
    }
  }

  /** Length-encoded integer at offset; returns (value, bytesConsumed). */
  private[mysqlwire] def lenenc(p: Array[Byte], off: Int): (Long, Int) =
    (p(off) & 0xFF) match {
      case 0xFC => (((p(off + 1) & 0xFFL)) | ((p(off + 2) & 0xFFL) << 8), 3)
      case 0xFD => ((p(off + 1) & 0xFFL) | ((p(off + 2) & 0xFFL) << 8) |
        ((p(off + 3) & 0xFFL) << 16), 4)
      case 0xFE =>
        var v = 0L
        var i = 0
        while (i < 8) { v |= (p(off + 1 + i) & 0xFFL) << (8 * i); i += 1 }
        (v, 9)
      case x => (x.toLong, 1)
    }

  private def sendCommand(cmd: Int, payload: Array[Byte]): Unit = {
    seq = 0
    val b = new ByteArrayOutputStream()
    b.write(cmd)
    b.write(payload, 0, payload.length)
    writePacket(b.toByteArray)
  }

  private def isEof(p: Array[Byte]): Boolean =
    (p(0) & 0xFF) == 0xFE && p.length < 9

  def query(sql: String): MyCursor = {
    require(openCursor == null, "mysqlwire: a cursor is already in flight")
    sendCommand(0x03, sql.getBytes(UTF_8))
    val first = readPacket()
    (first(0) & 0xFF) match {
      case 0xFF => throw errFrom(first)
      case 0x00 =>
        throw new SQLException(s"query returned no result set: $sql")
      case _ =>
        val (nCols, _) = lenenc(first, 0)
        val fields = (0 until nCols.toInt).map { _ =>
          MyCursor.parseColumnDef(this, readPacket())
        }.toArray
        val eof = readPacket()
        if (!isEof(eof)) throw new SQLException("missing column EOF")
        val c = new MyCursor(this, fields)
        openCursor = c
        c
    }
  }

  def update(sql: String): Int = {
    require(openCursor == null, "mysqlwire: a cursor is already in flight")
    sendCommand(0x03, sql.getBytes(UTF_8))
    val first = readPacket()
    (first(0) & 0xFF) match {
      case 0x00 => lenenc(first, 1)._1.toInt // OK: affected rows
      case 0xFF => throw errFrom(first)
      case _ => // SELECT through the update path: drain the result set
        val (nCols, _) = lenenc(first, 0)
        var i = 0
        while (i < nCols.toInt) { readPacket(); i += 1 }
        readPacket() // column EOF
        var rows = 0
        var done = false
        while (!done) {
          val p = readPacket()
          if (isEof(p)) done = true
          else if ((p(0) & 0xFF) == 0xFF) throw errFrom(p)
          else rows += 1
        }
        rows
    }
  }

  private[mysqlwire] def finishCursor(): Unit = openCursor = null

  def close(): Unit = if (!closed) {
    closed = true
    try {
      if (openCursor != null) openCursor.close()
      sendCommand(0x01, Array.empty) // COM_QUIT
    } catch { case _: Exception => }
    try sock.close() catch { case _: Exception => }
  }

  private[mysqlwire] def isEofPacket(p: Array[Byte]): Boolean = isEof(p)
}

private[mysqlwire] object MyCursor {

  /** ColumnDefinition41 → [[WireField]]: name, type byte, flags,
    * decimals, display length. MySQL-isms decoded here: TINY with
    * display length 1 is the connector's boolean (JDBC BIT); LONGLONG
    * with the UNSIGNED flag (0x20) maps to DECIMAL(20,0) so the full
    * unsigned range survives (the a04c widening rule).
    */
  def parseColumnDef(sess: MySession, p: Array[Byte]): WireField = {
    var off = 0
    def str(): String = {
      val (len, n) = sess.lenenc(p, off)
      val s = new String(p, off + n, len.toInt, UTF_8)
      off += n + len.toInt
      s
    }
    str(); str(); str(); str() // catalog, schema, table, org_table
    val name = str()
    str() // org_name
    off += 1 // 0x0C marker
    off += 2 // charset
    val len = (p(off) & 0xFFL) | ((p(off + 1) & 0xFFL) << 8) |
      ((p(off + 2) & 0xFFL) << 16) | ((p(off + 3) & 0xFFL) << 24)
    off += 4
    val tpe = p(off) & 0xFF; off += 1
    val flags = (p(off) & 0xFF) | ((p(off + 1) & 0xFF) << 8); off += 2
    val decimals = p(off) & 0xFF
    val unsigned = (flags & 0x20) != 0
    tpe match {
      case 0x01 if len == 1 =>
        WireField(name, Types.BIT, "tinyint(1)", 1, 0, signed = true)
      case 0x01 => WireField(name, Types.TINYINT, "tinyint", 3, 0, !unsigned)
      case 0x02 => WireField(name, Types.SMALLINT, "smallint", 5, 0, !unsigned)
      case 0x03 | 0x09 =>
        WireField(name, Types.INTEGER, "int", 10, 0, !unsigned)
      case 0x08 =>
        if (unsigned)
          WireField(name, Types.DECIMAL, "bigint unsigned", 20, 0,
            signed = false)
        else WireField(name, Types.BIGINT, "bigint", 19, 0, signed = true)
      case 0x04 => WireField(name, Types.REAL, "float", 12, decimals,
        signed = true)
      case 0x05 => WireField(name, Types.DOUBLE, "double", 22, decimals,
        signed = true)
      case 0xF6 | 0x00 =>
        WireField(name, Types.DECIMAL, "decimal",
          math.max(len.toInt - 2, 1), decimals, signed = true)
      case 0x0A => WireField(name, Types.DATE, "date", 10, 0, signed = false)
      case 0x07 | 0x0C =>
        WireField(name, Types.TIMESTAMP, "datetime", 26, 0, signed = false)
      case 0xFC => WireField(name, Types.BINARY, "blob", len.toInt, 0,
        signed = false)
      case _ => WireField(name, Types.VARCHAR, "varchar",
        math.max(len.toInt / 4, 1), 0, signed = false)
    }
  }
}

/** Streaming row cursor: each `next()` reads exactly one row packet off
  * the socket; the EOF packet ends it.
  */
private[mysqlwire] final class MyCursor(sess: MySession,
                                        val fields: Array[WireField])
    extends WireCursor {
  var row: Array[String] = null
  private var done = false

  def next(): Boolean =
    if (done) false
    else {
      val p = sess.readPacket()
      if (sess.isEofPacket(p)) { finish(); false }
      else if ((p(0) & 0xFF) == 0xFF) { finish(); throw sess.errFrom(p) }
      else {
        val r = new Array[String](fields.length)
        var off = 0
        var i = 0
        while (i < fields.length) {
          if ((p(off) & 0xFF) == 0xFB) { r(i) = null; off += 1 }
          else {
            val (len, n) = sess.lenenc(p, off)
            r(i) = new String(p, off + n, len.toInt, UTF_8)
            off += n + len.toInt
          }
          i += 1
        }
        row = r
        true
      }
    }

  private def finish(): Unit = { done = true; sess.finishCursor() }

  def close(): Unit = if (!done) {
    // drain the remaining frames so the session returns to idle
    try { while (next()) () } catch { case _: SQLException => }
  }
}

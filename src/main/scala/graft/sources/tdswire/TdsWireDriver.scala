package graft.sources.tdswire

import java.io.{BufferedInputStream, BufferedOutputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream, EOFException, IOException, InputStream}
import java.net.Socket
import java.nio.charset.StandardCharsets.UTF_16LE
import java.sql.{Connection, Driver, DriverPropertyInfo, SQLException, Types}
import java.util.Properties
import java.util.logging.Logger

import graft.sources.wire.WireJdbc
import graft.sources.wire.WireJdbc.{WireCursor, WireField, WireSession}

/** A minimal JDBC driver speaking TDS 7.x — the client half of
  * [[TdsWireServer]], completing the MSSQL leg of the reference's source
  * topology (`dags/mssql_to_bigquery.py:2` reads SQL Server with
  * three-part naming). URL form: `jdbc:grafttds://host:port/db`. The
  * JDBC facade is the shared [[WireJdbc]] surface; this module is ONLY
  * the protocol: packet framing with EOM reassembly, PRELOGIN, LOGIN7
  * (password under the documented nibble-swap-XOR obfuscation), SQL
  * batch with ALL_HEADERS, and the token stream — COLMETADATA →
  * [[WireField]], ROW values decoded from their BINARY type formats
  * (INTN/FLTN/BITN/NUMERICN/NVARCHAR/DATEN/DATETIME2N/VARBINARY) into
  * the facade's text cells, DONE/ERROR/INFO handling.
  *
  * Scale: ROW tokens stream off the socket one packet at a time
  * ([[TdsMessageIn]] pulls continuation packets lazily), so a
  * partitioned fact export holds O(1) rows per cursor client-side.
  */
final class TdsWireDriver extends Driver {
  override def acceptsURL(url: String): Boolean =
    url != null && url.startsWith(TdsWireDriver.Prefix)
  override def connect(url: String, info: Properties): Connection =
    if (!acceptsURL(url)) null
    else {
      val hp = url.stripPrefix(TdsWireDriver.Prefix).takeWhile(_ != '/')
      val (host, port) = hp.split(':') match {
        case Array(h, p) => (h, p.toInt)
        case _ => throw new SQLException(s"bad tdswire url: $url")
      }
      val user = Option(info).flatMap(p => Option(p.getProperty("user")))
        .getOrElse("graft")
      // the password slot carries the shared-secret token when the
      // server is network-bound (TDS has a real credential field, unlike
      // the trust-auth text protocols)
      val password = Option(info)
        .flatMap(p => Option(p.getProperty("password"))).getOrElse("")
      val ssl = Option(info)
        .flatMap(p => Option(p.getProperty("ssl"))).contains("true")
      WireJdbc.connection(new TdsSession(host, port, user, password, ssl),
        TdsWireDriver.flavor)
    }
  override def getMajorVersion: Int = 1
  override def getMinorVersion: Int = 0
  override def jdbcCompliant(): Boolean = false
  override def getParentLogger: Logger = Logger.getLogger("graft.tdswire")
  override def getPropertyInfo(url: String, info: Properties): Array[DriverPropertyInfo] =
    Array.empty
}

object TdsWireDriver {
  val Prefix = "jdbc:grafttds://"
  private[tdswire] val flavor = WireJdbc.Flavor(
    label = "graft-tdswire", urlPrefix = Prefix,
    productName = "Microsoft SQL Server (graft tdswire)",
    dbMajor = 12, dbMinor = 0, identifierQuote = "\"")
  // self-registration, the standard java.sql.Driver contract
  java.sql.DriverManager.registerDriver(new TdsWireDriver)
  def ensureRegistered(): Unit = ()
}

/** An InputStream over ONE message's payload: packet headers are
  * consumed transparently and continuation packets pulled lazily, so a
  * large tabular result streams row by row without client buffering.
  */
private[tdswire] final class TdsMessageIn(in: DataInputStream)
    extends InputStream {
  var msgType: Int = -1
  private var remaining = 0
  private var eom = false

  private def nextPacket(): Boolean =
    if (eom) false
    else {
      val t = in.readUnsignedByte()
      val status = in.readUnsignedByte()
      val len = in.readUnsignedShort()
      in.readUnsignedShort(); in.readUnsignedByte(); in.readUnsignedByte()
      if (msgType < 0) msgType = t
      remaining = len - 8
      eom = (status & 0x01) != 0
      true
    }

  override def read(): Int = {
    while (remaining == 0) if (!nextPacket() || (remaining == 0 && eom)) return -1
    remaining -= 1
    in.readUnsignedByte()
  }

  override def read(b: Array[Byte], off: Int, n: Int): Int = {
    while (remaining == 0) if (!nextPacket() || (remaining == 0 && eom)) return -1
    val k = math.min(n, remaining)
    in.readFully(b, off, k)
    remaining -= k
    k
  }

  /** Consume whatever is left so the session returns to idle. */
  def drain(): Unit = {
    val buf = new Array[Byte](4096)
    while (read(buf, 0, buf.length) >= 0) ()
  }
}

private[tdswire] final class TdsSession(host: String, port: Int,
                                        user: String, password: String,
                                        ssl: Boolean = false)
    extends WireSession {
  private val sock = new Socket(host, port)
  sock.setTcpNoDelay(true)
  sock.setSoTimeout(120000) // stalled read fails the query, never hangs the JVM
  // re-pointed at the TLS streams after the framed handshake (MS-TDS
  // §3.3.5.1) when `ssl` is negotiated; mutation happens only inside
  // the construction block below, before any cursor exists
  private var in = new DataInputStream(new BufferedInputStream(sock.getInputStream))
  private var rawOut = new DataOutputStream(
    new BufferedOutputStream(sock.getOutputStream))
  private var io = new TdsIO(in, rawOut)
  @volatile var closed = false
  /** The one cursor allowed in flight (single-outstanding-batch rule). */
  var openCursor: TdsCursor = null

  // ---- connection phase --------------------------------------------------
  locally {
    // PRELOGIN: VERSION + ENCRYPTION=NOT_SUP, terminator
    val pre = new ByteArrayOutputStream()
    val tableLen = 5 + 5 + 1
    pre.write(0x00); pre.write(tableLen >> 8); pre.write(tableLen & 0xFF)
    pre.write(0); pre.write(6)
    pre.write(0x01); pre.write((tableLen + 6) >> 8); pre.write((tableLen + 6) & 0xFF)
    pre.write(0); pre.write(1)
    pre.write(0xFF)
    pre.write(Array[Byte](1, 0, 0, 0, 0, 0), 0, 6)
    pre.write(if (ssl) 1 else 2) // ENCRYPT_ON requested / ENCRYPT_NOT_SUP
    io.writeMessage(0x12, pre.toByteArray)
    val (pt, preReply) = io.readMessage()
    if (pt != 0x04) throw new SQLException(s"unexpected prelogin reply $pt")
    // walk the option table for the server's ENCRYPTION verdict
    val serverEnc: Int = {
      var i = 0
      var enc = -1
      var stop = false
      while (!stop && i + 5 <= preReply.length) {
        val tok = preReply(i) & 0xFF
        if (tok == 0xFF) stop = true
        else {
          val off = ((preReply(i + 1) & 0xFF) << 8) | (preReply(i + 2) & 0xFF)
          val len = ((preReply(i + 3) & 0xFF) << 8) | (preReply(i + 4) & 0xFF)
          if (tok == 0x01 && len >= 1 && off < preReply.length)
            enc = preReply(off) & 0xFF
          i += 5
        }
      }
      enc
    }
    if (ssl && serverEnc != 0 && serverEnc != 1 && serverEnc != 3)
      // 08004: the peer cannot encrypt — abort, NEVER continue plaintext
      throw new SQLException(
        "tdswire: TLS requested but server answered ENCRYPT_NOT_SUP",
        "08004")
    if (!ssl && (serverEnc == 1 || serverEnc == 3))
      // the server demands encryption; a plaintext LOGIN7 would only die
      // inside its handshake — fail with the real reason instead
      throw new SQLException(
        "tdswire: server requires TLS (ENCRYPT_ON); set ssl=true", "28000")
    if (ssl) {
      val sslSock = TdsTls.upgradeClient(sock, host, port, in, rawOut)
      in = new DataInputStream(new BufferedInputStream(sslSock.getInputStream))
      rawOut = new DataOutputStream(
        new BufferedOutputStream(sslSock.getOutputStream))
      io = new TdsIO(in, rawOut)
    }

    // LOGIN7: fixed prologue + offset/length block + data
    val varFields: Seq[(String, Boolean)] = Seq(
      ("graft-client", false), // hostname
      (user, false),
      (password, true),
      ("graft", false),        // appname
      (host, false),           // servername
      ("", false),             // unused/extension
      ("graft-tdswire", false),// client interface name
      ("", false),             // language
      ("graft", false))        // database
    val fixedLen = 36 + varFields.length * 4 + 6 + 4 + 4 + 4 + 4
    // layout after prologue(36): 9 offset/len pairs, ClientID(6),
    // ibSSPI/cb(4), ibAtchDBFile/cch(4), ibChangePassword/cch(4),
    // cbSSPILong(4)
    val data = new ByteArrayOutputStream()
    val offsets = scala.collection.mutable.ArrayBuffer.empty[(Int, Int)]
    varFields.foreach { case (s, obfuscate) =>
      val bytes =
        if (obfuscate) TdsCodec.obfuscatePassword(s) else s.getBytes(UTF_16LE)
      offsets += ((fixedLen + data.size(), s.length))
      data.write(bytes, 0, bytes.length)
    }
    val b = new ByteArrayOutputStream()
    TdsCodec.le4(b, (fixedLen + data.size()).toLong) // total length
    b.write(Array[Byte](0x04, 0x00, 0x00, 0x74), 0, 4) // TDS 7.4
    TdsCodec.le4(b, 4096L) // packet size
    TdsCodec.le4(b, 0L); TdsCodec.le4(b, 0L); TdsCodec.le4(b, 0L)
    b.write(0); b.write(0); b.write(0); b.write(0) // option flags
    TdsCodec.le4(b, 0L) // timezone
    TdsCodec.le4(b, 0L) // lcid
    offsets.foreach { case (off, cch) =>
      TdsCodec.le2(b, off); TdsCodec.le2(b, cch)
    }
    b.write(new Array[Byte](6), 0, 6) // client id
    TdsCodec.le2(b, 0); TdsCodec.le2(b, 0) // SSPI
    TdsCodec.le2(b, 0); TdsCodec.le2(b, 0) // AtchDBFile
    TdsCodec.le2(b, 0); TdsCodec.le2(b, 0) // ChangePassword
    TdsCodec.le4(b, 0L) // cbSSPILong
    data.writeTo(b)
    io.writeMessage(0x10, b.toByteArray)

    // token stream: LOGINACK on success, ERROR on refusal, DONE last
    val resp = new TdsMessageIn(in)
    val d = new DataInputStream(resp)
    var loginAck = false
    var err: SQLException = null
    var open = true
    while (open) {
      val tok = d.read()
      if (tok < 0) open = false
      else tok match {
        case 0xAD => skipLenPrefixed(d); loginAck = true
        case 0xAA => val e = TdsParse.error(d); if (err == null) err = e
        case 0xAB => skipLenPrefixed(d)
        case 0xFD | 0xFE | 0xFF => d.skipBytes(12)
        case other =>
          throw new SQLException(f"unexpected login token 0x$other%02x")
      }
    }
    if (err != null) throw err
    if (!loginAck) throw new SQLException("login refused (no LOGINACK)")
  }

  private def skipLenPrefixed(d: DataInputStream): Unit = {
    val a = d.read(); val b = d.read()
    d.skipBytes((a & 0xFF) | ((b & 0xFF) << 8))
  }

  private def sendBatch(sql: String): TdsMessageIn = {
    require(openCursor == null, "tdswire: a batch is already in flight")
    val b = new ByteArrayOutputStream()
    // ALL_HEADERS: one transaction-descriptor header
    TdsCodec.le4(b, 22L) // total length
    TdsCodec.le4(b, 18L) // this header's length
    TdsCodec.le2(b, 2)   // type: transaction descriptor
    TdsCodec.le8(b, 0L)  // descriptor
    TdsCodec.le4(b, 1L)  // outstanding requests
    val x = sql.getBytes(UTF_16LE)
    b.write(x, 0, x.length)
    io.writeMessage(0x01, b.toByteArray)
    val m = new TdsMessageIn(in)
    m
  }

  def query(sql: String): TdsCursor = {
    val m = sendBatch(sql)
    val d = new DataInputStream(m)
    // first token decides: COLMETADATA → cursor; DONE → no result set;
    // ERROR → raise (after drain, so the session is reusable)
    var cursor: TdsCursor = null
    var err: SQLException = null
    var open = true
    while (open && cursor == null) {
      val tok = d.read()
      if (tok < 0) open = false
      else tok match {
        case 0x81 =>
          val fields = TdsParse.colMetadata(d)
          cursor = new TdsCursor(this, m, d, fields)
          openCursor = cursor
        case 0xAA => val e = TdsParse.error(d); if (err == null) err = e
        case 0xAB => skipLenPrefixed(d)
        case 0xFD | 0xFE | 0xFF => d.skipBytes(12)
        case other =>
          throw new SQLException(f"unexpected token 0x$other%02x")
      }
    }
    if (cursor == null) {
      m.drain()
      throw Option(err).getOrElse(
        new SQLException(s"query returned no result set: $sql"))
    }
    cursor
  }

  def update(sql: String): Int = {
    val m = sendBatch(sql)
    val d = new DataInputStream(m)
    var count = 0L
    var err: SQLException = null
    var open = true
    while (open) {
      val tok = d.read()
      if (tok < 0) open = false
      else tok match {
        case 0xFD | 0xFE | 0xFF =>
          val status = d.read() | (d.read() << 8)
          d.skipBytes(2)
          var rows = 0L
          var k = 0
          while (k < 8) { rows |= (d.read().toLong & 0xFF) << (8 * k); k += 1 }
          if ((status & 0x0010) != 0) count = rows // DONE_COUNT
        case 0xAA => val e = TdsParse.error(d); if (err == null) err = e
        case 0xAB => skipLenPrefixed(d)
        case 0x81 => // SELECT routed via update: skip metadata + rows
          val fields = TdsParse.colMetadata(d)
          var more = true
          while (more) {
            val t2 = d.read()
            if (t2 < 0) { more = false; open = false }
            else if (t2 == 0xD1) fields.foreach(f => TdsParse.value(d, f._2))
            else if (t2 == 0xFD || t2 == 0xFE || t2 == 0xFF) {
              d.skipBytes(12); more = false
            } else if (t2 == 0xAA) {
              val e = TdsParse.error(d); if (err == null) err = e
            } else if (t2 == 0xAB) skipLenPrefixed(d)
            else throw new SQLException(f"unexpected token 0x$t2%02x")
          }
        case other =>
          throw new SQLException(f"unexpected token 0x$other%02x")
      }
    }
    if (err != null) throw err
    count.toInt
  }

  def close(): Unit = if (!closed) {
    closed = true
    try {
      if (openCursor != null) openCursor.close()
    } catch { case _: Exception => }
    try sock.close() catch { case _: Exception => }
  }

  private[tdswire] def cursorDone(): Unit = openCursor = null
}

/** COLMETADATA / value parsing — the decode half of [[TdsCodec]]. */
private[tdswire] object TdsParse {

  /** One parsed column: facade field + the type descriptor needed to
    * decode its row values: (token, len/scale, precision, scale).
    */
  final case class TypeDesc(token: Int, len: Int, prec: Int, scale: Int)

  private def u16(d: DataInputStream): Int = d.read() | (d.read() << 8)

  private def ucs2(d: DataInputStream, chars: Int): String = {
    val b = new Array[Byte](chars * 2)
    d.readFully(b)
    new String(b, UTF_16LE)
  }

  def error(d: DataInputStream): SQLException = {
    u16(d) // token length
    var num = 0L
    var k = 0
    while (k < 4) { num |= (d.read().toLong & 0xFF) << (8 * k); k += 1 }
    d.read(); d.read() // state, class
    val msgRaw = ucs2(d, u16(d))
    val srv = ucs2(d, d.read())
    val proc = ucs2(d, d.read())
    d.skipBytes(4) // line
    val _ = (srv, proc)
    // the server prefixes "[SQLSTATE] message"
    val (state, msg) =
      if (msgRaw.startsWith("[") && msgRaw.length > 7 && msgRaw(6) == ']')
        (msgRaw.substring(1, 6), msgRaw.substring(8))
      else ("HY000", msgRaw)
    new SQLException(msg, state, num.toInt)
  }

  def colMetadata(d: DataInputStream): Array[(WireField, TypeDesc)] = {
    val n = u16(d)
    Array.fill(n) {
      d.skipBytes(4) // usertype
      d.skipBytes(2) // flags
      val tok = d.read()
      val desc = tok match {
        case 0x26 | 0x6D | 0x68 => TypeDesc(tok, d.read(), 0, 0)
        case 0x6C =>
          val len = d.read(); val p = d.read(); val s = d.read()
          TypeDesc(tok, len, p, s)
        case 0xE7 =>
          val max = u16(d); d.skipBytes(5) // collation
          TypeDesc(tok, max, 0, 0)
        case 0xA5 => TypeDesc(tok, u16(d), 0, 0)
        case 0x28 => TypeDesc(tok, 3, 0, 0)
        case 0x2A => TypeDesc(tok, 0, 0, d.read())
        case other =>
          throw new SQLException(f"unsupported TDS type 0x$other%02x")
      }
      val name = ucs2(d, d.read())
      (toWireField(name, desc), desc)
    }
  }

  private def toWireField(name: String, t: TypeDesc): WireField = t.token match {
    case 0x26 => t.len match {
      case 1 => WireField(name, Types.TINYINT, "tinyint", 3, 0, signed = false)
      case 2 => WireField(name, Types.SMALLINT, "smallint", 5, 0, signed = true)
      case 4 => WireField(name, Types.INTEGER, "int", 10, 0, signed = true)
      case _ => WireField(name, Types.BIGINT, "bigint", 19, 0, signed = true)
    }
    case 0x6D =>
      if (t.len == 4) WireField(name, Types.REAL, "real", 7, 0, signed = true)
      else WireField(name, Types.DOUBLE, "float", 15, 0, signed = true)
    case 0x68 => WireField(name, Types.BOOLEAN, "bit", 1, 0, signed = false)
    case 0x6C => WireField(name, Types.DECIMAL, "decimal", t.prec, t.scale,
      signed = true)
    case 0xE7 => WireField(name, Types.VARCHAR, "nvarchar", t.len / 2, 0,
      signed = false)
    case 0xA5 => WireField(name, Types.BINARY, "varbinary", t.len, 0,
      signed = false)
    case 0x28 => WireField(name, Types.DATE, "date", 10, 0, signed = false)
    case _ => WireField(name, Types.TIMESTAMP, "datetime2", 27, 7,
      signed = false)
  }

  private val CeEpochDay: Long = java.time.LocalDate.of(1, 1, 1).toEpochDay

  /** Decode one value to the facade's TEXT cell (null = SQL NULL). */
  def value(d: DataInputStream, t: TypeDesc): String = t.token match {
    case 0x26 =>
      val n = d.read()
      if (n == 0) null
      else {
        var v = 0L
        var k = 0
        while (k < n) { v |= (d.read().toLong & 0xFF) << (8 * k); k += 1 }
        // sign-extend from the actual wire width
        val shift = 64 - 8 * n
        ((v << shift) >> shift).toString
      }
    case 0x6D =>
      val n = d.read()
      if (n == 0) null
      else if (n == 4) {
        var v = 0
        var k = 0
        while (k < 4) { v |= (d.read() & 0xFF) << (8 * k); k += 1 }
        java.lang.Float.intBitsToFloat(v).toString
      } else {
        var v = 0L
        var k = 0
        while (k < 8) { v |= (d.read().toLong & 0xFF) << (8 * k); k += 1 }
        java.lang.Double.longBitsToDouble(v).toString
      }
    case 0x68 =>
      val n = d.read()
      if (n == 0) null else if (d.read() != 0) "1" else "0"
    case 0x6C =>
      val n = d.read()
      if (n == 0) null
      else {
        val neg = d.read() == 0
        val mag = new Array[Byte](n - 1)
        d.readFully(mag)
        val be = new Array[Byte](n) // leading 0x00 keeps it non-negative
        var k = 0
        while (k < n - 1) { be(n - 1 - k) = mag(k); k += 1 }
        val unscaled = new java.math.BigInteger(be)
        val v = new java.math.BigDecimal(
          if (neg) unscaled.negate() else unscaled, t.scale)
        v.toPlainString
      }
    case 0xE7 =>
      val n = u16(d)
      if (n == 0xFFFF) null else ucs2(d, n / 2)
    case 0xA5 =>
      val n = u16(d)
      if (n == 0xFFFF) null
      else {
        val b = new Array[Byte](n)
        d.readFully(b)
        b.map(x => f"${x & 0xFF}%02x").mkString
      }
    case 0x28 =>
      val n = d.read()
      if (n == 0) null
      else {
        var days = 0L
        var k = 0
        while (k < 3) { days |= (d.read().toLong & 0xFF) << (8 * k); k += 1 }
        java.time.LocalDate.ofEpochDay(days + CeEpochDay).toString
      }
    case 0x2A =>
      val n = d.read()
      if (n == 0) null
      else {
        val timeBytes = n - 3
        var units = 0L
        var k = 0
        while (k < timeBytes) {
          units |= (d.read().toLong & 0xFF) << (8 * k); k += 1
        }
        var days = 0L
        k = 0
        while (k < 3) { days |= (d.read().toLong & 0xFF) << (8 * k); k += 1 }
        // units are 10^-scale seconds
        var nanosPerUnit = 1000000000L
        var s = 0
        while (s < t.scale) { nanosPerUnit /= 10; s += 1 }
        val ldt = java.time.LocalDateTime.of(
          java.time.LocalDate.ofEpochDay(days + CeEpochDay),
          java.time.LocalTime.ofNanoOfDay(units * nanosPerUnit))
        java.sql.Timestamp.valueOf(ldt).toString
      }
    case other => throw new SQLException(f"unsupported TDS type 0x$other%02x")
  }
}

/** Streaming row cursor: each `next()` reads exactly one ROW token off
  * the socket; DONE ends it.
  */
private[tdswire] final class TdsCursor(
    sess: TdsSession, m: TdsMessageIn, d: DataInputStream,
    parsed: Array[(WireField, TdsParse.TypeDesc)]) extends WireCursor {
  val fields: Array[WireField] = parsed.map(_._1)
  var row: Array[String] = null
  private var done = false
  private var pendingErr: SQLException = null

  def next(): Boolean =
    if (done) false
    else {
      var got = false
      while (!got && !done) {
        val tok = d.read()
        if (tok < 0) finish()
        else tok match {
          case 0xD1 =>
            val r = new Array[String](parsed.length)
            var i = 0
            while (i < parsed.length) {
              r(i) = TdsParse.value(d, parsed(i)._2); i += 1
            }
            row = r; got = true
          case 0xFD | 0xFE | 0xFF =>
            d.skipBytes(12)
          case 0xAA =>
            val e = TdsParse.error(d)
            if (pendingErr == null) pendingErr = e
          case 0xAB =>
            val a = d.read(); val b = d.read()
            d.skipBytes((a & 0xFF) | ((b & 0xFF) << 8))
          case other =>
            finish()
            throw new SQLException(f"unexpected row token 0x$other%02x")
        }
      }
      if (pendingErr != null) { val e = pendingErr; finish(); throw e }
      got
    }

  private def finish(): Unit =
    if (!done) { done = true; m.drain(); sess.cursorDone() }

  def close(): Unit = finish()
}

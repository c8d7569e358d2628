package graft.sources.tdswire

import java.io.{BufferedInputStream, BufferedOutputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream, EOFException, IOException}
import java.net.{ServerSocket, Socket, SocketException}
import java.nio.charset.StandardCharsets.UTF_16LE
import java.sql.{DriverManager, SQLException, Types}

/** A TDS 7.x (Tabular Data Stream) wire-protocol SERVER fronting an
  * embedded Derby database — the MSSQL sibling of the pgwire/mysqlwire
  * listeners: the reference's third dialect DAG reads SQL Server with
  * three-part `[db].[dbo].[table]` naming (reference
  * `dags/mssql_to_bigquery.py:2`), and this leg runs those scans over a
  * REAL socket speaking the publicly documented protocol (MS-TDS open
  * specification).
  *
  * Scope — the minimal documented client/server exchange:
  *   - 8-byte packet header (type, EOM status, BE length) with messages
  *     SPLIT across 4096-byte packets (the negotiated default size);
  *   - PRELOGIN (0x12) → response carrying VERSION + ENCRYPT_NOT_SUP;
  *   - LOGIN7 (0x10) with the documented fixed header and offset/length
  *     variable block; the password arrives under the spec's
  *     nibble-swap-XOR-0xA5 obfuscation and doubles as the shared-secret
  *     slot when the listener is network-bound; → LOGINACK + DONE;
  *   - SQL_BATCH (0x01): ALL_HEADERS skipped per its own length field,
  *     UCS-2LE SQL text; row results return COLMETADATA (0x81) +
  *     ROW (0xD1) tokens + DONE, updates return DONE with DONE_COUNT,
  *     failures return ERROR (0xAA) + DONE — the session survives.
  *
  * Values travel BINARY-TYPED (TDS has no text mode): INTN / FLTN /
  * BITN / NUMERICN (sign byte + LE magnitude) / NVARCHAR (UCS-2LE) /
  * DATEN (LE days since 0001-01-01) / DATETIME2N scale 7 (100 ns time +
  * 3-byte date) / BIGVARBINARY — encoded from the backend's typed JDBC
  * getters, never via string round-trips.
  *
  * Dialect bridge (the reason this leg exists): incoming SQL is
  * translated from the MSSQL surface to the backend's —
  * `[bracketed]` identifiers become `"quoted"`, and the reference's
  * three-part `graft.dbo.` / `dbo.` prefixes are stripped — all outside
  * string literals, so data carrying brackets is untouched.
  *
  * Concurrency: thread-per-connection (daemon), one backend connection
  * per wire session, rows streamed cursor→socket (O(1) server memory).
  */
final class TdsWireServer(backendUrl: String,
                          bindHost: String = "127.0.0.1",
                          secret: Option[String] = None,
                          tls: Boolean = false) {

  // bind ONE specific address (the pgwire convention): callers pass the
  // spark.driver.host address for cross-host executors
  private val server =
    new ServerSocket(0, 64, java.net.InetAddress.getByName(bindHost))

  /** Ephemeral listen port — embed in the client JDBC URL. */
  val port: Int = server.getLocalPort

  @volatile private var closed = false

  private val acceptor = new Thread(() => acceptLoop(), s"tdswire-accept-$port")
  acceptor.setDaemon(true)
  acceptor.start()

  def close(): Unit = {
    closed = true
    try server.close() catch { case _: IOException => }
  }

  private def acceptLoop(): Unit =
    while (!closed) {
      try {
        val sock = server.accept()
        val t = new Thread(() => handle(sock), s"tdswire-conn-$port")
        t.setDaemon(true)
        t.start()
      } catch {
        case _: SocketException => // closed
        case _: IOException if closed =>
      }
    }

  private def handle(sock: Socket): Unit = {
    sock.setTcpNoDelay(true)
    val plainIn = new BufferedInputStream(sock.getInputStream)
    val plainOut = new BufferedOutputStream(sock.getOutputStream)
    var io = new TdsIO(
      new DataInputStream(plainIn), new DataOutputStream(plainOut))
    try {
      val (t1, _) = io.readMessage()
      if (t1 != 0x12) return // PRELOGIN is mandatory first
      io.writeMessage(0x04, preloginResponse())
      if (tls) {
        // MS-TDS §3.3.5.1: handshake records ride in PRELOGIN-typed
        // packets, then the channel switches to raw TLS. A client that
        // ignores ENCRYPT_ON and sends a plaintext LOGIN7 fails this
        // handshake (its bytes are not a ClientHello) — refused, never
        // silently downgraded.
        val ssl = TdsTls.upgradeServer(sock, plainIn, plainOut)
        io = new TdsIO(
          new DataInputStream(new BufferedInputStream(ssl.getInputStream)),
          new DataOutputStream(new BufferedOutputStream(ssl.getOutputStream)))
      }
      val (t2, p2) = io.readMessage()
      if (t2 != 0x10) return // LOGIN7
      val (userName, password) = TdsCodec.parseLogin7(p2)
      if (secret.exists(_ != password)) {
        val b = new ByteArrayOutputStream()
        TdsCodec.errorToken(b, 18456, "28000",
          s"Login failed for user '$userName'.")
        TdsCodec.doneToken(b, status = 0x0002, rows = 0L) // DONE_ERROR
        io.writeMessage(0x04, b.toByteArray)
        return
      }
      locally {
        val b = new ByteArrayOutputStream()
        TdsCodec.loginAckToken(b, "graft-tdswire")
        TdsCodec.doneToken(b, status = 0x0000, rows = 0L)
        io.writeMessage(0x04, b.toByteArray)
      }
      val backend = DriverManager.getConnection(backendUrl)
      try {
        var done = false
        while (!done) {
          val (tpe, payload) =
            try io.readMessage()
            catch { case _: EOFException => done = true; (0, Array.empty[Byte]) }
          if (!done) tpe match {
            case 0x01 => // SQL batch: ALL_HEADERS (self-sized) + UCS-2 SQL
              val hdrLen =
                if (payload.length >= 4)
                  (payload(0) & 0xFF) | ((payload(1) & 0xFF) << 8) |
                    ((payload(2) & 0xFF) << 16) | ((payload(3) & 0xFF) << 24)
                else 0
              val skip = if (hdrLen > 0 && hdrLen <= payload.length) hdrLen else 0
              val sql = new String(payload, skip, payload.length - skip, UTF_16LE)
              io.writeMessage(0x04, runBatch(sql.trim, backend))
            case 0x06 => // ATTENTION: acknowledge with a final DONE
              val b = new ByteArrayOutputStream()
              TdsCodec.doneToken(b, status = 0x0020, rows = 0L) // DONE_ATTN
              io.writeMessage(0x04, b.toByteArray)
            case _ =>
              val b = new ByteArrayOutputStream()
              TdsCodec.errorToken(b, 4004, "HY000",
                f"unsupported message type 0x$tpe%02x")
              TdsCodec.doneToken(b, status = 0x0002, rows = 0L)
              io.writeMessage(0x04, b.toByteArray)
          }
        }
      } finally backend.close()
    } catch {
      case _: EOFException | _: SocketException | _: IOException => // gone
    } finally {
      try sock.close() catch { case _: IOException => }
    }
  }

  /** PRELOGIN response: VERSION + ENCRYPTION (ENCRYPT_ON when this
    * listener requires TLS, ENCRYPT_NOT_SUP otherwise) + 0xFF.
    */
  private def preloginResponse(): Array[Byte] = {
    // option table: (token, offset BE, length BE)*, terminator 0xFF
    // offsets are from the start of this payload
    val b = new ByteArrayOutputStream()
    val tableLen = 5 + 5 + 1 // two option entries + terminator
    b.write(0x00); b.write(tableLen >> 8); b.write(tableLen & 0xFF)
    b.write(0); b.write(6) // VERSION: 6 bytes
    b.write(0x01); b.write((tableLen + 6) >> 8); b.write((tableLen + 6) & 0xFF)
    b.write(0); b.write(1) // ENCRYPTION: 1 byte
    b.write(0xFF)
    b.write(Array[Byte](12, 0, 0, 0, 0, 0), 0, 6) // version 12.0.0.0
    b.write(if (tls) 1 else 2) // ENCRYPT_ON / ENCRYPT_NOT_SUP
    b.toByteArray
  }

  /** Translate the MSSQL dialect surface to the backend's and run it:
    * `[x]` → `"x"`, three-part `graft.dbo.` / `dbo.` prefixes stripped —
    * both only OUTSIDE single-quoted string literals.
    */
  private[tdswire] def translate(sql: String): String = {
    val sb = new StringBuilder(sql.length)
    var i = 0
    while (i < sql.length) {
      sql.charAt(i) match {
        case '\'' => // copy string literal verbatim ('' escape in-span)
          sb.append('\''); i += 1
          var inSpan = true
          while (inSpan && i < sql.length) {
            val c = sql.charAt(i); sb.append(c); i += 1
            if (c == '\'') {
              if (i < sql.length && sql.charAt(i) == '\'') {
                sb.append('\''); i += 1
              } else inSpan = false
            }
          }
        case '[' => // bracketed identifier → double-quoted
          sb.append('"'); i += 1
          while (i < sql.length && sql.charAt(i) != ']') {
            sb.append(sql.charAt(i)); i += 1
          }
          sb.append('"'); i += 1 // consume ']'
        case _ =>
          if (sql.regionMatches(true, i, "graft.dbo.", 0, 10)) i += 10
          else if (sql.regionMatches(true, i, "dbo.", 0, 4) &&
              (i == 0 || !sql.charAt(i - 1).isLetterOrDigit)) i += 4
          else { sb.append(sql.charAt(i)); i += 1 }
      }
    }
    sb.toString
  }

  private def runBatch(sql0: String,
                       backend: java.sql.Connection): Array[Byte] = {
    val b = new ByteArrayOutputStream()
    val st = backend.createStatement()
    try {
      val sql = translate(sql0)
      // multi-row literal INSERTs execute as one prepared batch instead
      // of one giant statement the backend must compile (6.7× on the
      // bulk-load leg; graft.sources.wire.BatchInsert) — wire protocol,
      // SQL surface and the response tokens are unchanged
      val fast = graft.sources.wire.BatchInsert.tryExecute(backend, sql)
      if (fast >= 0) {
        TdsCodec.doneToken(b, status = 0x0010, rows = fast.toLong)
      } else if (st.execute(sql)) {
        val rs = st.getResultSet
        try {
          val md = rs.getMetaData
          val n = md.getColumnCount
          val kinds = (1 to n).map { i =>
            TdsCodec.columnKind(md.getColumnType(i), md.getPrecision(i),
              md.getScale(i))
          }.toArray
          // COLMETADATA
          b.write(0x81)
          TdsCodec.le2(b, n)
          (1 to n).foreach { i =>
            TdsCodec.le4(b, 0L) // usertype
            TdsCodec.le2(b, 0x0009) // flags: nullable | case-sensitive
            kinds(i - 1).writeTypeInfo(b)
            TdsCodec.bVarchar(b, md.getColumnLabel(i))
          }
          var count = 0L
          while (rs.next()) {
            b.write(0xD1) // ROW
            var i = 1
            while (i <= n) { kinds(i - 1).writeValue(b, rs, i); i += 1 }
            count += 1
          }
          TdsCodec.doneToken(b, status = 0x0010, rows = count) // DONE_COUNT
        } finally rs.close()
      } else {
        TdsCodec.doneToken(b, status = 0x0010,
          rows = math.max(st.getUpdateCount, 0).toLong)
      }
    } catch {
      case e: SQLException =>
        TdsCodec.errorToken(b, 50000,
          Option(e.getSQLState).getOrElse("HY000"),
          Option(e.getMessage).getOrElse("backend error"))
        TdsCodec.doneToken(b, status = 0x0002, rows = 0L)
    } finally st.close()
    b.toByteArray
  }
}

/** Packet framing shared by server and client: 8-byte header
  * (type, status, BE length incl. header, spid, packetId, window);
  * messages split across packets of `packetSize` bytes, EOM bit (0x01)
  * on the last.
  */
private[tdswire] final class TdsIO(in: DataInputStream,
                                   out: DataOutputStream,
                                   packetSize: Int = 4096) {
  /** Read one complete message: concatenate packets until EOM. */
  def readMessage(): (Int, Array[Byte]) = {
    val buf = new ByteArrayOutputStream()
    var tpe = -1
    var eom = false
    while (!eom) {
      val t = in.readUnsignedByte()
      val status = in.readUnsignedByte()
      val len = in.readUnsignedShort() // BE
      in.readUnsignedShort() // spid
      in.readUnsignedByte() // packet id
      in.readUnsignedByte() // window
      if (tpe < 0) tpe = t
      else if (t != tpe)
        throw new IOException(s"tdswire: packet type changed mid-message")
      val p = new Array[Byte](len - 8)
      in.readFully(p)
      buf.write(p, 0, p.length)
      eom = (status & 0x01) != 0
    }
    (tpe, buf.toByteArray)
  }

  /** Write one message, splitting at the negotiated packet size. */
  def writeMessage(tpe: Int, payload: Array[Byte]): Unit = {
    val chunk = packetSize - 8
    var off = 0
    var id = 1
    do {
      val n = math.min(chunk, payload.length - off)
      val last = off + n >= payload.length
      out.writeByte(tpe)
      out.writeByte(if (last) 0x01 else 0x00)
      out.writeShort(n + 8) // BE
      out.writeShort(0)     // spid
      out.writeByte(id & 0xFF)
      out.writeByte(0)
      out.write(payload, off, n)
      off += n
      id += 1
    } while (off < payload.length)
    out.flush()
  }
}

/** Token + value codecs shared by server and client — all layouts from
  * the open MS-TDS specification.
  */
private[tdswire] object TdsCodec {

  def le2(b: ByteArrayOutputStream, v: Int): Unit = {
    b.write(v & 0xFF); b.write((v >> 8) & 0xFF)
  }
  def le4(b: ByteArrayOutputStream, v: Long): Unit = {
    var i = 0
    while (i < 4) { b.write(((v >> (8 * i)) & 0xFF).toInt); i += 1 }
  }
  def le8(b: ByteArrayOutputStream, v: Long): Unit = {
    var i = 0
    while (i < 8) { b.write(((v >> (8 * i)) & 0xFF).toInt); i += 1 }
  }

  /** B_VARCHAR: 1-byte char count + UCS-2LE chars. */
  def bVarchar(b: ByteArrayOutputStream, s: String): Unit = {
    b.write(s.length & 0xFF)
    val x = s.getBytes(UTF_16LE)
    b.write(x, 0, x.length)
  }

  /** US_VARCHAR: 2-byte LE char count + UCS-2LE chars. */
  def usVarchar(b: ByteArrayOutputStream, s: String): Unit = {
    le2(b, s.length)
    val x = s.getBytes(UTF_16LE)
    b.write(x, 0, x.length)
  }

  def loginAckToken(b: ByteArrayOutputStream, progName: String): Unit = {
    b.write(0xAD)
    val body = new ByteArrayOutputStream()
    body.write(1) // interface: SQL_TSQL
    body.write(Array[Byte](0x04, 0x00, 0x00, 0x74), 0, 4) // TDS 7.4
    bVarchar(body, progName)
    body.write(Array[Byte](12, 0, 0, 0), 0, 4) // prog version
    le2(b, body.size())
    body.writeTo(b)
  }

  def doneToken(b: ByteArrayOutputStream, status: Int, rows: Long): Unit = {
    b.write(0xFD)
    le2(b, status)
    le2(b, 0) // curcmd
    le8(b, rows)
  }

  def errorToken(b: ByteArrayOutputStream, number: Int, state: String,
                 msg: String): Unit = {
    b.write(0xAA)
    val body = new ByteArrayOutputStream()
    le4(body, number.toLong)
    body.write(1) // state (numeric; the SQLSTATE string rides the message)
    body.write(16) // class: user error
    usVarchar(body, s"[$state] $msg")
    bVarchar(body, "graft")
    bVarchar(body, "")
    le4(body, 0L) // line number
    le2(b, body.size())
    body.writeTo(b)
  }

  /** The spec's password obfuscation: swap nibbles, then XOR 0xA5 —
    * applied per byte of the UCS-2LE password. Involutory when reversed
    * in the opposite order.
    */
  def obfuscatePassword(clear: String): Array[Byte] =
    clear.getBytes(UTF_16LE).map { x =>
      ((((x & 0x0F) << 4) | ((x & 0xF0) >> 4)) ^ 0xA5).toByte
    }

  def deobfuscatePassword(wire: Array[Byte]): String = {
    val out = wire.map { x =>
      val y = (x ^ 0xA5) & 0xFF
      ((((y & 0x0F) << 4) | ((y & 0xF0) >> 4))).toByte
    }
    new String(out, UTF_16LE)
  }

  /** Parse (userName, password) out of a LOGIN7 payload: fixed 36-byte
    * prologue, then the offset/length variable block (offsets from the
    * structure start).
    */
  def parseLogin7(p: Array[Byte]): (String, String) = {
    def u2(off: Int): Int = (p(off) & 0xFF) | ((p(off + 1) & 0xFF) << 8)
    // offset/length pairs start at 36: host(36), user(40), password(44)
    val ibUser = u2(40); val cchUser = u2(42)
    val ibPass = u2(44); val cchPass = u2(46)
    val user = new String(p, ibUser, cchUser * 2, UTF_16LE)
    val pass = deobfuscatePassword(
      java.util.Arrays.copyOfRange(p, ibPass, ibPass + cchPass * 2))
    (user, pass)
  }

  private val CeEpochDay: Long = java.time.LocalDate.of(1, 1, 1).toEpochDay

  /** One column's wire behavior: COLMETADATA TYPE_INFO + ROW value
    * encoding (server) — decoding lives in the driver, from the same
    * layout constants.
    */
  sealed trait ColKind {
    def writeTypeInfo(b: ByteArrayOutputStream): Unit
    def writeValue(b: ByteArrayOutputStream, rs: java.sql.ResultSet,
                   i: Int): Unit
  }

  final case class IntN(len: Int) extends ColKind {
    def writeTypeInfo(b: ByteArrayOutputStream): Unit = {
      b.write(0x26); b.write(len)
    }
    def writeValue(b: ByteArrayOutputStream, rs: java.sql.ResultSet,
                   i: Int): Unit = {
      val v = rs.getLong(i)
      if (rs.wasNull()) b.write(0)
      else {
        b.write(len)
        var k = 0
        while (k < len) { b.write(((v >> (8 * k)) & 0xFF).toInt); k += 1 }
      }
    }
  }

  final case class FltN(len: Int) extends ColKind {
    def writeTypeInfo(b: ByteArrayOutputStream): Unit = {
      b.write(0x6D); b.write(len)
    }
    def writeValue(b: ByteArrayOutputStream, rs: java.sql.ResultSet,
                   i: Int): Unit = {
      val v = rs.getDouble(i)
      if (rs.wasNull()) b.write(0)
      else {
        b.write(len)
        if (len == 4) le4(b, java.lang.Float.floatToIntBits(v.toFloat) & 0xFFFFFFFFL)
        else le8(b, java.lang.Double.doubleToLongBits(v))
      }
    }
  }

  case object BitN extends ColKind {
    def writeTypeInfo(b: ByteArrayOutputStream): Unit = {
      b.write(0x68); b.write(1)
    }
    def writeValue(b: ByteArrayOutputStream, rs: java.sql.ResultSet,
                   i: Int): Unit = {
      val v = rs.getBoolean(i)
      if (rs.wasNull()) b.write(0)
      else { b.write(1); b.write(if (v) 1 else 0) }
    }
  }

  final case class NumericN(prec: Int, scale: Int) extends ColKind {
    private val magBytes =
      if (prec <= 9) 4 else if (prec <= 19) 8 else if (prec <= 28) 12 else 16
    def writeTypeInfo(b: ByteArrayOutputStream): Unit = {
      b.write(0x6C); b.write(magBytes + 1); b.write(prec); b.write(scale)
    }
    def writeValue(b: ByteArrayOutputStream, rs: java.sql.ResultSet,
                   i: Int): Unit = {
      val v = rs.getBigDecimal(i)
      if (rs.wasNull() || v == null) b.write(0)
      else {
        val scaled = v.setScale(scale).unscaledValue()
        val neg = scaled.signum() < 0
        val mag = scaled.abs().toByteArray // BE, possibly short
        if (mag.length > magBytes)
          throw new SQLException(s"numeric overflow for precision $prec")
        b.write(magBytes + 1)
        b.write(if (neg) 0 else 1)
        var k = 0
        while (k < magBytes) { // LE magnitude
          val be = mag.length - 1 - k
          b.write(if (be >= 0) mag(be) & 0xFF else 0)
          k += 1
        }
      }
    }
  }

  case object NVarchar extends ColKind {
    def writeTypeInfo(b: ByteArrayOutputStream): Unit = {
      b.write(0xE7)
      le2(b, 8000) // max byte length
      b.write(Array[Byte](0x09, 0x04, 0x00, 0x00, 0x00), 0, 5) // collation
    }
    def writeValue(b: ByteArrayOutputStream, rs: java.sql.ResultSet,
                   i: Int): Unit = {
      val v = rs.getString(i)
      if (v == null) le2(b, 0xFFFF) // CHARBIN_NULL
      else {
        val x = v.getBytes(UTF_16LE)
        le2(b, x.length)
        b.write(x, 0, x.length)
      }
    }
  }

  case object DateN extends ColKind {
    def writeTypeInfo(b: ByteArrayOutputStream): Unit = b.write(0x28)
    def writeValue(b: ByteArrayOutputStream, rs: java.sql.ResultSet,
                   i: Int): Unit = {
      val v = rs.getDate(i)
      if (rs.wasNull() || v == null) b.write(0)
      else {
        val days = v.toLocalDate.toEpochDay - CeEpochDay
        b.write(3)
        b.write((days & 0xFF).toInt)
        b.write(((days >> 8) & 0xFF).toInt)
        b.write(((days >> 16) & 0xFF).toInt)
      }
    }
  }

  /** DATETIME2 at the max scale 7: 5-byte LE 100 ns units since
    * midnight + 3-byte LE days since 0001-01-01.
    */
  case object DateTime2 extends ColKind {
    def writeTypeInfo(b: ByteArrayOutputStream): Unit = {
      b.write(0x2A); b.write(7)
    }
    def writeValue(b: ByteArrayOutputStream, rs: java.sql.ResultSet,
                   i: Int): Unit = {
      val v = rs.getTimestamp(i)
      if (rs.wasNull() || v == null) b.write(0)
      else {
        val ldt = v.toLocalDateTime
        val days = ldt.toLocalDate.toEpochDay - CeEpochDay
        val t100 = ldt.toLocalTime.toNanoOfDay / 100L
        b.write(8)
        var k = 0
        while (k < 5) { b.write(((t100 >> (8 * k)) & 0xFF).toInt); k += 1 }
        b.write((days & 0xFF).toInt)
        b.write(((days >> 8) & 0xFF).toInt)
        b.write(((days >> 16) & 0xFF).toInt)
      }
    }
  }

  case object VarBinary extends ColKind {
    def writeTypeInfo(b: ByteArrayOutputStream): Unit = {
      b.write(0xA5); le2(b, 8000)
    }
    def writeValue(b: ByteArrayOutputStream, rs: java.sql.ResultSet,
                   i: Int): Unit = {
      val v = rs.getBytes(i)
      if (rs.wasNull() || v == null) le2(b, 0xFFFF)
      else { le2(b, v.length); b.write(v, 0, v.length) }
    }
  }

  /** Backend JDBC type → wire encoding. */
  def columnKind(jdbc: Int, prec: Int, scale: Int): ColKind = jdbc match {
    case Types.BOOLEAN | Types.BIT => BitN
    case Types.TINYINT => IntN(1)
    case Types.SMALLINT => IntN(2)
    case Types.INTEGER => IntN(4)
    case Types.BIGINT => IntN(8)
    case Types.REAL => FltN(4)
    case Types.FLOAT | Types.DOUBLE => FltN(8)
    case Types.DECIMAL | Types.NUMERIC =>
      NumericN(math.max(1, math.min(prec, 38)), math.max(0, scale))
    case Types.DATE => DateN
    case Types.TIMESTAMP => DateTime2
    case Types.BINARY | Types.VARBINARY | Types.LONGVARBINARY |
         Types.BLOB => VarBinary
    case _ => NVarchar
  }
}

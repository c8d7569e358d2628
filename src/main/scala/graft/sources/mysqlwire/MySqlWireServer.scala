package graft.sources.mysqlwire

import java.io.{BufferedInputStream, BufferedOutputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream, EOFException, IOException}
import java.net.{ServerSocket, Socket, SocketException}
import java.nio.charset.StandardCharsets.UTF_8
import java.sql.{DriverManager, SQLException, Types}

/** A MySQL client/server wire-protocol SERVER fronting an embedded Derby
  * database — the reference's PRIMARY source topology: its v2 DAG reads
  * MySQL through `cloud_sql_proxy tcp:3306` (reference
  * `yaml/sql_proxy_mysql_deployment.yaml:47-48`,
  * `dags/copy_cloudsql_to_bigquery_v2.py:83-90`), so the engine's JDBC
  * scans are exercised against a real socket speaking the publicly
  * documented MySQL protocol (text protocol / COM_QUERY), the sibling of
  * [[graft.sources.pgwire.PgWireServer]]'s PostgreSQL leg.
  *
  * Scope: protocol-41 connection phase (Initial Handshake V10 →
  * HandshakeResponse41, trust auth) and the COM_QUERY text subprotocol —
  * column-count packet, ColumnDefinition41 packets, EOF-delimited row
  * packets of length-encoded strings (NULL = 0xFB), OK packets carrying
  * affected-row counts, ERR packets with error code + '#'-marked
  * SQLSTATE, COM_PING/COM_QUIT. No SSL, no prepared-statement (binary)
  * subprotocol, no CLIENT_DEPRECATE_EOF — the classic EOF framing is the
  * simplest fully documented variant.
  *
  * MySQL-isms preserved on the value plane (the a04c dialect contract):
  * BOOLEAN travels as TINYINT(1) "1"/"0", and UNSIGNED BIGINT columns
  * carry the UNSIGNED flag so clients must widen past Long.
  *
  * Concurrency: thread-per-connection (daemon), one backend Derby
  * connection per wire connection; rows stream straight from the backend
  * cursor to the socket — O(1) rows in server memory per export.
  */
final class MySqlWireServer(backendUrl: String,
                            bindHost: String = "127.0.0.1",
                            secret: Option[String] = None,
                            tls: Boolean = false) {

  // bind ONE specific address, never the wildcard: callers pass the
  // spark.driver.host address for cross-host executors (the pgwire
  // convention); `secret` adds a shared-token check on the handshake
  // username when the bind is network-reachable
  private val server =
    new ServerSocket(0, 64, java.net.InetAddress.getByName(bindHost))

  /** Ephemeral listen port — embed in the client JDBC URL. */
  val port: Int = server.getLocalPort

  @volatile private var closed = false

  private val acceptor = new Thread(() => acceptLoop(), s"mywire-accept-$port")
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
        val t = new Thread(() => handle(sock), s"mywire-conn-$port")
        t.setDaemon(true)
        t.start()
      } catch {
        case _: SocketException => // closed
        case _: IOException if closed =>
      }
    }

  // ---- packet framing: 3-byte LE length + 1-byte sequence id ----------

  private final class Wire(private var in: DataInputStream,
                           private var out: DataOutputStream) {
    var seq = 0
    /** Swap the underlying streams after an in-place TLS upgrade —
      * sequence numbering continues across the upgrade (the documented
      * behavior: the SSL request and the post-TLS HandshakeResponse41
      * are consecutive packets of one connection phase).
      */
    def rebind(newIn: DataInputStream, newOut: DataOutputStream): Unit = {
      in = newIn; out = newOut
    }
    def readPacket(): Array[Byte] = {
      val a = in.readUnsignedByte()
      val b = in.readUnsignedByte()
      val c = in.readUnsignedByte()
      seq = (in.readUnsignedByte() + 1) & 0xFF
      val len = a | (b << 8) | (c << 16)
      // 0xFFFFFF announces the protocol's mandatory split-packet
      // continuation, which this subset does not implement — fail loudly
      // instead of silently treating the fragment as a whole packet
      if (len >= 0xFFFFFF)
        throw new IOException("mysqlwire: >=16MB split packets unsupported")
      val p = new Array[Byte](len)
      in.readFully(p)
      p
    }
    def writePacket(p: Array[Byte]): Unit = {
      // a payload at/above 0xFFFFFF needs the split-packet rule; writing
      // it with a wrapped 3-byte length would corrupt the whole stream
      if (p.length >= 0xFFFFFF)
        throw new IOException(
          s"mysqlwire: packet of ${p.length} bytes needs >=16MB splitting (unimplemented)")
      out.write(p.length & 0xFF)
      out.write((p.length >> 8) & 0xFF)
      out.write((p.length >> 16) & 0xFF)
      out.write(seq)
      seq = (seq + 1) & 0xFF
      out.write(p)
    }
    def flush(): Unit = out.flush()
  }

  private def lenenc(b: ByteArrayOutputStream, v: Long): Unit =
    if (v < 0xFB) b.write(v.toInt)
    else if (v < 0x10000) {
      b.write(0xFC); b.write((v & 0xFF).toInt); b.write(((v >> 8) & 0xFF).toInt)
    } else if (v < 0x1000000) {
      b.write(0xFD); b.write((v & 0xFF).toInt)
      b.write(((v >> 8) & 0xFF).toInt); b.write(((v >> 16) & 0xFF).toInt)
    } else {
      b.write(0xFE)
      var i = 0
      while (i < 8) { b.write(((v >> (8 * i)) & 0xFF).toInt); i += 1 }
    }

  private def lenencStr(b: ByteArrayOutputStream, s: String): Unit = {
    val x = s.getBytes(UTF_8)
    lenenc(b, x.length.toLong)
    b.write(x, 0, x.length)
  }

  private def le2(b: ByteArrayOutputStream, v: Int): Unit = {
    b.write(v & 0xFF); b.write((v >> 8) & 0xFF)
  }
  private def le4(b: ByteArrayOutputStream, v: Long): Unit = {
    var i = 0
    while (i < 4) { b.write(((v >> (8 * i)) & 0xFF).toInt); i += 1 }
  }

  private def okPacket(affected: Long): Array[Byte] = {
    val b = new ByteArrayOutputStream()
    b.write(0x00)
    lenenc(b, affected)
    lenenc(b, 0L) // last insert id
    le2(b, 0x0002) // SERVER_STATUS_AUTOCOMMIT
    le2(b, 0) // warnings
    b.toByteArray
  }

  private def eofPacket(): Array[Byte] = {
    val b = new ByteArrayOutputStream()
    b.write(0xFE); le2(b, 0); le2(b, 0x0002)
    b.toByteArray
  }

  private def errPacket(code: Int, sqlState: String,
                        msg: String): Array[Byte] = {
    val b = new ByteArrayOutputStream()
    b.write(0xFF)
    le2(b, code)
    b.write('#'.toInt)
    val st = (sqlState + "HY000").take(5)
    b.write(st.getBytes(UTF_8), 0, 5)
    val m = msg.getBytes(UTF_8)
    b.write(m, 0, m.length)
    b.toByteArray
  }

  private def handle(sock0: Socket): Unit = {
    sock0.setTcpNoDelay(true)
    var sock: Socket = sock0
    // TLS listener: the prologue MUST read unbuffered. The protocol has no
    // server ack between the client's SSL Connection Request and its TLS
    // ClientHello, so both can be in flight together; a BufferedInputStream
    // fill() here could slurp ClientHello bytes that are then lost when the
    // raw socket is handed to JSSE — both sides block in startHandshake
    // forever (observed as a bench hang). readPacket is exact-read
    // (readUnsignedByte/readFully), so the unbuffered prologue over-reads
    // nothing; handshake() rebinds buffered streams once TLS is up.
    val in0 =
      if (tls) new DataInputStream(sock.getInputStream)
      else new DataInputStream(new BufferedInputStream(sock.getInputStream))
    val wire = new Wire(in0,
      new DataOutputStream(new BufferedOutputStream(sock.getOutputStream)))
    try {
      sock = handshake(wire, sock)
      val backend = DriverManager.getConnection(backendUrl)
      try commandLoop(wire, backend)
      finally backend.close()
    } catch {
      case _: EOFException | _: SocketException | _: IOException => // gone
    } finally {
      try sock.close() catch { case _: IOException => }
    }
  }

  /** Connection phase: Initial Handshake Packet (protocol version 10)
    * with the documented layout, then accept ANY HandshakeResponse41
    * (trust auth — the server fronts an in-process test warehouse) and
    * answer OK.
    */
  private def handshake(wire: Wire, sock0: Socket): Socket = {
    var sock = sock0
    val b = new ByteArrayOutputStream()
    b.write(0x0A) // protocol version 10
    val ver = "8.0.0-graft".getBytes(UTF_8); b.write(ver, 0, ver.length); b.write(0)
    le4(b, 1L) // thread id
    b.write("12345678".getBytes(UTF_8), 0, 8) // auth-plugin-data-part-1
    b.write(0) // filler
    // capabilities: LONG_PASSWORD|FOUND_ROWS|LONG_FLAG|CONNECT_WITH_DB|
    // PROTOCOL_41|SECURE_CONNECTION (lower 16) + PLUGIN_AUTH (upper);
    // CLIENT_SSL advertised only when this listener actually serves TLS
    val caps = 0x0001 | 0x0002 | 0x0004 | 0x0008 | 0x0200 | 0x8000 |
      0x80000 | (if (tls) 0x0800 else 0)
    le2(b, caps & 0xFFFF)
    b.write(33) // charset utf8_general_ci
    le2(b, 0x0002) // status: autocommit
    le2(b, (caps >> 16) & 0xFFFF)
    b.write(21) // auth plugin data len (8 + 13)
    b.write(new Array[Byte](10), 0, 10) // reserved
    b.write("123456789012".getBytes(UTF_8), 0, 12); b.write(0) // part-2
    val plugin = "mysql_native_password".getBytes(UTF_8)
    b.write(plugin, 0, plugin.length); b.write(0)
    wire.writePacket(b.toByteArray)
    wire.flush()
    // First client packet: either the 32-byte SSL Connection Request
    // (CLIENT_SSL set in its caps → in-place TLS upgrade, then the full
    // HandshakeResponse41 arrives encrypted) or the plaintext
    // HandshakeResponse41 itself. A TLS-required listener refuses
    // plaintext with the documented ER_SECURE_TRANSPORT_REQUIRED; a
    // plaintext listener refuses SSL requests — no silent downgrades.
    val first = wire.readPacket()
    val clientSsl = first.length >= 4 &&
      ((first(1) & 0x08) != 0) // CLIENT_SSL = 0x0800, byte 1 bit 3 (LE)
    val resp: Array[Byte] =
      if (clientSsl && first.length <= 32) {
        if (!tls) {
          wire.writePacket(errPacket(1043, "08S01", "SSL not supported"))
          wire.flush()
          throw new IOException("ssl request refused")
        }
        sock = graft.sources.wire.WireTls.upgradeServer(sock)
        wire.rebind(
          new DataInputStream(new BufferedInputStream(sock.getInputStream)),
          new DataOutputStream(
            new BufferedOutputStream(sock.getOutputStream)))
        wire.readPacket() // full HandshakeResponse41, now encrypted
      } else {
        if (tls) {
          wire.writePacket(errPacket(3159, "HY000",
            "Connections using insecure transport are prohibited"))
          wire.flush()
          throw new IOException("mysqlwire: plaintext refused (TLS required)")
        }
        first
      }
    if (resp.length < 32) {
      wire.writePacket(errPacket(1043, "08S01", "malformed handshake"))
      wire.flush()
      throw new IOException("malformed handshake response")
    }
    // HandshakeResponse41 username: NUL-terminated at offset 32
    // (caps 4 + max-packet 4 + charset 1 + 23 reserved) — doubles as
    // the shared-secret token when the server is network-bound
    if (secret.isDefined) {
      var end = 32
      while (end < resp.length && resp(end) != 0) end += 1
      val user = new String(resp, 32, end - 32, UTF_8)
      if (!secret.contains(user)) {
        wire.writePacket(errPacket(1045, "28000", "Access denied"))
        wire.flush()
        throw new IOException("mysqlwire: authentication failed")
      }
    }
    wire.writePacket(okPacket(0))
    wire.flush()
    sock
  }

  private def commandLoop(wire: Wire,
                          backend: java.sql.Connection): Unit = {
    var done = false
    while (!done) {
      wire.seq = 0 // command phase: each command resets sequencing
      val p = wire.readPacket()
      if (p.isEmpty) done = true
      else (p(0) & 0xFF) match {
        case 0x01 => done = true // COM_QUIT
        case 0x0E => // COM_PING
          wire.writePacket(okPacket(0)); wire.flush()
        case 0x03 => // COM_QUERY
          val sql = new String(p, 1, p.length - 1, UTF_8).trim
          runQuery(sql, wire, backend)
          wire.flush()
        case other =>
          wire.writePacket(errPacket(1047, "08S01",
            s"unsupported command 0x${other.toHexString}"))
          wire.flush()
      }
    }
  }

  private def runQuery(sql: String, wire: Wire,
                       backend: java.sql.Connection): Unit = {
    val st = backend.createStatement()
    try {
      // multi-row literal INSERTs execute as one prepared batch instead
      // of one giant statement the backend must compile (6.7× on the
      // bulk-load leg; graft.sources.wire.BatchInsert) — wire protocol,
      // SQL surface and the OK packet are unchanged
      val fast = graft.sources.wire.BatchInsert.tryExecute(backend, sql)
      if (fast >= 0) {
        wire.writePacket(okPacket(fast.toLong))
      } else if (st.execute(sql)) {
        val rs = st.getResultSet
        try {
          val md = rs.getMetaData
          val n = md.getColumnCount
          // column count packet
          val cc = new ByteArrayOutputStream()
          lenenc(cc, n.toLong)
          wire.writePacket(cc.toByteArray)
          // ColumnDefinition41 per column
          val isBool = new Array[Boolean](n)
          (1 to n).foreach { i =>
            val jt = md.getColumnType(i)
            isBool(i - 1) = jt == Types.BOOLEAN || jt == Types.BIT
            val (tpe, flags, decimals, len) =
              myType(jt, md.getPrecision(i), md.getScale(i))
            val b = new ByteArrayOutputStream()
            lenencStr(b, "def")
            lenencStr(b, "")  // schema
            lenencStr(b, "")  // table
            lenencStr(b, "")  // org_table
            lenencStr(b, md.getColumnLabel(i))
            lenencStr(b, md.getColumnLabel(i)) // org_name
            b.write(0x0C) // fixed-length fields marker
            le2(b, if (tpe == 0xFC) 63 else 33) // charset (63 = binary)
            le4(b, len)
            b.write(tpe)
            le2(b, flags)
            b.write(decimals)
            le2(b, 0) // filler
            wire.writePacket(b.toByteArray)
          }
          wire.writePacket(eofPacket())
          // rows: lenenc text cells, NULL = 0xFB
          while (rs.next()) {
            val b = new ByteArrayOutputStream()
            var i = 1
            while (i <= n) {
              val v0 = rs.getString(i)
              val v = if (v0 != null && isBool(i - 1))
                (if (v0 == "true") "1" else "0") else v0
              if (v == null) b.write(0xFB)
              else lenencStr(b, v)
              i += 1
            }
            wire.writePacket(b.toByteArray)
          }
          wire.writePacket(eofPacket())
        } finally rs.close()
      } else {
        wire.writePacket(okPacket(math.max(st.getUpdateCount, 0).toLong))
      }
    } catch {
      case e: SQLException =>
        wire.writePacket(errPacket(1064,
          Option(e.getSQLState).getOrElse("HY000"),
          Option(e.getMessage).getOrElse("backend error")))
    } finally st.close()
  }

  /** JDBC type → (MySQL Protocol::ColumnType, flags, decimals, length).
    * BOOLEAN travels the reference-faithful way: TINYINT(1). Flags:
    * 0x20 = UNSIGNED, 0x80 = BINARY.
    */
  private def myType(jdbc: Int, prec: Int,
                     scale: Int): (Int, Int, Int, Long) = jdbc match {
    case Types.BOOLEAN | Types.BIT => (0x01, 0, 0, 1L) // TINY, tinyint(1)
    case Types.TINYINT => (0x01, 0, 0, 4L)
    case Types.SMALLINT => (0x02, 0, 0, 6L)
    case Types.INTEGER => (0x03, 0, 0, 11L)
    case Types.BIGINT => (0x08, 0, 0, 20L)
    case Types.REAL => (0x04, 0, 31, 12L)
    case Types.FLOAT | Types.DOUBLE => (0x05, 0, 31, 22L)
    case Types.DECIMAL | Types.NUMERIC =>
      (0xF6, 0, math.max(scale, 0), prec.toLong + 2) // NEWDECIMAL
    case Types.DATE => (0x0A, 0x80, 0, 10L)
    case Types.TIMESTAMP => (0x0C, 0x80, 0, 26L) // DATETIME
    case Types.BINARY | Types.VARBINARY | Types.LONGVARBINARY |
         Types.BLOB => (0xFC, 0x80, 0, 65535L)
    case Types.CHAR | Types.VARCHAR =>
      (0xFD, 0, 0, if (prec > 0) prec.toLong * 4 else 1024L) // VAR_STRING
    case _ => (0xFD, 0, 0, 4096L)
  }
}

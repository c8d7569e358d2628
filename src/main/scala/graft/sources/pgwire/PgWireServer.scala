package graft.sources.pgwire

import java.io.{BufferedInputStream, BufferedOutputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream, EOFException, IOException}
import java.net.{InetAddress, ServerSocket, Socket, SocketException}
import java.nio.charset.StandardCharsets.UTF_8
import java.sql.{DriverManager, ResultSet, SQLException, Types}

/** A PostgreSQL v3 wire-protocol SERVER fronting an embedded Derby
  * database — the live network leg of the reference's source topology:
  * the reference reaches CloudSQL through a TCP listener
  * (`cloud_sql_proxy`, port 5432/3306 — reference
  * `yaml/sql_proxy_postgresql_deployment_with_sa.yaml:56-57`), so the
  * engine's JDBC scans are exercised here against a real socket speaking
  * a real, publicly documented protocol (PostgreSQL Frontend/Backend
  * Protocol v3, simple-query subprotocol), not only an in-process
  * embedded handle.
  *
  * Scope: the SIMPLE QUERY cycle of the published protocol —
  * SSLRequest (accepted with an in-place JSSE upgrade when `tls` is set,
  * refused with the documented 'N' otherwise, and a TLS-required server
  * refuses plaintext StartupMessages outright — no silent downgrade
  * either way), StartupMessage → AuthenticationOk /
  * ParameterStatus / BackendKeyData / ReadyForQuery, then per Query
  * ('Q'): RowDescription ('T') + streamed DataRow ('D') + CommandComplete
  * ('C'), errors as ErrorResponse ('E') with SQLSTATE, Terminate ('X').
  * Values travel in text format with PostgreSQL type OIDs derived from
  * the backend's JDBC metadata; NUMERIC precision/scale ride the
  * documented `atttypmod` encoding `((p << 16) | s) + 4`.
  *
  * Concurrency: thread-per-connection (daemon), one backend Derby
  * connection per wire connection — N parallel Spark range cursors (the
  * A2 partitioned scan) land as N independent sessions, exactly like a
  * real server. Rows are streamed straight from the backend cursor to
  * the socket — no buffering of the result set on the server side, so a
  * fact-sized export holds O(1) rows in memory.
  */
final class PgWireServer(backendUrl: String,
                         bindHost: String = "127.0.0.1",
                         secret: Option[String] = None,
                         tls: Boolean = false) {

  // bind ONE specific address, never the wildcard: callers pass the
  // spark.driver.host address so executor JVMs on other hosts can reach
  // the driver-hosted listener, and nothing else on the network is
  // exposed by accident (loopback default covers single-host runs).
  // When the bind is network-reachable, `secret` adds a shared-token
  // check on the startup `user` param — the backend executes arbitrary
  // SQL, so trust auth is only safe behind loopback.
  private val server =
    new ServerSocket(0, 64, InetAddress.getByName(bindHost))

  /** Ephemeral listen port — embed in the client JDBC URL. */
  val port: Int = server.getLocalPort

  @volatile private var closed = false

  private val acceptor = new Thread(() => acceptLoop(), s"pgwire-accept-$port")
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
        val t = new Thread(() => handle(sock), s"pgwire-conn-$port")
        t.setDaemon(true)
        t.start()
      } catch {
        case _: SocketException => // closed
        case _: IOException if closed =>
      }
    }

  // ---- protocol framing -------------------------------------------------

  private final class Out(raw: DataOutputStream) {
    /** One typed backend message: type byte + int32 length (self-inclusive,
      * type-exclusive) + payload — the documented frame.
      */
    def msg(tpe: Char)(body: DataOutputStream => Unit): Unit = {
      val buf = new ByteArrayOutputStream()
      val d = new DataOutputStream(buf)
      body(d)
      raw.writeByte(tpe.toInt)
      raw.writeInt(4 + buf.size())
      buf.writeTo(raw)
    }
    def flush(): Unit = raw.flush()
  }

  private def cstr(d: DataOutputStream, s: String): Unit = {
    d.write(s.getBytes(UTF_8)); d.writeByte(0)
  }

  /** Startup negotiation per the documented protocol: SSLRequest →
    * single-byte 'S' (then TLS handshake in place) when this server
    * requires TLS, the documented 'N' refusal otherwise; CancelRequest
    * ignored; StartupMessage authenticated against the shared secret
    * when configured. A TLS-required server answers a plaintext
    * StartupMessage with FATAL 28000 — refusal, never a silent
    * downgrade.
    */
  private def handle(sock0: Socket): Unit = {
    sock0.setTcpNoDelay(true)
    var sock: Socket = sock0
    var in = new DataInputStream(new BufferedInputStream(sock.getInputStream))
    var rawOut = new DataOutputStream(
      new BufferedOutputStream(sock.getOutputStream))
    var out = new Out(rawOut)
    var upgraded = false
    try {
      var ready = false
      var alive = true
      while (alive && !ready) {
        val len = in.readInt()
        val code = in.readInt()
        code match {
          case 80877103 => // SSLRequest
            if (tls && !upgraded) {
              rawOut.writeByte('S'.toInt); rawOut.flush()
              sock = graft.sources.wire.WireTls.upgradeServer(sock)
              in = new DataInputStream(
                new BufferedInputStream(sock.getInputStream))
              rawOut = new DataOutputStream(
                new BufferedOutputStream(sock.getOutputStream))
              out = new Out(rawOut)
              upgraded = true
            } else {
              rawOut.writeByte('N'.toInt); rawOut.flush()
            }
          case 80877102 => // CancelRequest: no out-of-band cancel support
            alive = false
          case 196608 => // protocol 3.0
            // user/database params must be fully consumed. readFully (not
            // skipBytes) because skipBytes may skip fewer bytes when the
            // StartupMessage arrives fragmented across TCP segments,
            // silently desyncing the protocol stream.
            val params = new Array[Byte](len - 8)
            in.readFully(params)
            val deny =
              if (tls && !upgraded) Some("server requires TLS")
              else if (secret.exists(_ != startupParam(params, "user")))
                Some("authentication failed")
              else None
            deny match {
              case Some(msg) =>
                out.msg('E') { d =>
                  d.writeByte('S'.toInt); cstr(d, "FATAL")
                  d.writeByte('C'.toInt); cstr(d, "28000")
                  d.writeByte('M'.toInt); cstr(d, msg)
                  d.writeByte(0)
                }
                out.flush()
                alive = false
              case None =>
                out.msg('R')(_.writeInt(0)) // AuthenticationOk
                Seq("server_version" -> "15.0 (graft-pgwire)",
                    "client_encoding" -> "UTF8",
                    "DateStyle" -> "ISO, MDY").foreach { case (k, v) =>
                  out.msg('S') { d => cstr(d, k); cstr(d, v) }
                }
                out.msg('K') { d => d.writeInt(0); d.writeInt(0) } // BackendKeyData
                readyForQuery(out)
                ready = true
            }
          case _ =>
            alive = false
        }
      }
      if (ready) {
        val backend = DriverManager.getConnection(backendUrl)
        try queryLoop(in, out, backend)
        finally backend.close()
      }
    } catch {
      case _: EOFException | _: SocketException | _: IOException => // client gone
    } finally {
      try sock.close() catch { case _: IOException => }
    }
  }

  /** One StartupMessage parameter by key (NUL-delimited k/v pairs). */
  private def startupParam(p: Array[Byte], key: String): String = {
    var i = 0
    while (i < p.length && p(i) != 0) {
      val ke = p.indexOf(0.toByte, i)
      val k = new String(p, i, ke - i, UTF_8)
      val ve = p.indexOf(0.toByte, ke + 1)
      if (ve < 0) return null
      val v = new String(p, ke + 1, ve - ke - 1, UTF_8)
      if (k == key) return v
      i = ve + 1
    }
    null
  }

  private def readyForQuery(out: Out): Unit = {
    out.msg('Z')(_.writeByte('I'.toInt)) // idle, no open transaction
    out.flush()
  }

  private def queryLoop(in: DataInputStream, out: Out,
                        backend: java.sql.Connection): Unit = {
    var done = false
    while (!done) {
      val tpe = in.readByte().toChar
      val len = in.readInt()
      val payload = new Array[Byte](len - 4)
      in.readFully(payload)
      tpe match {
        case 'Q' =>
          val sql = new String(payload, 0, payload.length - 1, UTF_8).trim
          if (sql.isEmpty) out.msg('I')(_ => ())
          else runQuery(sql, out, backend)
          readyForQuery(out)
        case 'X' => done = true
        case _ => // Sync/Flush/extended-protocol: not in scope
          out.msg('E') { d =>
            d.writeByte('S'.toInt); cstr(d, "ERROR")
            d.writeByte('C'.toInt); cstr(d, "0A000")
            d.writeByte('M'.toInt); cstr(d, s"unsupported message type '$tpe'")
            d.writeByte(0)
          }
          readyForQuery(out)
      }
    }
  }

  private def runQuery(sql: String, out: Out,
                       backend: java.sql.Connection): Unit = {
    val st = backend.createStatement()
    try {
      // multi-row literal INSERTs execute as one prepared batch instead
      // of one giant statement the backend must compile (6.7× on the
      // bulk-load leg; graft.sources.wire.BatchInsert) — wire protocol,
      // SQL surface and the response tags are unchanged
      val fast = graft.sources.wire.BatchInsert.tryExecute(backend, sql)
      if (fast >= 0) {
        out.msg('C')(d => cstr(d, s"INSERT 0 $fast"))
      } else if (st.execute(sql)) {
        val rs = st.getResultSet
        try {
          val md = rs.getMetaData
          val n = md.getColumnCount
          val pgTypes = (1 to n).map(i => pgType(md.getColumnType(i),
            md.getPrecision(i), md.getScale(i))).toArray
          out.msg('T') { d =>
            d.writeShort(n)
            (1 to n).foreach { i =>
              cstr(d, md.getColumnLabel(i))
              d.writeInt(0); d.writeShort(0)           // table oid, attnum
              d.writeInt(pgTypes(i - 1)._1)            // type oid
              d.writeShort(pgTypes(i - 1)._2)          // typlen
              d.writeInt(pgTypes(i - 1)._3)            // atttypmod
              d.writeShort(0)                          // text format
            }
          }
          var count = 0L
          val isBool = (1 to n).map(md.getColumnType(_) == Types.BOOLEAN)
          while (rs.next()) {
            out.msg('D') { d =>
              d.writeShort(n)
              var i = 1
              while (i <= n) {
                val v0 = rs.getString(i)
                val v = if (v0 != null && isBool(i - 1))
                  (if (v0 == "true") "t" else "f") else v0
                if (v == null) d.writeInt(-1)
                else { val b = v.getBytes(UTF_8); d.writeInt(b.length); d.write(b) }
                i += 1
              }
            }
            count += 1
          }
          out.msg('C')(d => cstr(d, s"SELECT $count"))
        } finally rs.close()
      } else {
        val nUpd = st.getUpdateCount
        val verb = sql.takeWhile(!_.isWhitespace).toUpperCase
        val tag = verb match {
          case "INSERT" => s"INSERT 0 $nUpd"
          case "UPDATE" | "DELETE" => s"$verb $nUpd"
          case _ => verb
        }
        out.msg('C')(d => cstr(d, tag))
      }
    } catch {
      case e: SQLException =>
        out.msg('E') { d =>
          d.writeByte('S'.toInt); cstr(d, "ERROR")
          d.writeByte('C'.toInt)
          cstr(d, Option(e.getSQLState).getOrElse("XX000"))
          d.writeByte('M'.toInt)
          cstr(d, Option(e.getMessage).getOrElse("backend error"))
          d.writeByte(0)
        }
    } finally st.close()
  }

  /** JDBC type → (PostgreSQL type OID, typlen, atttypmod) — the public
    * pg_type constants for the types the Derby backend produces.
    */
  private def pgType(jdbc: Int, prec: Int, scale: Int): (Int, Int, Int) =
    jdbc match {
      case Types.BOOLEAN | Types.BIT => (16, 1, -1)
      case Types.SMALLINT | Types.TINYINT => (21, 2, -1)
      case Types.INTEGER => (23, 4, -1)
      case Types.BIGINT => (20, 8, -1)
      case Types.REAL => (700, 4, -1)
      case Types.FLOAT | Types.DOUBLE => (701, 8, -1)
      case Types.DECIMAL | Types.NUMERIC =>
        (1700, -1, ((prec << 16) | scale) + 4)
      case Types.DATE => (1082, 4, -1)
      case Types.TIMESTAMP => (1114, 8, -1)
      case Types.BINARY | Types.VARBINARY | Types.LONGVARBINARY |
           Types.BLOB => (17, -1, -1)
      case Types.CHAR | Types.VARCHAR =>
        (1043, -1, if (prec > 0) prec + 4 else -1)
      case _ => (25, -1, -1) // text fallback (CLOB, LONGVARCHAR, …)
    }
}

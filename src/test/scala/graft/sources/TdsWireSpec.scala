package graft.sources.tdswire

import java.io.{BufferedInputStream, BufferedOutputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}
import java.net.Socket
import java.sql.DriverManager

import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Protocol-level pins for the TDS (MSSQL) wire leg: raw-socket packet
  * framing against the documented formats — independent of our own
  * client, so a shared framing bug cannot self-verify — plus the JDBC
  * driver round trip over binary-typed values, the MSSQL dialect bridge
  * (bracket identifiers, three-part naming), LOGIN7 password
  * obfuscation, the shared-secret contract, >4 KB packet splitting in
  * both directions, error recovery and concurrent sessions.
  */
class TdsWireSpec extends AnyFunSuite with BeforeAndAfterAll {

  private val url = "jdbc:derby:memory:tdswiretest;create=true"
  private var server: TdsWireServer = _

  override def beforeAll(): Unit = {
    val c = DriverManager.getConnection(url)
    val st = c.createStatement()
    st.execute(
      """CREATE TABLE t ("id" BIGINT, "name" VARCHAR(100), "bal" DOUBLE,
        |  "money" DECIMAL(19,4), "ts" TIMESTAMP, "dt" DATE,
        |  "ok" BOOLEAN, "small" SMALLINT)""".stripMargin)
    st.execute("""INSERT INTO t VALUES
      |(1, 'naïve café', 12.5, 922337203685477.5807,
      | TIMESTAMP('2024-05-01 10:30:00.123456'), DATE('2024-05-01'),
      | TRUE, 255),
      |(2, NULL, -0.125, -1.0001,
      | TIMESTAMP('1999-12-31 23:59:59'), DATE('1999-12-31'),
      | FALSE, -7),
      |(3, 'x', NULL, NULL, NULL, NULL, NULL, NULL)""".stripMargin)
    st.close(); c.close()
    server = new TdsWireServer(url)
    TdsWireDriver.ensureRegistered()
  }

  override def afterAll(): Unit = if (server != null) server.close()

  private def jdbcUrl = s"jdbc:grafttds://127.0.0.1:${server.port}/graft"

  // ---- raw-socket framing (no shared client code) ------------------------

  test("PRELOGIN raw round trip: 8-byte header framing, version + " +
      "ENCRYPT_NOT_SUP option table") {
    val s = new Socket("127.0.0.1", server.port)
    try {
      val out = new DataOutputStream(new BufferedOutputStream(s.getOutputStream))
      val in = new DataInputStream(new BufferedInputStream(s.getInputStream))
      // hand-framed PRELOGIN: VERSION request only + terminator
      val payload = Array[Byte](0x00, 0x00, 0x07, 0x00, 0x06, 0xFF.toByte,
        1, 0, 0, 0, 0, 0)
      out.writeByte(0x12); out.writeByte(0x01)
      out.writeShort(payload.length + 8)
      out.writeShort(0); out.writeByte(1); out.writeByte(0)
      out.write(payload); out.flush()
      // response: one EOM packet, type 0x04
      assert(in.readUnsignedByte() == 0x04)
      assert((in.readUnsignedByte() & 0x01) == 1)
      val len = in.readUnsignedShort()
      in.skipBytes(4)
      val p = new Array[Byte](len - 8)
      in.readFully(p)
      // option table: VERSION (0x00) then ENCRYPTION (0x01), 0xFF end
      assert(p(0) == 0x00 && p(5) == 0x01 && p(10) == 0xFF.toByte)
      // ENCRYPTION offset/length point at the single NOT_SUP byte
      val encOff = ((p(6) & 0xFF) << 8) | (p(7) & 0xFF)
      assert(p(encOff) == 2, "ENCRYPT_NOT_SUP")
    } finally s.close()
  }

  test("LOGIN7 password obfuscation is the documented nibble-swap-XOR " +
      "and round-trips") {
    val w = TdsCodec.obfuscatePassword("Sécret1")
    assert(TdsCodec.deobfuscatePassword(w) == "Sécret1")
    // spot-pin one byte against a hand computation: 'a' = 0x61 UCS-2LE
    // low byte; swap → 0x16; xor 0xA5 → 0xB3
    assert(TdsCodec.obfuscatePassword("a")(0) == 0xB3.toByte)
  }

  // ---- driver round trip -------------------------------------------------

  test("driver round trip: binary-typed values decode exactly — INTN " +
      "widths, FLTN, NUMERICN(19,4) money range, DATETIME2 fraction, " +
      "DATEN, BITN, NVARCHAR unicode, NULLs of every type") {
    val conn = new TdsWireDriver().connect(jdbcUrl, null)
    try {
      val rs = conn.prepareStatement(
        """SELECT "id", "name", "bal", "money", "ts", "dt", "ok", "small"
          |FROM t ORDER BY "id"""".stripMargin).executeQuery()
      assert(rs.next())
      assert(rs.getLong(1) == 1L)
      assert(rs.getString(2) == "naïve café", "UCS-2 survives the wire")
      assert(rs.getDouble(3) == 12.5)
      assert(rs.getBigDecimal(4) ==
        new java.math.BigDecimal("922337203685477.5807"),
        "the money upper bound crosses NUMERICN exactly")
      assert(rs.getTimestamp(5) ==
        java.sql.Timestamp.valueOf("2024-05-01 10:30:00.123456"))
      assert(rs.getDate(6) == java.sql.Date.valueOf("2024-05-01"))
      assert(rs.getBoolean(7))
      assert(rs.getShort(8) == 255)
      assert(rs.next())
      assert(rs.getString(2) == null && rs.wasNull())
      assert(rs.getBigDecimal(4) == new java.math.BigDecimal("-1.0001"),
        "NUMERICN sign byte")
      assert(rs.getShort(8) == -7, "INTN sign extension from 2 bytes")
      assert(rs.next())
      (3 to 8).foreach { i => rs.getString(i); assert(rs.wasNull()) }
      assert(!rs.next())
    } finally conn.close()
  }

  test("MSSQL dialect bridge: [bracketed] identifiers and three-part " +
      "graft.dbo. naming translate; string literals are untouched") {
    val conn = new TdsWireDriver().connect(jdbcUrl, null)
    try {
      // (brackets pin on the quoted-lowercase columns; the table rides
      // the three-part prefix strip — Derby folds unquoted names up)
      val rs = conn.prepareStatement(
        """SELECT [id], [name] FROM graft.dbo.t WHERE [id] = 1""")
        .executeQuery()
      assert(rs.next() && rs.getLong(1) == 1L)
      assert(!rs.next())
      // a literal carrying brackets and 'dbo.' must survive verbatim
      val rs2 = conn.prepareStatement(
        "VALUES ('keep [x] and dbo. intact')").executeQuery()
      assert(rs2.next() && rs2.getString(1) == "keep [x] and dbo. intact")
    } finally conn.close()
  }

  test("shared-secret: wrong password refused with 18456/28000, right " +
      "token admitted; the password crosses the wire obfuscated") {
    val s2 = new TdsWireServer(url, secret = Some("tok-tds"))
    try {
      val u = s"jdbc:grafttds://127.0.0.1:${s2.port}/graft"
      val e = intercept[java.sql.SQLException] {
        new TdsWireDriver().connect(u, null)
      }
      assert(e.getErrorCode == 18456 && e.getSQLState == "28000")
      val p = new java.util.Properties()
      p.setProperty("password", "tok-tds")
      val conn = new TdsWireDriver().connect(u, p)
      try {
        val rs = conn.prepareStatement("VALUES 7").executeQuery()
        assert(rs.next() && rs.getInt(1) == 7)
      } finally conn.close()
    } finally s2.close()
  }

  test("messages split across 4096-byte packets reassemble in both " +
      "directions (wide rows out, long SQL in)") {
    val conn = new TdsWireDriver().connect(jdbcUrl, null)
    try {
      val st0 = conn.createStatement()
      st0.execute("""CREATE TABLE wide ("k" INT, "v" VARCHAR(6000))""")
      // long SQL batch (client→server splitting): a 5000-char literal
      val big = "ab" * 2500
      st0.execute(s"""INSERT INTO wide VALUES (1, '$big')""")
      st0.close()
      // wide row (server→client splitting: 5000 chars = 10000 UCS-2
      // bytes, forced across 3 packets)
      val rs = conn.prepareStatement("""SELECT "v" FROM wide""").executeQuery()
      assert(rs.next())
      assert(rs.getString(1) == big)
      assert(!rs.next())
      conn.createStatement().execute("DROP TABLE wide")
    } finally conn.close()
  }

  test("backend error surfaces as ERROR token with number and SQLSTATE; " +
      "the session recovers for the next batch") {
    val conn = new TdsWireDriver().connect(jdbcUrl, null)
    try {
      val e = intercept[java.sql.SQLException] {
        conn.prepareStatement("SELECT * FROM no_such_table").executeQuery()
      }
      assert(e.getSQLState == "42X05") // Derby: table does not exist
      val rs = conn.prepareStatement("VALUES 41 + 1").executeQuery()
      assert(rs.next() && rs.getInt(1) == 42)
    } finally conn.close()
  }

  test("prepared-statement interpolation + multi-row batch insert over " +
      "the wire; DONE_COUNT carries affected rows") {
    val conn = new TdsWireDriver().connect(jdbcUrl, null)
    try {
      conn.createStatement().execute(
        """CREATE TABLE b ("k" BIGINT, "v" VARCHAR(32))""")
      val ins = conn.prepareStatement(
        """INSERT INTO b ("k", "v") VALUES (?, ?)""")
      for (i <- 1 to 7) {
        ins.setLong(1, i.toLong)
        ins.setString(2, if (i % 3 == 0) null else s"v'$i")
        ins.addBatch()
      }
      assert(ins.executeBatch().length == 7)
      ins.close()
      val rs = conn.prepareStatement(
        """SELECT COUNT(*) AS "n" FROM b WHERE "v" IS NULL""").executeQuery()
      assert(rs.next() && rs.getLong(1) == 2L)
      rs.close() // single-outstanding-batch rule before the next update
      val upd = conn.prepareStatement("""DELETE FROM b WHERE "k" <= ?""")
      upd.setLong(1, 3L)
      assert(upd.executeUpdate() == 3, "DONE_COUNT affected rows")
      conn.createStatement().execute("DROP TABLE b")
    } finally conn.close()
  }

  test("concurrent wire sessions stream independently (the partitioned-" +
      "read shape): interleaved cursors over separate sockets") {
    val d = new TdsWireDriver()
    val c1 = d.connect(jdbcUrl, null); val c2 = d.connect(jdbcUrl, null)
    try {
      val r1 = c1.createStatement()
        .executeQuery("""SELECT "id" FROM t ORDER BY "id"""")
      val r2 = c2.createStatement()
        .executeQuery("""SELECT "id" FROM t ORDER BY "id" DESC""")
      assert(r1.next() && r1.getLong(1) == 1L)
      assert(r2.next() && r2.getLong(1) == 3L)
      assert(r1.next() && r1.getLong(1) == 2L)
      assert(r2.next() && r2.getLong(1) == 2L)
      assert(r1.next() && r2.next())
      assert(!r1.next() && !r2.next())
    } finally { c1.close(); c2.close() }
  }

  // ---- TLS (MS-TDS §3.3.5.1: framed handshake, then raw TLS) -------------

  test("TLS leg: PRELOGIN agrees ENCRYPT_ON, the handshake rides in " +
      "PRELOGIN-typed packets, LOGIN7 + queries flow inside TLS; a " +
      "plaintext client is told to use TLS; a TLS client refuses a " +
      "plain server") {
    val tlsServer = new TdsWireServer(url, tls = true)
    try {
      val u = s"jdbc:grafttds://127.0.0.1:${tlsServer.port}/graft"
      val p = new java.util.Properties()
      p.setProperty("ssl", "true")
      val conn = new TdsWireDriver().connect(u, p)
      try {
        val rs = conn.prepareStatement(
          """SELECT [id], [name] FROM t WHERE [id] = 1""").executeQuery()
        assert(rs.next() && rs.getLong(1) == 1L &&
          rs.getString(2) == "naïve café")
        assert(!rs.next())
      } finally conn.close()
      // plaintext client against the TLS-required listener: the server's
      // ENCRYPT_ON verdict aborts the session BEFORE any LOGIN7 creds
      // would cross in clear — 28000, never a silent downgrade
      val e = intercept[java.sql.SQLException] {
        new TdsWireDriver().connect(u, null)
      }
      assert(e.getSQLState == "28000" && e.getMessage.contains("TLS"))
    } finally tlsServer.close()
    // a TLS-requesting client against the plain (ENCRYPT_NOT_SUP)
    // server must abort, never continue plaintext
    val p2 = new java.util.Properties()
    p2.setProperty("ssl", "true")
    val e2 = intercept[java.sql.SQLException] {
      new TdsWireDriver().connect(jdbcUrl, p2)
    }
    assert(e2.getSQLState == "08004")
  }

  test("TLS leg wire form: handshake flights ride in PRELOGIN-typed " +
      "(0x12) TDS packets, post-handshake traffic is RAW TLS records — " +
      "pinned through a byte-recording proxy, not our own framing code") {
    val tlsServer = new TdsWireServer(url, tls = true)
    val proxy = new java.net.ServerSocket(0, 4,
      java.net.InetAddress.getByName("127.0.0.1"))
    // server->client bytes in arrival order, with a marker index noted
    // after the cleartext PRELOGIN reply has passed
    val s2c = new java.io.ByteArrayOutputStream()
    @volatile var preloginReplyEnd = -1
    val t = new Thread(() => {
      val cli = proxy.accept()
      val srv = new java.net.Socket("127.0.0.1", tlsServer.port)
      val up = new Thread(() => {
        try {
          val buf = new Array[Byte](8192)
          val in = cli.getInputStream; val out = srv.getOutputStream
          var n = in.read(buf)
          while (n > 0) { out.write(buf, 0, n); out.flush(); n = in.read(buf) }
        } catch { case _: java.io.IOException => () }
        try srv.shutdownOutput() catch { case _: Exception => () }
      })
      up.setDaemon(true); up.start()
      try {
        val buf = new Array[Byte](8192)
        val in = srv.getInputStream; val out = cli.getOutputStream
        var n = in.read(buf)
        while (n > 0) {
          s2c.synchronized { s2c.write(buf, 0, n) }
          if (preloginReplyEnd < 0) {
            // first server message is the cleartext PRELOGIN reply: one
            // complete TDS packet, type 0x04; record where it ends
            val a = s2c.synchronized(s2c.toByteArray)
            if (a.length >= 4) {
              val len = ((a(2) & 0xFF) << 8) | (a(3) & 0xFF)
              if ((a(0) & 0xFF) == 0x04 && a.length >= len)
                preloginReplyEnd = len
            }
          }
          out.write(buf, 0, n); out.flush(); n = in.read(buf)
        }
      } catch { case _: java.io.IOException => () }
      try cli.close() catch { case _: Exception => () }
    })
    t.setDaemon(true); t.start()
    try {
      val u = s"jdbc:grafttds://127.0.0.1:${proxy.getLocalPort}/graft"
      val p = new java.util.Properties()
      p.setProperty("ssl", "true")
      val conn = new TdsWireDriver().connect(u, p)
      try {
        val rs = conn.prepareStatement(
          """SELECT [id] FROM t ORDER BY [id]""").executeQuery()
        assert(rs.next() && rs.getLong(1) == 1L)
      } finally conn.close()
      val bytes = s2c.synchronized(s2c.toByteArray)
      assert(preloginReplyEnd > 0, "must have seen the PRELOGIN reply")
      // the very next server byte after the PRELOGIN reply begins the
      // FRAMED handshake: a PRELOGIN-typed packet header (0x12), never a
      // bare TLS record (0x16)
      assert(bytes.length > preloginReplyEnd)
      assert((bytes(preloginReplyEnd) & 0xFF) == 0x12,
        f"handshake must be TDS-framed, got 0x${bytes(preloginReplyEnd)}%02x")
      // and the stream LATER carries raw TLS application records (0x17
      // content type at a plausible record boundary) — i.e. the channel
      // switched out of TDS framing after the handshake; walk the framed
      // packets to find where framing ends
      var pos = preloginReplyEnd
      var framedPackets = 0
      var ok = true
      while (ok && pos + 8 <= bytes.length &&
          (bytes(pos) & 0xFF) == 0x12) {
        val len = ((bytes(pos + 2) & 0xFF) << 8) | (bytes(pos + 3) & 0xFF)
        if (len < 8 || pos + len > bytes.length) ok = false
        else { framedPackets += 1; pos += len }
      }
      assert(framedPackets >= 1, "at least one framed handshake packet")
      assert(pos < bytes.length, "post-handshake bytes must exist")
      val first = bytes(pos) & 0xFF
      // raw TLS 1.2 records: 0x16 (handshake, e.g. NewSessionTicket) or
      // 0x14 (ChangeCipherSpec) or 0x17 (application data)
      assert(first == 0x14 || first == 0x16 || first == 0x17,
        f"post-handshake must be raw TLS, got 0x$first%02x")
      assert(bytes.indexOfSlice(Seq(0x17.toByte, 0x03.toByte), pos) >= 0,
        "application-data records must appear raw (0x17 0x03 ...)")
    } finally {
      try proxy.close() catch { case _: Exception => () }
      tlsServer.close()
    }
  }

  test("TLS leg: a client pinned to a DIFFERENT certificate fails the " +
      "framed handshake — the fixture trust is a pin, not trust-all") {
    val tlsServer = new TdsWireServer(url, tls = true)
    try {
      val sock = new Socket("127.0.0.1", tlsServer.port)
      try {
        sock.setTcpNoDelay(true)
        val out = new DataOutputStream(
          new BufferedOutputStream(sock.getOutputStream))
        val in = new DataInputStream(
          new BufferedInputStream(sock.getInputStream))
        // PRELOGIN requesting ENCRYPT_ON
        val payload = Array[Byte](
          0x00, 0x00, 0x0B, 0x00, 0x06, // VERSION @ 11, 6 bytes
          0x01, 0x00, 0x11, 0x00, 0x01, // ENCRYPTION @ 17, 1 byte
          0xFF.toByte,
          1, 0, 0, 0, 0, 0,
          0x01) // ENCRYPT_ON
        out.writeByte(0x12); out.writeByte(0x01)
        out.writeShort(payload.length + 8)
        out.writeShort(0); out.writeByte(1); out.writeByte(0)
        out.write(payload); out.flush()
        // consume the PRELOGIN reply message
        in.readUnsignedByte(); in.readUnsignedByte()
        val len = in.readUnsignedShort()
        in.skipBytes(4 + (len - 8))
        // framed handshake with a trust store pinning the ROGUE cert
        val ks = java.security.KeyStore.getInstance("PKCS12")
        val res = getClass.getResourceAsStream("/graft/tls/rogue-trust.p12")
        try ks.load(res, "graft-tls".toCharArray) finally res.close()
        val tmf = javax.net.ssl.TrustManagerFactory.getInstance(
          javax.net.ssl.TrustManagerFactory.getDefaultAlgorithm)
        tmf.init(ks)
        val ctx = javax.net.ssl.SSLContext.getInstance("TLS")
        ctx.init(null, tmf.getTrustManagers, null)
        val framing = new TdsTlsFramingSocket(sock, in, out)
        val ssl = ctx.getSocketFactory
          .createSocket(framing, "127.0.0.1", tlsServer.port, true)
          .asInstanceOf[javax.net.ssl.SSLSocket]
        ssl.setUseClientMode(true)
        intercept[javax.net.ssl.SSLHandshakeException] {
          ssl.startHandshake()
        }
      } finally sock.close()
    } finally tlsServer.close()
  }
}

package graft.sources

import java.io.{BufferedInputStream, BufferedOutputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}
import java.net.Socket
import java.nio.charset.StandardCharsets.UTF_8
import java.sql.DriverManager

import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.mysqlwire.{MySqlWireDriver, MySqlWireServer}

/** Protocol-level pins for the MySQL wire leg (the reference's primary
  * source protocol): raw-socket packet framing against the documented
  * formats — independent of our own client, so a shared framing bug
  * cannot self-verify — plus the JDBC driver round trip, the MySQL-ism
  * type mappings (tinyint(1), unsigned bigint), error recovery, and
  * concurrent sessions.
  */
class MySqlWireSpec extends AnyFunSuite with BeforeAndAfterAll {

  private val url = "jdbc:derby:memory:mywiretest;create=true"
  private var server: MySqlWireServer = _

  override def beforeAll(): Unit = {
    val c = DriverManager.getConnection(url)
    val st = c.createStatement()
    st.execute(
      """CREATE TABLE t ("id" BIGINT, "name" VARCHAR(32), "bal" DOUBLE,
        |  "d" DECIMAL(10,2), "big" DECIMAL(20,0), "ts" TIMESTAMP,
        |  "dt" DATE, "ok" BOOLEAN)""".stripMargin)
    st.execute("""INSERT INTO t VALUES
      |(1, 'alpha', 12.5, 99.25, 18446744073709551615,
      | TIMESTAMP('2026-01-02 03:04:05'), DATE('2026-01-02'), TRUE),
      |(2, NULL, -0.125, -1.00, 0,
      | TIMESTAMP('1999-12-31 23:59:59'), DATE('1999-12-31'), FALSE)"""
      .stripMargin)
    st.close(); c.close()
    server = new MySqlWireServer(url)
    MySqlWireDriver.ensureRegistered()
  }

  override def afterAll(): Unit = if (server != null) server.close()

  // ---- raw-socket helpers (independent of the driver) -------------------

  private def rawConnect(): (Socket, DataInputStream, DataOutputStream) = {
    val s = new Socket("127.0.0.1", server.port)
    s.setTcpNoDelay(true)
    (s, new DataInputStream(new BufferedInputStream(s.getInputStream)),
      new DataOutputStream(new BufferedOutputStream(s.getOutputStream)))
  }

  private def readPacket(in: DataInputStream): (Int, Array[Byte]) = {
    val a = in.readUnsignedByte(); val b = in.readUnsignedByte()
    val c = in.readUnsignedByte(); val seq = in.readUnsignedByte()
    val p = new Array[Byte](a | (b << 8) | (c << 16))
    in.readFully(p)
    (seq, p)
  }

  private def writePacket(out: DataOutputStream, seq: Int,
                          p: Array[Byte]): Unit = {
    out.write(p.length & 0xFF); out.write((p.length >> 8) & 0xFF)
    out.write((p.length >> 16) & 0xFF); out.write(seq)
    out.write(p); out.flush()
  }

  private def handshakeResponse(): Array[Byte] = {
    val b = new ByteArrayOutputStream()
    val caps = 0x0200 | 0x8000 | 0x0008 | 0x80000
    for (i <- 0 until 4) b.write((caps >> (8 * i)) & 0xFF)
    for (i <- 0 until 4) b.write((0x1000000 >> (8 * i)) & 0xFF)
    b.write(33)
    b.write(new Array[Byte](23), 0, 23)
    b.write("u".getBytes(UTF_8)); b.write(0)
    b.write(0)
    b.write("db".getBytes(UTF_8)); b.write(0)
    b.write("mysql_native_password".getBytes(UTF_8)); b.write(0)
    b.toByteArray
  }

  test("initial handshake is a documented V10 packet: protocol version, " +
      "server version, 21-byte auth data, plugin name; OK after response") {
    val (s, in, out) = rawConnect()
    try {
      val (seq0, hs) = readPacket(in)
      assert(seq0 == 0)
      assert((hs(0) & 0xFF) == 0x0A, "protocol version 10")
      val verEnd = hs.indexOf(0.toByte, 1)
      assert(new String(hs, 1, verEnd - 1, UTF_8).nonEmpty)
      // fixed layout after version: thread id 4 + auth1 8 + filler 1
      val capLow = verEnd + 1 + 4 + 8 + 1
      assert((hs(capLow) & 0x02) != 0x04, "packet long enough") // bounds only
      // plugin name is the trailing NUL-terminated string
      val tail = new String(hs, hs.length - 22, 21, UTF_8)
      assert(tail == "mysql_native_password")
      writePacket(out, 1, handshakeResponse())
      val (_, ok) = readPacket(in)
      assert((ok(0) & 0xFF) == 0x00, "OK after trust-auth response")
    } finally s.close()
  }

  test("COM_QUERY result set framing: column-count packet, " +
      "ColumnDefinition41 per column, EOF, lenenc rows with 0xFB NULL, EOF") {
    val (s, in, out) = rawConnect()
    try {
      readPacket(in); writePacket(out, 1, handshakeResponse()); readPacket(in)
      val q = new ByteArrayOutputStream()
      q.write(0x03)
      q.write("""SELECT "id", "name", "ok" FROM t ORDER BY "id"""".getBytes(UTF_8))
      writePacket(out, 0, q.toByteArray)
      val (_, cc) = readPacket(in)
      assert((cc(0) & 0xFF) == 3, "3 columns")
      // first column def: catalog lenenc-str "def"
      val (_, c1) = readPacket(in)
      assert((c1(0) & 0xFF) == 3 && new String(c1, 1, 3, UTF_8) == "def")
      readPacket(in); readPacket(in) // remaining column defs
      val (_, eof1) = readPacket(in)
      assert((eof1(0) & 0xFF) == 0xFE && eof1.length < 9, "column EOF")
      val (_, r1) = readPacket(in)
      // row 1: "1", "alpha", "1" as lenenc strings
      assert((r1(0) & 0xFF) == 1 && r1(1) == '1'.toByte)
      assert((r1(2) & 0xFF) == 5 && new String(r1, 3, 5, UTF_8) == "alpha")
      assert((r1(8) & 0xFF) == 1 && r1(9) == '1'.toByte, "boolean as 1")
      val (_, r2) = readPacket(in)
      assert((r2(0) & 0xFF) == 1 && r2(1) == '2'.toByte)
      assert((r2(2) & 0xFF) == 0xFB, "NULL cell is 0xFB")
      val (_, eof2) = readPacket(in)
      assert((eof2(0) & 0xFF) == 0xFE && eof2.length < 9, "row EOF")
    } finally s.close()
  }

  test("backend error surfaces as ERR packet with code, '#' and SQLSTATE; " +
      "the session recovers for the next command") {
    val (s, in, out) = rawConnect()
    try {
      readPacket(in); writePacket(out, 1, handshakeResponse()); readPacket(in)
      val bad = new ByteArrayOutputStream()
      bad.write(0x03); bad.write("SELECT broken FROM nowhere".getBytes(UTF_8))
      writePacket(out, 0, bad.toByteArray)
      val (_, err) = readPacket(in)
      assert((err(0) & 0xFF) == 0xFF)
      assert(err(3) == '#'.toByte, "SQLSTATE marker")
      assert(new String(err, 4, 5, UTF_8).length == 5)
      // recovery: a good query on the same session
      val good = new ByteArrayOutputStream()
      good.write(0x03); good.write("""SELECT "id" FROM t""".getBytes(UTF_8))
      writePacket(out, 0, good.toByteArray)
      val (_, cc) = readPacket(in)
      assert((cc(0) & 0xFF) == 1, "session recovered")
    } finally s.close()
  }

  test("driver round trip: typed getters, wasNull, tinyint(1) boolean, " +
      "DECIMAL(20,0) carries 2^64-1 exactly, timestamps and dates") {
    val conn = new MySqlWireDriver()
      .connect(s"jdbc:graftmy://127.0.0.1:${server.port}/graft", null)
    try {
      val st = conn.prepareStatement(
        """SELECT "id", "name", "bal", "d", "big", "ts", "dt", "ok"
          |FROM t ORDER BY "id"""".stripMargin)
      val rs = st.executeQuery()
      val md = rs.getMetaData
      assert(md.getColumnCount == 8)
      assert(md.getColumnType(1) == java.sql.Types.BIGINT)
      assert(md.getColumnType(4) == java.sql.Types.DECIMAL)
      assert(md.getPrecision(4) == 10 && md.getScale(4) == 2)
      assert(md.getPrecision(5) == 20 && md.getScale(5) == 0)
      assert(md.getColumnType(8) == java.sql.Types.BIT, "tinyint(1)")
      assert(rs.next())
      assert(rs.getLong(1) == 1L)
      assert(rs.getString(2) == "alpha")
      assert(rs.getDouble(3) == 12.5)
      assert(rs.getBigDecimal(4).toPlainString == "99.25")
      assert(rs.getBigDecimal(5).toPlainString == "18446744073709551615",
        "unsigned-bigint-range value survives DECIMAL(20,0)")
      assert(rs.getTimestamp(6).toString.startsWith("2026-01-02 03:04:05"))
      assert(rs.getDate(7).toString == "2026-01-02")
      assert(rs.getBoolean(8))
      assert(rs.next())
      assert(rs.getString(2) == null && rs.wasNull())
      assert(!rs.getBoolean(8))
      assert(!rs.next())
      rs.close(); st.close()
    } finally conn.close()
  }

  test("prepared-statement interpolation + multi-row batch insert over " +
      "the wire; affected counts come from OK packets") {
    val conn = new MySqlWireDriver()
      .connect(s"jdbc:graftmy://127.0.0.1:${server.port}/graft", null)
    try {
      val st0 = conn.createStatement()
      st0.execute("""CREATE TABLE b ("k" BIGINT, "v" VARCHAR(16))""")
      st0.close()
      val ins = conn.prepareStatement(
        """INSERT INTO b ("k", "v") VALUES (?, ?)""")
      for (i <- 1 to 7) {
        ins.setLong(1, i.toLong)
        ins.setString(2, if (i % 3 == 0) null else s"v'$i")
        ins.addBatch()
      }
      val counts = ins.executeBatch()
      assert(counts.length == 7)
      ins.close()
      val st = conn.prepareStatement(
        """SELECT COUNT(*) AS "n" FROM b WHERE "v" IS NULL""")
      val rs = st.executeQuery()
      assert(rs.next() && rs.getLong(1) == 2L)
      rs.close(); st.close()
      val upd = conn.prepareStatement("""DELETE FROM b WHERE "k" <= ?""")
      upd.setLong(1, 3L)
      assert(upd.executeUpdate() == 3, "OK packet affected-rows")
      upd.close()
    } finally conn.close()
  }

  test("concurrent wire sessions stream independently (the partitioned-" +
      "read shape): interleaved cursors over separate sockets") {
    val d = new MySqlWireDriver()
    val u = s"jdbc:graftmy://127.0.0.1:${server.port}/graft"
    val c1 = d.connect(u, null); val c2 = d.connect(u, null)
    try {
      val r1 = c1.createStatement()
        .executeQuery("""SELECT "id" FROM t ORDER BY "id"""")
      val r2 = c2.createStatement()
        .executeQuery("""SELECT "id" FROM t ORDER BY "id" DESC""")
      assert(r1.next() && r1.getLong(1) == 1L)
      assert(r2.next() && r2.getLong(1) == 2L)
      assert(r1.next() && r1.getLong(1) == 2L)
      assert(r2.next() && r2.getLong(1) == 1L)
      assert(!r1.next() && !r2.next())
    } finally { c1.close(); c2.close() }
  }

  test("shared-secret server: wrong username refused with ER 1045, right " +
      "token admitted (the network-bind auth contract)") {
    val s2 = new MySqlWireServer(url, secret = Some("tok-my"))
    try {
      val u = s"jdbc:graftmy://127.0.0.1:${s2.port}/graft"
      val e = intercept[java.sql.SQLException] {
        new MySqlWireDriver().connect(u, null)
      }
      assert(e.getErrorCode == 1045 && e.getSQLState == "28000")
      val p = new java.util.Properties()
      p.setProperty("user", "tok-my")
      val conn = new MySqlWireDriver().connect(u, p)
      try {
        val rs = conn.prepareStatement("VALUES 7").executeQuery()
        assert(rs.next() && rs.getInt(1) == 7)
      } finally conn.close()
    } finally s2.close()
  }

  test("a >=16MB packet header (0xFFFFFF = split-packet continuation) " +
      "fails loudly instead of silently desyncing") {
    val (s, in, out) = rawConnect()
    try {
      readPacket(in) // initial handshake
      // minimal HandshakeResponse41 (>= 32 bytes, trust auth)
      val resp = new Array[Byte](34)
      out.write(0x22); out.write(0); out.write(0); out.write(1) // len 34, seq 1
      out.write(resp); out.flush()
      readPacket(in) // OK
      // COM_QUERY framed with the 0xFFFFFF split-packet length: the
      // server must refuse (connection teardown), never wrap the length
      out.write(0xFF); out.write(0xFF); out.write(0xFF); out.write(0)
      out.flush()
      // the guard throws server-side before any body bytes are read, so
      // the connection tears down: the client sees EOF, never a reply
      // framed as if the fragment were a whole packet
      intercept[java.io.IOException] { readPacket(in) }
    } finally s.close()
  }

  test("TLS leg: CLIENT_SSL upgrades in place and queries flow " +
      "encrypted; plaintext handshakes are refused with ER 3159; a " +
      "plain server never silently admits a TLS-requesting client") {
    val tlsServer = new MySqlWireServer(url, tls = true)
    try {
      val u = s"jdbc:graftmy://127.0.0.1:${tlsServer.port}/graft"
      val p = new java.util.Properties()
      p.setProperty("ssl", "true")
      val conn = new MySqlWireDriver().connect(u, p)
      try {
        val rs = conn.prepareStatement(
          """SELECT "id", "name" FROM t ORDER BY "id"""").executeQuery()
        assert(rs.next() && rs.getLong(1) == 1L && rs.getString(2) == "alpha")
        assert(rs.next() && rs.getLong(1) == 2L)
        assert(!rs.next())
      } finally conn.close()
      // plaintext HandshakeResponse41 against the TLS-required listener:
      // the documented ER_SECURE_TRANSPORT_REQUIRED
      val e = intercept[java.sql.SQLException] {
        new MySqlWireDriver().connect(u, null)
      }
      assert(e.getErrorCode == 3159)
    } finally tlsServer.close()
    // downgrade path: the plain `server` refuses the SSL request, so the
    // client's TLS handshake fails loudly — it never falls back
    val p2 = new java.util.Properties()
    p2.setProperty("ssl", "true")
    intercept[Exception] {
      new MySqlWireDriver()
        .connect(s"jdbc:graftmy://127.0.0.1:${server.port}/graft", p2)
    }
  }
}

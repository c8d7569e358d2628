package graft.sources

import java.io.{BufferedInputStream, BufferedOutputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}
import java.net.Socket
import java.nio.charset.StandardCharsets.UTF_8
import java.sql.DriverManager

import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.pgwire.{PgWireDriver, PgWireServer}

/** Protocol-level pins for the PostgreSQL-v3 wire leg: raw-socket framing
  * against the documented message formats (independent of our own client,
  * so a shared framing bug can't self-verify), the JDBC driver round
  * trip, typed values, error recovery, and concurrent sessions.
  */
class PgWireSpec extends AnyFunSuite with BeforeAndAfterAll {

  private val url = "jdbc:derby:memory:pgwiretest;create=true"
  private var server: PgWireServer = _

  override def beforeAll(): Unit = {
    val c = DriverManager.getConnection(url)
    val st = c.createStatement()
    st.execute(
      """CREATE TABLE t ("id" BIGINT, "name" VARCHAR(32), "bal" DOUBLE,
        |  "d" DECIMAL(10,2), "ts" TIMESTAMP, "dt" DATE, "ok" BOOLEAN)"""
        .stripMargin)
    st.execute("""INSERT INTO t VALUES
      |(1, 'alpha', 12.5, 99.25, TIMESTAMP('2026-01-02 03:04:05'),
      | DATE('2026-01-02'), TRUE),
      |(2, NULL, -0.125, -1.00, TIMESTAMP('1999-12-31 23:59:59'),
      | DATE('1999-12-31'), FALSE)""".stripMargin)
    st.close(); c.close()
    server = new PgWireServer(url)
    PgWireDriver.ensureRegistered()
  }

  override def afterAll(): Unit = if (server != null) server.close()

  private def jdbcUrl = s"jdbc:graftpg://127.0.0.1:${server.port}/graft"

  // ---- raw-socket framing (no shared client code) -----------------------

  private final class RawClient {
    private val sock = new Socket("127.0.0.1", server.port)
    val in = new DataInputStream(new BufferedInputStream(sock.getInputStream))
    private val out = new DataOutputStream(
      new BufferedOutputStream(sock.getOutputStream))

    def startup(): Unit = {
      val b = new ByteArrayOutputStream(); val d = new DataOutputStream(b)
      d.writeInt(196608)
      d.write("user".getBytes(UTF_8)); d.writeByte(0)
      d.write("x".getBytes(UTF_8)); d.writeByte(0)
      d.writeByte(0)
      out.writeInt(4 + b.size()); b.writeTo(out); out.flush()
    }
    def sslRequest(): Int = {
      out.writeInt(8); out.writeInt(80877103); out.flush()
      in.read()
    }
    def query(sql: String): Unit = {
      val b = sql.getBytes(UTF_8)
      out.writeByte('Q'.toInt); out.writeInt(4 + b.length + 1)
      out.write(b); out.writeByte(0); out.flush()
    }
    def readFrame(): (Char, Array[Byte]) = {
      val t = in.readByte().toChar
      val len = in.readInt()
      val p = new Array[Byte](len - 4); in.readFully(p)
      (t, p)
    }
    def close(): Unit = sock.close()
  }

  test("startup handshake emits the documented sequence: AuthenticationOk, " +
      "ParameterStatus*, BackendKeyData, ReadyForQuery(idle)") {
    val c = new RawClient
    c.startup()
    val (t1, p1) = c.readFrame()
    assert(t1 == 'R' && p1.length == 4 && p1.forall(_ == 0),
      "first frame must be AuthenticationOk (R, int32 0)")
    var frame = c.readFrame()
    val params = scala.collection.mutable.Map.empty[String, String]
    while (frame._1 == 'S') {
      val z = frame._2.indexOf(0.toByte)
      params(new String(frame._2, 0, z, UTF_8)) =
        new String(frame._2, z + 1, frame._2.length - z - 2, UTF_8)
      frame = c.readFrame()
    }
    assert(params("client_encoding") == "UTF8")
    assert(frame._1 == 'K' && frame._2.length == 8, "BackendKeyData")
    val (tz, pz) = c.readFrame()
    assert(tz == 'Z' && pz.length == 1 && pz(0) == 'I'.toByte,
      "ReadyForQuery idle")
    c.close()
  }

  test("SSLRequest is refused with the single documented 'N' byte and the " +
      "connection stays usable for a plain startup") {
    val c = new RawClient
    assert(c.sslRequest() == 'N'.toInt)
    c.startup()
    val (t1, _) = c.readFrame()
    assert(t1 == 'R')
    c.close()
  }

  test("simple query cycle: RowDescription with PG OIDs + typmod, one " +
      "DataRow per row with NULL as length -1, CommandComplete SELECT n") {
    val c = new RawClient
    c.startup()
    var f = c.readFrame()
    while (f._1 != 'Z') f = c.readFrame()
    c.query("""SELECT "id", "name", "d" FROM t ORDER BY "id"""")
    val (tt, tp) = c.readFrame()
    assert(tt == 'T')
    val din = new DataInputStream(new java.io.ByteArrayInputStream(tp))
    assert(din.readShort() == 3)
    def field(): (String, Int, Int) = {
      val sb = new StringBuilder
      var b = din.readByte()
      while (b != 0) { sb.append(b.toChar); b = din.readByte() }
      din.readInt(); din.readShort()
      val oid = din.readInt(); din.readShort()
      val typmod = din.readInt(); din.readShort()
      (sb.toString, oid, typmod)
    }
    assert(field() == (("id", 20, -1)), "BIGINT -> int8")
    assert(field()._2 == 1043, "VARCHAR -> varchar oid")
    val d = field()
    assert(d._2 == 1700 && d._3 == ((10 << 16) | 2) + 4,
      "DECIMAL(10,2) -> numeric with atttypmod ((p<<16)|s)+4")
    val (d1t, d1p) = c.readFrame()
    assert(d1t == 'D')
    val r1 = new DataInputStream(new java.io.ByteArrayInputStream(d1p))
    assert(r1.readShort() == 3)
    val l1 = r1.readInt(); val v1 = new Array[Byte](l1); r1.readFully(v1)
    assert(new String(v1, UTF_8) == "1")
    val (d2t, d2p) = c.readFrame()
    assert(d2t == 'D')
    val r2 = new DataInputStream(new java.io.ByteArrayInputStream(d2p))
    assert(r2.readShort() == 3)
    val l21 = r2.readInt(); r2.readFully(new Array[Byte](l21))
    assert(r2.readInt() == -1, "NULL cell must be length -1")
    val (ct, cp) = c.readFrame()
    assert(ct == 'C' &&
      new String(cp, 0, cp.length - 1, UTF_8) == "SELECT 2")
    assert(c.readFrame()._1 == 'Z')
    c.close()
  }

  test("backend error surfaces as ErrorResponse with SQLSTATE and the " +
      "session recovers to ReadyForQuery for the next statement") {
    val c = new RawClient
    c.startup()
    var f = c.readFrame()
    while (f._1 != 'Z') f = c.readFrame()
    c.query("SELECT * FROM no_such_table")
    val (et, ep) = c.readFrame()
    assert(et == 'E')
    val s = new String(ep, UTF_8)
    assert(s.contains("42X05"), s"Derby table-not-found SQLSTATE in: $s")
    assert(c.readFrame()._1 == 'Z', "ReadyForQuery after error")
    c.query("VALUES 41 + 1")
    val frames = Iterator.continually(c.readFrame()).takeWhile(_._1 != 'Z').toSeq
    assert(frames.exists(_._1 == 'D'), "session usable after error")
    c.close()
  }

  // ---- JDBC driver round trip ------------------------------------------

  test("driver round trip: typed getters, wasNull, boolean t/f, decimal, " +
      "timestamp, date") {
    val conn = new PgWireDriver().connect(jdbcUrl, null)
    val st = conn.prepareStatement(
      """SELECT "id", "name", "bal", "d", "ts", "dt", "ok" FROM t ORDER BY "id"""")
    val rs = st.executeQuery()
    assert(rs.next())
    assert(rs.getLong(1) == 1L && !rs.wasNull())
    assert(rs.getString(2) == "alpha")
    assert(rs.getDouble(3) == 12.5)
    assert(rs.getBigDecimal(4) == new java.math.BigDecimal("99.25"))
    assert(rs.getTimestamp(5) ==
      java.sql.Timestamp.valueOf("2026-01-02 03:04:05"))
    assert(rs.getDate(6) == java.sql.Date.valueOf("2026-01-02"))
    assert(rs.getBoolean(7))
    assert(rs.next())
    assert(rs.getString(2) == null && rs.wasNull())
    assert(rs.getDouble(3) == -0.125)
    assert(!rs.getBoolean(7))
    val md = rs.getMetaData
    assert(md.getColumnCount == 7)
    assert(md.getColumnType(1) == java.sql.Types.BIGINT)
    assert(md.getColumnType(4) == java.sql.Types.DECIMAL)
    assert(md.getPrecision(4) == 10 && md.getScale(4) == 2)
    assert(!rs.next())
    st.close(); conn.close()
  }

  test("prepared-statement interpolation + multi-row batch insert over " +
      "the wire round-trips exact doubles and escaped strings") {
    val conn = new PgWireDriver().connect(jdbcUrl, null)
    val st0 = conn.createStatement()
    st0.execute("""CREATE TABLE ins ("k" BIGINT, "s" VARCHAR(64), "x" DOUBLE)""")
    val ps = conn.prepareStatement(
      """INSERT INTO ins ("k","s","x") VALUES (?,?,?)""")
    val vals = Seq(
      (1L, "it's quoted", 0.1), (2L, "plain", -1.5e-300),
      (3L, null, 7.000000000000001))
    vals.foreach { case (k, s, x) =>
      ps.setLong(1, k)
      if (s == null) ps.setNull(2, java.sql.Types.VARCHAR)
      else ps.setString(2, s)
      ps.setDouble(3, x)
      ps.addBatch()
    }
    assert(ps.executeBatch().toSeq == Seq(1, 1, 1))
    ps.close()
    val rs = conn.prepareStatement(
      """SELECT "k", "s", "x" FROM ins ORDER BY "k"""").executeQuery()
    val got = Iterator.continually(rs)
      .takeWhile(_.next())
      .map(r => (r.getLong(1),
        { val s = r.getString(2); if (r.wasNull()) null else s },
        r.getDouble(3)))
      .toSeq
    assert(got == vals, "text interpolation must round-trip bit-exactly")
    st0.execute("DROP TABLE ins"); st0.close(); conn.close()
  }

  test("a literal '?' inside a quoted string or identifier is data, not " +
      "a parameter slot") {
    val conn = new PgWireDriver().connect(jdbcUrl, null)
    // one '?' in a string literal (with an escaped quote before it), one
    // in a quoted identifier, and ONE real placeholder after both — a
    // split-on-? interpolator would bind the parameter to the first
    // in-literal '?' and misalign everything after it
    val ps = conn.prepareStatement(
      """SELECT "q?", v FROM (VALUES ('it''s a ?', ?)) AS t("q?", v)""")
    ps.setLong(1, 42L)
    val rs = ps.executeQuery()
    assert(rs.next())
    assert(rs.getString(1) == "it's a ?")
    assert(rs.getLong(2) == 42L)
    assert(rs.getMetaData.getColumnName(1) == "q?")
    assert(!rs.next())
    ps.close(); conn.close()
  }

  test("concurrent wire sessions stream independently (the partitioned-" +
      "export shape)") {
    val results = new java.util.concurrent.ConcurrentLinkedQueue[Int]()
    val threads = (1 to 4).map { i =>
      new Thread(() => {
        val conn = new PgWireDriver().connect(jdbcUrl, null)
        try {
          val rs = conn.prepareStatement(s"VALUES $i * 10").executeQuery()
          assert(rs.next())
          results.add(rs.getInt(1))
        } finally conn.close()
      })
    }
    threads.foreach(_.start()); threads.foreach(_.join(30000))
    assert(results.toArray(Array.empty[Integer]).map(_.toInt).sorted.toSeq ==
      Seq(10, 20, 30, 40))
  }

  test("shared-secret server: wrong token refused with 28000, right " +
      "token admitted (the network-bind auth contract)") {
    val s2 = new PgWireServer(url, secret = Some("tok-pg"))
    try {
      val u = s"jdbc:graftpg://127.0.0.1:${s2.port}/graft"
      // default user ("graft") != secret → FATAL 28000 at startup
      val e = intercept[java.sql.SQLException] {
        new PgWireDriver().connect(u, null)
      }
      assert(e.getSQLState == "28000")
      // the right token (as the standard `user` property) is admitted
      val p = new java.util.Properties()
      p.setProperty("user", "tok-pg")
      val conn = new PgWireDriver().connect(u, p)
      try {
        val rs = conn.prepareStatement("VALUES 7").executeQuery()
        assert(rs.next() && rs.getInt(1) == 7)
      } finally conn.close()
    } finally s2.close()
  }

  test("TLS leg: SSLRequest upgrades in place and queries flow " +
      "encrypted; plaintext startup is refused; a plain server never " +
      "silently downgrades a TLS-requesting client") {
    val tlsServer = new PgWireServer(url, tls = true)
    try {
      val u = s"jdbc:graftpg://127.0.0.1:${tlsServer.port}/graft"
      // the happy path: negotiate TLS, then a normal typed round trip
      val p = new java.util.Properties()
      p.setProperty("ssl", "true")
      val conn = new PgWireDriver().connect(u, p)
      try {
        val rs = conn.prepareStatement(
          """SELECT "id", "name" FROM t ORDER BY "id"""").executeQuery()
        assert(rs.next() && rs.getLong(1) == 1L && rs.getString(2) == "alpha")
        assert(rs.next() && rs.getLong(1) == 2L)
        assert(!rs.next())
      } finally conn.close()
      // plaintext startup against the TLS-required listener: FATAL 28000
      val e = intercept[java.sql.SQLException] {
        new PgWireDriver().connect(u, null)
      }
      assert(e.getSQLState == "28000")
      assert(e.getMessage.contains("TLS"))
    } finally tlsServer.close()
    // downgrade path: the plain `server` answers SSLRequest with 'N';
    // a client that asked for TLS must abort, never continue plaintext
    val p2 = new java.util.Properties()
    p2.setProperty("ssl", "true")
    val e2 = intercept[java.sql.SQLException] {
      new PgWireDriver().connect(jdbcUrl, p2)
    }
    assert(e2.getSQLState == "08004")
  }
}

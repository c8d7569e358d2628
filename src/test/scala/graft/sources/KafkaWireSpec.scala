package graft.sources

import java.io.{BufferedInputStream, BufferedOutputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}
import java.net.Socket
import java.nio.charset.StandardCharsets.UTF_8
import java.util.zip.CRC32

import org.scalatest.BeforeAndAfterAll

import graft.SparkTestBase
import graft.sources.kafkawire.{KafkaWireClient, KafkaWireServer}

/** Protocol-level pins for the Kafka wire leg: raw-socket framing
  * against the documented formats (size framing, v0 request header,
  * big-endian primitives, MessageSet v1 with CRC over magic..value) —
  * independent of our own client, the mysqlwire standard — plus the
  * client surface, CRC corruption rejection, and the streaming connector
  * running over `protocol=kafka` with an exactly-once forced restart.
  */
class KafkaWireSpec extends SparkTestBase with BeforeAndAfterAll {

  private var server: KafkaWireServer = _
  private var port: Int = 0

  override def beforeAll(): Unit = {
    super.beforeAll()
    server = new KafkaWireServer(3)
    port = server.start()
  }

  override def afterAll(): Unit = {
    if (server != null) server.close()
    super.afterAll()
  }

  // ---- raw-socket helpers ------------------------------------------------

  private def call(apiKey: Int, corr: Int)(
      body: DataOutputStream => Unit): DataInputStream = {
    val s = new Socket("127.0.0.1", port)
    s.setTcpNoDelay(true)
    val in = new DataInputStream(new BufferedInputStream(s.getInputStream))
    val out = new DataOutputStream(new BufferedOutputStream(s.getOutputStream))
    val b = new ByteArrayOutputStream()
    val d = new DataOutputStream(b)
    d.writeShort(apiKey); d.writeShort(0); d.writeInt(corr)
    d.writeShort(3); d.write("raw".getBytes(UTF_8)) // client_id
    body(d)
    out.writeInt(b.size()); b.writeTo(out); out.flush()
    val size = in.readInt()
    val resp = new Array[Byte](size)
    in.readFully(resp)
    s.close()
    val rin = new DataInputStream(new java.io.ByteArrayInputStream(resp))
    assert(rin.readInt() == corr, "correlation id echoes")
    rin
  }

  private def kstr(d: DataOutputStream, s: String): Unit = {
    d.writeShort(s.length); d.write(s.getBytes(UTF_8))
  }

  private def msgV1(tsMs: Long, key: Array[Byte], value: Array[Byte],
                    corruptCrc: Boolean = false): Array[Byte] = {
    val body = new ByteArrayOutputStream()
    val d = new DataOutputStream(body)
    d.writeByte(1); d.writeByte(0); d.writeLong(tsMs)
    d.writeInt(key.length); d.write(key)
    d.writeInt(value.length); d.write(value)
    val payload = body.toByteArray
    val crc = new CRC32(); crc.update(payload)
    val o = new ByteArrayOutputStream()
    val od = new DataOutputStream(o)
    od.writeInt(crc.getValue.toInt ^ (if (corruptCrc) 0x5A5A5A else 0))
    od.write(payload)
    o.toByteArray
  }

  test("ApiVersions v0 lists the served APIs; Metadata v0 carries one " +
      "broker and the topic's partition layout in documented framing") {
    val av = call(18, 7)(_ => ())
    assert(av.readShort() == 0)
    val n = av.readInt()
    val keys = (0 until n).map { _ =>
      val k = av.readShort(); av.readShort(); av.readShort(); k
    }
    assert(keys.toSet == Set(0, 1, 2, 3, 18))
    val md = call(3, 8) { d => d.writeInt(1); kstr(d, "graft") }
    assert(md.readInt() == 1) // one broker
    md.readInt() // node id
    val hlen = md.readShort(); md.readFully(new Array[Byte](hlen))
    md.readInt() // port
    assert(md.readInt() == 1) // one topic
    assert(md.readShort() == 0)
    val tlen = md.readShort()
    val tname = new Array[Byte](tlen); md.readFully(tname)
    assert(new String(tname, UTF_8) == "graft")
    assert(md.readInt() == 3, "3 partitions")
  }

  test("Produce v0 appends a CRC-valid MessageSet and returns the base " +
      "offset; a corrupted CRC is rejected with CORRUPT_MESSAGE(2)") {
    val m1 = msgV1(1700000000123L, "k1".getBytes(UTF_8), "v1".getBytes(UTF_8))
    val m2 = msgV1(1700000000456L, "k2".getBytes(UTF_8), "v2".getBytes(UTF_8))
    val pr = call(0, 9) { d =>
      d.writeShort(1); d.writeInt(30000)
      d.writeInt(1); kstr(d, "graft")
      d.writeInt(1); d.writeInt(0)
      d.writeInt(12 + m1.length + 12 + m2.length)
      d.writeLong(0L); d.writeInt(m1.length); d.write(m1)
      d.writeLong(0L); d.writeInt(m2.length); d.write(m2)
    }
    pr.readInt(); val nlen = pr.readShort(); pr.readFully(new Array[Byte](nlen))
    pr.readInt(); pr.readInt()
    assert(pr.readShort() == 0)
    val base = pr.readLong()
    assert(base >= 0)
    // corrupted message refuses the whole set
    val bad = msgV1(1L, "k".getBytes(UTF_8), "v".getBytes(UTF_8),
      corruptCrc = true)
    val pr2 = call(0, 10) { d =>
      d.writeShort(1); d.writeInt(30000)
      d.writeInt(1); kstr(d, "graft")
      d.writeInt(1); d.writeInt(0)
      d.writeInt(12 + bad.length)
      d.writeLong(0L); d.writeInt(bad.length); d.write(bad)
    }
    pr2.readInt(); val n2 = pr2.readShort(); pr2.readFully(new Array[Byte](n2))
    pr2.readInt(); pr2.readInt()
    assert(pr2.readShort() == 2, "CORRUPT_MESSAGE")
    // Fetch v0 returns the two good messages with valid CRCs
    val f = call(1, 11) { d =>
      d.writeInt(-1); d.writeInt(0); d.writeInt(0)
      d.writeInt(1); kstr(d, "graft")
      d.writeInt(1); d.writeInt(0)
      d.writeLong(base); d.writeInt(1 << 20)
    }
    f.readInt(); val n3 = f.readShort(); f.readFully(new Array[Byte](n3))
    f.readInt(); f.readInt()
    assert(f.readShort() == 0)
    val hw = f.readLong()
    assert(hw == base + 2)
    val setSize = f.readInt()
    val set = new Array[Byte](setSize); f.readFully(set)
    val sin = new DataInputStream(new java.io.ByteArrayInputStream(set))
    assert(sin.readLong() == base)
    val sz = sin.readInt()
    val raw = new Array[Byte](sz); sin.readFully(raw)
    val crcGiven = ((raw(0) & 0xFF) << 24) | ((raw(1) & 0xFF) << 16) |
      ((raw(2) & 0xFF) << 8) | (raw(3) & 0xFF)
    val crc = new CRC32(); crc.update(raw, 4, raw.length - 4)
    assert(crc.getValue.toInt == crcGiven, "fetched message CRC holds")
  }

  test("ListOffsets v0: log-end with ts=-1, log-start with ts=-2; " +
      "client endOffsets tracks appends") {
    val cl = new KafkaWireClient("127.0.0.1", port)
    try {
      val before = cl.endOffsets()
      assert(before.length == 3)
      cl.append(1, 1700000001000000L, "ka", "va")
      cl.append(1, 1700000002000000L, "kb", "vb")
      val after = cl.endOffsets()
      assert(after(1) == before(1) + 2 && after(0) == before(0))
      val lo = call(2, 12) { d =>
        d.writeInt(-1)
        d.writeInt(1); kstr(d, "graft")
        d.writeInt(1); d.writeInt(1); d.writeLong(-2L); d.writeInt(1)
      }
      lo.readInt(); val nl = lo.readShort(); lo.readFully(new Array[Byte](nl))
      lo.readInt(); lo.readInt()
      assert(lo.readShort() == 0)
      assert(lo.readInt() == 1)
      assert(lo.readLong() == 0L, "log-start is 0")
    } finally cl.close()
  }

  test("client round trip preserves records in order with ms-floored " +
      "timestamps; fetch honors [from, until) and chunking") {
    val s2 = new KafkaWireServer(2)
    val p2 = s2.start()
    val cl = new KafkaWireClient("127.0.0.1", p2)
    try {
      for (i <- 0 until 300)
        cl.append(i % 2, 1700000000000000L + i * 1000L, s"k$i", s"v$i" * 10)
      assert(cl.endOffsets().toSeq == Seq(150L, 150L))
      val got = cl.fetch(0, 10, 60, max = 7)
      assert(got.head.offset == 10 && got.forall(r => r.offset < 60))
      // drain the range in bounded chunks like the connector does
      var off = 10L
      val all = scala.collection.mutable.ArrayBuffer.empty[Long]
      while (off < 60) {
        val chunk = cl.fetch(0, off, 60, max = 7)
        assert(chunk.nonEmpty)
        all ++= chunk.map(_.offset)
        off = chunk.last.offset + 1
      }
      assert(all.toSeq == (10L until 60L).toSeq)
      val r0 = cl.fetch(0, 0, 1, max = 1).head
      assert(r0.key == "k0" && r0.value == "v0" * 10)
      assert(r0.ts == 1700000000000000L, "micros->ms->micros round trip")
    } finally { cl.close(); s2.close() }
  }

  test("the streaming connector over protocol=kafka is exactly-once " +
      "across a forced restart (checkpointed offsets resume mid-log)") {
    import org.apache.spark.sql.streaming.Trigger
    val s2 = new KafkaWireServer(2)
    val p2 = s2.start()
    try {
      val cl = new KafkaWireClient("127.0.0.1", p2)
      try {
        for (i <- 0 until 120)
          cl.append(i % 2, 1700000000000000L + i * 1000L, s"k$i", s"v$i")
      } finally cl.close()
      val ckpt = java.nio.file.Files.createTempDirectory("kw_ckpt").toString
      val out = java.nio.file.Files.createTempDirectory("kw_out").toString
      def drain(): Unit =
        spark.readStream.format("graft.sources.bus.BusSourceProvider")
          .option("host", "127.0.0.1").option("port", p2.toString)
          .option("protocol", "kafka")
          .option("maxRecordsPerTrigger", "16")
          .load()
          .writeStream.trigger(Trigger.AvailableNow())
          .option("checkpointLocation", ckpt)
          .format("parquet").option("path", out)
          .start().awaitTermination()
      drain()
      // produce more while the query is down, then resume
      val cl2 = new KafkaWireClient("127.0.0.1", p2)
      try {
        for (i <- 120 until 200)
          cl2.append(i % 2, 1700000000000000L + i * 1000L, s"k$i", s"v$i")
      } finally cl2.close()
      drain()
      val got = spark.read.parquet(out)
      assert(got.count() == 200, "no loss, no duplication across restart")
      assert(got.select("key").distinct().count() == 200)
    } finally s2.close()
  }

  // ---- TLS listener variant (from byte 0 — no in-band upgrade) -----------

  test("TLS listener: produce + fetch round-trip inside TLS; a plaintext " +
      "client dies at its first frame; a client pinned to a different " +
      "certificate fails the handshake") {
    val s3 = new KafkaWireServer(2, tls = true)
    val p3 = s3.start()
    try {
      // happy path: full client surface over the encrypted session
      val cl = new KafkaWireClient("127.0.0.1", p3, tls = true)
      try {
        for (i <- 0 until 10)
          cl.append(i % 2, 1700000000000000L + i * 1000L, s"k$i", s"v$i")
        val recs = cl.fetch(0, 0L, Long.MaxValue)
        assert(recs.nonEmpty && recs.forall(_.key.startsWith("k")))
        assert(cl.endOffsets.sum == 10L)
      } finally cl.close()
      // plaintext client: its size-framed ApiVersions is not a
      // ClientHello — the server kills the session, the client errors
      intercept[Exception] {
        val bad = new KafkaWireClient("127.0.0.1", p3)
        try bad.endOffsets finally bad.close()
      }
      // wrong-cert pin: a trust store holding only the ROGUE cert must
      // fail the handshake (the fixture trust is a pin, not trust-all)
      val ks = java.security.KeyStore.getInstance("PKCS12")
      val res = getClass.getResourceAsStream("/graft/tls/rogue-trust.p12")
      try ks.load(res, "graft-tls".toCharArray) finally res.close()
      val tmf = javax.net.ssl.TrustManagerFactory.getInstance(
        javax.net.ssl.TrustManagerFactory.getDefaultAlgorithm)
      tmf.init(ks)
      val ctx = javax.net.ssl.SSLContext.getInstance("TLS")
      ctx.init(null, tmf.getTrustManagers, null)
      val raw = new java.net.Socket("127.0.0.1", p3)
      try {
        val ssl = ctx.getSocketFactory
          .createSocket(raw, "127.0.0.1", p3, true)
          .asInstanceOf[javax.net.ssl.SSLSocket]
        ssl.setUseClientMode(true)
        intercept[javax.net.ssl.SSLHandshakeException] { ssl.startHandshake() }
      } finally raw.close()
    } finally s3.close()
  }
}

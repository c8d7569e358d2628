package graft.sources.kafkawire

import java.io.{BufferedInputStream, BufferedOutputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream, IOException}
import java.net.Socket
import java.nio.charset.StandardCharsets.UTF_8
import java.util.zip.CRC32

import graft.sources.bus.BusRecord

/** Kafka-protocol client: the [[graft.sources.bus.BusClient]] surface
  * (append / endOffsets / fetch / close) spoken over the Apache Kafka
  * wire protocol against [[KafkaWireServer]] — which is what lets the
  * GraftBus streaming connector run over the industry protocol with a
  * one-option switch (`protocol=kafka`).
  *
  * Timestamps: the v1 message format carries epoch MILLISECONDS
  * (CREATE_TIME); the bus surface speaks MICROSECONDS, so append floors
  * micros→ms on the wire and fetch widens ms→micros back. Callers that
  * need sub-ms event time carry it inside the payload (the
  * `EventsStream.publishEventsToBus` JSON convention does exactly this).
  */
final class KafkaWireClient(host: String, port: Int,
                            topic: String = "graft",
                            tls: Boolean = false)
    extends graft.sources.LogReadClient {
  private val sock = {
    val s0 = new Socket(host, port)
    s0.setTcpNoDelay(true)
    s0.setSoTimeout(120000) // stalled read fails the query, never hangs the JVM
    // from-byte-0 TLS against the broker's SSL listener, pinned to the
    // fixture certificate (see KafkaWireServer: no in-band upgrade
    // exists in this protocol)
    if (tls) graft.sources.wire.WireTls.upgradeClient(s0, host, port) else s0
  }
  private val in = new DataInputStream(new BufferedInputStream(sock.getInputStream))
  private val out = new DataOutputStream(new BufferedOutputStream(sock.getOutputStream))
  private var correlation = 0

  private def kstr(d: DataOutputStream, s: String): Unit = {
    val b = s.getBytes(UTF_8)
    d.writeShort(b.length)
    d.write(b)
  }

  /** One request/response cycle: v0 header, size framing, correlation
    * check (the protocol's pipelining key — strict here, one in flight).
    */
  private def call(apiKey: Int)(body: DataOutputStream => Unit): DataInputStream = {
    val b = new ByteArrayOutputStream()
    val d = new DataOutputStream(b)
    d.writeShort(apiKey)
    d.writeShort(0) // api version 0
    correlation += 1
    d.writeInt(correlation)
    kstr(d, "graft-client")
    body(d)
    out.writeInt(b.size())
    b.writeTo(out)
    out.flush()
    val size = in.readInt()
    val resp = new Array[Byte](size)
    in.readFully(resp)
    val rin = new DataInputStream(new java.io.ByteArrayInputStream(resp))
    val corr = rin.readInt()
    if (corr != correlation)
      throw new IOException(s"kafka correlation mismatch: $corr != $correlation")
    rin
  }

  private def readStr(rin: DataInputStream): String = {
    val n = rin.readShort()
    if (n < 0) null
    else { val b = new Array[Byte](n); rin.readFully(b); new String(b, UTF_8) }
  }

  /** Metadata v0: (brokers, partition count of `topic`). */
  def metadata(): (Seq[(Int, String, Int)], Int) = {
    val rin = call(3) { d => d.writeInt(1); kstr(d, topic) }
    val brokers = (0 until rin.readInt()).map { _ =>
      val id = rin.readInt(); val h = readStr(rin); val p = rin.readInt()
      (id, h, p)
    }
    val nTopics = rin.readInt()
    var parts = 0
    var t = 0
    while (t < nTopics) {
      val err = rin.readShort()
      val name = readStr(rin)
      val np = rin.readInt()
      var pi = 0
      while (pi < np) {
        rin.readShort(); rin.readInt(); rin.readInt()
        var i = rin.readInt(); while (i > 0) { rin.readInt(); i -= 1 }
        i = rin.readInt(); while (i > 0) { rin.readInt(); i -= 1 }
        pi += 1
      }
      if (err == 0 && name == topic) parts = np
      t += 1
    }
    (brokers, parts)
  }

  private def messageV1(tsMs: Long, key: Array[Byte],
                        value: Array[Byte]): Array[Byte] = {
    val body = new ByteArrayOutputStream()
    val d = new DataOutputStream(body)
    d.writeByte(1); d.writeByte(0)
    d.writeLong(tsMs)
    if (key == null) d.writeInt(-1) else { d.writeInt(key.length); d.write(key) }
    if (value == null) d.writeInt(-1)
    else { d.writeInt(value.length); d.write(value) }
    val payload = body.toByteArray
    val crc = new CRC32()
    crc.update(payload)
    val o = new ByteArrayOutputStream()
    val od = new DataOutputStream(o)
    od.writeInt(crc.getValue.toInt)
    od.write(payload)
    o.toByteArray
  }

  /** Produce one record (Produce v0, acks=1); returns its offset.
    * `ts` in MICROS (bus surface) → ms on the wire.
    */
  def append(partition: Int, ts: Long, key: String, value: String): Long = {
    val m = messageV1(ts / 1000L, key.getBytes(UTF_8), value.getBytes(UTF_8))
    val rin = call(0) { d =>
      d.writeShort(1) // acks
      d.writeInt(30000)
      d.writeInt(1); kstr(d, topic)
      d.writeInt(1); d.writeInt(partition)
      d.writeInt(12 + m.length)
      d.writeLong(0L) // producer-side offset, server-assigned anyway
      d.writeInt(m.length)
      d.write(m)
    }
    rin.readInt() // topic count (1)
    readStr(rin)
    rin.readInt() // partition count (1)
    rin.readInt() // partition id
    val err = rin.readShort()
    val base = rin.readLong()
    if (err != 0) throw new IOException(s"kafka produce error $err")
    base
  }

  /** Log-end offsets of every partition (ListOffsets v0, ts=-1). */
  def endOffsets(): Array[Long] = {
    val n = metadata()._2
    val rin = call(2) { d =>
      d.writeInt(-1) // replica_id
      d.writeInt(1); kstr(d, topic)
      d.writeInt(n)
      (0 until n).foreach { p =>
        d.writeInt(p); d.writeLong(-1L); d.writeInt(1)
      }
    }
    val res = new Array[Long](n)
    rin.readInt() // topics (1)
    readStr(rin)
    val np = rin.readInt()
    var pi = 0
    while (pi < np) {
      val p = rin.readInt()
      val err = rin.readShort()
      val cnt = rin.readInt()
      var v = 0L
      var i = 0
      while (i < cnt) { v = rin.readLong(); i += 1 }
      if (err != 0) throw new IOException(s"kafka listOffsets error $err")
      res(p) = v
      pi += 1
    }
    res
  }

  /** Records [from, until) on one partition (Fetch v0), at most ~`max`
    * records per wire round-trip via the byte budget. Timestamps widen
    * ms→micros back to the bus surface.
    */
  def fetch(partition: Int, from: Long, until: Long,
            max: Int = 4096): Array[BusRecord] = {
    val rin = call(1) { d =>
      d.writeInt(-1) // replica_id
      d.writeInt(0)  // max_wait
      d.writeInt(0)  // min_bytes
      d.writeInt(1); kstr(d, topic)
      d.writeInt(1); d.writeInt(partition)
      d.writeLong(from)
      d.writeInt(math.min(max, 4096) * 256) // byte budget per round-trip
    }
    rin.readInt() // topics (1)
    readStr(rin)
    rin.readInt() // partitions (1)
    rin.readInt() // partition id
    val err = rin.readShort()
    if (err != 0) throw new IOException(s"kafka fetch error $err")
    rin.readLong() // high watermark
    val setSize = rin.readInt()
    val set = new Array[Byte](setSize)
    rin.readFully(set)
    val sin = new DataInputStream(new java.io.ByteArrayInputStream(set))
    val outRecs = scala.collection.mutable.ArrayBuffer.empty[BusRecord]
    var remaining = setSize
    var stop = false
    while (remaining > 0 && !stop) {
      val off = sin.readLong()
      val msgSize = sin.readInt()
      val msg = new Array[Byte](msgSize)
      sin.readFully(msg)
      remaining -= 12 + msgSize
      if (off >= until) stop = true
      else if (off >= from) {
        val min = new DataInputStream(new java.io.ByteArrayInputStream(msg))
        val crcGiven = min.readInt()
        val crc = new CRC32()
        crc.update(msg, 4, msg.length - 4)
        if (crc.getValue.toInt != crcGiven)
          throw new IOException(s"kafka fetch: CRC mismatch at offset $off")
        val magic = min.readByte()
        if (magic != 1) throw new IOException(s"unsupported magic $magic")
        min.readByte()
        val tsMs = min.readLong()
        val kLen = min.readInt()
        val k = if (kLen < 0) null else {
          val b = new Array[Byte](kLen); min.readFully(b); new String(b, UTF_8)
        }
        val vLen = min.readInt()
        val v = if (vLen < 0) null else {
          val b = new Array[Byte](vLen); min.readFully(b); new String(b, UTF_8)
        }
        outRecs += BusRecord(off, tsMs * 1000L, k, v)
      }
    }
    outRecs.toArray
  }

  override def close(): Unit =
    try sock.close() catch { case _: IOException => }
}

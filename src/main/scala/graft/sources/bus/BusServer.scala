package graft.sources.bus

import java.io.{BufferedInputStream, BufferedOutputStream, DataInputStream, DataOutputStream, EOFException, IOException}
import java.net.{ServerSocket, Socket, SocketException}
import java.nio.charset.StandardCharsets.UTF_8

import scala.collection.mutable.ArrayBuffer

/** GraftBus — a minimal Kafka-shaped message bus: N ordered partitions of
  * an append-only record log, served over a REAL TCP socket, so the
  * streaming source reads through genuine network framing with
  * offset-based, replayable fetches (the property that makes exactly-once
  * restart possible; a socket text stream has no offsets and cannot
  * replay). The pgwire precedent applied to the ingest side: the wire
  * protocol is the contract, the in-memory log is the test-scale backing
  * store a production deployment swaps for disk.
  *
  * Protocol (big-endian, length-free request framing — each op has a
  * fixed shape):
  *   - 'A' append:  i32 partition, i64 ts, i32 keyLen, key, i32 valLen,
  *     val → i64 assigned offset
  *   - 'E' endOffsets: → i32 n, n × i64 (next offset per partition)
  *   - 'F' fetch: i32 partition, i64 from, i64 until, i32 max →
  *     i32 count, count × (i64 offset, i64 ts, i32 keyLen, key,
  *     i32 valLen, val) — records [from, min(until, from+max))
  *   - 'Q' quit: close the session
  *
  * Concurrency: appends synchronize on the partition log; fetches read a
  * stable prefix (offsets are assigned densely, a fetch below endOffset
  * never sees a gap). One thread per connection — N Spark tasks open N
  * independent sessions, each streaming its own partition range.
  */
private final case class Rec(ts: Long, key: Array[Byte], value: Array[Byte])

/** One record as a client sees it. */
final case class BusRecord(offset: Long, ts: Long, key: String, value: String)

final class BusServer(val partitions: Int,
                      bindHost: String = "127.0.0.1") {
  require(partitions > 0)

  private val logs = Array.fill(partitions)(new ArrayBuffer[Rec]())
  @volatile private var server: ServerSocket = _
  @volatile private var closed = false

  /** Bind an ephemeral port on ONE specific address (never the
    * wildcard — nothing else on the network should reach the log by
    * accident): callers pass the spark.driver.host address so executor
    * producers and the connector reach a driver-hosted bus cross-host;
    * the loopback default covers single-host runs. Returns the port.
    */
  def start(): Int = {
    server = new ServerSocket(0, 64,
      java.net.InetAddress.getByName(bindHost))
    val t = new Thread(() => acceptLoop(), "graft-bus-accept")
    t.setDaemon(true)
    t.start()
    server.getLocalPort
  }

  def close(): Unit = {
    closed = true
    try server.close() catch { case _: IOException => }
  }

  /** Next offset per partition (== count — offsets are dense from 0). */
  def endOffsets: Array[Long] =
    logs.map(l => l.synchronized(l.length.toLong))

  private def acceptLoop(): Unit =
    try {
      while (!closed) {
        val sock = server.accept()
        val t = new Thread(() => serve(sock), "graft-bus-session")
        t.setDaemon(true)
        t.start()
      }
    } catch { case _: IOException => } // closed

  private def serve(sock: Socket): Unit = {
    sock.setTcpNoDelay(true)
    try {
      val in = new DataInputStream(new BufferedInputStream(sock.getInputStream))
      val out = new DataOutputStream(new BufferedOutputStream(sock.getOutputStream))
      var done = false
      while (!done) {
        (in.readByte().toChar: @annotation.switch) match {
          case 'A' =>
            val p = in.readInt()
            val ts = in.readLong()
            val key = new Array[Byte](in.readInt()); in.readFully(key)
            val value = new Array[Byte](in.readInt()); in.readFully(value)
            if (p < 0 || p >= partitions) throw new IOException(s"bad partition $p")
            val log = logs(p)
            val off = log.synchronized { log += Rec(ts, key, value); log.length - 1L }
            out.writeLong(off); out.flush()
          case 'E' =>
            out.writeInt(partitions)
            endOffsets.foreach(out.writeLong)
            out.flush()
          case 'F' =>
            val p = in.readInt()
            val from = in.readLong()
            val until = in.readLong()
            val max = in.readInt()
            if (p < 0 || p >= partitions) throw new IOException(s"bad partition $p")
            val log = logs(p)
            // snapshot the fetch window UNDER the partition lock: record
            // fields are immutable, but a concurrent append can resize
            // the ArrayBuffer's backing array, and an unlocked indexed
            // read may observe the swapped array before its element
            // copies (JMM visibility) — bounded copy, serialize unlocked
            val (lo, recs) = log.synchronized {
              val hi = log.length.toLong
              val lo0 = math.max(0L, from)
              val end = math.min(math.min(until, hi), lo0 + math.max(0, max))
              val cnt = math.max(0L, end - lo0).toInt
              (lo0, Array.tabulate(cnt)(i => log((lo0 + i).toInt)))
            }
            out.writeInt(recs.length)
            var i = 0
            while (i < recs.length) {
              val r = recs(i)
              out.writeLong(lo + i); out.writeLong(r.ts)
              out.writeInt(r.key.length); out.write(r.key)
              out.writeInt(r.value.length); out.write(r.value)
              i += 1
            }
            out.flush()
          case 'Q' => done = true
          case c => throw new IOException(s"bad op '$c'")
        }
      }
    } catch {
      case _: EOFException | _: SocketException | _: IOException => // client gone
    } finally {
      try sock.close() catch { case _: IOException => }
    }
  }
}

/** One client wire session (driver admission control or one task's reads). */
final class BusClient(host: String, port: Int)
    extends graft.sources.LogReadClient {
  private val sock = new Socket(host, port)
  sock.setTcpNoDelay(true)
  private val in = new DataInputStream(new BufferedInputStream(sock.getInputStream))
  private val out = new DataOutputStream(new BufferedOutputStream(sock.getOutputStream))

  def append(partition: Int, ts: Long, key: String, value: String): Long = {
    val k = key.getBytes(UTF_8); val v = value.getBytes(UTF_8)
    out.writeByte('A'.toInt); out.writeInt(partition); out.writeLong(ts)
    out.writeInt(k.length); out.write(k)
    out.writeInt(v.length); out.write(v)
    out.flush()
    in.readLong()
  }

  def endOffsets(): Array[Long] = {
    out.writeByte('E'.toInt); out.flush()
    val n = in.readInt()
    Array.fill(n)(in.readLong())
  }

  /** Records [from, until) in one wire round-trip (capped at max). */
  def fetch(partition: Int, from: Long, until: Long,
            max: Int = 4096): Array[BusRecord] = {
    out.writeByte('F'.toInt); out.writeInt(partition)
    out.writeLong(from); out.writeLong(until); out.writeInt(max)
    out.flush()
    val n = in.readInt()
    Array.fill(n) {
      val off = in.readLong(); val ts = in.readLong()
      val k = new Array[Byte](in.readInt()); in.readFully(k)
      val v = new Array[Byte](in.readInt()); in.readFully(v)
      BusRecord(off, ts, new String(k, UTF_8), new String(v, UTF_8))
    }
  }

  override def close(): Unit = {
    try { out.writeByte('Q'.toInt); out.flush() } catch { case _: IOException => }
    try sock.close() catch { case _: IOException => }
  }
}

package graft.sources.tdswire

import java.io.{InputStream, OutputStream}
import java.net.{InetAddress, Socket, SocketAddress}
import javax.net.ssl.SSLSocket

import graft.sources.wire.WireTls

/** TLS-inside-TDS framing (the MS-TDS open specification, §3.3.5.1,
  * "Pre-Login followed by TLS/SSL handshake"): after the cleartext
  * PRELOGIN exchange agrees ENCRYPT_ON, the TLS handshake records do NOT
  * travel raw — each flight rides as the payload of a PRELOGIN-typed
  * (0x12) TDS packet with a normal 8-byte header. Only once the
  * handshake completes does the channel switch to raw TLS records for
  * the rest of the session (LOGIN7 onward travels inside TLS with no
  * TDS-packet wrapper around the records themselves).
  *
  * JSSE models TLS-over-a-transport as an `SSLSocket` layered over a
  * base `Socket`'s streams, so the framing is expressed as a Socket
  * whose streams add/strip TDS packet headers while `handshakeDone` is
  * false and pass bytes through untouched afterwards. The switchover is
  * race-free because both peers finish the handshake inside the framed
  * channel (the Finished messages are framed) and neither sends
  * post-handshake bytes before `startHandshake()` returns.
  *
  * The key material is the shared pinned-fixture pair in [[WireTls]] —
  * same trust story as the pgwire/mysqlwire TLS legs: the client trusts
  * exactly one certificate, a different self-signed identity fails the
  * handshake (pinned, never trust-all).
  */
private[tdswire] final class TdsTlsFramingSocket(
    underlying: Socket, base_in: InputStream, base_out: OutputStream)
    extends Socket {

  @volatile var handshakeDone = false

  private val framedIn = new InputStream {
    private var remaining = 0
    private def header(): Boolean = {
      // 8-byte TDS header: type, status, BE length, spid, id, window.
      // EOF on the FIRST byte is a clean end-of-stream; anywhere later
      // in the header it is a truncation and must fail loudly (a -1
      // folded into the length would fabricate a garbage `remaining`).
      val first = base_in.read()
      if (first < 0) return false
      // outbound flights are PRELOGIN-typed (0x12); a real SQL Server
      // wraps ITS handshake payload in tabular-response packets (0x04,
      // MS-TDS §2.2.3.1.1) — accept both inbound so the client-side
      // upgrade works against a genuine server, not only the in-repo
      // loopback pair (which frames both directions as 0x12)
      if (first != 0x12 && first != 0x04)
        throw new java.io.IOException(
          f"tds-tls: expected PRELOGIN (0x12) or response (0x04) framing packet, got 0x$first%02x")
      val rest = new Array[Byte](7)
      var got = 0
      while (got < 7) {
        val k = base_in.read(rest, got, 7 - got)
        if (k < 0)
          throw new java.io.EOFException("tds-tls: packet header truncated")
        got += k
      }
      val len = ((rest(1) & 0xFF) << 8) | (rest(2) & 0xFF)
      if (len < 9)
        throw new java.io.IOException(
          s"tds-tls: framing packet length $len below the 8-byte header + payload")
      remaining = len - 8
      true
    }
    override def read(): Int =
      if (handshakeDone) base_in.read()
      else {
        while (remaining == 0) if (!header()) return -1
        remaining -= 1
        base_in.read()
      }
    override def read(b: Array[Byte], off: Int, n: Int): Int =
      if (handshakeDone) base_in.read(b, off, n)
      else {
        while (remaining == 0) if (!header()) return -1
        val k = base_in.read(b, off, math.min(n, remaining))
        if (k > 0) remaining -= k
        k
      }
  }

  private val framedOut = new OutputStream {
    override def write(b: Int): Unit = write(Array(b.toByte), 0, 1)
    override def write(b: Array[Byte], off: Int, n: Int): Unit =
      if (handshakeDone) base_out.write(b, off, n)
      else {
        // one PRELOGIN-typed packet per flight; 4096 is the default
        // negotiated packet size, so split larger flights like any
        // other TDS message
        var o = off
        var left = n
        while (left > 0) {
          val k = math.min(left, 4096 - 8)
          val last = k == left
          base_out.write(0x12)
          base_out.write(if (last) 0x01 else 0x00)
          base_out.write((k + 8) >> 8); base_out.write((k + 8) & 0xFF)
          base_out.write(0); base_out.write(0) // spid
          base_out.write(1); base_out.write(0) // packet id, window
          base_out.write(b, o, k)
          o += k; left -= k
        }
        base_out.flush()
      }
    override def flush(): Unit = base_out.flush()
  }

  override def getInputStream: InputStream = framedIn
  override def getOutputStream: OutputStream = framedOut
  override def close(): Unit = underlying.close()
  override def isClosed: Boolean = underlying.isClosed
  override def isConnected: Boolean = true
  override def getInetAddress: InetAddress = underlying.getInetAddress
  override def getLocalAddress: InetAddress = underlying.getLocalAddress
  override def getPort: Int = underlying.getPort
  override def getLocalPort: Int = underlying.getLocalPort
  override def getRemoteSocketAddress: SocketAddress =
    underlying.getRemoteSocketAddress
  override def getLocalSocketAddress: SocketAddress =
    underlying.getLocalSocketAddress
  override def setTcpNoDelay(on: Boolean): Unit = underlying.setTcpNoDelay(on)
  override def getTcpNoDelay: Boolean = underlying.getTcpNoDelay
  override def setSoTimeout(t: Int): Unit = underlying.setSoTimeout(t)
  override def getSoTimeout: Int = underlying.getSoTimeout
  override def shutdownInput(): Unit = underlying.shutdownInput()
  override def shutdownOutput(): Unit = underlying.shutdownOutput()
}

private[tdswire] object TdsTls {

  /** Server side: frame the handshake in PRELOGIN packets, then hand
    * back the established SSLSocket carrying raw TLS.
    */
  def upgradeServer(sock: Socket, in: InputStream,
                    out: OutputStream): SSLSocket = {
    val framing = new TdsTlsFramingSocket(sock, in, out)
    val ssl = WireTls.serverContext.getSocketFactory
      .createSocket(framing, null, sock.getPort, true)
      .asInstanceOf[SSLSocket]
    ssl.setUseClientMode(false)
    // TLS 1.2: its full handshake ends with symmetric flights (client
    // Finished -> server CCS+Finished), so both peers leave the framed
    // phase at aligned points. TLS 1.3's early server-side completion
    // (0.5-RTT: server returns before reading client Finished) would
    // let one side flip to raw while the other is still framing — the
    // protocol generation the TDS 7.x framed handshake predates (TDS
    // 8.0 switched to raw TLS from byte 0 precisely for 1.3).
    ssl.setEnabledProtocols(Array("TLSv1.2"))
    ssl.startHandshake()
    framing.handshakeDone = true
    ssl
  }

  /** Client side: mirror of [[upgradeServer]] with the pinned trust. */
  def upgradeClient(sock: Socket, host: String, port: Int,
                    in: InputStream, out: OutputStream): SSLSocket = {
    val framing = new TdsTlsFramingSocket(sock, in, out)
    val ssl = WireTls.clientContext.getSocketFactory
      .createSocket(framing, host, port, true)
      .asInstanceOf[SSLSocket]
    ssl.setUseClientMode(true)
    ssl.setEnabledProtocols(Array("TLSv1.2")) // see upgradeServer
    ssl.startHandshake()
    framing.handshakeDone = true
    ssl
  }
}

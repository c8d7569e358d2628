package graft.sources.wire

import java.net.Socket
import java.security.KeyStore
import javax.net.ssl.{KeyManagerFactory, SSLContext, SSLSocket, TrustManagerFactory}

/** TLS upgrade seam for the wire listeners (pgwire SSLRequest, mysqlwire
  * CLIENT_SSL) — plain JSSE over the sockets the protocol modules already
  * hold; both published protocols upgrade IN PLACE on the existing TCP
  * connection after a cleartext negotiation prologue, which is exactly
  * what `SSLSocketFactory.createSocket(socket, …)` models.
  *
  * Identity: a self-signed fixture certificate committed as a classpath
  * resource (`graft/tls/server.p12`, generated once with the JDK's
  * keytool; CN=graft-wire-fixture, RSA-2048). The client side trusts
  * EXACTLY that certificate via the paired `truststore.p12` — certificate
  * pinning, never a trust-all manager, so a MITM with a different
  * self-signed cert fails the handshake. A production deployment swaps
  * the two resources for real key material; every code path stays the
  * same.
  */
object WireTls {

  private val StorePass = "graft-tls".toCharArray

  private def loadStore(resource: String): KeyStore = {
    val ks = KeyStore.getInstance("PKCS12")
    val in = getClass.getResourceAsStream(resource)
    if (in == null)
      throw new IllegalStateException(s"missing TLS fixture $resource")
    try ks.load(in, StorePass) finally in.close()
    ks
  }

  /** Server context: fixture private key + certificate. */
  lazy val serverContext: SSLContext = {
    val kmf = KeyManagerFactory.getInstance(
      KeyManagerFactory.getDefaultAlgorithm)
    kmf.init(loadStore("/graft/tls/server.p12"), StorePass)
    val ctx = SSLContext.getInstance("TLS")
    ctx.init(kmf.getKeyManagers, null, null)
    ctx
  }

  /** Client context: trusts ONLY the pinned fixture certificate. */
  lazy val clientContext: SSLContext = {
    val tmf = TrustManagerFactory.getInstance(
      TrustManagerFactory.getDefaultAlgorithm)
    tmf.init(loadStore("/graft/tls/truststore.p12"))
    val ctx = SSLContext.getInstance("TLS")
    ctx.init(null, tmf.getTrustManagers, null)
    ctx
  }

  /** Upgrade an accepted server-side socket to TLS in place. */
  def upgradeServer(sock: Socket): SSLSocket = {
    val s = serverContext.getSocketFactory
      .createSocket(sock, null, sock.getPort, true).asInstanceOf[SSLSocket]
    s.setUseClientMode(false)
    s.startHandshake()
    s
  }

  /** Upgrade a connected client-side socket to TLS in place. */
  def upgradeClient(sock: Socket, host: String, port: Int): SSLSocket = {
    val s = clientContext.getSocketFactory
      .createSocket(sock, host, port, true).asInstanceOf[SSLSocket]
    s.setUseClientMode(true)
    s.startHandshake()
    s
  }
}

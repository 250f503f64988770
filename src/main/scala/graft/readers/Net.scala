package graft.readers

import java.io.{BufferedInputStream, BufferedOutputStream, InputStream, OutputStream}

/** Shared byte transport for the wire-protocol service readers
  * (MQTT/WebSocket/ArrowFlight/Mongo-style): one socket factory so a
  * fix to timeouts or TLS setup lands everywhere at once, and one trait
  * for specs to fake with loopback streams.
  */
object Net {

  /** Bidirectional byte transport to a server. */
  trait Transport {
    def in: InputStream
    def out: OutputStream
    def close(): Unit
  }

  /** TCP transport with explicit connect + read timeouts; `tls` wraps
    * the connection in the default SSL context (the socket is created
    * unconnected so the connect timeout applies on both paths).
    */
  def socket(host: String, port: Int, tls: Boolean, soTimeoutMs: Int, connectTimeoutMs: Int = 15000): Transport = {
    val s =
      if (tls) javax.net.ssl.SSLSocketFactory.getDefault.createSocket().asInstanceOf[javax.net.ssl.SSLSocket]
      else new java.net.Socket()
    s.connect(new java.net.InetSocketAddress(host, port), connectTimeoutMs)
    s.setSoTimeout(soTimeoutMs)
    new Transport {
      val in = new BufferedInputStream(s.getInputStream)
      val out = new BufferedOutputStream(s.getOutputStream)
      def close(): Unit = s.close()
    }
  }
}

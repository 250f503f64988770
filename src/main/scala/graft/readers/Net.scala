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

  /** TCP transport with explicit connect + read timeouts. `tls` layers
    * SSL over the connected socket with the hostname attached — so the
    * ClientHello carries SNI, and endpoint identification is enabled
    * (certificate hostname verification; without it ANY CA-valid cert
    * passes and a MITM feeds forged data into the reader). `alpn` names
    * the application protocols to negotiate (gRPC-over-TLS servers
    * require "h2" before speaking HTTP/2).
    */
  def socket(
      host: String,
      port: Int,
      tls: Boolean,
      soTimeoutMs: Int,
      connectTimeoutMs: Int = 15000,
      alpn: Seq[String] = Nil): Transport = {
    val raw = new java.net.Socket()
    raw.connect(new java.net.InetSocketAddress(host, port), connectTimeoutMs)
    raw.setSoTimeout(soTimeoutMs)
    val s =
      if (!tls) raw
      else {
        val ssl = javax.net.ssl.SSLSocketFactory.getDefault
          .asInstanceOf[javax.net.ssl.SSLSocketFactory]
          .createSocket(raw, host, port, true)
          .asInstanceOf[javax.net.ssl.SSLSocket]
        val params = ssl.getSSLParameters
        params.setEndpointIdentificationAlgorithm("HTTPS")
        if (alpn.nonEmpty) params.setApplicationProtocols(alpn.toArray)
        ssl.setSSLParameters(params)
        ssl.startHandshake()
        ssl
      }
    new Transport {
      val in = new BufferedInputStream(s.getInputStream)
      val out = new BufferedOutputStream(s.getOutputStream)
      def close(): Unit = s.close()
    }
  }
}

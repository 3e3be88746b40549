package graft.http

import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.{Files, Paths}
import java.security.cert.CertificateFactory

import javax.net.ssl.{HttpsURLConnection, SSLContext, TrustManagerFactory}

import graft.SparkSuite

/** TLS termination (reference `ssl_acceptor.rs` via `modal/mod.rs:101-143`):
  * a configured cert+key serves HTTPS end-to-end; a broken config fails
  * fast instead of coming up plaintext.
  */
class TlsSpec extends SparkSuite {

  private def openssl(args: String*): Unit = {
    val p = new ProcessBuilder(("openssl" +: args): _*)
      .redirectErrorStream(true).start()
    val out = new String(p.getInputStream.readAllBytes(), UTF_8)
    assert(p.waitFor() == 0, s"openssl ${args.head} failed:\n$out")
  }

  test("HTTPS round trip against a self-signed cert") {
    val dir = Files.createTempDirectory("graft-tls")
    val key = dir.resolve("key.pem").toString
    val cert = dir.resolve("cert.pem").toString
    // modern openssl emits PKCS#8 ("BEGIN PRIVATE KEY") for -newkey
    openssl("req", "-x509", "-newkey", "rsa:2048", "-nodes",
      "-keyout", key, "-out", cert, "-days", "2",
      "-subj", "/CN=127.0.0.1",
      "-addext", "subjectAltName=IP:127.0.0.1")

    val tmp = Files.createTempDirectory("graft-tls-root").toString
    val srv = new GraftHttpServer(spark, tmp,
      tls = Some(Tls.Config(cert, key)))
    srv.start()
    try {
      assert(srv.isTls)
      // client context trusting exactly our self-signed cert
      val cf = CertificateFactory.getInstance("X.509")
      val in = Files.newInputStream(Paths.get(cert))
      val trusted = try cf.generateCertificate(in) finally in.close()
      val ks = java.security.KeyStore.getInstance("PKCS12")
      ks.load(null, null)
      ks.setCertificateEntry("ca", trusted)
      val tmf = TrustManagerFactory.getInstance(
        TrustManagerFactory.getDefaultAlgorithm)
      tmf.init(ks)
      val ctx = SSLContext.getInstance("TLS")
      ctx.init(null, tmf.getTrustManagers, null)

      val url = new java.net.URL(
        s"https://127.0.0.1:${srv.boundPort}/api/v1/liveness")
      val conn = url.openConnection().asInstanceOf[HttpsURLConnection]
      conn.setSSLSocketFactory(ctx.getSocketFactory)
      assert(conn.getResponseCode == 200)
      assert(conn.getCipherSuite != null) // really TLS, not plaintext
      conn.disconnect()

      // plaintext to the TLS port is refused (no silent downgrade)
      val plain = new java.net.URL(
        s"http://127.0.0.1:${srv.boundPort}/api/v1/liveness")
        .openConnection().asInstanceOf[java.net.HttpURLConnection]
      plain.setConnectTimeout(2000)
      plain.setReadTimeout(2000)
      intercept[java.io.IOException] { plain.getResponseCode; () }
    } finally srv.stop()
  }

  test("querier reaches a TLS ingestor via pinned trust; untrusting querier sees it dead") {
    val dir = Files.createTempDirectory("graft-tls-cluster")
    val key = dir.resolve("key.pem").toString
    val cert = dir.resolve("cert.pem").toString
    openssl("req", "-x509", "-newkey", "rsa:2048", "-nodes",
      "-keyout", key, "-out", cert, "-days", "2",
      "-subj", "/CN=127.0.0.1",
      "-addext", "subjectAltName=IP:127.0.0.1")
    val tmp = Files.createTempDirectory("graft-tls-cluster-root").toString
    val ing = new GraftHttpServer(spark, tmp, role = Cluster.Ingestor,
      nodeId = "tls-ing", tls = Some(Tls.Config(cert, key)))
    val qry = new GraftHttpServer(spark, tmp, role = Cluster.Querier,
      nodeId = "plain-qry", trustedCerts = Some(cert))
    val qryBlind = new GraftHttpServer(spark, tmp, role = Cluster.Querier,
      nodeId = "blind-qry")
    ing.start(); qry.start(); qryBlind.start()
    try {
      def reachOf(port: Int): Map[String, Boolean] = {
        val conn = new java.net.URL(
          s"http://127.0.0.1:$port/api/v1/cluster/info")
          .openConnection().asInstanceOf[java.net.HttpURLConnection]
        assert(conn.getResponseCode == 200)
        val body = new String(conn.getInputStream.readAllBytes(), UTF_8)
        conn.disconnect()
        val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
        val arr = mapper.readTree(body)
        (0 until arr.size()).map(i => arr.get(i).get("node_id").asText() ->
          arr.get(i).get("reachable").asBoolean()).toMap
      }
      // metastore advertises the TLS node as https; the trusting querier's
      // liveness probe succeeds over TLS
      val seen = reachOf(qry.boundPort)
      assert(seen("tls-ing"), seen.toString)
      // a querier without the pinned CA cannot verify the self-signed
      // listener — the node reads as unreachable, never plaintext-probed
      val blind = reachOf(qryBlind.boundPort)
      assert(!blind("tls-ing"), blind.toString)
    } finally { ing.stop(); qry.stop(); qryBlind.stop() }
  }

  test("unparseable key material fails fast at construction") {
    val dir = Files.createTempDirectory("graft-tls-bad")
    val cert = dir.resolve("cert.pem")
    val key = dir.resolve("key.pem")
    Files.write(cert, "not a cert".getBytes(UTF_8))
    Files.write(key, "not a key".getBytes(UTF_8))
    val tmp = Files.createTempDirectory("graft-tls-bad-root").toString
    intercept[Exception] {
      new GraftHttpServer(spark, tmp,
        tls = Some(Tls.Config(cert.toString, key.toString)))
    }
  }
}

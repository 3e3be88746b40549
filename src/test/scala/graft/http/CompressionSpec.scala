package graft.http

import java.net.{HttpURLConnection, URL}
import java.nio.charset.StandardCharsets.UTF_8
import java.util.zip.{GZIPInputStream, GZIPOutputStream}

import graft.SparkSuite

/** HTTP payload compression parity (reference actix `Compress` middleware
  * + transparent extractor decompression, `modal/mod.rs:119`): gzip'd
  * request bodies decode before the handler reads them (OTel exporters
  * gzip OTLP by default), large responses gzip when the client accepts
  * it, and corrupt compressed bodies answer 400 — never 500.
  */
class CompressionSpec extends SparkSuite {

  private def raw(method: String, url: String, headers: Map[String, String],
                  body: Option[Array[Byte]]): (Int, Array[Byte], String) = {
    val conn = new URL(url).openConnection().asInstanceOf[HttpURLConnection]
    conn.setRequestMethod(method)
    headers.foreach { case (k, v) => conn.setRequestProperty(k, v) }
    body.foreach { b =>
      conn.setDoOutput(true)
      val os = conn.getOutputStream
      try os.write(b) finally os.close()
    }
    val status = conn.getResponseCode
    val stream =
      if (status < 400) conn.getInputStream else conn.getErrorStream
    val bytes =
      if (stream == null) Array.emptyByteArray
      else try stream.readAllBytes() finally stream.close()
    val enc = String.valueOf(conn.getHeaderField("Content-Encoding"))
    conn.disconnect()
    (status, bytes, enc)
  }

  private def gz(s: String): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val g = new GZIPOutputStream(bos)
    try g.write(s.getBytes(UTF_8)) finally g.close()
    bos.toByteArray
  }

  private def gunzip(b: Array[Byte]): String =
    new String(new GZIPInputStream(
      new java.io.ByteArrayInputStream(b)).readAllBytes(), UTF_8)

  test("gzip request bodies ingest; large responses gzip on request; " +
       "corrupt gzip answers 400") {
    // HttpURLConnection transparently gunzips responses UNLESS told not
    // to — disable so the wire encoding is observable
    val tmp = java.nio.file.Files.createTempDirectory("graft-gzip").toString
    val srv = new GraftHttpServer(spark, tmp)
    srv.start()
    val base = s"http://127.0.0.1:${srv.boundPort}/api/v1"
    try {
      // 1. gzip'd ingest body lands as a normal event
      val (is, _, _) = raw("POST", s"$base/ingest",
        Map("X-P-Stream" -> "gzstream", "Content-Encoding" -> "gzip"),
        Some(gz("""{"level":"info","msg":"compressed hello"}""")))
      assert(is == 200)
      // deflate too
      val dbos = new java.io.ByteArrayOutputStream()
      val d = new java.util.zip.DeflaterOutputStream(dbos)
      try d.write("""{"level":"warn","msg":"deflated"}""".getBytes(UTF_8))
      finally d.close()
      assert(raw("POST", s"$base/ingest",
        Map("X-P-Stream" -> "gzstream", "Content-Encoding" -> "deflate"),
        Some(dbos.toByteArray))._1 == 200)

      // 2. query returns both rows; with Accept-Encoding: gzip the
      // (padded) response comes back gzip'd and decodes to the same JSON
      val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
      val q = mapper.createObjectNode()
        .put("query",
          "SELECT level, msg FROM gzstream ORDER BY level")
        .put("startTime", "10m")
        // TimeRange truncates both bounds to the MINUTE (reference
        // parse_human_time parity): now+60s can truncate below an event
        // ingested just after a minute boundary and silently drop it from
        // the window (the 1-in-8 flake this suite had) — keep the end far
        // enough out that truncation can never exclude this test's events
        .put("endTime",
          java.time.Instant.now().plusSeconds(600).toString)
      val body = Some(mapper.writeValueAsString(q).getBytes(UTF_8))
      val (ps, plainBytes, penc) = raw("POST", s"$base/query",
        Map("Accept-Encoding" -> "identity"), body)
      assert(ps == 200 && penc == "null", s"$ps $penc")
      val rows = mapper.readTree(new String(plainBytes, UTF_8))
      assert(rows.size() == 2, rows.toString)
      assert(rows.get(0).get("msg").asText() == "compressed hello")
      // small responses stay identity even when gzip is accepted…
      val (ss, smallBytes, senc) = raw("GET", s"$base/about",
        Map("Accept-Encoding" -> "gzip"), None)
      assert(ss == 200 && senc == "null",
        s"small response was '$senc' (${smallBytes.length}B)")
      // …large ones compress: pad the stream with a wide row first
      assert(raw("POST", s"$base/ingest",
        Map("X-P-Stream" -> "gzstream", "Content-Encoding" -> "gzip"),
        Some(gz(s"""{"level":"debug","msg":"${"x" * 2000}"}""")))._1 == 200)
      val (gs, gzBytes, genc) = raw("POST", s"$base/query",
        Map("Accept-Encoding" -> "gzip"), body)
      assert(gs == 200 && genc == "gzip", s"$gs $genc")
      val decoded = mapper.readTree(gunzip(gzBytes))
      assert(decoded.size() == 3)

      // 3. hostile compressed bodies: 400, never 500; server stays up
      assert(raw("POST", s"$base/ingest",
        Map("X-P-Stream" -> "gzstream", "Content-Encoding" -> "gzip"),
        Some("totally not gzip".getBytes(UTF_8)))._1 == 400)
      val truncated = gz("""{"level":"info","msg":"cut"}""").dropRight(6)
      val ts = raw("POST", s"$base/ingest",
        Map("X-P-Stream" -> "gzstream", "Content-Encoding" -> "gzip"),
        Some(truncated))._1
      assert(ts == 400, s"truncated gzip -> $ts")
      assert(raw("POST", s"$base/ingest",
        Map("X-P-Stream" -> "gzstream", "Content-Encoding" -> "br"),
        Some("anything".getBytes(UTF_8)))._1 == 415)
      assert(raw("GET", s"$base/about", Map.empty, None)._1 == 200)
    } finally srv.stop()
  }

  test("shutdown drain: once the flag is up every route answers 503") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-drain").toString
    val srv = new GraftHttpServer(spark, tmp)
    srv.start()
    val base = s"http://127.0.0.1:${srv.boundPort}/api/v1"
    try {
      assert(raw("GET", s"$base/about", Map.empty, None)._1 == 200)
      // raise the flag WITHOUT closing the socket — the reference
      // middleware behavior: draining, not refusing connections
      srv.stopping = true
      val (ds, dbody, _) = raw("GET", s"$base/about", Map.empty, None)
      assert(ds == 503, ds)
      assert(new String(dbody, UTF_8).contains("shutting down"))
      assert(raw("POST", s"$base/ingest",
        Map("X-P-Stream" -> "x"),
        Some("""{"a":1}""".getBytes(UTF_8)))._1 == 503)
    } finally srv.stop()
  }

  test("Accept-Encoding q-values are token-parsed, not regex-matched") {
    import graft.http.GraftHttpServer.gzipAccepted
    // plain accepts
    assert(gzipAccepted("gzip"))
    assert(gzipAccepted("br, gzip"))
    assert(gzipAccepted("GZIP"))
    assert(gzipAccepted("x-gzip"))
    // explicit q on the gzip entry decides, wherever it sits in the list
    assert(!gzipAccepted("gzip;q=0"))
    assert(!gzipAccepted("gzip;q=0.0"))
    assert(!gzipAccepted("gzip;q=0 , br"))       // space before comma
    assert(!gzipAccepted("gzip; q=0, deflate;q=1"))
    assert(gzipAccepted("gzip;q=0.5;v=x"))       // extra params ignored
    assert(gzipAccepted("gzip;q=0.001, br;q=0"))
    // q on OTHER codings never disables gzip
    assert(gzipAccepted("br;q=0, gzip"))
    // wildcard only applies when gzip has no entry of its own
    assert(gzipAccepted("*"))
    assert(!gzipAccepted("*;q=0"))
    assert(!gzipAccepted("*, gzip;q=0"))
    assert(gzipAccepted("*;q=0, gzip"))
    // absent / garbage: no compression
    assert(!gzipAccepted(""))
    assert(!gzipAccepted("identity, br"))
    assert(!gzipAccepted("gzip;q=notanumber"))
  }
}

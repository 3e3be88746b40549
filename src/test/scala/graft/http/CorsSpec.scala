package graft.http

import graft.SparkSuite

/** CORS over the wire (reference `cross_origin_config`): permissive mode
  * echoes any Origin, allow-list mode echoes only members (mismatches
  * still get their response, just without CORS headers), preflight
  * OPTIONS short-circuits with the asked method/headers.
  */
class CorsSpec extends SparkSuite {

  // java.net.http.HttpClient: HttpURLConnection strips `Origin` as a
  // restricted header, which would make every assertion vacuous
  private val client = java.net.http.HttpClient.newHttpClient()

  private def req(method: String, url: String,
                  headers: Map[String, String]): (Int, Map[String, String]) = {
    val b = java.net.http.HttpRequest.newBuilder(java.net.URI.create(url))
      .method(method, java.net.http.HttpRequest.BodyPublishers.noBody())
    headers.foreach { case (k, v) => b.header(k, v) }
    val resp = client.send(b.build(),
      java.net.http.HttpResponse.BodyHandlers.ofString())
    import scala.jdk.CollectionConverters._
    val hs = resp.headers().map().asScala.map { case (k, vs) =>
      k.toLowerCase -> vs.get(0) }.toMap
    (resp.statusCode(), hs)
  }

  test("permissive mode echoes any origin; preflight short-circuits") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-cors").toString
    val srv = new GraftHttpServer(spark, tmp) // cors = false → permissive
    srv.start()
    val base = s"http://127.0.0.1:${srv.boundPort}/api/v1"
    try {
      val (s1, h1) = req("GET", s"$base/about",
        Map("Origin" -> "https://console.example"))
      assert(s1 == 200)
      assert(h1.get("access-control-allow-origin")
        .contains("https://console.example"))
      assert(h1.get("access-control-allow-credentials").contains("true"))
      val (s2, h2) = req("OPTIONS", s"$base/query",
        Map("Origin" -> "https://anywhere.example",
          "Access-Control-Request-Method" -> "POST",
          "Access-Control-Request-Headers" -> "authorization,x-p-stream"))
      assert(s2 == 200)
      assert(h2.get("access-control-allow-methods").contains("POST"))
      assert(h2.get("access-control-allow-headers")
        .contains("authorization,x-p-stream"))
      // no Origin header → no CORS headers, normal handling
      val (s3, h3) = req("GET", s"$base/about", Map.empty)
      assert(s3 == 200 && !h3.contains("access-control-allow-origin"))
    } finally srv.stop()
  }

  test("allow-list mode: member echoed, mismatch served without CORS headers") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-cors").toString
    val srv = new GraftHttpServer(spark, tmp, cors = true,
      allowOrigins = Seq("https://ok.example"))
    srv.start()
    val base = s"http://127.0.0.1:${srv.boundPort}/api/v1"
    try {
      val (s1, h1) = req("GET", s"$base/about",
        Map("Origin" -> "https://ok.example"))
      assert(s1 == 200)
      assert(h1.get("access-control-allow-origin").contains("https://ok.example"))
      val (s2, h2) = req("GET", s"$base/about",
        Map("Origin" -> "https://evil.example"))
      assert(s2 == 200) // block_on_origin_mismatch(false): still served
      assert(!h2.contains("access-control-allow-origin"))
      // preflight from a non-member: 200 but NO allow headers → browser blocks
      val (s3, h3) = req("OPTIONS", s"$base/query",
        Map("Origin" -> "https://evil.example",
          "Access-Control-Request-Method" -> "POST"))
      assert(s3 == 200 && !h3.contains("access-control-allow-origin") &&
        !h3.contains("access-control-allow-methods"))
    } finally srv.stop()
  }
}

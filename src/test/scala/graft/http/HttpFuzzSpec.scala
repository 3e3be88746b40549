package graft.http

import java.net.{HttpURLConnection, URL}
import java.nio.charset.StandardCharsets.UTF_8

import graft.SparkSuite

/** Malformed-input fuzz over every mounted route: garbage bodies, broken
  * JSON, binary junk, absurd headers — the server must answer 4xx (or a
  * deliberate 503), NEVER 5xx, and must keep serving afterwards. A 500
  * means an unhandled exception escaped a handler: each one found here is
  * a real robustness bug.
  */
class HttpFuzzSpec extends SparkSuite {

  private def req(method: String, url: String,
                  headers: Map[String, String],
                  body: Option[Array[Byte]]): Int = {
    val conn = new URL(url).openConnection().asInstanceOf[HttpURLConnection]
    conn.setRequestMethod(method)
    conn.setConnectTimeout(10000)
    conn.setReadTimeout(30000)
    headers.foreach { case (k, v) => conn.setRequestProperty(k, v) }
    body.foreach { b =>
      conn.setDoOutput(true)
      val os = conn.getOutputStream
      try os.write(b) finally os.close()
    }
    val code = conn.getResponseCode
    // drain so the server-side handler completes
    val s = if (code < 400) conn.getInputStream else conn.getErrorStream
    if (s != null) { try s.readAllBytes() finally s.close() }
    conn.disconnect()
    code
  }

  private val routes = Seq(
    "/api/v1/ingest", "/v1/logs", "/v1/metrics", "/v1/traces",
    "/api/v1/logstream", "/api/v1/logstream/x", "/api/v1/logstream/x/schema",
    "/api/v1/logstream/x/retention", "/api/v1/logstream/x/info",
    "/api/v1/cluster/info", "/api/v1/query", "/api/v1/counts",
    "/api/v1/role", "/api/v1/user", "/api/v1/apikeys",
    "/api/v1/dataset_stats", "/api/v1/dataset_stats/distinct",
    "/api/v1/similarity/index", "/api/v1/similarity/search",
    "/api/v1/similarity/delete", "/api/v1/similarity/compact",
    "/api/v1/text/index", "/api/v1/text/search", "/api/v1/text/delete",
    "/api/v1/text/compact", "/api/v1/text/hybrid",
    "/api/v1/filters", "/api/v1/dashboards",
    "/api/v1/correlation", "/api/v1/o/login", "/api/v1/o/callback",
    "/api/v1/alerts", "/api/v1/targets", "/api/v1/alert-target-policy",
    "/api/v1/services/traces/list", "/api/v1/services/traces/detail",
    "/api/v1/livetail/x", "/api/v1/llm/generate", "/api/v1/prism/home",
    "/api/v1/datasets", "/api/v1/about", "/api/v1/demodata",
    "/api/v1/metrics", "/api/v1/otel_generator", "/api/v1/nonsense",
    "/api/v1/query/context")

  private val bodies: Seq[Array[Byte]] = Seq(
    "".getBytes(UTF_8),
    "not json at all".getBytes(UTF_8),
    """{"truncated": """.getBytes(UTF_8),
    """{"query": 42, "startTime": {}, "endTime": []}""".getBytes(UTF_8),
    """[[[[[[[[[[""".getBytes(UTF_8),
    Array.tabulate[Byte](64)(i => (i * 37 % 251).toByte), // binary junk
    ("{\"a\":\"" + "x" * 5000 + "\"}").getBytes(UTF_8))

  test("garbage in => 4xx out on every route, server keeps serving") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-fuzz").toString
    // llm configured (unroutable endpoint): without a config the route's
    // DELIBERATE reference-parity answer for any request is 500
    // "OpenAI key was not provided", which is not an unhandled exception
    val srv = new GraftHttpServer(spark, tmp,
      llm = Some(Llm.Config("http://127.0.0.1:9/never", "test-key")))
    srv.start()
    val base = s"http://127.0.0.1:${srv.boundPort}"
    val weirdHeaders = Map(
      "X-P-Stream" -> "../../etc/passwd",
      "X-P-Log-Source" -> "\u0000\u0001",
      "Content-Type" -> "application/x-unknown")
    try {
      val failures = for {
        route <- routes
        method <- Seq("GET", "POST", "PUT", "DELETE")
        body <- if (method == "GET") Seq(None) else bodies.map(Some(_))
        code = req(method, base + route,
          if (route.contains("ingest") || route.startsWith("/v1"))
            weirdHeaders else Map("X-P-Stream" -> "fz"),
          body)
        if code >= 500
      } yield s"$method $route body=${body.map(_.length)} -> $code"
      assert(failures.isEmpty,
        s"${failures.size} unhandled-exception responses:\n" +
          failures.take(20).mkString("\n"))
      // still alive and correct afterwards
      assert(req("GET", s"$base/api/v1/about", Map.empty, None) == 200)
    } finally srv.stop()
  }
}

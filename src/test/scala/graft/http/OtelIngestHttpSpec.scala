package graft.http

import java.net.{HttpURLConnection, URL}
import java.nio.charset.StandardCharsets.UTF_8
import java.time.Instant

import com.fasterxml.jackson.databind.ObjectMapper

import graft.SparkSuite
import graft.query.Rbac

/** OTLP/HTTP ingestion endpoints (`POST /v1/logs|metrics|traces`,
  * reference `get_ingest_otel_factory`): flatten → common pipeline →
  * queryable stream, plus auth and validation.
  */
class OtelIngestHttpSpec extends SparkSuite {

  private val mapper = new ObjectMapper()

  private def http(method: String, url: String,
                   headers: Map[String, String] = Map.empty,
                   body: Option[String] = None): (Int, String) = {
    val conn = new URL(url).openConnection().asInstanceOf[HttpURLConnection]
    conn.setRequestMethod(method)
    headers.foreach { case (k, v) => conn.setRequestProperty(k, v) }
    body.foreach { b =>
      conn.setDoOutput(true)
      val os = conn.getOutputStream
      try os.write(b.getBytes(UTF_8)) finally os.close()
    }
    val status = conn.getResponseCode
    val stream =
      if (status < 400) conn.getInputStream else conn.getErrorStream
    val text =
      if (stream == null) ""
      else try new String(stream.readAllBytes(), UTF_8) finally stream.close()
    conn.disconnect()
    (status, text)
  }

  private val logsPayload =
    """{"resourceLogs":[{
      |  "resource":{"attributes":[
      |    {"key":"service.name","value":{"stringValue":"api"}}]},
      |  "scopeLogs":[{"scope":{"name":"lib"},
      |    "logRecords":[
      |      {"timeUnixNano":"1700000000123456789","severityNumber":9,
      |       "body":{"stringValue":"hello"}},
      |      {"timeUnixNano":"1700000002000000000","severityNumber":17,
      |       "body":{"stringValue":"boom"}}
      |    ]}]}]}""".stripMargin

  private val tracesPayload =
    """{"resourceSpans":[{
      |  "resource":{"attributes":[
      |    {"key":"service.name","value":{"stringValue":"api"}}]},
      |  "scopeSpans":[{"scope":{"name":"lib"},
      |    "spans":[{"traceId":"0af7651916cd43dd8448eb211c80319c",
      |      "spanId":"b7ad6b7169203331","name":"GET /x","kind":2,
      |      "startTimeUnixNano":"1700000000000000000",
      |      "endTimeUnixNano":"1700000000500000000"}]}]}]}""".stripMargin

  test("logs and traces ingest end-to-end; validation and auth") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-otlp").toString
    val srv = new GraftHttpServer(spark, tmp)
    srv.start()
    val base = s"http://127.0.0.1:${srv.boundPort}"
    try {
      // logs
      val (ls, lb) = http("POST", s"$base/v1/logs",
        Map("X-P-Stream" -> "otellogs"), Some(logsPayload))
      assert(ls == 200, lb)
      assert(mapper.readTree(lb).get("events").asLong() == 2L)
      // the flattened stream is queryable through the normal query path
      val end = Instant.now().plusSeconds(60).toString
      val (qs, qb) = http("POST", s"$base/api/v1/query", body = Some(
        s"""{"query":
           |"SELECT `service.name` AS svc, severity_text FROM otellogs
           | ORDER BY severity_text",
           |"startTime": "2000-01-01T00:00:00Z",
           |"endTime": "$end"}""".stripMargin.replace("\n", " ")))
      assert(qs == 200, qb)
      val rows = mapper.readTree(qb)
      assert(rows.size() == 2, qb)
      assert(rows.get(0).get("svc").asText() == "api")
      assert(rows.get(0).get("severity_text").asText() == "ERROR")
      assert(rows.get(1).get("severity_text").asText() == "INFO")

      // traces
      val (ts, tb) = http("POST", s"$base/v1/traces",
        Map("X-P-Stream" -> "oteltraces"), Some(tracesPayload))
      assert(ts == 200, tb)
      assert(mapper.readTree(tb).get("events").asLong() == 1L)

      // validation
      assert(http("POST", s"$base/v1/logs", body = Some(logsPayload))._1
        == 400) // missing stream header
      assert(http("POST", s"$base/v1/gauges",
        Map("X-P-Stream" -> "x"), Some("{}"))._1 == 404)
      assert(http("POST", s"$base/v1/logs",
        Map("X-P-Stream" -> "x"), Some("not json"))._1 == 400)
      assert(http("GET", s"$base/v1/logs")._1 == 405)
    } finally srv.stop()
  }

  test("otel generator: start, status, produced data, stop, conflicts") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-gen").toString
    val srv = new GraftHttpServer(spark, tmp)
    srv.start()
    val base = s"http://127.0.0.1:${srv.boundPort}/api/v1"
    try {
      assert(mapper.readTree(http("GET", s"$base/otel_generator")._2)
        .get("status").asText() == "not running")
      assert(http("POST", s"$base/otel_generator",
        body = Some("""{"durationSecs": 0}"""))._1 == 400)
      val (ss, sb) = http("POST", s"$base/otel_generator",
        body = Some("""{"durationSecs": 120, "intervalMillis": 100}"""))
      assert(ss == 202, sb)
      // double start conflicts
      assert(http("POST", s"$base/otel_generator",
        body = Some("""{"durationSecs": 120}"""))._1 == 409)
      // wait for at least one batch to land
      // generous deadline: under full-suite contention the first batch's
      // Spark jobs can queue for a while
      var batches = 0L
      val deadline = System.currentTimeMillis() + 120000
      while (batches < 1 && System.currentTimeMillis() < deadline) {
        Thread.sleep(300)
        batches = mapper.readTree(http("GET", s"$base/otel_generator")._2)
          .path("batches").asLong(0)
      }
      assert(batches >= 1, "generator produced no batches in 120s")
      assert(http("DELETE", s"$base/otel_generator")._2
        .contains("stopped"))
      // the generated stream exists and its rows are flattened OTel logs
      assert(http("GET", s"$base/logstream")._2.contains("otel-demo-logs"))
      val end = Instant.now().plusSeconds(60).toString
      val (qs, qb) = http("POST", s"$base/query", body = Some(
        s"""{"query": "SELECT severity_text FROM `otel-demo-logs` LIMIT 1",
           |"startTime": "10m", "endTime": "$end"}""".stripMargin))
      assert(qs == 200, qb)
      assert(mapper.readTree(qb).size() == 1, qb)
    } finally srv.stop()
  }

  test("OTLP ingest honors RBAC ingest permission") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-otlp2").toString
    Rbac.clear()
    Rbac.grant("ro", Seq(Rbac.Reader(None)))
    Rbac.grant("wr", Seq(Rbac.Writer(Some("otellogs"))))
    val srv = new GraftHttpServer(spark, tmp, requireAuth = true,
      users = Map("ro" -> "pw", "wr" -> "pw"))
    srv.start()
    val base = s"http://127.0.0.1:${srv.boundPort}"
    def auth(u: String) = Map("Authorization" -> ("Basic " +
      java.util.Base64.getEncoder.encodeToString(s"$u:pw".getBytes(UTF_8))),
      "X-P-Stream" -> "otellogs")
    try {
      assert(http("POST", s"$base/v1/logs",
        Map("X-P-Stream" -> "otellogs"), Some(logsPayload))._1 == 401)
      assert(http("POST", s"$base/v1/logs", auth("ro"),
        Some(logsPayload))._1 == 403)
      assert(http("POST", s"$base/v1/logs", auth("wr"),
        Some(logsPayload))._1 == 200)
    } finally { srv.stop(); Rbac.clear() }
  }
}

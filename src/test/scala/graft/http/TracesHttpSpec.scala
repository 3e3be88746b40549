package graft.http

import java.net.{HttpURLConnection, URL}
import java.nio.charset.StandardCharsets.UTF_8
import java.time.Instant
import java.util.Base64

import com.fasterxml.jackson.databind.ObjectMapper

import graft.SparkSuite
import graft.query.Rbac

/** APM trace endpoints over the wire (reference
  * `/api/v1/services/traces/{list,detail}`,
  * `src/handlers/http/modal/server.rs:282-295`): OTLP spans in, listed /
  * detailed traces out, with option filters, sorting, paging, service
  * filter and RBAC denial.
  */
class TracesHttpSpec extends SparkSuite {

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

  private def basic(user: String, pass: String): Map[String, String] =
    Map("Authorization" -> ("Basic " + Base64.getEncoder
      .encodeToString(s"$user:$pass".getBytes(UTF_8))))

  /** OTLP payload: trace t1 = api:A(500ms) → api:B(200ms) → db:C(100ms,
    * status ERROR); trace t2 = api:D(300ms). One resource per service.
    */
  private def span(traceId: String, spanId: String, parent: String,
                   name: String, startNs: Long, durNs: Long,
                   status: Int): String =
    s"""{"traceId":"$traceId","spanId":"$spanId",
       |"parentSpanId":"$parent","name":"$name","kind":2,
       |"startTimeUnixNano":"$startNs",
       |"endTimeUnixNano":"${startNs + durNs}",
       |"status":{"code":$status}}""".stripMargin.replace("\n", "")

  private val Base = 1700000000000000000L
  private def payload(service: String, spans: Seq[String]): String =
    s"""{"resourceSpans":[{
       |  "resource":{"attributes":[
       |    {"key":"service.name","value":{"stringValue":"$service"}}]},
       |  "scopeSpans":[{"scope":{"name":"lib"},
       |    "spans":[${spans.mkString(",")}]}]}]}""".stripMargin

  test("trace list/detail over the wire: options, sort, paging, service " +
       "filter, hierarchy levels, RBAC") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-traces").toString
    Rbac.clear()
    val srv = new GraftHttpServer(spark, tmp, requireAuth = true,
      users = Map("alice" -> "pw", "bob" -> "pw"))
    srv.start()
    try {
      val base = s"http://127.0.0.1:${srv.boundPort}"
      Rbac.grant("alice",
        Seq(Rbac.Reader(Some("apmtraces")), Rbac.Ingestor(Some("apmtraces"))))

      val api = payload("api", Seq(
        span("t1", "a1", "", "GET /x", Base, 500000000L, 0),
        span("t1", "b2", "a1", "auth", Base + 1000000L, 200000000L, 0),
        span("t2", "d4", "", "GET /y", Base + 5000000L, 300000000L, 0)))
      val db = payload("db", Seq(
        span("t1", "c3", "b2", "select", Base + 2000000L, 100000000L, 2)))
      for (p <- Seq(api, db)) {
        val (s, b) = http("POST", s"$base/v1/traces",
          basic("alice", "pw") + ("X-P-Stream" -> "apmtraces"), Some(p))
        assert(s == 200, b)
      }

      val end = Instant.now().plusSeconds(60).toString
      def listBody(extra: String = ""): String =
        s"""{"dataset": "apmtraces", "startTime": "10m",
           |"endTime": "$end"$extra}""".stripMargin.replace("\n", " ")
      val listUrl = s"$base/api/v1/services/traces/list"

      // default option (spans): all 4 spans, per-trace counts attached
      val (s1, b1) = http("POST", listUrl, basic("alice", "pw"),
        Some(listBody()))
      assert(s1 == 200, b1)
      val r1 = mapper.readTree(b1)
      assert(r1.get("count").asLong() == 4, b1)
      assert(r1.get("records").size() == 4)
      val byId = (0 until 4).map(r1.get("records").get)
        .map(n => n.get("span_span_id").asText() -> n).toMap
      assert(byId("a1").get("total_span_count").asLong() == 3)
      assert(byId("a1").get("error_count").asLong() == 1)
      assert(byId("d4").get("total_span_count").asLong() == 1)
      assert(byId("d4").get("error_count").asLong() == 0)

      // option traces: only root spans; count agrees
      val (s2, b2) = http("POST", listUrl, basic("alice", "pw"),
        Some(listBody(""", "options": "traces"""")))
      assert(s2 == 200, b2)
      val r2 = mapper.readTree(b2)
      assert(r2.get("count").asLong() == 2)
      val roots = (0 until r2.get("records").size())
        .map(r2.get("records").get(_).get("span_span_id").asText()).toSet
      assert(roots == Set("a1", "d4"))

      // option errorSpans: only the status-2 span of an erroring trace
      val (s3, b3) = http("POST", listUrl, basic("alice", "pw"),
        Some(listBody(""", "options": "errorSpans"""")))
      assert(s3 == 200, b3)
      val r3 = mapper.readTree(b3)
      assert(r3.get("records").size() == 1)
      assert(r3.get("records").get(0).get("span_span_id").asText() == "c3")

      // longestFirst ordering + paging
      val (s4, b4) = http("POST", listUrl, basic("alice", "pw"),
        Some(listBody(""", "sortBy": "longestFirst", "limit": 2""")))
      val r4 = mapper.readTree(b4)
      assert(s4 == 200, b4)
      assert(r4.get("records").size() == 2)
      assert(r4.get("records").get(0).get("span_span_id").asText() == "a1")
      assert(r4.get("records").get(1).get("span_span_id").asText() == "d4")
      val (s5, b5) = http("POST", listUrl, basic("alice", "pw"),
        Some(listBody(
          """, "sortBy": "longestFirst", "limit": 2, "offset": 2""")))
      val r5 = mapper.readTree(b5)
      assert(s5 == 200, b5)
      assert(r5.get("records").get(0).get("span_span_id").asText() == "b2")

      // serviceName filter
      val (s6, b6) = http("POST", listUrl, basic("alice", "pw"),
        Some(listBody(""", "serviceName": "db"""")))
      val r6 = mapper.readTree(b6)
      assert(s6 == 200, b6)
      assert(r6.get("records").size() == 1)
      assert(r6.get("records").get(0).get("span_span_id").asText() == "c3")

      // detail: hierarchy levels, per-span has_error, total count
      val (ds, dbb) = http("POST", s"$base/api/v1/services/traces/detail",
        basic("alice", "pw"), Some(
          s"""{"dataset": "apmtraces", "traceId": "t1",
             |"startTime": "10m", "endTime": "$end"}"""
            .stripMargin.replace("\n", " ")))
      assert(ds == 200, dbb)
      val d = mapper.readTree(dbb)
      val recs = d.get("records")
      assert(recs.size() == 3, dbb)
      val levels = (0 until 3).map(recs.get)
        .map(n => n.get("span_span_id").asText() -> n.get("level").asLong())
        .toMap
      assert(levels == Map("a1" -> 0L, "b2" -> 1L, "c3" -> 2L))
      (0 until 3).map(recs.get).foreach { n =>
        assert(n.get("total_span_count").asLong() == 3)
        assert(n.get("has_error").asBoolean()
          == (n.get("span_span_id").asText() == "c3"))
      }

      // negatives: unknown trace 404, unknown dataset 404, bad limit 400,
      // RBAC denial 403 for bob
      assert(http("POST", s"$base/api/v1/services/traces/detail",
        basic("alice", "pw"), Some(
          s"""{"dataset": "apmtraces", "traceId": "zz",
             |"startTime": "10m", "endTime": "$end"}"""
            .stripMargin.replace("\n", " ")))._1 == 404)
      assert(http("POST", listUrl, basic("alice", "pw"), Some(
        s"""{"dataset": "nope", "startTime": "10m", "endTime": "$end"}"""))
        ._1 == 404)
      assert(http("POST", listUrl, basic("alice", "pw"),
        Some(listBody(""", "limit": 9999""")))._1 == 400)
      assert(http("POST", listUrl, basic("bob", "pw"),
        Some(listBody()))._1 == 403)
    } finally { srv.stop(); Rbac.clear() }
  }
}

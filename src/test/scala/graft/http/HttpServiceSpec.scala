package graft.http

import java.net.{HttpURLConnection, URL}
import java.nio.charset.StandardCharsets.UTF_8
import java.time.Instant
import java.time.format.DateTimeFormatter
import java.util.Base64

import com.fasterxml.jackson.databind.ObjectMapper

import graft.SparkSuite
import graft.query.Rbac

/** End-to-end HTTP integration: ingest over the wire, query over the wire,
  * NDJSON streaming, health probes, Basic-auth + RBAC gates.
  */
class HttpServiceSpec extends SparkSuite {

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

  private def futureIso: String =
    DateTimeFormatter.ISO_INSTANT.format(Instant.now().plusSeconds(600))

  test("ingest → query round trip over HTTP, JSON and NDJSON modes") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-http").toString
    val srv = new GraftHttpServer(spark, tmp)
    srv.start()
    try {
      val base = s"http://127.0.0.1:${srv.boundPort}/api/v1"

      assert(http("GET", s"$base/liveness")._1 == 200)
      assert(http("GET", s"$base/readiness")._1 == 200)

      val (s1, b1) = http("POST", s"$base/ingest",
        Map("X-P-Stream" -> "weblogs"),
        Some("""[{"level":"info","msg":"a","n":1},
                 {"level":"error","msg":"b","n":2}]"""))
      assert(s1 == 200, b1)
      assert(mapper.readTree(b1).get("events").asLong() == 2L)
      val (s2, _) = http("POST", s"$base/ingest",
        Map("X-P-Stream" -> "weblogs"),
        Some("""{"level":"error","msg":"c","n":3}"""))
      assert(s2 == 200)

      val q = mapper.createObjectNode()
        .put("query",
          "SELECT level, count(*) AS n FROM weblogs GROUP BY level ORDER BY level")
        .put("startTime", "10m").put("endTime", futureIso)
      val (qs, qb) = http("POST", s"$base/query", Map.empty,
        Some(mapper.writeValueAsString(q)))
      assert(qs == 200, qb)
      val arr = mapper.readTree(qb)
      assert(arr.isArray && arr.size() == 2)
      assert(arr.get(0).get("level").asText() == "error")
      assert(arr.get(0).get("n").asLong() == 2L)
      assert(arr.get(1).get("level").asText() == "info")
      assert(arr.get(1).get("n").asLong() == 1L)

      // NDJSON streaming mode: one JSON object per line
      val (ns, nb) = http("POST", s"$base/query",
        Map("Accept" -> "application/x-ndjson"),
        Some(mapper.writeValueAsString(q)))
      assert(ns == 200)
      val lines = nb.trim.split("\n")
      assert(lines.length == 2)
      assert(lines.forall(l => mapper.readTree(l).has("level")))

      // p_* enrichment columns are queryable (ingest actor metadata)
      val q2 = mapper.createObjectNode()
        .put("query",
          "SELECT count(*) AS n FROM weblogs WHERE p_format = 'json'")
        .put("startTime", "10m").put("endTime", futureIso)
      val (qs2, qb2) = http("POST", s"$base/query", Map.empty,
        Some(mapper.writeValueAsString(q2)))
      assert(qs2 == 200, qb2)
      assert(mapper.readTree(qb2).get(0).get("n").asLong() == 3L)

      // bad requests are 4xx, not connection drops
      assert(http("POST", s"$base/ingest", Map.empty, Some("{}"))._1 == 400)
      assert(http("POST", s"$base/query", Map.empty, Some("{}"))._1 == 400)
      assert(http("GET", s"$base/query")._1 == 405)

      // ?fields=true wraps records with the field-name list (reference
      // Query::from_request + QueryResponse with_fields)
      val (fs, fb) = http("POST", s"$base/query?fields=true", Map.empty,
        Some(mapper.writeValueAsString(q)))
      assert(fs == 200, fb)
      val fr = mapper.readTree(fb)
      assert((0 until fr.get("fields").size()).map(fr.get("fields").get(_)
        .asText()) == Seq("level", "n"))
      assert(fr.get("records").size() == 2)

      // sendNull: null-valued keys are omitted unless asked for
      val qn = mapper.createObjectNode()
        .put("query",
          "SELECT msg, CAST(NULL AS STRING) AS gone FROM weblogs LIMIT 1")
        .put("startTime", "10m").put("endTime", futureIso)
      val (ds, dbody) = http("POST", s"$base/query", Map.empty,
        Some(mapper.writeValueAsString(qn)))
      assert(ds == 200, dbody)
      assert(!mapper.readTree(dbody).get(0).has("gone"), dbody)
      val (ns2, nb2) = http("POST", s"$base/query?sendNull=true", Map.empty,
        Some(mapper.writeValueAsString(qn)))
      assert(ns2 == 200)
      assert(mapper.readTree(nb2).get(0).has("gone") &&
        mapper.readTree(nb2).get(0).get("gone").isNull, nb2)

      // ?streaming=true&fields=true: NDJSON with a fields first chunk
      val (ss2, sb2) = http("POST",
        s"$base/query?streaming=true&fields=true", Map.empty,
        Some(mapper.writeValueAsString(q)))
      assert(ss2 == 200)
      val slines = sb2.trim.split("\n")
      assert(slines.length == 3, sb2)
      assert(mapper.readTree(slines(0)).has("fields"), sb2)
      assert(mapper.readTree(slines(1)).has("level"), sb2)
    } finally srv.stop()
  }

  test("Basic auth + RBAC: 401 bad creds, 403 unauthorized stream, 200 granted") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-http-auth").toString
    Rbac.clear()
    Rbac.grant("alice", Seq(Rbac.Writer(Some("applogs"))))
    Rbac.grant("bob", Seq(Rbac.Reader(Some("otherstream"))))
    val srv = new GraftHttpServer(spark, tmp, requireAuth = true,
      users = Map("alice" -> "pw-a", "bob" -> "pw-b"))
    srv.start()
    try {
      val base = s"http://127.0.0.1:${srv.boundPort}/api/v1"
      val payload = Some("""{"level":"info","msg":"x"}""")

      // no/bad credentials
      assert(http("POST", s"$base/ingest",
        Map("X-P-Stream" -> "applogs"), payload)._1 == 401)
      assert(http("POST", s"$base/ingest",
        Map("X-P-Stream" -> "applogs") ++ basic("alice", "wrong"),
        payload)._1 == 401)

      // bob may not ingest applogs; alice may
      assert(http("POST", s"$base/ingest",
        Map("X-P-Stream" -> "applogs") ++ basic("bob", "pw-b"),
        payload)._1 == 403)
      val (as, ab) = http("POST", s"$base/ingest",
        Map("X-P-Stream" -> "applogs") ++ basic("alice", "pw-a"), payload)
      assert(as == 200, ab)

      val q = mapper.createObjectNode()
        .put("query", "SELECT count(*) AS n FROM applogs")
        .put("startTime", "10m").put("endTime", futureIso)
      val qjson = Some(mapper.writeValueAsString(q))

      // bob cannot query applogs; alice can
      assert(http("POST", s"$base/query", basic("bob", "pw-b"),
        qjson)._1 == 403)
      val (qs, qb) = http("POST", s"$base/query", basic("alice", "pw-a"), qjson)
      assert(qs == 200, qb)
      assert(mapper.readTree(qb).get(0).get("n").asLong() == 1L)
    } finally { srv.stop(); Rbac.clear() }
  }
}

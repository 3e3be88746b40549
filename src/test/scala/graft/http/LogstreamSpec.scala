package graft.http

import java.net.{HttpURLConnection, URL}
import java.nio.charset.StandardCharsets.UTF_8
import java.time.Instant
import java.time.format.DateTimeFormatter
import java.util.Base64

import com.fasterxml.jackson.databind.ObjectMapper

import graft.SparkSuite
import graft.query.Rbac

/** Stream-management surface over the wire: create/list/schema/stats,
  * retention config CRUD with validation, retention enforcement dropping
  * aged date partitions, stream deletion, and the RBAC gates on each.
  */
class LogstreamSpec extends SparkSuite {

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

  private def futureIso: String =
    DateTimeFormatter.ISO_INSTANT.format(Instant.now().plusSeconds(600))

  test("stream lifecycle: create, list, schema, stats, retention, delete") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-ls").toString
    val srv = new GraftHttpServer(spark, tmp)
    srv.start()
    val base = s"http://127.0.0.1:${srv.boundPort}/api/v1"
    try {
      // create + list
      assert(http("PUT", s"$base/logstream/applogs")._1 == 200)
      val (_, listed) = http("GET", s"$base/logstream")
      assert(mapper.readTree(listed).toString.contains("applogs"))

      // ingest one event so schema/stats have substance
      val (si, _) = http("POST", s"$base/ingest",
        Map("X-P-Stream" -> "applogs"),
        Some("""{"level": "info", "msg": "hello", "code": 7}"""))
      assert(si == 200)

      val (ss, schemaJson) = http("GET", s"$base/logstream/applogs/schema")
      assert(ss == 200)
      assert(schemaJson.contains("msg") && schemaJson.contains("p_timestamp"))

      val (ts, statsJson) = http("GET", s"$base/logstream/applogs/stats")
      assert(ts == 200, statsJson)
      val stats = mapper.readTree(statsJson)
      assert(stats.get("ingestion").get("count").asLong() == 1L)
      assert(stats.get("storage").get("size").asLong() > 0L)

      // retention config: validation, round trip
      assert(http("PUT", s"$base/logstream/applogs/retention",
        body = Some("""[{"duration": "30"}]"""))._1 == 400)
      assert(http("PUT", s"$base/logstream/applogs/retention",
        body = Some(
          """[{"description": "wk", "action": "delete",
            |"duration": "7d"}]""".stripMargin.replace("\n", " ")))._1 == 200)
      val (_, ret) = http("GET", s"$base/logstream/applogs/retention")
      assert(mapper.readTree(ret).get(0).get("duration").asText() == "7d")

      // age in a partition: copy the ingested leaf into an old date dir
      // (same leaf schema, same date=/hour=/minute= depth)
      val dir = s"$tmp/applogs"
      spark.read.parquet(dir).drop("date", "hour", "minute")
        .write.parquet(s"$dir/date=2020-01-01/hour=00/minute=00")
      assert(mapper.readTree(
        http("GET", s"$base/logstream/applogs/stats")._2)
        .get("ingestion").get("count").asLong() == 2L)

      // enforcement drops exactly the expired partition
      val (cs, cb) =
        http("POST", s"$base/logstream/applogs/retention/cleanup")
      assert(cs == 200, cb)
      val removed = mapper.readTree(cb).get("removed")
      assert(removed.size() == 1)
      assert(removed.get(0).asText() == "date=2020-01-01")

      // recent data still queryable after cleanup
      val (qs, qb) = http("POST", s"$base/query",
        body = Some(s"""{"query": "SELECT msg FROM applogs",
                       |"startTime": "10m", "endTime": "$futureIso"}"""
          .stripMargin.replace("\n", "")))
      assert(qs == 200 && qb.contains("hello"))

      // delete: gone from listing, stats 404, storage removed
      assert(http("DELETE", s"$base/logstream/applogs")._1 == 200)
      assert(!http("GET", s"$base/logstream")._2.contains("applogs"))
      assert(http("GET", s"$base/logstream/applogs/stats")._1 == 404)
      assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(dir)))
    } finally srv.stop()
  }

  test("schema detect and hot-tier endpoints") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-ls3").toString
    val srv = new GraftHttpServer(spark, tmp)
    srv.start()
    val base = s"http://127.0.0.1:${srv.boundPort}/api/v1"
    try {
      // detect: nested JSON flattens, types inferred, nothing is created
      val (ds, dj) = http("POST", s"$base/logstream/schema/detect",
        body = Some("""{"a": {"b": 1.5}, "tags": ["x"], "ok": true}"""))
      assert(ds == 200, dj)
      assert(dj.contains("a.b") && dj.contains("double"))
      assert(http("GET", s"$base/logstream")._2 == "[]")
      assert(http("POST", s"$base/logstream/schema/detect",
        body = Some("not json"))._1 == 400)

      // hot tier: configure, inspect, disable
      assert(http("PUT", s"$base/logstream/applogs/hottier",
        body = Some("{}"))._1 == 404) // stream doesn't exist yet
      assert(http("PUT", s"$base/logstream/applogs")._1 == 200)
      val (hs0, _) = http("GET", s"$base/logstream/applogs/hottier")
      assert(hs0 == 404) // not configured yet
      http("POST", s"$base/ingest", Map("X-P-Stream" -> "applogs"),
        Some("""{"msg": "warm me"}"""))
      val (hs, hb) = http("PUT", s"$base/logstream/applogs/hottier",
        body = Some("""{"keep_dates": 2}"""))
      assert(hs == 200, hb)
      val put = mapper.readTree(hb)
      assert(put.get("keep_dates").asInt() == 2)
      assert(put.get("pinned").size() == 1) // only today's partition exists
      val (gs, gb) = http("GET", s"$base/logstream/applogs/hottier")
      assert(gs == 200)
      assert(mapper.readTree(gb).get("keep_dates").asInt() == 2)
      assert(http("DELETE", s"$base/logstream/applogs/hottier")._1 == 200)
      assert(http("GET", s"$base/logstream/applogs/hottier")._1 == 404)
      assert(http("DELETE", s"$base/logstream/applogs/hottier")._1 == 404)
    } finally { srv.stop(); graft.catalog.HotTier.clear() }
  }

  test("stream management RBAC gates") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-ls2").toString
    Rbac.clear()
    Rbac.grant("root", Seq(Rbac.Admin()))
    Rbac.grant("writer", Seq(Rbac.Writer(Some("applogs"))))
    Rbac.grant("outsider", Seq(Rbac.Reader(Some("otherstream"))))
    val srv = new GraftHttpServer(spark, tmp, requireAuth = true,
      users = Map("root" -> "pw", "writer" -> "pw", "outsider" -> "pw"))
    srv.start()
    val base = s"http://127.0.0.1:${srv.boundPort}/api/v1"
    def basic(u: String): Map[String, String] =
      Map("Authorization" -> ("Basic " + Base64.getEncoder
        .encodeToString(s"$u:pw".getBytes(UTF_8))))
    try {
      // writer (ingest privilege on applogs) can create it; outsider cannot
      assert(http("PUT", s"$base/logstream/applogs",
        basic("outsider"))._1 == 403)
      assert(http("PUT", s"$base/logstream/applogs",
        basic("writer"))._1 == 200)

      // listing is filtered by query access
      assert(http("GET", s"$base/logstream", basic("writer"))._2
        .contains("applogs"))
      assert(!http("GET", s"$base/logstream", basic("outsider"))._2
        .contains("applogs"))

      // retention config + deletion are admin-only
      val cfg = Some("""[{"duration": "7d"}]""")
      assert(http("PUT", s"$base/logstream/applogs/retention",
        basic("writer"), cfg)._1 == 403)
      assert(http("PUT", s"$base/logstream/applogs/retention",
        basic("root"), cfg)._1 == 200)
      assert(http("POST", s"$base/logstream/applogs/retention/cleanup",
        basic("writer"))._1 == 403)
      assert(http("DELETE", s"$base/logstream/applogs",
        basic("writer"))._1 == 403)
      assert(http("DELETE", s"$base/logstream/applogs",
        basic("root"))._1 == 200)
    } finally { srv.stop(); Rbac.clear() }
  }
}

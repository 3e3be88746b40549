package graft.http

import java.net.{HttpURLConnection, InetSocketAddress, URL}
import java.nio.charset.StandardCharsets.UTF_8

import scala.collection.mutable

import com.fasterxml.jackson.databind.ObjectMapper
import com.sun.net.httpserver.HttpServer

import graft.SparkSuite
import graft.query.Rbac

/** Alerts + notification-targets over the wire (reference
  * `handlers/http/alerts.rs` / `targets.rs`): target CRUD with in-use
  * delete refusal, alert CRUD with validation, evaluate_alert through the
  * state machine, webhook/slack delivery with suppression and resolution,
  * disable/enable, and the admin/editor mutation gate.
  */
class AlertsHttpSpec extends SparkSuite {

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

  /** Local notification sink recording (contentType, body) pairs. */
  private def sinkServer(): (HttpServer, mutable.Buffer[(String, String)]) = {
    val received = mutable.Buffer.empty[(String, String)]
    val sink = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    sink.createContext("/notify", ex => {
      val body = new String(ex.getRequestBody.readAllBytes(), UTF_8)
      received.synchronized {
        received += ((Option(ex.getRequestHeaders.getFirst("Content-Type"))
          .getOrElse(""), body))
      }
      ex.sendResponseHeaders(200, -1)
      ex.close()
    })
    sink.start()
    (sink, received)
  }

  test("target CRUD, alert lifecycle, webhook delivery round trip") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-alerts").toString
    val srv = new GraftHttpServer(spark, tmp)
    srv.start()
    val base = s"http://127.0.0.1:${srv.boundPort}/api/v1"
    val (sink, received) = sinkServer()
    val sinkUrl = s"http://127.0.0.1:${sink.getAddress.getPort}/notify"
    try {
      // ---- target CRUD
      assert(http("POST", s"$base/targets",
        body = Some("""{"name": "t", "type": "nope", "endpoint": "x"}"""))._1
        == 400)
      val (ts, tb) = http("POST", s"$base/targets", body = Some(
        s"""{"name": "ops", "type": "webhook", "endpoint": "$sinkUrl"}"""))
      assert(ts == 200, tb)
      val targetId = mapper.readTree(tb).get("id").asText()
      assert(http("GET", s"$base/targets/$targetId")._1 == 200)
      assert(http("GET", s"$base/targets/missing")._1 == 404)
      val (ls, lb) = http("GET", s"$base/targets")
      assert(ls == 200 && mapper.readTree(lb).size() == 1)

      // ---- alert validation
      assert(http("POST", s"$base/alerts", body = Some(
        """{"title": "x", "stream": "s", "agg": "median", "column": "c",
          |"operator": "above", "threshold": 1}""".stripMargin))._1 == 400)
      assert(http("POST", s"$base/alerts", body = Some(
        """{"title": "x", "stream": "s", "agg": "avg", "column": "c",
          |"operator": "sideways", "threshold": 1}""".stripMargin))._1 == 400)
      assert(http("POST", s"$base/alerts", body = Some(
        """{"title": "x", "stream": "s", "agg": "avg", "column": "c",
          |"operator": "above", "threshold": 1,
          |"targets": ["missing"]}""".stripMargin))._1 == 400)
      assert(http("POST", s"$base/alerts", body = Some(
        """{"title": "x", "stream": "s", "agg": "avg", "column": "c",
          |"operator": "above", "threshold": 1,
          |"where": {"column": "c", "op": "resembles", "value": "v"}}"""
          .stripMargin))._1 == 400)

      // ---- data: error codes averaging 10
      assert(http("PUT", s"$base/logstream/applogs")._1 == 200)
      Seq(8, 10, 12).foreach(c =>
        assert(http("POST", s"$base/ingest",
          Map("X-P-Stream" -> "applogs"),
          Some(s"""{"level": "error", "code": $c}"""))._1 == 200))

      // ---- create + evaluate: avg(code) = 10 > 5 → Triggered, delivered
      val (as, ab) = http("POST", s"$base/alerts", body = Some(
        s"""{"title": "high codes", "severity": "high",
           |"stream": "applogs", "agg": "avg", "column": "code",
           |"operator": "above", "threshold": 5,
           |"where": {"and": [{"column": "level", "op": "=",
           |                   "value": "error"}]},
           |"targets": ["$targetId"], "tags": ["infra"]}""".stripMargin))
      assert(as == 200, ab)
      val alertId = mapper.readTree(ab).get("id").asText()

      val (es, eb) = http("PUT", s"$base/alerts/$alertId/evaluate_alert")
      assert(es == 200, eb)
      val ev = mapper.readTree(eb)
      assert(ev.get("state").asText() == "triggered")
      assert(ev.get("results").get(0).get("value").asDouble() == 10.0)
      assert(ev.get("results").get(0).get("triggered").asBoolean())
      assert(received.synchronized(received.size) == 1)
      assert(received.head._1.startsWith("text/plain"))
      assert(received.head._2.contains("Avg(code)") &&
        received.head._2.contains("10.0"))

      // list shows the live state; tags filter works
      val (_, sum1) = http("GET", s"$base/alerts")
      assert(mapper.readTree(sum1).get(0).get("state").asText() == "triggered")
      assert(mapper.readTree(
        http("GET", s"$base/alerts?tags=infra")._2).size() == 1)
      assert(mapper.readTree(
        http("GET", s"$base/alerts?tags=other")._2).size() == 0)

      // still triggered → notify suppressed inside the repeat window
      assert(http("PUT", s"$base/alerts/$alertId/evaluate_alert")._1 == 200)
      assert(received.synchronized(received.size) == 1)

      // ---- raise the threshold → resolution notification
      val (us, ub) = http("PUT", s"$base/alerts/$alertId", body = Some(
        s"""{"title": "high codes", "stream": "applogs", "agg": "avg",
           |"column": "code", "operator": "above", "threshold": 99999,
           |"targets": ["$targetId"]}""".stripMargin))
      assert(us == 200, ub)
      val (rs, rb) = http("PUT", s"$base/alerts/$alertId/evaluate_alert")
      assert(rs == 200 && mapper.readTree(rb).get("state").asText()
        == "not-triggered", rb)
      assert(received.synchronized(received.size) == 2)
      assert(received.last._2.contains("is now resolved"))

      // ---- disable: no evaluation, no delivery; enable restores
      assert(http("PUT", s"$base/alerts/$alertId/disable")._1 == 200)
      val (ds, db) = http("PUT", s"$base/alerts/$alertId/evaluate_alert")
      assert(ds == 200 && mapper.readTree(db).get("state").asText()
        == "disabled")
      assert(received.synchronized(received.size) == 2)
      val (gs, gb) = http("GET", s"$base/alerts/$alertId")
      assert(gs == 200 &&
        mapper.readTree(gb).get("state").asText() == "disabled")
      assert(http("PUT", s"$base/alerts/$alertId/enable")._1 == 200)

      // ---- referenced target cannot be deleted; alert delete frees it
      assert(http("DELETE", s"$base/targets/$targetId")._1 == 409)
      assert(http("DELETE", s"$base/alerts/$alertId")._1 == 200)
      assert(http("DELETE", s"$base/alerts/$alertId")._1 == 404)
      assert(http("DELETE", s"$base/targets/$targetId")._1 == 200)
    } finally { srv.stop(); sink.stop(0) }
  }

  test("slack payload shape") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-alerts2").toString
    val srv = new GraftHttpServer(spark, tmp)
    srv.start()
    val base = s"http://127.0.0.1:${srv.boundPort}/api/v1"
    val (sink, received) = sinkServer()
    val sinkUrl = s"http://127.0.0.1:${sink.getAddress.getPort}/notify"
    try {
      assert(http("PUT", s"$base/logstream/s1")._1 == 200)
      assert(http("POST", s"$base/ingest", Map("X-P-Stream" -> "s1"),
        Some("""{"v": 3}"""))._1 == 200)
      val tid = mapper.readTree(http("POST", s"$base/targets", body = Some(
        s"""{"name": "sl", "type": "slack", "endpoint": "$sinkUrl"}"""))._2)
        .get("id").asText()
      val aid = mapper.readTree(http("POST", s"$base/alerts", body = Some(
        s"""{"title": "v", "stream": "s1", "agg": "max", "column": "v",
           |"operator": "above", "threshold": 0,
           |"targets": ["$tid"]}""".stripMargin))._2).get("id").asText()
      assert(http("PUT", s"$base/alerts/$aid/evaluate_alert")._1 == 200)
      assert(received.synchronized(received.size) == 1)
      assert(received.head._1.startsWith("application/json"))
      val payload = mapper.readTree(received.head._2)
      assert(payload.get("text").asText().contains("Max(v)"))
    } finally { srv.stop(); sink.stop(0) }
  }

  test("SSE stream delivers alert trigger events") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-sse").toString
    val srv = new GraftHttpServer(spark, tmp)
    srv.start()
    val base = s"http://127.0.0.1:${srv.boundPort}/api/v1"
    try {
      assert(http("PUT", s"$base/logstream/s")._1 == 200)
      assert(http("POST", s"$base/ingest", Map("X-P-Stream" -> "s"),
        Some("""{"v": 9}"""))._1 == 200)
      val aid = mapper.readTree(http("POST", s"$base/alerts", body = Some(
        """{"title": "sse alert", "stream": "s", "agg": "max",
          |"column": "v", "operator": "above",
          |"threshold": 1}""".stripMargin))._2).get("id").asText()

      // subscribe, then trigger; the event must arrive as a data: frame
      val conn = new URL(s"$base/sse").openConnection()
        .asInstanceOf[HttpURLConnection]
      conn.setReadTimeout(15000)
      val reader = new java.io.BufferedReader(
        new java.io.InputStreamReader(conn.getInputStream, UTF_8))
      assert(conn.getContentType.startsWith("text/event-stream"))
      val got = new java.util.concurrent.LinkedBlockingQueue[String]()
      val t = new Thread(() => {
        try {
          var line = reader.readLine()
          while (line != null && !line.startsWith("data: ")) {
            line = reader.readLine() // skip keep-alive comments
          }
          if (line != null) got.offer(line.stripPrefix("data: "))
          ()
        } catch { case _: Exception => () }
      })
      t.start()
      Thread.sleep(300) // let the subscription land before the trigger
      assert(http("PUT", s"$base/alerts/$aid/evaluate_alert")._1 == 200)
      val frame = got.poll(10, java.util.concurrent.TimeUnit.SECONDS)
      assert(frame != null, "no SSE frame arrived")
      val event = mapper.readTree(frame)
      assert(event.get("criticality").asText() == "error")
      val info = event.get("message").get("alertEvent")
      assert(info.get("id").asText() == aid)
      assert(info.get("state").asText() == "triggered")
      assert(info.get("name").asText() == "sse alert")
      conn.disconnect()
      t.join(2000)
    } finally srv.stop()
  }

  test("mutations require admin or editor; reads do not") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-alerts3").toString
    Rbac.clear()
    Rbac.grant("boss", Seq(Rbac.Admin()))
    Rbac.grant("eve", Seq(Rbac.Editor()))
    Rbac.grant("ro", Seq(Rbac.Reader(None)))
    val srv = new GraftHttpServer(spark, tmp, requireAuth = true,
      users = Map("boss" -> "pw", "eve" -> "pw", "ro" -> "pw"))
    srv.start()
    val base = s"http://127.0.0.1:${srv.boundPort}/api/v1"
    def auth(u: String) = Map("Authorization" -> ("Basic " +
      java.util.Base64.getEncoder.encodeToString(s"$u:pw".getBytes(UTF_8))))
    try {
      assert(http("GET", s"$base/alerts")._1 == 401) // unauthenticated
      assert(http("GET", s"$base/alerts", auth("ro"))._1 == 200)
      assert(http("GET", s"$base/targets", auth("ro"))._1 == 200)
      val target = """{"name": "t", "type": "webhook",
                     |"endpoint": "http://127.0.0.1:9/x"}""".stripMargin
      assert(http("POST", s"$base/targets", auth("ro"),
        Some(target))._1 == 403)
      assert(http("POST", s"$base/targets", auth("eve"),
        Some(target))._1 == 200)
      val alert = """{"title": "a", "stream": "s", "agg": "count",
                    |"column": "c", "operator": "above",
                    |"threshold": 1}""".stripMargin
      assert(http("POST", s"$base/alerts", auth("ro"), Some(alert))._1 == 403)
      val (cs, cb) = http("POST", s"$base/alerts", auth("boss"), Some(alert))
      assert(cs == 200, cb)
      val id = mapper.readTree(cb).get("id").asText()
      assert(http("PUT", s"$base/alerts/$id/disable", auth("ro"))._1 == 403)
      assert(http("DELETE", s"$base/alerts/$id", auth("eve"))._1 == 200)
    } finally { srv.stop(); Rbac.clear() }
  }
}

package graft.http

import java.net.{HttpURLConnection, URL}
import java.nio.charset.StandardCharsets.UTF_8

import graft.SparkSuite

/** SQL execution timeout over the wire (reference `P_SQL_TIMEOUT`): a
  * query outliving the deadline is job-group-cancelled and answered 504;
  * queries inside the deadline are untouched — and the server stays
  * healthy for the next query after a cancellation.
  */
class QueryTimeoutSpec extends SparkSuite {

  private def http(method: String, url: String,
                   headers: Map[String, String] = Map.empty,
                   body: Option[String] = None): (Int, String) = {
    val conn = new URL(url).openConnection().asInstanceOf[HttpURLConnection]
    conn.setRequestMethod(method)
    conn.setReadTimeout(120000)
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

  test("slow query 504s at the deadline; fast queries unaffected after") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-qt").toString
    val srv = new GraftHttpServer(spark, tmp, sqlTimeoutSeconds = 2)
    srv.start()
    val base = s"http://127.0.0.1:${srv.boundPort}/api/v1"
    try {
      assert(http("POST", s"$base/ingest", Map("X-P-Stream" -> "qt"),
        Some("""[{"v":1},{"v":2},{"v":3}]"""))._1 == 200)
      val futureIso = java.time.format.DateTimeFormatter.ISO_INSTANT
        .format(java.time.Instant.now().plusSeconds(600))
      def q(sql: String) = http("POST", s"$base/query", Map.empty, Some(
        s"""{"query": ${com.fasterxml.jackson.databind.node.JsonNodeFactory
          .instance.textNode(sql).toString},
           |"startTime": "10m", "endTime": "$futureIso"}""".stripMargin))
      // per-row 3s sleep × 3 rows blows the 2s deadline
      val t0 = System.nanoTime()
      val (slow, slowBody) = q(
        "SELECT java_method('java.lang.Thread', 'sleep', 3000L) AS z FROM qt")
      val sec = (System.nanoTime() - t0) / 1e9
      assert(slow == 504, s"$slow: $slowBody")
      assert(slowBody.contains("timed out"), slowBody)
      assert(sec < 60, s"cancellation took ${sec}s") // not run-to-completion
      // the next (fast) query answers normally — no poisoned session state
      val (ok, okBody) = q("SELECT count(*) AS n FROM qt")
      assert(ok == 200 && okBody.contains("3"), s"$ok: $okBody")
    } finally srv.stop()
  }
}

package graft.http

import java.net.{HttpURLConnection, URL}
import java.nio.charset.StandardCharsets.UTF_8
import java.time.Instant

import com.fasterxml.jackson.databind.ObjectMapper

import graft.SparkSuite

/** The console's histogram strip (`POST /counts`, reference
  * `query::get_counts`) and around-an-anchor log paging
  * (`POST /query/context`, reference `query_context.rs`) over the wire.
  */
class CountsContextSpec extends SparkSuite {

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

  test("counts: dense bins, conditions filter, validation") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-counts").toString
    val srv = new GraftHttpServer(spark, tmp)
    srv.start()
    val base = s"http://127.0.0.1:${srv.boundPort}/api/v1"
    try {
      assert(http("PUT", s"$base/logstream/ev")._1 == 200)
      // 5 events now (3 error / 2 info); all land in the final bins
      Seq("error", "error", "error", "info", "info").foreach(l =>
        assert(http("POST", s"$base/ingest", Map("X-P-Stream" -> "ev"),
          Some(s"""{"level": "$l"}"""))._1 == 200))

      // "now" truncates to the minute (reference parse_human_time), which
      // would exclude events ingested this minute — use an explicit end
      val end = Instant.now().plusSeconds(120).toString
      def counts(extra: String = ""): (Int, String) =
        http("POST", s"$base/counts", body = Some(
          s"""{"stream": "ev", "startTime": "10m", "endTime": "$end",
             |"numBins": 10$extra}""".stripMargin))

      // ingest maintained the stream's stats catalog → the conditionless
      // request below goes through the manifest bin-density fast path
      assert(new java.io.File(s"$tmp/.stats/ev").isDirectory)
      val (cs, cb) = counts()
      assert(cs == 200, cb)
      val node = mapper.readTree(cb)
      assert(node.get("fields").get(2).asText() == "count")
      val records = node.get("records")
      assert(records.size() == 10) // dense: every bin present
      var total = 0L
      records.forEach(r => total += r.get("count").asLong())
      assert(total == 5, cb)
      // bins tile the range contiguously
      assert(records.get(0).get("end_time").asText()
        == records.get(1).get("start_time").asText())

      // conditions narrow the count (the alert where-tree shape)
      val (fs, fb) = counts(
        """, "conditions": {"column": "level", "op": "=",
          |"value": "error"}""".stripMargin)
      assert(fs == 200, fb)
      var errTotal = 0L
      mapper.readTree(fb).get("records")
        .forEach(r => errTotal += r.get("count").asLong())
      assert(errTotal == 3, fb)

      // validation
      assert(counts(""", "conditions": {"column": "l", "op": "~"}""")._1
        == 400)
      assert(http("POST", s"$base/counts", body = Some(
        """{"stream": "nope", "startTime": "10m",
          |"endTime": "now"}""".stripMargin))._1 == 404)
      assert(http("POST", s"$base/counts", body = Some(
        """{"stream": "ev"}"""))._1 == 400)
      assert(http("POST", s"$base/counts", body = Some(
        """{"stream": "ev", "startTime": "10m", "endTime": "now",
          |"numBins": 0}""".stripMargin))._1 == 400)
      // an empty stream still answers: all-zero dense bins
      assert(http("PUT", s"$base/logstream/empty")._1 == 200)
      val (zs, zb) = http("POST", s"$base/counts", body = Some(
        """{"stream": "empty", "startTime": "10m", "endTime": "now",
          |"numBins": 3}""".stripMargin))
      assert(zs == 200, zb)
      var zero = 0L
      mapper.readTree(zb).get("records").forEach(r =>
        zero += r.get("count").asLong())
      assert(zero == 0)
    } finally srv.stop()
  }

  test("bare COUNT(*) answers from the manifest with the executed shape") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-cnt").toString
    val srv = new GraftHttpServer(spark, tmp)
    srv.start()
    val base = s"http://127.0.0.1:${srv.boundPort}/api/v1"
    try {
      assert(http("PUT", s"$base/logstream/cs")._1 == 200)
      (1 to 4).foreach(i =>
        assert(http("POST", s"$base/ingest", Map("X-P-Stream" -> "cs"),
          Some(s"""{"v": $i}"""))._1 == 200))
      assert(new java.io.File(s"$tmp/.stats/cs").isDirectory) // fast path on
      val end = Instant.now().plusSeconds(120).toString
      def q(sql: String): String = http("POST", s"$base/query", body = Some(
        s"""{"query": "$sql", "startTime": "10m",
           |"endTime": "$end"}""".stripMargin))._2
      // same column name as real execution, aliased and not
      assert(mapper.readTree(q("SELECT COUNT(*) FROM cs"))
        .get(0).get("count(1)").asLong() == 4L)
      assert(mapper.readTree(q("SELECT COUNT(*) AS n FROM cs"))
        .get(0).get("n").asLong() == 4L)
      // a window before the data → zero, not an error
      val old = http("POST", s"$base/query", body = Some(
        """{"query": "SELECT COUNT(*) FROM cs", "startTime": "60m",
          |"endTime": "30m"}""".stripMargin))._2
      assert(mapper.readTree(old).get(0).get("count(1)").asLong() == 0L)
      // non-bare shapes still execute normally
      assert(mapper.readTree(q("SELECT COUNT(*) FROM cs WHERE v > 2"))
        .get(0).get("count(1)").asLong() == 2L)
    } finally srv.stop()
  }

  test("query/context: anchored page, ordering, window clipping") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-ctx").toString
    val srv = new GraftHttpServer(spark, tmp)
    srv.start()
    val base = s"http://127.0.0.1:${srv.boundPort}/api/v1"
    try {
      assert(http("PUT", s"$base/logstream/lg")._1 == 200)
      (1 to 9).foreach(i =>
        assert(http("POST", s"$base/ingest", Map("X-P-Stream" -> "lg"),
          Some(s"""{"seq": $i}"""))._1 == 200))
      // anchor "now": every ingested row sits within the window, at or
      // before the anchor
      val anchor = Instant.now().plusSeconds(1).toString
      val (s1, b1) = http("POST", s"$base/query/context", body = Some(
        s"""{"dataset": "lg", "pTimestamp": "$anchor",
           |"contextWindow": "5m", "pageSize": 6}""".stripMargin))
      assert(s1 == 200, b1)
      val r1 = mapper.readTree(b1)
      assert(r1.get("scope").asText() == "contextWindow")
      assert(r1.get("limit").asInt() == 6)
      // all rows are before the anchor → the before-half (3 newest)
      assert(r1.get("anchorIndex").asInt() == 3)
      assert(r1.get("records").size() == 3)
      // oldest-first within the page: the 3 NEWEST rows ascending = 7,8,9
      val seqs = (0 until 3).map(i =>
        r1.get("records").get(i).get("seq").asLong())
      assert(seqs == Seq(7L, 8L, 9L), b1)

      // anchor far in the past: nothing inside the window
      val old = Instant.now().minusSeconds(3600).toString
      val (s2, b2) = http("POST", s"$base/query/context", body = Some(
        s"""{"dataset": "lg", "pTimestamp": "$old",
           |"contextWindow": "1m"}""".stripMargin))
      assert(s2 == 200, b2)
      assert(mapper.readTree(b2).get("records").size() == 0)

      // validation
      assert(http("POST", s"$base/query/context", body = Some(
        """{"dataset": "lg"}"""))._1 == 400)
      assert(http("POST", s"$base/query/context", body = Some(
        s"""{"dataset": "lg", "pTimestamp": "yesterday-ish"}"""))._1 == 400)
      assert(http("POST", s"$base/query/context", body = Some(
        s"""{"dataset": "lg", "pTimestamp": "$anchor",
           |"contextWindow": "fortnight"}""".stripMargin))._1 == 400)
      assert(http("POST", s"$base/query/context", body = Some(
        s"""{"dataset": "none", "pTimestamp": "$anchor"}"""))._1 == 404)
    } finally srv.stop()
  }
}

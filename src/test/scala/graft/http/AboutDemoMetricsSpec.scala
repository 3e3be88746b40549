package graft.http

import java.net.{HttpURLConnection, URL}
import java.nio.charset.StandardCharsets.UTF_8

import com.fasterxml.jackson.databind.ObjectMapper

import graft.SparkSuite

/** Console/ops surface: `/about` instance metadata (stable deploymentId),
  * `/demodata` seeding (deterministic ingest + sample saved objects), and
  * the `/metrics` Prometheus exposition.
  */
class AboutDemoMetricsSpec extends SparkSuite {

  private val mapper = new ObjectMapper()

  private def http(method: String, url: String,
                   headers: Map[String, String] = Map.empty): (Int, String) = {
    val conn = new URL(url).openConnection().asInstanceOf[HttpURLConnection]
    conn.setRequestMethod(method)
    headers.foreach { case (k, v) => conn.setRequestProperty(k, v) }
    val status = conn.getResponseCode
    val stream =
      if (status < 400) conn.getInputStream else conn.getErrorStream
    val text =
      if (stream == null) ""
      else try new String(stream.readAllBytes(), UTF_8) finally stream.close()
    conn.disconnect()
    (status, text)
  }

  test("about, demodata, metrics") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-about").toString
    val srv = new GraftHttpServer(spark, tmp)
    srv.start()
    val base = s"http://127.0.0.1:${srv.boundPort}/api/v1"
    try {
      // ---- about: metadata + deploymentId persisted in the root
      val (as, ab) = http("GET", s"$base/about")
      assert(as == 200, ab)
      val about = mapper.readTree(ab)
      assert(about.get("version").asText() == GraftHttpServer.Version)
      assert(about.get("mode").asText() == "all")
      assert(!about.get("oidcActive").asBoolean())
      assert(about.get("store").get("path").asText() == tmp)
      val dep = about.get("deploymentId").asText()
      assert(dep.nonEmpty)
      // a second server over the same root reports the SAME deployment id
      val srv2 = new GraftHttpServer(spark, tmp)
      srv2.start()
      try {
        val again = mapper.readTree(http("GET",
          s"http://127.0.0.1:${srv2.boundPort}/api/v1/about")._2)
        assert(again.get("deploymentId").asText() == dep)
      } finally srv2.stop()

      // ---- demodata
      assert(http("GET", s"$base/demodata")._1 == 400)
      assert(http("GET", s"$base/demodata?action=selfdestruct")._1 == 400)
      val (ds, db) = http("GET", s"$base/demodata?action=ingest")
      assert(ds == 200, db)
      assert(mapper.readTree(db).get("events").asLong() == 200)
      // the demo stream is queryable like any other
      val listed = http("GET", s"$base/logstream")._2
      assert(listed.contains("demodata"))
      val (fs, fb) = http("GET", s"$base/demodata?action=filters")
      assert(fs == 200 && mapper.readTree(fb).get("filter_id") != null, fb)
      val (hs, hb) = http("GET", s"$base/demodata?action=dashboards")
      assert(hs == 200 && mapper.readTree(hb).get("dashboardId") != null, hb)
      val (als, alb) = http("GET", s"$base/demodata?action=alerts")
      assert(als == 200 && mapper.readTree(alb).get("id") != null, alb)

      // ---- metrics: prometheus text with the ingest counted
      val (ms, mb) = http("GET", s"$base/metrics")
      assert(ms == 200)
      assert(mb.contains("# TYPE graft_ingested_events_total counter"))
      val events = mb.linesIterator
        .find(_.startsWith("graft_ingested_events_total "))
        .map(_.split(" ").last.toLong)
      assert(events.contains(200L), mb)
      assert(mb.contains("graft_uptime_seconds"))
      val streams = mb.linesIterator.find(_.startsWith("graft_streams "))
        .map(_.split(" ").last.toInt)
      assert(streams.exists(_ >= 1), mb)

      // ---- per-stream labeled series (reference EVENTS_INGESTED vecs):
      // the demo ingest's stream carries its event count and positive
      // payload + storage bytes
      val streamLine = mb.linesIterator
        .find(_.startsWith("graft_stream_events_ingested_total{"))
      assert(streamLine.exists(_.split(" ").last.toLong == 200L), mb)
      assert(mb.linesIterator
        .find(_.startsWith("graft_stream_ingested_bytes_total{"))
        .exists(_.split(" ").last.toLong > 0L), mb)
      assert(mb.linesIterator
        .find(_.startsWith("graft_stream_storage_bytes{"))
        .exists(_.split(" ").last.toLong > 0L), mb)

      // ---- query latency histogram: cumulative buckets, count == +Inf
      // NOT a bare COUNT(*): that answers from the manifest fast path
      // BEFORE the timed SQL envelope and would never hit the histogram
      val q = mapper.createObjectNode()
        .put("query", "SELECT * FROM " +
          streamLine.get.split("\"")(1) + " LIMIT 5")
        .put("startTime", "10m")
        .put("endTime", java.time.Instant.now.plusSeconds(60).toString)
      val qconn = new URL(s"$base/query").openConnection()
        .asInstanceOf[HttpURLConnection]
      qconn.setRequestMethod("POST"); qconn.setDoOutput(true)
      val os = qconn.getOutputStream
      try os.write(mapper.writeValueAsString(q).getBytes(UTF_8))
      finally os.close()
      assert(qconn.getResponseCode == 200)
      qconn.getInputStream.readAllBytes(); qconn.disconnect()
      val (_, mb2) = http("GET", s"$base/metrics")
      val buckets = mb2.linesIterator
        .filter(_.startsWith("graft_query_duration_seconds_bucket"))
        .map(_.split(" ").last.toLong).toSeq
      assert(buckets.nonEmpty && buckets == buckets.sorted, buckets)
      val inf = buckets.last
      val cnt = mb2.linesIterator
        .find(_.startsWith("graft_query_duration_seconds_count"))
        .map(_.split(" ").last.toLong)
      assert(cnt.contains(inf) && inf >= 1L, mb2)
    } finally srv.stop()
  }

  test("demo ingest is deterministic") {
    val a = GraftHttpServer.demoEvents(50)
    val b = GraftHttpServer.demoEvents(50)
    assert(a == b)
    val arr = mapper.readTree(a)
    assert(arr.size() == 50)
    assert(arr.get(0).get("method") != null)
    // not all identical — the scramble actually varies fields
    val statuses = (0 until 50).map(i => arr.get(i).get("status").asInt())
    assert(statuses.distinct.size > 1)
  }
}

package graft.http

import java.net.{HttpURLConnection, URL}
import java.nio.charset.StandardCharsets.UTF_8

import com.fasterxml.jackson.databind.ObjectMapper

import graft.SparkSuite

/** `POST /api/v1/dataset_stats/distinct` — the KMV theta-sketch set
  * algebra served over the wire: create a stream, ingest events with
  * named cohorts and overlapping member sets, read back per-cohort
  * distinct estimates AND pairwise intersection/union. Below k the
  * sketch is exhaustive, so every number asserted here is EXACT — the
  * wire surface of the `q_sketch_distinct`/`q_sketch_setops` gates.
  */
class SketchStatsSpec extends SparkSuite {

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

  test("create cohorts -> ingest -> GET estimates: exact distinct, " +
      "intersection and union per cohort pair in the exhaustive regime") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-sketch").toString
    val srv = new GraftHttpServer(spark, tmp)
    srv.start()
    try {
      val base = s"http://127.0.0.1:${srv.boundPort}/api/v1"
      assert(http("PUT", s"$base/logstream/members")._1 == 200)
      // A = users 1..30, B = 21..50 (|A∩B| = 10), C = 100..104 (disjoint)
      val events =
        (1 to 30).map(u => s"""{"kind":"A","user":$u}""") ++
        (21 to 50).map(u => s"""{"kind":"B","user":$u}""") ++
        (100 to 104).map(u => s"""{"kind":"C","user":$u}""")
      val (is, ib) = http("POST", s"$base/ingest",
        Map("X-P-Stream" -> "members"),
        Some(events.mkString("[", ",", "]")))
      assert(is == 200, ib)

      val end = java.time.Instant.now().plusSeconds(60).toString
      def ask(bodyJson: String): (Int, String) =
        http("POST", s"$base/dataset_stats/distinct", body = Some(bodyJson))
      val (s, b) = ask(
        s"""{"datasetName":"members","startTime":"10m","endTime":"$end",
           |"cohortField":"kind","valueField":"user"}"""
          .stripMargin.replace("\n", " "))
      assert(s == 200, b)
      val o = mapper.readTree(b)
      val cohorts = o.get("cohorts")
      assert(cohorts.size() == 3, b)
      val byName = (0 until 3).map(i => cohorts.get(i))
        .map(c => c.get("cohort").asText() -> c).toMap
      assert(byName("A").get("est_distinct").asLong == 30L)
      assert(byName("B").get("est_distinct").asLong == 30L)
      assert(byName("C").get("est_distinct").asLong == 5L)
      assert(byName("C").get("n_sketch").asLong == 5L) // exhaustive
      val pairs = o.get("pairs")
      assert(pairs.size() == 3, b)
      val byPair = (0 until 3).map(i => pairs.get(i))
        .map(p => (p.get("g_a").asText(), p.get("g_b").asText()) -> p).toMap
      assert(byPair(("A", "B")).get("n_common").asLong == 10L)
      assert(byPair(("A", "B")).get("intersect_est").asLong == 10L)
      assert(byPair(("A", "B")).get("union_est").asLong == 50L)
      assert(byPair(("A", "C")).get("intersect_est").asLong == 0L)
      assert(byPair(("A", "C")).get("union_est").asLong == 35L)
      assert(byPair(("B", "C")).get("union_est").asLong == 35L)

      // surface errors: unknown dataset, missing fields, invalid k
      assert(ask(s"""{"datasetName":"nope","startTime":"10m","endTime":"$end","cohortField":"kind","valueField":"user"}""")._1 == 404)
      assert(ask(s"""{"datasetName":"members","startTime":"10m","endTime":"$end"}""")._1 == 400)
      assert(ask(s"""{"datasetName":"members","startTime":"10m","endTime":"$end","cohortField":"kind","valueField":"user","k":1}""")._1 == 400)
      // a field the schema lacks degrades to an empty answer, not a 500
      val (es, eb) = ask(s"""{"datasetName":"members","startTime":"10m","endTime":"$end","cohortField":"nosuch","valueField":"user"}""")
      assert(es == 200 && mapper.readTree(eb).get("cohorts").size() == 0, eb)
      // the base dataset_stats route still answers (dispatch untouched)
      assert(http("POST", s"$base/dataset_stats", body = Some(
        s"""{"datasetName":"members","fields":["kind"],"startTime":"10m","endTime":"$end"}"""))._1 == 200)
    } finally srv.stop()
  }
}

package graft.http

import java.net.{HttpURLConnection, URL}
import java.nio.charset.StandardCharsets.UTF_8
import java.time.Instant
import java.time.format.DateTimeFormatter
import java.util.Base64

import com.fasterxml.jackson.databind.ObjectMapper

import graft.SparkSuite
import graft.query.Rbac

/** Distributed-mode split end-to-end: an ingestor node and a querier node
  * share one storage root; data ingested through the ingestor is queryable
  * from the querier (stream metadata travels through the shared
  * metastore); each node refuses the other's routes; cluster info fans out
  * real liveness probes; dead nodes can be removed, live ones cannot.
  */
class ClusterSpec extends SparkSuite {

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

  test("ingestor/querier split over one storage root") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-cluster").toString
    val ing = new GraftHttpServer(spark, tmp, role = Cluster.Ingestor,
      nodeId = "ing-1")
    val qry = new GraftHttpServer(spark, tmp, role = Cluster.Querier,
      nodeId = "qry-1")
    ing.start(); qry.start()
    val ingBase = s"http://127.0.0.1:${ing.boundPort}/api/v1"
    val qryBase = s"http://127.0.0.1:${qry.boundPort}/api/v1"
    try {
      // routes are split: ingest only on the ingestor, query only on the
      // querier (the other node answers as if the route weren't mounted)
      val (iq, _) = http("POST", s"$qryBase/ingest",
        Map("X-P-Stream" -> "applogs"), Some("""{"a": 1}"""))
      assert(iq == 404)
      val (qi, _) = http("POST", s"$ingBase/query",
        body = Some("{}"))
      assert(qi == 404)

      // ingest through the ingestor...
      val (s1, _) = http("POST", s"$ingBase/ingest",
        Map("X-P-Stream" -> "applogs"),
        Some("""[{"level": "info", "msg": "from-node-a"},
                |{"level": "error", "msg": "boom"}]"""
          .stripMargin.replace("\n", "")))
      assert(s1 == 200)

      // ...and the QUERIER resolves the stream via the shared metastore
      // and reads the same parquet — no node-to-node data transfer
      val (qs, qb) = http("POST", s"$qryBase/query",
        body = Some(s"""{"query": "SELECT msg FROM applogs WHERE level = 'error'",
                       |"startTime": "10m", "endTime": "$futureIso"}"""
          .stripMargin.replace("\n", "")))
      assert(qs == 200, qb)
      assert(qb.contains("boom") && !qb.contains("from-node-a"))

      // cluster info from the querier probes both nodes live
      val (cs, cb) = http("GET", s"$qryBase/cluster/info")
      assert(cs == 200)
      val infos = mapper.readTree(cb)
      assert(infos.size() == 2)
      val byId = (0 until infos.size()).map(infos.get)
        .map(n => n.get("node_id").asText() -> n).toMap
      assert(byId("ing-1").get("role").asText() == "ingestor")
      assert(byId("qry-1").get("role").asText() == "querier")
      assert(byId.values.forall(_.get("reachable").asBoolean()))
      // cluster management is a querier-class route
      assert(http("GET", s"$ingBase/cluster/info")._1 == 404)

      // a live node cannot be removed
      val (rl, rb) = http("DELETE", s"$qryBase/cluster/ing-1")
      assert(rl == 400 && rb.contains("live"))

      // stop the ingestor: info shows it dead, removal now succeeds
      ing.stop()
      val (cs2, cb2) = http("GET", s"$qryBase/cluster/info")
      assert(cs2 == 200)
      val infos2 = mapper.readTree(cb2)
      val ingRow = (0 until infos2.size()).map(infos2.get)
        .find(_.get("node_id").asText() == "ing-1").get
      assert(!ingRow.get("reachable").asBoolean())
      assert(ingRow.get("error").asText() == "not reachable")
      assert(http("DELETE", s"$qryBase/cluster/ing-1")._1 == 200)
      val (_, cb3) = http("GET", s"$qryBase/cluster/info")
      assert(mapper.readTree(cb3).size() == 1)
      assert(http("DELETE", s"$qryBase/cluster/ghost")._1 == 404)
    } finally { ing.stop(); qry.stop() }
  }

  test("cluster management is admin-gated under auth") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-cluster2").toString
    Rbac.clear()
    Rbac.grant("root", Seq(Rbac.Admin()))
    Rbac.grant("reader", Seq(Rbac.Reader(Some("applogs"))))
    val qry = new GraftHttpServer(spark, tmp, requireAuth = true,
      users = Map("root" -> "pw", "reader" -> "pw"),
      role = Cluster.Querier, nodeId = "qry-auth")
    qry.start()
    val base = s"http://127.0.0.1:${qry.boundPort}/api/v1"
    def basic(u: String): Map[String, String] =
      Map("Authorization" -> ("Basic " + Base64.getEncoder
        .encodeToString(s"$u:pw".getBytes(UTF_8))))
    try {
      assert(http("GET", s"$base/cluster/info")._1 == 401)
      assert(http("GET", s"$base/cluster/info", basic("reader"))._1 == 403)
      val (s, b) = http("GET", s"$base/cluster/info", basic("root"))
      assert(s == 200)
      assert(mapper.readTree(b).size() == 1)
    } finally { qry.stop(); Rbac.clear() }
  }
}

package graft.http

import java.net.{HttpURLConnection, URL}
import java.nio.charset.StandardCharsets.UTF_8

import com.fasterxml.jackson.databind.ObjectMapper

import graft.SparkSuite
import graft.query.Rbac

/** Saved correlations CRUD (reference `src/correlation.rs` +
  * `handlers/http/correlation.rs`): two-table configs with join-table
  * consistency validation, per-stream query authorization, and prism
  * search integration.
  */
class CorrelationHttpSpec extends SparkSuite {

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

  private def corr(title: String, a: String, b: String,
                   join: Boolean = true): String = {
    val joinPart =
      if (join)
        s""","joinConfig": {"joinConditions": [
           |  {"tableName": "$a", "field": "id"},
           |  {"tableName": "$b", "field": "id"}]}""".stripMargin
      else ""
    s"""{"title": "$title",
       |"tableConfigs": [
       |  {"tableName": "$a", "selectedFields": ["id"]},
       |  {"tableName": "$b", "selectedFields": ["id"]}]$joinPart}"""
      .stripMargin
  }

  test("CRUD round trip, validation, prism search") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-corr").toString
    val srv = new GraftHttpServer(spark, tmp)
    srv.start()
    val base = s"http://127.0.0.1:${srv.boundPort}/api/v1"
    try {
      // structural validation
      assert(http("POST", s"$base/correlation", body = Some(
        """{"title": "one table", "tableConfigs":
          |[{"tableName": "a", "selectedFields": []}]}""".stripMargin))._1
        == 400)
      val mismatched =
        """{"title": "m", "tableConfigs": [
          |  {"tableName": "a", "selectedFields": []},
          |  {"tableName": "b", "selectedFields": []}],
          |"joinConfig": {"joinConditions": [
          |  {"tableName": "a", "field": "x"},
          |  {"tableName": "c", "field": "x"}]}}""".stripMargin
      assert(http("POST", s"$base/correlation",
        body = Some(mismatched))._1 == 400)

      // create + stamps
      val (cs, cb) = http("POST", s"$base/correlation",
        body = Some(corr("logs vs traces", "applogs", "traces")))
      assert(cs == 200, cb)
      val created = mapper.readTree(cb)
      val id = created.get("id").asText()
      assert(created.get("version").asText()
        == UserConfigs.CurrentCorrelationVersion)
      assert(created.get("user_id").asText() == "anonymous")

      // list / get / update / delete
      assert(mapper.readTree(http("GET", s"$base/correlation")._2).size() == 1)
      assert(http("GET", s"$base/correlation/$id")._1 == 200)
      val (us, ub) = http("PUT", s"$base/correlation/$id",
        body = Some(corr("logs vs metrics", "applogs", "metrics")))
      assert(us == 200 && mapper.readTree(ub).get("id").asText() == id, ub)

      // prism search finds it by title
      val (ps, pb) = http("GET", s"$base/prism/home/search?key=metrics")
      assert(ps == 200, pb)
      assert(pb.contains("Correlation"), pb)

      assert(http("DELETE", s"$base/correlation/$id")._1 == 200)
      assert(http("GET", s"$base/correlation/$id")._1 == 404)
    } finally srv.stop()
  }

  test("correlation creation requires query access to both streams") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-corr2").toString
    Rbac.clear()
    Rbac.grant("narrow", Seq(Rbac.Reader(Some("applogs"))))
    val srv = new GraftHttpServer(spark, tmp, requireAuth = true,
      users = Map("narrow" -> "pw"))
    srv.start()
    val base = s"http://127.0.0.1:${srv.boundPort}/api/v1"
    val auth = Map("Authorization" -> ("Basic " +
      java.util.Base64.getEncoder.encodeToString("narrow:pw".getBytes(UTF_8))))
    try {
      val (s1, b1) = http("POST", s"$base/correlation", auth,
        Some(corr("x", "applogs", "secrets")))
      assert(s1 == 403, b1)
      assert(b1.contains("secrets"))
      Rbac.grant("narrow",
        Seq(Rbac.Reader(Some("applogs")), Rbac.Reader(Some("secrets"))))
      assert(http("POST", s"$base/correlation", auth,
        Some(corr("x", "applogs", "secrets")))._1 == 200)
    } finally { srv.stop(); Rbac.clear() }
  }
}

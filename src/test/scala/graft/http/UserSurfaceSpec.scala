package graft.http

import java.net.{HttpURLConnection, URL}
import java.nio.charset.StandardCharsets.UTF_8
import java.time.Instant
import java.time.format.DateTimeFormatter
import java.util.Base64

import com.fasterxml.jackson.databind.ObjectMapper

import graft.SparkSuite
import graft.query.Rbac

/** HTTP shell user surface: multi-tenant stream isolation, API-key auth,
  * and saved filters / dashboards CRUD.
  */
class UserSurfaceSpec extends SparkSuite {

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

  private def queryBody(sql: String): String =
    mapper.writeValueAsString(mapper.createObjectNode()
      .put("query", sql).put("startTime", "10m").put("endTime", futureIso))

  test("tenants isolate streams: same name, disjoint data, no cross access") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-mt").toString
    val srv = new GraftHttpServer(spark, tmp, requireAuth = true,
      users = Map("alice" -> "pa", "bob" -> "pb"),
      userTenants = Map("alice" -> "ta", "bob" -> "tb"))
    srv.start()
    try {
      val base = s"http://127.0.0.1:${srv.boundPort}/api/v1"
      Rbac.grant("alice", Seq(Rbac.Writer(Some("ta/logs"))))
      Rbac.grant("bob", Seq(Rbac.Writer(Some("tb/logs"))))

      // both tenants ingest into a stream NAMED "logs"
      val (sa, ba) = http("POST", s"$base/ingest",
        basic("alice", "pa") + ("X-P-Stream" -> "logs"),
        Some("""{"owner":"alice","v":1}"""))
      assert(sa == 200, ba)
      val (sb, bb) = http("POST", s"$base/ingest",
        basic("bob", "pb") + ("X-P-Stream" -> "logs"),
        Some("""[{"owner":"bob","v":2},{"owner":"bob","v":3}]"""))
      assert(sb == 200, bb)

      // two disjoint tables on disk, tenant-prefixed
      assert(java.nio.file.Files.isDirectory(
        java.nio.file.Paths.get(tmp, "ta", "logs")))
      assert(java.nio.file.Files.isDirectory(
        java.nio.file.Paths.get(tmp, "tb", "logs")))

      // each tenant's "logs" resolves to its OWN data only
      val (qa, qra) = http("POST", s"$base/query", basic("alice", "pa"),
        Some(queryBody("SELECT owner, v FROM logs ORDER BY v")))
      assert(qa == 200, qra)
      val rowsA = mapper.readTree(qra)
      assert(rowsA.size() == 1 && rowsA.get(0).get("owner").asText() == "alice")
      val (qb2, qrb) = http("POST", s"$base/query", basic("bob", "pb"),
        Some(queryBody("SELECT owner, v FROM logs ORDER BY v")))
      assert(qb2 == 200, qrb)
      val rowsB = mapper.readTree(qrb)
      assert(rowsB.size() == 2 && rowsB.get(0).get("owner").asText() == "bob")

      // bob granted alice's TENANT-SCOPED key would still resolve only his
      // own tenant's stream; and without an ingest grant for ta/logs his
      // writes land in tb — assert the RBAC key is tenant-scoped by
      // revoking bob's grant: his own stream now rejects
      Rbac.grant("bob", Seq(Rbac.Writer(Some("ta/logs")))) // alice's key
      val (s403, _) = http("POST", s"$base/ingest",
        basic("bob", "pb") + ("X-P-Stream" -> "logs"),
        Some("""{"owner":"bob"}"""))
      assert(s403 == 403) // his stream is tb/logs; the ta grant is useless
      val (q403, _) = http("POST", s"$base/query", basic("bob", "pb"),
        Some(queryBody("SELECT * FROM logs")))
      assert(q403 == 403)
    } finally {
      srv.stop()
      Rbac.clear()
    }
  }

  test("stale temp views cannot leak another tenant's data; unknown " +
       "tables are rejected, not silently dropped") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-leak").toString
    val srv = new GraftHttpServer(spark, tmp, requireAuth = true,
      users = Map("alice" -> "pa", "bob" -> "pb"),
      userTenants = Map("alice" -> "ta", "bob" -> "tb"))
    srv.start()
    try {
      val base = s"http://127.0.0.1:${srv.boundPort}/api/v1"
      Rbac.grant("alice", Seq(Rbac.Writer(Some("ta/secrets"))))
      Rbac.grant("bob", Seq(Rbac.Writer(Some("tb/other"))))
      val (sa, ba) = http("POST", s"$base/ingest",
        basic("alice", "pa") + ("X-P-Stream" -> "secrets"),
        Some("""{"owner":"alice","token":"s3cr3t"}"""))
      assert(sa == 200, ba)

      // plant a stale global temp view under the bare stream name — the
      // artifact a pre-cleanup query() used to leave in the shared session
      import spark.implicits._
      Seq(("alice", "s3cr3t-stale")).toDF("owner", "token")
        .createOrReplaceTempView("secrets")
      try {
        // bob's tenant has no stream "secrets": the query must be
        // rejected, NOT resolved against the shared session catalog
        val (qs, qb) = http("POST", s"$base/query", basic("bob", "pb"),
          Some(queryBody("SELECT owner, token FROM secrets")))
        assert(qs == 403, s"expected 403, got $qs: $qb")
        assert(!qb.contains("s3cr3t"), s"leaked another tenant's data: $qb")
        // alice still reads her own stream normally
        val (as2, ab2) = http("POST", s"$base/query", basic("alice", "pa"),
          Some(queryBody("SELECT owner, token FROM secrets")))
        assert(as2 == 200, ab2)
        assert(ab2.contains("s3cr3t") && !ab2.contains("stale"),
          s"alice's query resolved the stale view, not her stream: $ab2")
      } finally spark.catalog.dropTempView("secrets")
    } finally {
      srv.stop()
      Rbac.clear()
    }
  }

  test("api keys authenticate as their backing user; revocation kills them") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-key").toString
    val srv = new GraftHttpServer(spark, tmp, requireAuth = true,
      users = Map("carol" -> "pw"),
      apiKeys = Map("psk-live-123" -> "carol"))
    srv.start()
    try {
      val base = s"http://127.0.0.1:${srv.boundPort}/api/v1"
      Rbac.grant("carol", Seq(Rbac.Writer(Some("applogs"))))

      val key = Map("x-api-key" -> "psk-live-123", "X-P-Stream" -> "applogs")
      val (s1, b1) = http("POST", s"$base/ingest", key,
        Some("""{"m":"hello"}"""))
      assert(s1 == 200, b1)

      // wrong key → 401; wrong key never falls back to anonymous
      assert(http("POST", s"$base/ingest",
        Map("x-api-key" -> "nope", "X-P-Stream" -> "applogs"),
        Some("""{"m":"x"}"""))._1 == 401)

      // revoked key → 401, even though the token itself is valid
      srv.revokeApiKey("psk-live-123")
      assert(http("POST", s"$base/ingest", key,
        Some("""{"m":"x"}"""))._1 == 401)
      // the backing user's Basic credentials still work
      assert(http("POST", s"$base/ingest",
        basic("carol", "pw") + ("X-P-Stream" -> "applogs"),
        Some("""{"m":"still"}"""))._1 == 200)
    } finally {
      srv.stop()
      Rbac.clear()
    }
  }

  test("roles CRUD: admin-gated, assignment resolves at check time") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-roles").toString
    val srv = new GraftHttpServer(spark, tmp, requireAuth = true,
      users = Map("root" -> "pr", "frank" -> "pf"))
    srv.start()
    try {
      val base = s"http://127.0.0.1:${srv.boundPort}/api/v1"
      Rbac.grant("root", Seq(Rbac.Admin()))

      // non-admin cannot manage roles
      assert(http("PUT", s"$base/role/ops", basic("frank", "pf"),
        Some("""[{"privilege":"reader","stream":"syslogs"}]"""))._1 == 403)

      // create + get + list
      assert(http("PUT", s"$base/role/ops", basic("root", "pr"),
        Some("""[{"privilege":"reader","stream":"syslogs"},
                 {"privilege":"ingestor","stream":"syslogs"}]"""))._1 == 200)
      val (gs, gb) = http("GET", s"$base/role/ops", basic("root", "pr"))
      assert(gs == 200 && mapper.readTree(gb).size() == 2)
      val (ls, lb) = http("GET", s"$base/role", basic("root", "pr"))
      assert(ls == 200 && mapper.readTree(lb).has("ops"))
      // unknown privilege rejected
      assert(http("PUT", s"$base/role/bad", basic("root", "pr"),
        Some("""[{"privilege":"owner"}]"""))._1 == 400)

      // frank holds no grant yet: ingest denied; after role assignment the
      // role's privileges resolve at check time
      assert(http("POST", s"$base/ingest",
        basic("frank", "pf") + ("X-P-Stream" -> "syslogs"),
        Some("""{"m":"x"}"""))._1 == 403)
      assert(http("PUT", s"$base/role/ops/users", basic("root", "pr"),
        Some("""["frank"]"""))._1 == 200)
      assert(http("POST", s"$base/ingest",
        basic("frank", "pf") + ("X-P-Stream" -> "syslogs"),
        Some("""{"m":"x"}"""))._1 == 200)

      // a held role cannot be deleted; after clearing the holder it can
      assert(http("DELETE", s"$base/role/ops", basic("root", "pr"))._1 == 409)
      assert(Rbac.assignRoles("frank", Seq.empty).isRight)
      assert(http("DELETE", s"$base/role/ops", basic("root", "pr"))._1 == 200)
      assert(http("GET", s"$base/role/ops", basic("root", "pr"))._1 == 404)

      // editing a live role re-scopes holders immediately
      assert(http("PUT", s"$base/role/viewer", basic("root", "pr"),
        Some("""[{"privilege":"reader","stream":"syslogs"}]"""))._1 == 200)
      assert(http("PUT", s"$base/role/viewer/users", basic("root", "pr"),
        Some("""["frank"]"""))._1 == 200)
      assert(http("POST", s"$base/ingest",
        basic("frank", "pf") + ("X-P-Stream" -> "syslogs"),
        Some("""{"m":"x"}"""))._1 == 403) // reader cannot ingest
      assert(http("PUT", s"$base/role/viewer", basic("root", "pr"),
        Some("""[{"privilege":"writer","stream":"syslogs"}]"""))._1 == 200)
      assert(http("POST", s"$base/ingest",
        basic("frank", "pf") + ("X-P-Stream" -> "syslogs"),
        Some("""{"m":"x"}"""))._1 == 200)
    } finally {
      srv.stop()
      Rbac.clear()
    }
  }

  test("tenant admins cannot mint global or cross-tenant role privileges") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-troles").toString
    val srv = new GraftHttpServer(spark, tmp, requireAuth = true,
      users = Map("ta-admin" -> "pa"),
      userTenants = Map("ta-admin" -> "ta"))
    srv.start()
    try {
      val base = s"http://127.0.0.1:${srv.boundPort}/api/v1"
      Rbac.grant("ta-admin", Seq(Rbac.Admin()))
      // wildcard and admin/editor privileges are refused for tenant admins
      assert(http("PUT", s"$base/role/wild", basic("ta-admin", "pa"),
        Some("""[{"privilege":"reader"}]"""))._1 == 400)
      assert(http("PUT", s"$base/role/esc", basic("ta-admin", "pa"),
        Some("""[{"privilege":"admin"}]"""))._1 == 400)
      // stream-scoped is fine, and lands on the TENANT key
      assert(http("PUT", s"$base/role/ok", basic("ta-admin", "pa"),
        Some("""[{"privilege":"reader","stream":"logs"}]"""))._1 == 200)
      assert(Rbac.getRole("ok").get.head.stream.contains("ta/logs"))
    } finally {
      srv.stop()
      Rbac.clear()
    }
  }

  test("saved filters CRUD round trip with stream RBAC") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-filters").toString
    val srv = new GraftHttpServer(spark, tmp, requireAuth = true,
      users = Map("dave" -> "pd", "erin" -> "pe"))
    srv.start()
    try {
      val base = s"http://127.0.0.1:${srv.boundPort}/api/v1"
      Rbac.grant("dave", Seq(Rbac.Reader(Some("weblogs"))))

      // create: requires query access to the filter's stream
      val body = """{"stream_name":"weblogs","filter_name":"errors",
        "query":{"filter_type":"sql",
        "filter_query":"SELECT * FROM weblogs WHERE level='error'"}}"""
      val (cs, cb) = http("POST", s"$base/filters", basic("dave", "pd"),
        Some(body))
      assert(cs == 200, cb)
      val created = mapper.readTree(cb)
      val fid = created.get("filter_id").asText()
      assert(created.get("version").asText() == "v2")
      assert(created.get("user_id").asText() == "dave")

      // erin has NO grant on weblogs → 403
      assert(http("POST", s"$base/filters", basic("erin", "pe"),
        Some(body))._1 == 403)

      // list + get
      val (ls, lb) = http("GET", s"$base/filters", basic("dave", "pd"))
      assert(ls == 200 && mapper.readTree(lb).size() == 1)
      val (gs, gb) = http("GET", s"$base/filters/$fid", basic("dave", "pd"))
      assert(gs == 200)
      assert(mapper.readTree(gb).get("filter_name").asText() == "errors")
      // erin cannot see dave's filter (per-user namespace → 404)
      assert(http("GET", s"$base/filters/$fid", basic("erin", "pe"))._1 == 404)

      // update keeps the id
      val (us, ub) = http("PUT", s"$base/filters/$fid", basic("dave", "pd"),
        Some("""{"stream_name":"weblogs","filter_name":"renamed",
          "query":{"filter_type":"search","filter_query":"error"}}"""))
      assert(us == 200, ub)
      val updated = mapper.readTree(ub)
      assert(updated.get("filter_id").asText() == fid)
      assert(updated.get("filter_name").asText() == "renamed")

      // delete, then 404
      assert(http("DELETE", s"$base/filters/$fid",
        basic("dave", "pd"))._1 == 200)
      assert(http("GET", s"$base/filters/$fid", basic("dave", "pd"))._1 == 404)
      assert(http("GET", s"$base/filters", basic("dave", "pd"))
        ._2.trim == "[]")
    } finally {
      srv.stop()
      Rbac.clear()
    }
  }

  test("dashboards CRUD: metadata stamping, per-user isolation") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-dash").toString
    val srv = new GraftHttpServer(spark, tmp, requireAuth = true,
      users = Map("dave" -> "pd", "erin" -> "pe"))
    srv.start()
    try {
      val base = s"http://127.0.0.1:${srv.boundPort}/api/v1"
      val (cs, cb) = http("POST", s"$base/dashboards", basic("dave", "pd"),
        Some("""{"title":"Ops overview","tags":["prod"]}"""))
      assert(cs == 200, cb)
      val created = mapper.readTree(cb)
      val did = created.get("dashboardId").asText()
      assert(created.get("author").asText() == "dave")
      assert(created.get("isFavorite").asBoolean() == false)
      assert(created.get("tiles").isArray && created.get("tiles").isEmpty)
      assert(created.hasNonNull("created") && created.hasNonNull("modified"))

      val (us, ub) = http("PUT", s"$base/dashboards/$did", basic("dave", "pd"),
        Some("""{"title":"Ops overview v2",
          "tiles":[{"name":"errors","chart":"line"}]}"""))
      assert(us == 200, ub)
      val updated = mapper.readTree(ub)
      assert(updated.get("title").asText() == "Ops overview v2")
      assert(updated.get("tiles").size() == 1)
      // creation timestamp survives the update
      assert(updated.get("created") == created.get("created"))

      // erin's namespace is disjoint: list empty, dave's id is 404
      assert(mapper.readTree(
        http("GET", s"$base/dashboards", basic("erin", "pe"))._2).size() == 0)
      assert(http("PUT", s"$base/dashboards/$did", basic("erin", "pe"),
        Some("""{"title":"hijack"}"""))._1 == 404)
      assert(http("DELETE", s"$base/dashboards/$did",
        basic("erin", "pe"))._1 == 404)

      assert(http("DELETE", s"$base/dashboards/$did",
        basic("dave", "pd"))._1 == 200)
      assert(http("GET", s"$base/dashboards/$did",
        basic("dave", "pd"))._1 == 404)
    } finally {
      srv.stop()
      Rbac.clear()
    }
  }
}

package graft.http

import java.net.URI
import java.nio.charset.StandardCharsets.UTF_8
import java.util.Base64

import com.fasterxml.jackson.databind.ObjectMapper

import graft.SparkSuite
import graft.query.Rbac

/** Dynamic user management over HTTP (reference `rbac.rs` user webscope):
  * create with generated password, login, role add/remove, password
  * reset, delete; server-configured users stay protected.
  */
class UserAdminSpec extends SparkSuite {

  private val mapper = new ObjectMapper()

  // java.net.http client: HttpURLConnection cannot send PATCH
  private lazy val client = java.net.http.HttpClient.newHttpClient()

  private def http(method: String, url: String,
                   headers: Map[String, String] = Map.empty,
                   body: Option[String] = None): (Int, String) = {
    var b = java.net.http.HttpRequest.newBuilder()
      .uri(java.net.URI.create(url))
      .method(method, body.fold(
        java.net.http.HttpRequest.BodyPublishers.noBody())(
        java.net.http.HttpRequest.BodyPublishers.ofString(_, UTF_8)))
    headers.foreach { case (k, v) => b = b.header(k, v) }
    val resp = client.send(b.build(),
      java.net.http.HttpResponse.BodyHandlers.ofString())
    (resp.statusCode(), resp.body())
  }

  private def basic(user: String, pass: String): Map[String, String] =
    Map("Authorization" -> ("Basic " + Base64.getEncoder
      .encodeToString(s"$user:$pass".getBytes(UTF_8))))

  test("user lifecycle: create → login → roles → password reset → delete") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-uadm").toString
    Rbac.clear()
    Rbac.grant("root", Seq(Rbac.Admin()))
    val srv = new GraftHttpServer(spark, tmp, requireAuth = true,
      users = Map("root" -> "rootpw"))
    srv.start()
    try {
      val base = s"http://127.0.0.1:${srv.boundPort}/api/v1"
      Rbac.putRole("reader", Seq(Rbac.Reader(Some("applogs"))))

      // create with a role; the response is the one-time password
      val (cs, cb) = http("POST", s"$base/user/dana",
        basic("root", "rootpw"), Some("""["reader"]"""))
      assert(cs == 200, cb)
      val password = mapper.readTree(cb).asText()
      assert(password.length >= 16, cb)
      // a second create of the same name is refused; bad roles are 400
      assert(http("POST", s"$base/user/dana",
        basic("root", "rootpw"))._1 == 400)
      assert(http("POST", s"$base/user/erin",
        basic("root", "rootpw"), Some("""["nope"]"""))._1 == 400)

      // the new user can authenticate and read their roles
      val (rs, rb) = http("GET", s"$base/user/dana/role",
        basic("dana", password))
      assert(rs == 200 && rb.contains("reader"), s"$rs $rb")
      // …but cannot manage users (not admin)
      assert(http("POST", s"$base/user/frank",
        basic("dana", password))._1 == 403)

      // ingest as root so dana's reader grant means something
      assert(http("POST", s"$base/ingest",
        basic("root", "rootpw") + ("X-P-Stream" -> "applogs"),
        Some("""{"m": "hi"}"""))._1 == 200)
      val end = java.time.Instant.now().plusSeconds(60).toString
      assert(http("POST", s"$base/query", basic("dana", password), Some(
        s"""{"query": "SELECT m FROM applogs", "startTime": "10m",
           |"endTime": "$end"}""".stripMargin.replace("\n", " ")))._1 == 200)

      // role add/remove
      Rbac.putRole("editor2", Seq(Rbac.Editor()))
      assert(http("PATCH", s"$base/user/dana/role/add",
        basic("root", "rootpw"), Some("""["editor2"]"""))._1 == 200)
      assert(Rbac.rolesOf("dana").toSet == Set("reader", "editor2"))
      assert(http("PATCH", s"$base/user/dana/role/remove",
        basic("root", "rootpw"), Some("""["reader"]"""))._1 == 200)
      assert(Rbac.rolesOf("dana") == Seq("editor2"))

      // password reset: old stops working, new works
      val (ps, pb) = http("POST",
        s"$base/user/dana/generate-new-password", basic("root", "rootpw"))
      assert(ps == 200, pb)
      val newPass = mapper.readTree(pb).asText()
      assert(newPass != password)
      assert(http("GET", s"$base/user/dana/role",
        basic("dana", password))._1 == 401)
      assert(http("GET", s"$base/user/dana/role",
        basic("dana", newPass))._1 == 200)

      // list shows the tenant's dynamic users
      val (ls, lb) = http("GET", s"$base/user", basic("root", "rootpw"))
      assert(ls == 200 && mapper.readTree(lb).toString.contains("dana"))

      // server-configured users are protected end-to-end
      assert(http("DELETE", s"$base/user/root",
        basic("root", "rootpw"))._1 == 403)
      assert(http("POST", s"$base/user/root/generate-new-password",
        basic("root", "rootpw"))._1 == 403)
      assert(http("POST", s"$base/user/root",
        basic("root", "rootpw"))._1 == 403)

      // delete: account and grants are gone, login stops
      assert(http("DELETE", s"$base/user/dana",
        basic("root", "rootpw"))._1 == 200)
      assert(http("GET", s"$base/user/dana/role",
        basic("dana", newPass))._1 == 401)
      assert(Rbac.rolesOf("dana").isEmpty)
      assert(http("DELETE", s"$base/user/dana",
        basic("root", "rootpw"))._1 == 404)
    } finally { srv.stop(); Rbac.clear() }
  }

  test("api keys: create with roles, authenticate as own principal, " +
       "masked list, validate, delete revokes") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-keys").toString
    Rbac.clear()
    Rbac.grant("root", Seq(Rbac.Admin()))
    val srv = new GraftHttpServer(spark, tmp, requireAuth = true,
      users = Map("root" -> "pw"))
    srv.start()
    try {
      val base = s"http://127.0.0.1:${srv.boundPort}/api/v1"
      Rbac.putRole("kreader",
        Seq(Rbac.Reader(Some("klogs")), Rbac.Ingestor(Some("klogs"))))

      // create: full key value returned once; bad roles 400; non-admin 403
      val (cs, cb) = http("POST", s"$base/apikeys", basic("root", "pw"),
        Some("""{"keyName": "ci-bot", "roles": ["kreader"]}"""))
      assert(cs == 200, cb)
      val created = mapper.readTree(cb)
      val keyVal = created.get("apiKey").asText()
      val keyId = created.get("keyId").asText()
      assert(keyVal.length == 36, cb) // UUID format
      assert(created.get("createdBy").asText() == "root")
      assert(http("POST", s"$base/apikeys", basic("root", "pw"),
        Some("""{"keyName": "x", "roles": ["nope"]}"""))._1 == 400)

      // the key authenticates as its own principal with the role's grants
      assert(http("POST", s"$base/ingest",
        Map("x-api-key" -> keyVal, "X-P-Stream" -> "klogs"),
        Some("""{"k": 1}"""))._1 == 200)
      // …but has no admin rights
      assert(http("GET", s"$base/apikeys",
        Map("x-api-key" -> keyVal))._1 == 403)

      // list masks the secret; get by id returns it in full
      val (ls, lb) = http("GET", s"$base/apikeys", basic("root", "pw"))
      assert(ls == 200, lb)
      val listed = mapper.readTree(lb)
      assert(listed.size() == 1)
      val maskedVal = listed.get(0).get("apiKey").asText()
      assert(maskedVal.startsWith("****") &&
        maskedVal.endsWith(keyVal.takeRight(4)) && maskedVal != keyVal, lb)
      val (gs, gb) = http("GET", s"$base/apikeys/$keyId", basic("root", "pw"))
      assert(gs == 200 &&
        mapper.readTree(gb).get("apiKey").asText() == keyVal)

      // validate endpoint
      assert(mapper.readTree(http("POST", s"$base/apikeys/validate",
        basic("root", "pw"),
        Some(s"""{"apiKey": "$keyVal"}"""))._2).get("valid").asBoolean())
      assert(!mapper.readTree(http("POST", s"$base/apikeys/validate",
        basic("root", "pw"),
        Some("""{"apiKey": "nope"}"""))._2).get("valid").asBoolean())

      // delete revokes: auth stops working, list is empty
      assert(http("DELETE", s"$base/apikeys/$keyId",
        basic("root", "pw"))._1 == 200)
      assert(http("POST", s"$base/ingest",
        Map("x-api-key" -> keyVal, "X-P-Stream" -> "klogs"),
        Some("""{"k": 2}"""))._1 == 401)
      assert(mapper.readTree(
        http("GET", s"$base/apikeys", basic("root", "pw"))._2).size() == 0)
      assert(http("DELETE", s"$base/apikeys/$keyId",
        basic("root", "pw"))._1 == 404)
    } finally { srv.stop(); Rbac.clear() }
  }

  test("dynamic users live in their creator's tenant") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-uten").toString
    Rbac.clear()
    Rbac.grant("adminA", Seq(Rbac.Admin()))
    val srv = new GraftHttpServer(spark, tmp, requireAuth = true,
      users = Map("adminA" -> "pw"),
      userTenants = Map("adminA" -> "ta"))
    srv.start()
    try {
      val base = s"http://127.0.0.1:${srv.boundPort}/api/v1"
      val (cs, cb) = http("POST", s"$base/user/worker",
        basic("adminA", "pw"))
      assert(cs == 200, cb)
      val pass = mapper.readTree(cb).asText()
      // the new user resolves into tenant ta: ingest + query land there
      Rbac.grant("worker", Seq(Rbac.Writer(Some("ta/wlogs"))))
      assert(http("POST", s"$base/ingest",
        basic("worker", pass) + ("X-P-Stream" -> "wlogs"),
        Some("""{"w": 1}"""))._1 == 200)
      assert(java.nio.file.Files.isDirectory(
        java.nio.file.Paths.get(tmp, "ta", "wlogs")))
    } finally { srv.stop(); Rbac.clear() }
  }
}

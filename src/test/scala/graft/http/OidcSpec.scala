package graft.http

import java.net.{HttpURLConnection, InetSocketAddress, URL}
import java.nio.charset.StandardCharsets.UTF_8
import java.time.Instant
import java.time.format.DateTimeFormatter
import java.util.Base64

import com.sun.net.httpserver.HttpServer

import graft.SparkSuite
import graft.query.Rbac

/** OIDC authorization-code flow end-to-end against an in-process stub
  * identity provider: login redirect → (spec acts as the browser) provider
  * authorize → callback code exchange → verified id_token → claim-mapped
  * RBAC roles → session-cookie query; plus the negative paths (forged
  * signature, replayed state, expired session, open-redirect).
  */
class OidcSpec extends SparkSuite {

  private val Secret = "client-s3cret"
  private val Issuer = "https://idp.test"
  private val ClientId = "graft-console"

  /** Stub IdP: /authorize bounces the browser straight back to the client's
    * redirect_uri with a code; /token exchanges that code for an HS256
    * id_token. Code "good" is signed with the real client secret, "forged"
    * with the wrong one — driving both verification branches over the wire.
    */
  private def startIdp(username: String = "alice"): HttpServer = {
    val idp = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    idp.createContext("/authorize", ex => {
      val params = Option(ex.getRequestURI.getRawQuery).toSeq
        .flatMap(_.split("&").toSeq)
        .flatMap(_.split("=", 2) match {
          case Array(k, v) => Some(k -> java.net.URLDecoder.decode(v, UTF_8))
          case _           => None
        }).toMap
      val loc = s"${params("redirect_uri")}?code=good&state=${params("state")}"
      ex.getResponseHeaders.set("Location", loc)
      ex.sendResponseHeaders(302, -1)
      ex.close()
    })
    idp.createContext("/token", ex => {
      val form = new String(ex.getRequestBody.readAllBytes(), UTF_8)
      val code = form.split("&").collectFirst {
        case kv if kv.startsWith("code=") => kv.stripPrefix("code=")
      }.getOrElse("")
      val signingSecret = if (code == "forged") "wrong-secret" else Secret
      val exp = Instant.now().getEpochSecond + 3600
      val claims =
        s"""{"iss":"$Issuer","aud":"$ClientId","sub":"u-alice",
           |"preferred_username":"$username","groups":["data-eng"],
           |"exp":$exp}""".stripMargin.replace("\n", "")
      val idToken = Oidc.signHs256(claims, signingSecret)
      val body =
        s"""{"access_token":"at","token_type":"Bearer","id_token":"$idToken"}"""
      val bytes = body.getBytes(UTF_8)
      ex.getResponseHeaders.set("Content-Type", "application/json")
      ex.sendResponseHeaders(200, bytes.length.toLong)
      ex.getResponseBody.write(bytes)
      ex.close()
    })
    idp.start()
    idp
  }

  /** No-redirect-following HTTP helper returning (status, body, headers). */
  private def http(method: String, url: String,
                   headers: Map[String, String] = Map.empty,
                   body: Option[String] = None)
      : (Int, String, Map[String, Seq[String]]) = {
    val conn = new URL(url).openConnection().asInstanceOf[HttpURLConnection]
    conn.setInstanceFollowRedirects(false)
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
    import scala.jdk.CollectionConverters._
    val hs = conn.getHeaderFields.asScala.toMap
      .collect { case (k, v) if k != null => k -> v.asScala.toSeq }
    conn.disconnect()
    (status, text, hs)
  }

  private def basic(user: String, pass: String): Map[String, String] =
    Map("Authorization" -> ("Basic " + Base64.getEncoder
      .encodeToString(s"$user:$pass".getBytes(UTF_8))))

  /** `com.sun.net.httpserver` normalizes header names ("Set-cookie") —
    * match case-insensitively.
    */
  private def setCookies(headers: Map[String, Seq[String]]): Seq[String] =
    headers.collect {
      case (k, v) if k.equalsIgnoreCase("Set-Cookie") => v
    }.flatten.toSeq

  private def sessionOf(headers: Map[String, Seq[String]]): Option[String] =
    setCookies(headers)
      .collectFirst { case c if c.startsWith("session=") =>
        c.stripPrefix("session=").split(";")(0)
      }.filter(_.nonEmpty)

  test("OIDC code flow: login → provider → callback → session query") {
    val idp = startIdp()
    val idpBase = s"http://127.0.0.1:${idp.getAddress.getPort}"
    val cfg = Oidc.Config(
      issuer = Issuer, clientId = ClientId, clientSecret = Secret,
      authorizeUrl = s"$idpBase/authorize", tokenUrl = s"$idpBase/token",
      groupRoleMap = Map("data-eng" -> "engineer"))
    val tmp = java.nio.file.Files.createTempDirectory("graft-oidc").toString
    Rbac.clear()
    Rbac.putRole("engineer",
      Seq(Rbac.Reader(Some("weblogs")), Rbac.Ingestor(Some("weblogs"))))
    Rbac.grant("admin", Seq(Rbac.Admin()))
    val srv = new GraftHttpServer(spark, tmp, requireAuth = true,
      users = Map("admin" -> "pw"), oidc = Some(cfg))
    srv.start()
    try {
      val base = s"http://127.0.0.1:${srv.boundPort}/api/v1"

      // seed a stream over the wire as admin so the OIDC user can query it
      val (si, _, _) = http("POST", s"$base/ingest",
        basic("admin", "pw") + ("X-P-Stream" -> "weblogs"),
        Some("""{"status": 200, "msg": "hello"}"""))
      assert(si == 200)

      // 1. login: unauthenticated browser is bounced to the provider
      val (ls, _, lh) = http("GET", s"$base/o/login?redirect=/after")
      assert(ls == 307)
      val authUrl = lh("Location").head
      assert(authUrl.startsWith(s"$idpBase/authorize"))
      assert(authUrl.contains("client_id=graft-console"))
      assert(authUrl.contains("state="))

      // 2. the browser visits the provider; it redirects back with a code
      val (as, _, ah) = http("GET", authUrl)
      assert(as == 302)
      val cbUrl = ah("Location").head
      assert(cbUrl.contains("/api/v1/o/callback?code=good&state="))

      // 3. callback mints the session and sends the browser to `redirect`
      val (cs, _, ch) = http("GET", cbUrl)
      assert(cs == 307)
      assert(ch("Location").head == "/after")
      val session = sessionOf(ch).get

      // 4. the session cookie now authenticates queries; claim group
      // data-eng mapped to role engineer (reader on weblogs)
      val end = DateTimeFormatter.ISO_INSTANT
        .format(Instant.now().plusSeconds(600))
      val (qs, qb, _) = http("POST", s"$base/query",
        Map("Cookie" -> s"session=$session"),
        Some(s"""{"query": "SELECT msg FROM weblogs",
                 |"startTime": "10m", "endTime": "$end"}"""
          .stripMargin.replace("\n", "")))
      assert(qs == 200, qb)
      assert(qb.contains("hello"))
      assert(Rbac.rolesOf("alice") == Seq("engineer"))

      // 5. a replayed state is rejected (single-use)
      val (rs, rb, _) = http("GET", cbUrl)
      assert(rs == 400 && rb.contains("state"))

      // 6. logout revokes the session server-side
      val (os, _, oh) = http("GET", s"$base/o/logout?redirect=/bye",
        Map("Cookie" -> s"session=$session"))
      assert(os == 307)
      assert(setCookies(oh).exists(_.startsWith("session=;")))
      val (qs2, _, _) = http("POST", s"$base/query",
        Map("Cookie" -> s"session=$session"),
        Some(s"""{"query": "SELECT msg FROM weblogs",
                 |"startTime": "10m", "endTime": "$end"}"""
          .stripMargin.replace("\n", "")))
      assert(qs2 == 401)
    } finally { srv.stop(); idp.stop(0); Rbac.clear() }
  }

  test("forged id_token, unknown state, open redirect, basic-for-cookie") {
    val idp = startIdp()
    val idpBase = s"http://127.0.0.1:${idp.getAddress.getPort}"
    val cfg = Oidc.Config(
      issuer = Issuer, clientId = ClientId, clientSecret = Secret,
      authorizeUrl = s"$idpBase/authorize", tokenUrl = s"$idpBase/token")
    val tmp = java.nio.file.Files.createTempDirectory("graft-oidc2").toString
    Rbac.clear()
    Rbac.grant("admin", Seq(Rbac.Admin()))
    val srv = new GraftHttpServer(spark, tmp, requireAuth = true,
      users = Map("admin" -> "pw"), oidc = Some(cfg))
    srv.start()
    try {
      val base = s"http://127.0.0.1:${srv.boundPort}/api/v1"

      // a forged id_token (wrong signing key) is rejected at the callback
      val (_, _, lh) = http("GET", s"$base/o/login")
      val state = lh("Location").head.split("state=")(1).split("&")(0)
      val (fs, fb, _) =
        http("GET", s"$base/o/callback?code=forged&state=$state")
      assert(fs == 401 && fb.contains("signature"))

      // a state the server never issued is rejected before any exchange
      val (us, _, _) =
        http("GET", s"$base/o/callback?code=good&state=not-issued")
      assert(us == 400)

      // absolute redirects to foreign hosts are refused (open redirect)
      val (es, _, _) =
        http("GET", s"$base/o/login?redirect=https%3A%2F%2Fevil.test%2Fx")
      assert(es == 400)

      // so are the browser-absolute shapes that LOOK relative:
      // scheme-relative //evil, backslash /\evil, authority-less https:/e
      for (evil <- Seq("%2F%2Fevil.test%2Fx", "%2F%5Cevil.test",
                       "https%3A%2Fevil.test")) {
        val (s, _, _) = http("GET", s"$base/o/login?redirect=$evil")
        assert(s == 400, s"redirect=$evil must be refused, got $s")
        val (so, _, _) = http("GET", s"$base/o/logout?redirect=$evil")
        assert(so == 400, s"logout redirect=$evil must be refused, got $so")
      }

      // valid Basic credentials exchange directly for a session cookie
      val (bs, _, bh) =
        http("GET", s"$base/o/login?redirect=/home", basic("admin", "pw"))
      assert(bs == 307 && bh("Location").head == "/home")
      assert(sessionOf(bh).nonEmpty)

      // no provider + no credentials → 401, not a silent redirect loop
      val srvNo = new GraftHttpServer(spark, tmp, requireAuth = true,
        users = Map("admin" -> "pw"))
      srvNo.start()
      try {
        val (ns, _, _) = http("GET",
          s"http://127.0.0.1:${srvNo.boundPort}/api/v1/o/login")
        assert(ns == 401)
      } finally srvNo.stop()
    } finally { srv.stop(); idp.stop(0); Rbac.clear() }
  }

  test("verifyIdToken rejects alg downgrade, bad issuer/audience, expiry") {
    val cfg = Oidc.Config(Issuer, ClientId, Secret, "http://a", "http://t")
    val now = Instant.now().getEpochSecond
    def claims(iss: String = Issuer, aud: String = ClientId,
               exp: Long = now + 600): String =
      s"""{"iss":"$iss","aud":"$aud","sub":"u1","exp":$exp}"""

    val good = Oidc.signHs256(claims(), Secret)
    assert(Oidc.verifyIdToken(good, cfg, now).isRight)

    assert(Oidc.verifyIdToken(Oidc.signHs256(claims(), "bad"), cfg, now)
      .left.exists(_.contains("signature")))
    assert(Oidc.verifyIdToken(Oidc.signHs256(claims(iss = "x"), Secret),
      cfg, now).left.exists(_.contains("issuer")))
    assert(Oidc.verifyIdToken(Oidc.signHs256(claims(aud = "x"), Secret),
      cfg, now).left.exists(_.contains("audience")))
    assert(Oidc.verifyIdToken(
      Oidc.signHs256(claims(exp = now - 3600), Secret), cfg, now)
      .left.exists(_.contains("expired")))

    // alg:none downgrade: unsigned token with a none header must not pass
    def b64(s: String) =
      Base64.getUrlEncoder.withoutPadding.encodeToString(s.getBytes(UTF_8))
    val none = s"${b64("""{"alg":"none","typ":"JWT"}""")}.${b64(claims())}."
    assert(Oidc.verifyIdToken(none, cfg, now).isLeft)

    // aud as an array (RFC 7519) still matches
    val arrAud = Oidc.signHs256(
      s"""{"iss":"$Issuer","aud":["other","$ClientId"],"sub":"u1",
         |"exp":${now + 600}}""".stripMargin.replace("\n", ""), Secret)
    assert(Oidc.verifyIdToken(arrAud, cfg, now).isRight)
  }

  /** Drive login → provider → callback for whatever username the stub IdP
    * asserts; returns (callback status, callback response headers).
    */
  private def loginAs(username: String): (Int, Map[String, Seq[String]]) = {
    val idp = startIdp(username)
    val idpBase = s"http://127.0.0.1:${idp.getAddress.getPort}"
    val cfg = Oidc.Config(
      issuer = Issuer, clientId = ClientId, clientSecret = Secret,
      authorizeUrl = s"$idpBase/authorize", tokenUrl = s"$idpBase/token")
    val tmp = java.nio.file.Files.createTempDirectory("graft-oidc3").toString
    val srv = new GraftHttpServer(spark, tmp, requireAuth = true,
      users = Map.empty, oidc = Some(cfg))
    srv.start()
    try {
      val base = s"http://127.0.0.1:${srv.boundPort}/api/v1"
      val (_, _, lh) = http("GET", s"$base/o/login?redirect=/after")
      val (_, _, ah) = http("GET", lh("Location").head)
      val (cs, _, ch) = http("GET", ah("Location").head)
      (cs, ch)
    } finally { srv.stop(); idp.stop(0); Rbac.clear() }
  }

  test("IdP-asserted usernames: traversal shapes refused, cookie value " +
       "percent-encoded, SameSite set") {
    // path separators / parent refs never reach cookies or the filesystem
    // third entry is a JSON \t escape -> a literal TAB once the IdP's
    // claims are parsed (control character)
    for (evil <- Seq("../secret", "a/b", "bad\\tname"))
      assert(loginAs(evil)._1 == 401, s"username '$evil' must be refused")
    // cookie-metacharacter names survive, but percent-encoded
    val (cs, ch) = loginAs("a;b,c=d")
    assert(cs == 307)
    val userCookie = setCookies(ch).find(_.startsWith("username=")).get
    assert(userCookie.startsWith("username=a%3Bb%2Cc%3Dd"),
      s"cookie value not encoded: $userCookie")
    assert(setCookies(ch).forall(c => !c.startsWith("session=") ||
      c.contains("SameSite=Lax")), s"session cookie lacks SameSite")
  }
}

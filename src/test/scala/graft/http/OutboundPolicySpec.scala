package graft.http

import java.net.{HttpURLConnection, URL}
import java.nio.charset.StandardCharsets.UTF_8
import java.util.Base64

import com.fasterxml.jackson.databind.ObjectMapper

import graft.SparkSuite
import graft.query.Rbac

/** Outbound-HTTP policy for alert targets (reference
  * `src/alerts/outbound_http_policy.rs` + `alert_target_policy.rs`):
  * validation rules, endpoint checks, and the admin HTTP surface gating
  * target creation.
  */
class OutboundPolicySpec extends SparkSuite {

  private val mapper = new ObjectMapper()

  test("policy validation: conflicting allow/deny CIDRs and domains refused") {
    import OutboundPolicy._
    assert(validate(Config()).isRight)
    assert(validate(Config(
      allowedCidrs = Seq("10.0.0.0/8"),
      deniedCidrs = Seq("10.1.0.0/16"))).isLeft) // contained → overlap
    assert(validate(Config(
      allowedCidrs = Seq("10.0.0.0/8"),
      deniedCidrs = Seq("192.168.0.0/16"))).isRight)
    assert(validate(Config(
      allowedDomains = Seq("api.example.com"),
      deniedDomains = Seq("example.com"))).isLeft) // subdomain overlap
    assert(validate(Config(
      allowedDomains = Seq("good.test"),
      deniedDomains = Seq("evil.test"))).isRight)
    assert(validate(Config(deniedCidrs = Seq("not-a-cidr"))).isLeft)
  }

  test("endpoint checks: denied domains, private addresses, slack " +
       "pinning, TLS gate") {
    import OutboundPolicy._
    val open = Config(allowPrivate = true, allowedCidrs = Seq("127.0.0.0/8"))
    // loopback passes only with allowPrivate AND an allowlist match
    assert(checkEndpoint("http://127.0.0.1:9/x", "webhook", skipTls = false,
      open).isRight)
    assert(checkEndpoint("http://127.0.0.1:9/x", "webhook", skipTls = false,
      Config(allowPrivate = true)).isLeft) // no allowlist match
    assert(checkEndpoint("http://127.0.0.1:9/x", "webhook", skipTls = false,
      Config(allowedCidrs = Seq("127.0.0.0/8"))).isLeft) // no allowPrivate
    // denied domain wins even when allowlisted
    assert(checkEndpoint("http://bad.internal/x", "webhook", skipTls = false,
      Config(deniedDomains = Seq("internal"))).isLeft)
    // scheme gates
    assert(checkEndpoint("ftp://host/x", "webhook", false, open).isLeft)
    assert(checkEndpoint("http://hooks.slack.com/x", "slack", false,
      open).isLeft) // slack requires https
    assert(checkEndpoint("https://127.0.0.1/x", "slack", false,
      open).isLeft) // slack host pinning
    // skipTlsCheck requires allowInvalidTls
    assert(checkEndpoint("http://127.0.0.1:9/x", "webhook", skipTls = true,
      open).isLeft)
    assert(checkEndpoint("http://127.0.0.1:9/x", "webhook", skipTls = true,
      open.copy(allowInvalidTls = true)).isRight)
  }

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

  test("policy HTTP surface: admin-gated PUT/GET; active policy gates " +
       "target creation") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-pol").toString
    Rbac.clear()
    Rbac.grant("root", Seq(Rbac.Admin()))
    Rbac.grant("eve", Seq(Rbac.Editor()))
    val srv = new GraftHttpServer(spark, tmp, requireAuth = true,
      users = Map("root" -> "pw", "eve" -> "pw"))
    srv.start()
    try {
      val base = s"http://127.0.0.1:${srv.boundPort}/api/v1"
      // no policy yet: a loopback webhook target creates fine (library
      // default is permissive until an operator opts in)
      val target = """{"type": "webhook", "name": "t1",
                     |"endpoint": "http://127.0.0.1:9/hook"}"""
        .stripMargin.replace("\n", " ")
      val (c0, b0) = http("POST", s"$base/targets", basic("root", "pw"),
        Some(target))
      assert(c0 == 200, b0)

      // non-admin cannot set policy; invalid policy is refused
      assert(http("PUT", s"$base/alert-target-policy", basic("eve", "pw"),
        Some("{}"))._1 == 403)
      assert(http("PUT", s"$base/alert-target-policy", basic("root", "pw"),
        Some("""{"allowed_cidrs": ["10.0.0.0/8"],
               |"denied_cidrs": ["10.0.1.0/24"]}"""
          .stripMargin.replace("\n", " ")))._1 == 400)

      // lock the tenant down: no private targets
      val (ps, pb) = http("PUT", s"$base/alert-target-policy",
        basic("root", "pw"), Some("""{"allow_private": false}"""))
      assert(ps == 200, pb)
      val (s1, b1) = http("POST", s"$base/targets", basic("root", "pw"),
        Some(target))
      assert(s1 == 400 && b1.contains("allowPrivate"), s"$s1 $b1")

      // open it up with an explicit allowlist: creation passes again
      assert(http("PUT", s"$base/alert-target-policy", basic("root", "pw"),
        Some("""{"allow_private": true, "allowed_cidrs": ["127.0.0.0/8"]}"""
        ))._1 == 200)
      assert(http("POST", s"$base/targets", basic("root", "pw"),
        Some(target))._1 == 200)
      // GET returns the stored policy
      val (gs, gb) = http("GET", s"$base/alert-target-policy",
        basic("root", "pw"))
      assert(gs == 200 &&
        mapper.readTree(gb).get("allow_private").asBoolean(), gb)
    } finally { srv.stop(); Rbac.clear() }
  }
}

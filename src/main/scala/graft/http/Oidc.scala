package graft.http

import java.net.URI
import java.net.http.{HttpClient, HttpRequest => JRequest, HttpResponse => JResponse}
import java.nio.charset.StandardCharsets.UTF_8
import java.security.MessageDigest
import java.util.Base64

import javax.crypto.Mac
import javax.crypto.spec.SecretKeySpec

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}

/** OIDC authorization-code login for the HTTP shell — the Spark-side analog
  * of the reference's OIDC flow (`src/handlers/http/oidc.rs:79-205` login /
  * reply_login, role resolution at `:206-260`): `/o/login` redirects to the
  * provider's authorize endpoint (or exchanges valid Basic credentials for a
  * session cookie directly), `/o/callback` exchanges the code at the token
  * endpoint, validates the returned `id_token`, maps claim groups to RBAC
  * roles, and mints a server-side session; `/o/logout` revokes it.
  *
  * Zero new dependencies: the token exchange uses the JDK `java.net.http`
  * client, JWTs are verified with `javax.crypto` (HS256 — the symmetric
  * confidential-client configuration; the client secret IS the key, so no
  * JWKS fetch is needed), JSON via the Jackson shipped with Spark.
  *
  * Trust model mirrors the reference: the id_token's signature, issuer,
  * audience and expiry are all checked before any claim is believed;
  * the `state` parameter is single-use with a TTL (CSRF + replay guard);
  * sessions are opaque random ids mapped server-side (nothing user-visible
  * is trusted).
  */
object Oidc {

  /** Provider + client configuration (reference `OpenidConfig`).
    *
    * `groupRoleMap` maps id_token `groups` entries to RBAC role names and
    * `defaultRole` applies when no group matches — the reference's
    * `resolve_roles` (oidc.rs:206-260): an existing user's explicit role
    * assignments always win over claim-derived ones.
    */
  final case class Config(
      issuer: String,
      clientId: String,
      clientSecret: String,
      authorizeUrl: String,
      tokenUrl: String,
      logoutUrl: Option[String] = None,
      scope: String = "openid profile email",
      defaultRole: Option[String] = None,
      groupRoleMap: Map[String, String] = Map.empty,
      clockSkewSecs: Long = 60L)

  /** The identity an id_token asserts (reference `extract_identity`). */
  final case class Identity(username: String, userId: String,
                            groups: Seq[String])

  private val mapper = new ObjectMapper()

  // --------------------------------------------------------------- JWT

  private def b64url(b: Array[Byte]): String =
    Base64.getUrlEncoder.withoutPadding.encodeToString(b)

  private def hs256(input: String, secret: String): Array[Byte] = {
    val mac = Mac.getInstance("HmacSHA256")
    mac.init(new SecretKeySpec(secret.getBytes(UTF_8), "HmacSHA256"))
    mac.doFinal(input.getBytes(UTF_8))
  }

  /** Mint an HS256 JWT from a claims JSON object — used by the test stub
    * IdP and by symmetric-client deployments that self-issue tokens.
    */
  def signHs256(claimsJson: String, secret: String): String = {
    val header = b64url("""{"alg":"HS256","typ":"JWT"}""".getBytes(UTF_8))
    val payload = b64url(claimsJson.getBytes(UTF_8))
    val input = s"$header.$payload"
    s"$input.${b64url(hs256(input, secret))}"
  }

  /** Verify an HS256 id_token end-to-end: structure, signature
    * (constant-time), `alg` (no `none` downgrade), `iss`, `aud`, `exp`
    * (with skew). Returns the claims on success.
    */
  def verifyIdToken(token: String, cfg: Config,
                    nowEpochSec: Long): Either[String, JsonNode] = {
    token.split("\\.") match {
      case Array(h, p, s) =>
        for {
          header <- parseB64Json(h, "header")
          _ <- Either.cond(
            Option(header.get("alg")).exists(_.asText() == "HS256"), (),
            "unsupported JWT alg (HS256 only)")
          sig <-
            try Right(Base64.getUrlDecoder.decode(s))
            catch { case _: IllegalArgumentException =>
              Left("malformed JWT signature") }
          _ <- Either.cond(
            MessageDigest.isEqual(sig, hs256(s"$h.$p", cfg.clientSecret)), (),
            "id_token signature mismatch")
          claims <- parseB64Json(p, "claims")
          _ <- Either.cond(
            Option(claims.get("iss")).exists(_.asText() == cfg.issuer), (),
            "id_token issuer mismatch")
          _ <- Either.cond(audMatches(claims.get("aud"), cfg.clientId), (),
            "id_token audience mismatch")
          _ <- Either.cond(
            Option(claims.get("exp")).exists(
              _.asLong() + cfg.clockSkewSecs > nowEpochSec), (),
            "id_token expired")
        } yield claims
      case _ => Left("malformed JWT (want header.payload.signature)")
    }
  }

  private def parseB64Json(part: String,
                           what: String): Either[String, JsonNode] =
    try Right(mapper.readTree(
      new String(Base64.getUrlDecoder.decode(part), UTF_8)))
    catch { case _: Exception => Left(s"malformed JWT $what") }

  /** `aud` may be a string or an array of strings (RFC 7519 §4.1.3). */
  private def audMatches(aud: JsonNode, clientId: String): Boolean =
    Option(aud).exists { n =>
      if (n.isArray) {
        val it = n.elements()
        var found = false
        while (it.hasNext && !found) found = it.next().asText() == clientId
        found
      } else n.asText() == clientId
    }

  // ----------------------------------------------------------- identity

  /** Username preference order mirrors the reference: `preferred_username`,
    * then `email`, then `sub`; `sub` itself is mandatory.
    */
  def extractIdentity(claims: JsonNode): Either[String, Identity] =
    Option(claims.get("sub")).map(_.asText()).filter(_.nonEmpty) match {
      case None => Left("id_token missing sub claim")
      case Some(sub) =>
        val username = Option(claims.get("preferred_username"))
          .orElse(Option(claims.get("email")))
          .map(_.asText()).filter(_.nonEmpty).getOrElse(sub)
        val groups = Option(claims.get("groups")).toSeq.flatMap { g =>
          if (!g.isArray) Seq.empty
          else {
            val out = Seq.newBuilder[String]
            val it = g.elements()
            while (it.hasNext) out += it.next().asText()
            out.result()
          }
        }
        Right(Identity(username, sub, groups))
    }

  /** Claim-derived roles: mapped groups first, `defaultRole` as fallback —
    * only applied to users with NO existing explicit assignment (the
    * reference keeps stored roles authoritative for known users).
    */
  def resolveRoles(identity: Identity, cfg: Config): Seq[String] = {
    val mapped = identity.groups.flatMap(cfg.groupRoleMap.get).distinct
    if (mapped.nonEmpty) mapped else cfg.defaultRole.toSeq
  }

  // ------------------------------------------------------ code exchange

  /** POST the authorization code to the token endpoint (confidential
    * client: HTTP Basic with client id/secret) and return the raw token
    * response JSON. Blocking is fine — this runs on the HTTP shell's own
    * pool, never on a Spark thread.
    */
  def exchangeCode(cfg: Config, code: String, redirectUri: String,
                   http: HttpClient): Either[String, JsonNode] = {
    val form = Seq(
      "grant_type" -> "authorization_code",
      "code" -> code,
      "redirect_uri" -> redirectUri)
      .map { case (k, v) =>
        s"$k=${java.net.URLEncoder.encode(v, UTF_8)}" }
      .mkString("&")
    val basic = Base64.getEncoder.encodeToString(
      s"${cfg.clientId}:${cfg.clientSecret}".getBytes(UTF_8))
    val req = JRequest.newBuilder(URI.create(cfg.tokenUrl))
      .header("Content-Type", "application/x-www-form-urlencoded")
      .header("Authorization", s"Basic $basic")
      .POST(JRequest.BodyPublishers.ofString(form))
      .build()
    try {
      val resp = http.send(req, JResponse.BodyHandlers.ofString())
      if (resp.statusCode() != 200)
        Left(s"token endpoint returned ${resp.statusCode()}")
      else Right(mapper.readTree(resp.body()))
    } catch {
      case e: Exception => Left(s"token exchange failed: ${e.getMessage}")
    }
  }

  /** Full callback-side login: code → token response → verified id_token →
    * identity. One seam for the server handler and the spec's negative
    * paths.
    */
  def completeLogin(cfg: Config, code: String, redirectUri: String,
                    http: HttpClient,
                    nowEpochSec: Long): Either[String, Identity] =
    for {
      tokens <- exchangeCode(cfg, code, redirectUri, http)
      idToken <- Option(tokens.get("id_token")).map(_.asText())
        .toRight("token response missing id_token")
      claims <- verifyIdToken(idToken, cfg, nowEpochSec)
      identity <- extractIdentity(claims)
    } yield identity

  /** The provider authorize redirect (response_type=code). */
  def authorizeRedirect(cfg: Config, redirectUri: String,
                        state: String): String = {
    def enc(s: String) = java.net.URLEncoder.encode(s, UTF_8)
    val sep = if (cfg.authorizeUrl.contains('?')) "&" else "?"
    s"${cfg.authorizeUrl}${sep}response_type=code&client_id=${enc(cfg.clientId)}" +
      s"&redirect_uri=${enc(redirectUri)}&scope=${enc(cfg.scope)}" +
      s"&state=${enc(state)}"
  }
}

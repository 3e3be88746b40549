package graft.http

import java.nio.charset.StandardCharsets.UTF_8
import java.util.Base64

import scala.jdk.CollectionConverters._

import com.sun.net.httpserver.HttpExchange
import org.apache.spark.sql.functions.{col, count, floor, lit, unix_millis}

import graft.ingest.IngestPipeline
import graft.query.{Alerts, Counts, QueryService, Rbac, ResponseWriter, TimeRange}

import GraftHttpServer._

/** OIDC login/callback/logout, session cookies, redirect validation
  * and Basic-for-cookie exchange.
  *
  * One surface of [[GraftHttpServer]] — split out for maintainability;
  * state and shared plumbing stay on the server class (self-type).
  */
private[http] trait OidcRoutes { self: GraftHttpServer =>

  // ------------------------------------------------------- OIDC sessions

  private[http] def cookieMap(ex: HttpExchange): Map[String, String] =
    Option(ex.getRequestHeaders.getFirst("Cookie")).toSeq
      .flatMap(_.split(";").toSeq).flatMap { c =>
        c.trim.split("=", 2) match {
          case Array(k, v) => Some(k -> v)
          case _           => None
        }
      }.toMap

  private[http] def sessionCookie(ex: HttpExchange): Option[String] =
    cookieMap(ex).get("session")

  /** Live user behind a session id; expired entries are dropped on read. */
  private[http] def sessionUser(id: String): Option[String] =
    Option(sessions.get(id)).flatMap { s =>
      if (s.expiresAtMs > System.currentTimeMillis()) Some(s.user)
      else { sessions.remove(id); None }
    }

  private[http] def randomToken(): String = {
    val b = new Array[Byte](24)
    rng.nextBytes(b)
    Base64.getUrlEncoder.withoutPadding.encodeToString(b)
  }

  private[http] def newSession(user: String): String = {
    val id = randomToken()
    sessions.put(id, Session(user, System.currentTimeMillis() + SessionTtlMs))
    id
  }

  /** Reference `is_valid_redirect_url`: path-relative targets are fine;
    * anything carrying a scheme or an authority must point back at this
    * server's own host. Browsers resolve scheme-relative `//evil.com` (and
    * the `/\evil.com` backslash variant, and authority-less `https:/e`) as
    * absolute — all are caught here: a backslash fails URI parsing, and a
    * scheme or authority triggers the host check.
    */
  private[http] def validRedirect(ex: HttpExchange, target: String): Boolean = {
    val host = Option(ex.getRequestHeaders.getFirst("Host"))
      .getOrElse(s"127.0.0.1:$boundPort")
    try {
      val u = new java.net.URI(target)
      if (u.getScheme != null || u.getAuthority != null)
        u.getAuthority == host
      else !target.startsWith("//") && !target.startsWith("\\")
    } catch { case _: Exception => false }
  }

  private[http] def redirect(ex: HttpExchange, location: String,
                       cookies: Seq[String] = Seq.empty): Unit = {
    cookies.foreach(c => ex.getResponseHeaders.add("Set-Cookie", c))
    ex.getResponseHeaders.set("Location", location)
    ex.sendResponseHeaders(307, -1)
    ex.close()
  }

  private[http] def sessionSetCookie(id: String): String =
    s"session=$id; Path=/; HttpOnly; SameSite=Lax; " +
      s"Max-Age=${SessionTtlMs / 1000}"

  /** IdP-asserted usernames flow into cookie values and filesystem paths
    * (UserConfigs/Rbac stores) — refuse anything that could traverse or
    * inject: path separators, parent refs, control characters.
    */
  private[http] def usableUsername(u: String): Boolean =
    u.nonEmpty && u.length <= 256 && !u.contains("/") &&
      !u.contains("\\") && !u.contains("..") &&
      u.forall(c => c >= 0x20 && c != 0x7f)

  /** `GET /api/v1/o/login?redirect=…` — with valid Basic credentials,
    * exchange them for a session cookie (reference's basic-for-cookie
    * path); otherwise redirect to the provider's authorize endpoint with a
    * fresh single-use `state`.
    */
  private[http] def handleOidcLogin(ex: HttpExchange): Unit = {
    val target = queryParams(ex).getOrElse("redirect", "/")
    if (!validRedirect(ex, target)) {
      err(ex, 400, "invalid redirect URL"); return
    }
    basicUser(ex) match {
      case Right(Some(user)) =>
        redirect(ex, target, Seq(sessionSetCookie(newSession(user))))
      case _ => oidc match {
        case None => err(ex, 401, "no OIDC provider configured")
        case Some(cfg) =>
          // sweep stale states so abandoned logins don't accumulate
          val now = System.currentTimeMillis()
          pendingStates.entrySet().removeIf(e =>
            e.getValue.createdMs + StateTtlMs < now)
          val state = randomToken()
          pendingStates.put(state, Pending(target, now))
          redirect(ex,
            Oidc.authorizeRedirect(cfg, callbackUri(ex), state))
      }
    }
  }

  private[http] def callbackUri(ex: HttpExchange): String = {
    val host = Option(ex.getRequestHeaders.getFirst("Host"))
      .getOrElse(s"127.0.0.1:$boundPort")
    s"http://$host/api/v1/o/callback"
  }

  /** `GET /api/v1/o/callback?code=…&state=…` — the provider redirects the
    * browser here; exchange the code, verify the id_token, resolve roles
    * (claim-mapped only for users with no explicit assignment), mint the
    * session.
    */
  private[http] def handleOidcCallback(ex: HttpExchange): Unit = oidc match {
    case None => err(ex, 401, "no OIDC provider configured")
    case Some(cfg) =>
      val params = queryParams(ex)
      (params.get("code"), params.get("state")) match {
        case (Some(code), Some(state)) =>
          Option(pendingStates.remove(state)) match {
            case None => err(ex, 400, "unknown or expired login state")
            case Some(pending)
                if pending.createdMs + StateTtlMs <
                  System.currentTimeMillis() =>
              err(ex, 400, "unknown or expired login state")
            case Some(pending) =>
              Oidc.completeLogin(cfg, code, callbackUri(ex), httpClient,
                System.currentTimeMillis() / 1000L) match {
                case Left(msg) => err(ex, 401, msg)
                case Right(identity) if !usableUsername(identity.username) =>
                  err(ex, 401, "identity provider asserted an unusable username")
                case Right(identity) =>
                  // stored role assignments win; claim-derived roles only
                  // seed users the RBAC registry has never seen
                  if (Rbac.rolesOf(identity.username).isEmpty) {
                    val derived = Oidc.resolveRoles(identity, cfg)
                      .filter(Rbac.getRole(_).nonEmpty)
                    if (derived.nonEmpty)
                      Rbac.assignRoles(identity.username, derived)
                  }
                  // percent-encoded: ';'/','/'=' in an IdP-asserted name
                  // must not break out of the cookie value
                  val encUser = java.net.URLEncoder
                    .encode(identity.username, UTF_8)
                  redirect(ex, pending.redirect, Seq(
                    sessionSetCookie(newSession(identity.username)),
                    s"username=$encUser; Path=/; SameSite=Lax"))
              }
          }
        case _ => err(ex, 400, "need code and state")
      }
  }

  /** `GET /api/v1/o/logout?redirect=…` — drop the session server-side and
    * expire the cookie; send the browser to the provider's logout endpoint
    * when one is configured.
    */
  private[http] def handleOidcLogout(ex: HttpExchange): Unit = {
    val target = queryParams(ex).getOrElse("redirect", "/")
    if (!validRedirect(ex, target)) {
      err(ex, 400, "invalid redirect URL"); return
    }
    sessionCookie(ex).foreach(sessions.remove)
    val location = oidc.flatMap(_.logoutUrl).getOrElse(target)
    redirect(ex, location,
      Seq("session=; Path=/; HttpOnly; Max-Age=0"))
  }

  private[http] def handleOidc(ex: HttpExchange): Unit = {
    if (ex.getRequestMethod != "GET") { err(ex, 405, "GET only"); return }
    ex.getRequestURI.getPath match {
      case "/api/v1/o/login"    => handleOidcLogin(ex)
      case "/api/v1/o/callback" => handleOidcCallback(ex)
      case "/api/v1/o/logout"   => handleOidcLogout(ex)
      case other                => err(ex, 404, s"no such path: $other")
    }
  }

  private[http] def basicUser(ex: HttpExchange): Either[String, Option[String]] = {
    Option(ex.getRequestHeaders.getFirst("Authorization")) match {
      case Some(h) if h.startsWith("Basic ") =>
        // malformed base64 is a credential problem (401), not a server 500
        try {
          val decoded = new String(
            Base64.getDecoder.decode(h.stripPrefix("Basic ").trim), UTF_8)
          decoded.split(":", 2) match {
            case Array(u, p) if users.get(u).contains(p) => Right(Some(u))
            // dynamically-created accounts (PBKDF2-verified); static
            // config wins on a name collision (protected root users)
            case Array(u, p) if !users.contains(u) &&
                userAccounts.verify(u, p) => Right(Some(u))
            case _ => Left("invalid credentials")
          }
        } catch {
          case _: IllegalArgumentException => Left("malformed Basic credentials")
        }
      case _ => Left("missing Basic authorization")
    }
  }
}

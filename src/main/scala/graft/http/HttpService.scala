package graft.http

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets.UTF_8
import java.util.Base64

import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.ObjectMapper
import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.{col, count, floor, lit, unix_millis}

import graft.ingest.IngestPipeline
import graft.query.{Alerts, Counts, QueryService, Rbac, ResponseWriter, TimeRange}

/** Minimal HTTP service shell binding the ingest and query libraries to a
  * port — the Spark-side analog of the reference's actix handlers
  * (`src/handlers/http/ingest.rs:69-180` ingest flow,
  * `src/handlers/http/query.rs:63-77` query flow), on the JDK's built-in
  * `com.sun.net.httpserver` (zero extra dependencies).
  *
  * Endpoints (reference API shapes):
  *   - `POST /api/v1/ingest` — header `X-P-Stream` names the stream, body
  *     is a JSON object or array of objects. Runs the full
  *     [[IngestPipeline]] (flatten → rename → schema-merge → enrich) and
  *     appends to the stream's minute-partitioned parquet table.
  *   - `POST /api/v1/query` — body
  *     `{"query": sql, "startTime": t, "endTime": t}` with human times
  *     ("now", "10m", RFC-3339 — [[TimeRange.parseHumanTime]]). The time
  *     window is injected into every referenced stream
  *     ([[QueryService.query]]). `Accept: application/x-ndjson` streams
  *     newline-delimited rows through `toLocalIterator` (bounded driver
  *     memory); anything else returns one JSON array.
  *   - `POST|GET|PUT|DELETE /api/v1/filters[/{id}]` and
  *     `/api/v1/dashboards[/{id}]` — per-user saved filters and dashboards
  *     CRUD ([[UserConfigs]]; reference `src/users/filters.rs`,
  *     `src/users/dashboards.rs`). Filters name a stream and require query
  *     access to it; both kinds resolve only within the calling user's
  *     own namespace.
  *   - `GET /api/v1/liveness`, `GET /api/v1/readiness` — health probes.
  *   - `GET /api/v1/o/login|callback|logout` — OIDC authorization-code
  *     login ([[Oidc]]; reference `src/handlers/http/oidc.rs`): login
  *     redirects to the provider (or exchanges valid Basic credentials for
  *     a session cookie — the reference's basic-for-cookie path), callback
  *     validates the id_token and mints a session, logout revokes it.
  *
  * Auth: when `requireAuth` is set, requests carry a `session` cookie
  * (minted by the OIDC flow), HTTP Basic credentials, or an `x-api-key`
  * header (reference `src/apikeys.rs` — each key backs a user;
  * [[revokeApiKey]] kills a key at runtime). The resolved username feeds
  * the [[Rbac]] grants table, and queries run through the same
  * `user_auth_for_datasets` gate.
  *
  * Multi-tenancy (reference `src/tenants/mod.rs`,
  * `stream_schema_provider.rs:76-109`): `userTenants` assigns users to
  * tenants (absent = the default tenant). Streams are registered,
  * stored (`<root>/<tenant>/<stream>`) and RBAC-checked under
  * tenant-scoped keys, and every request resolves stream NAMES strictly
  * inside the caller's tenant — tenant A cannot even name tenant B's
  * streams. Default-tenant keys stay un-prefixed, so single-tenant
  * deployments are unchanged.
  *
  * Scale note: this shell is a driver-side front door for API-sized
  * payloads — exactly the reference's standalone mode. Bulk ingestion
  * belongs on the executor path ([[graft.streaming.IngestStream]]); query
  * results stream with bounded memory. The server itself is a fixed
  * thread pool; Spark serializes/parallelizes the real work.
  */
final class GraftHttpServer(
    spark: SparkSession,
    root: String,
    port: Int = 0,
    requireAuth: Boolean = false,
    users: Map[String, String] = Map.empty,
    threads: Int = 8,
    userTenants: Map[String, String] = Map.empty,
    apiKeys: Map[String, String] = Map.empty,
    oidc: Option[Oidc.Config] = None,
    role: Cluster.NodeRole = Cluster.All,
    nodeId: String = "") {

  import GraftHttpServer.{DefaultTenant, SessionTtlMs, StateTtlMs}

  private val mapper = new ObjectMapper()
  private val configs =
    new java.util.concurrent.ConcurrentHashMap[String, IngestPipeline.StreamConfig]()
  val registry = new IngestPipeline.SchemaRegistry
  private val userConfigs = new UserConfigs(root)
  private val alertStore = new AlertStore(root)
  private val revokedKeys =
    java.util.concurrent.ConcurrentHashMap.newKeySet[String]()

  // OIDC state: opaque session ids → (user, expiry); single-use login
  // states → (redirect target, creation time). Both maps are bounded by
  // TTL sweeps on access — no background reaper thread needed.
  private case class Session(user: String, expiresAtMs: Long)
  private val sessions =
    new java.util.concurrent.ConcurrentHashMap[String, Session]()
  private case class Pending(redirect: String, createdMs: Long)
  private val pendingStates =
    new java.util.concurrent.ConcurrentHashMap[String, Pending]()
  // hot-tier config per stream key: how many newest dates stay pinned
  private val hotTierKeep =
    new java.util.concurrent.ConcurrentHashMap[String, Integer]()
  private lazy val httpClient = java.net.http.HttpClient.newBuilder()
    .connectTimeout(java.time.Duration.ofSeconds(5)).build()
  private val rng = new java.security.SecureRandom()

  // request counters surfaced by /metrics (reference's prometheus
  // middleware); cheap atomics, bumped on the hot handlers
  private val startedAtMs = System.currentTimeMillis()
  private val ingestCalls = new java.util.concurrent.atomic.AtomicLong
  private val ingestedEvents = new java.util.concurrent.atomic.AtomicLong
  private val queryCalls = new java.util.concurrent.atomic.AtomicLong

  // cluster metastore lives in the shared storage root — the same place
  // the data goes, so every node sees the same registrations
  private val metaStore = new Cluster.MetaStore(root)
  private val myNodeId =
    if (nodeId.nonEmpty) nodeId else s"node-${randomToken().take(8)}"

  /** Kill an API key at runtime (reference key revocation). */
  def revokeApiKey(token: String): Unit = { revokedKeys.add(token); () }

  private val server =
    HttpServer.create(new InetSocketAddress("127.0.0.1", port), 0)
  private val pool =
    java.util.concurrent.Executors.newFixedThreadPool(threads)
  server.setExecutor(pool)

  /** Ephemeral-port deployments read the bound port after construction. */
  def boundPort: Int = server.getAddress.getPort

  /** Tenant of a resolved user; unauthenticated and unassigned users live
    * in the default tenant.
    */
  private def tenantOf(user: Option[String]): String =
    user.flatMap(userTenants.get).getOrElse(DefaultTenant)

  /** Tenant-scoped stream key — registry, storage path suffix and RBAC
    * resource. Default-tenant keys stay bare for single-tenant
    * compatibility.
    */
  private def tenantKey(tenant: String, stream: String): String =
    if (tenant == DefaultTenant) stream else s"$tenant/$stream"

  /** Streams of the DEFAULT tenant (single-tenant compatibility surface). */
  def streams: Map[String, QueryService.Stream] = streamsFor(DefaultTenant)

  /** Streams visible to `tenant`, keyed by their BARE name — the resolution
    * map a query from that tenant sees; other tenants' streams are simply
    * absent from it.
    */
  def streamsFor(tenant: String): Map[String, QueryService.Stream] = {
    // streams ingested through OTHER nodes of the cluster resolve here via
    // the shared metastore — a querier node knows every ingestor's streams
    val keys = configs.keys().asScala.toSet ++ metaStore.streams()
    keys.toSeq.flatMap { key =>
      val bare =
        if (tenant == DefaultTenant) Option.when(!key.contains('/'))(key)
        else Option.when(key.startsWith(s"$tenant/"))(
          key.stripPrefix(s"$tenant/"))
      // streams with a maintained stats catalog read through the
      // catalog-backed FileIndex (file pruning before any footer opens)
      bare.map(_ -> QueryService.Stream(s"$root/$key", "p_timestamp",
        catalogPath = Option(statsPath(key))
          .filter(p => new java.io.File(p).isDirectory)))
    }.toMap
  }

  /** Pre-register a stream (e.g. one written by a previous process) so
    * queries can see it without a prior ingest through this server.
    */
  def registerStream(name: String,
                     cfg: IngestPipeline.StreamConfig,
                     tenant: String = DefaultTenant): Unit = {
    configs.put(tenantKey(tenant, name), cfg); ()
  }

  // ------------------------------------------------------------- plumbing

  private def respond(ex: HttpExchange, status: Int, body: String,
                      contentType: String = "application/json"): Unit = {
    val bytes = body.getBytes(UTF_8)
    ex.getResponseHeaders.set("Content-Type", contentType)
    ex.sendResponseHeaders(status, bytes.length.toLong)
    try ex.getResponseBody.write(bytes)
    finally ex.close()
  }

  private def err(ex: HttpExchange, status: Int, msg: String): Unit =
    respond(ex, status,
      mapper.writeValueAsString(
        mapper.createObjectNode().put("error", msg)))

  /** Authenticated user, if valid; Right(None) when auth is not required.
    * Order mirrors the reference middleware: a `session` cookie (the OIDC
    * session key) first, then `x-api-key` (token → backing user, unless
    * revoked), then Basic credentials.
    */
  private def authedUser(ex: HttpExchange): Either[String, Option[String]] = {
    if (!requireAuth) Right(None)
    else sessionCookie(ex).flatMap(sessionUser) match {
      case Some(user) => Right(Some(user))
      case None => Option(ex.getRequestHeaders.getFirst("x-api-key")) match {
        case Some(token) =>
          if (revokedKeys.contains(token)) Left("API key revoked")
          else apiKeys.get(token) match {
            case Some(user) => Right(Some(user))
            case None       => Left("invalid API key")
          }
        case None => basicUser(ex)
      }
    }
  }

  // ------------------------------------------------------- OIDC sessions

  private def cookieMap(ex: HttpExchange): Map[String, String] =
    Option(ex.getRequestHeaders.getFirst("Cookie")).toSeq
      .flatMap(_.split(";").toSeq).flatMap { c =>
        c.trim.split("=", 2) match {
          case Array(k, v) => Some(k -> v)
          case _           => None
        }
      }.toMap

  private def sessionCookie(ex: HttpExchange): Option[String] =
    cookieMap(ex).get("session")

  /** Live user behind a session id; expired entries are dropped on read. */
  private def sessionUser(id: String): Option[String] =
    Option(sessions.get(id)).flatMap { s =>
      if (s.expiresAtMs > System.currentTimeMillis()) Some(s.user)
      else { sessions.remove(id); None }
    }

  private def randomToken(): String = {
    val b = new Array[Byte](24)
    rng.nextBytes(b)
    Base64.getUrlEncoder.withoutPadding.encodeToString(b)
  }

  private def newSession(user: String): String = {
    val id = randomToken()
    sessions.put(id, Session(user, System.currentTimeMillis() + SessionTtlMs))
    id
  }

  private def queryParams(ex: HttpExchange): Map[String, String] =
    Option(ex.getRequestURI.getRawQuery).toSeq
      .flatMap(_.split("&").toSeq).flatMap { kv =>
        kv.split("=", 2) match {
          case Array(k, v) =>
            Some(k -> java.net.URLDecoder.decode(v, UTF_8))
          case _ => None
        }
      }.toMap

  /** Reference `is_valid_redirect_url`: path-relative targets are fine;
    * anything carrying a scheme or an authority must point back at this
    * server's own host. Browsers resolve scheme-relative `//evil.com` (and
    * the `/\evil.com` backslash variant, and authority-less `https:/e`) as
    * absolute — all are caught here: a backslash fails URI parsing, and a
    * scheme or authority triggers the host check.
    */
  private def validRedirect(ex: HttpExchange, target: String): Boolean = {
    val host = Option(ex.getRequestHeaders.getFirst("Host"))
      .getOrElse(s"127.0.0.1:$boundPort")
    try {
      val u = new java.net.URI(target)
      if (u.getScheme != null || u.getAuthority != null)
        u.getAuthority == host
      else !target.startsWith("//") && !target.startsWith("\\")
    } catch { case _: Exception => false }
  }

  private def redirect(ex: HttpExchange, location: String,
                       cookies: Seq[String] = Seq.empty): Unit = {
    cookies.foreach(c => ex.getResponseHeaders.add("Set-Cookie", c))
    ex.getResponseHeaders.set("Location", location)
    ex.sendResponseHeaders(307, -1)
    ex.close()
  }

  private def sessionSetCookie(id: String): String =
    s"session=$id; Path=/; HttpOnly; SameSite=Lax; " +
      s"Max-Age=${SessionTtlMs / 1000}"

  /** IdP-asserted usernames flow into cookie values and filesystem paths
    * (UserConfigs/Rbac stores) — refuse anything that could traverse or
    * inject: path separators, parent refs, control characters.
    */
  private def usableUsername(u: String): Boolean =
    u.nonEmpty && u.length <= 256 && !u.contains("/") &&
      !u.contains("\\") && !u.contains("..") &&
      u.forall(c => c >= 0x20 && c != 0x7f)

  /** `GET /api/v1/o/login?redirect=…` — with valid Basic credentials,
    * exchange them for a session cookie (reference's basic-for-cookie
    * path); otherwise redirect to the provider's authorize endpoint with a
    * fresh single-use `state`.
    */
  private def handleOidcLogin(ex: HttpExchange): Unit = {
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

  private def callbackUri(ex: HttpExchange): String = {
    val host = Option(ex.getRequestHeaders.getFirst("Host"))
      .getOrElse(s"127.0.0.1:$boundPort")
    s"http://$host/api/v1/o/callback"
  }

  /** `GET /api/v1/o/callback?code=…&state=…` — the provider redirects the
    * browser here; exchange the code, verify the id_token, resolve roles
    * (claim-mapped only for users with no explicit assignment), mint the
    * session.
    */
  private def handleOidcCallback(ex: HttpExchange): Unit = oidc match {
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
  private def handleOidcLogout(ex: HttpExchange): Unit = {
    val target = queryParams(ex).getOrElse("redirect", "/")
    if (!validRedirect(ex, target)) {
      err(ex, 400, "invalid redirect URL"); return
    }
    sessionCookie(ex).foreach(sessions.remove)
    val location = oidc.flatMap(_.logoutUrl).getOrElse(target)
    redirect(ex, location,
      Seq("session=; Path=/; HttpOnly; Max-Age=0"))
  }

  private def handleOidc(ex: HttpExchange): Unit = {
    if (ex.getRequestMethod != "GET") { err(ex, 405, "GET only"); return }
    ex.getRequestURI.getPath match {
      case "/api/v1/o/login"    => handleOidcLogin(ex)
      case "/api/v1/o/callback" => handleOidcCallback(ex)
      case "/api/v1/o/logout"   => handleOidcLogout(ex)
      case other                => err(ex, 404, s"no such path: $other")
    }
  }

  private def basicUser(ex: HttpExchange): Either[String, Option[String]] = {
    Option(ex.getRequestHeaders.getFirst("Authorization")) match {
      case Some(h) if h.startsWith("Basic ") =>
        // malformed base64 is a credential problem (401), not a server 500
        try {
          val decoded = new String(
            Base64.getDecoder.decode(h.stripPrefix("Basic ").trim), UTF_8)
          decoded.split(":", 2) match {
            case Array(u, p) if users.get(u).contains(p) => Right(Some(u))
            case _ => Left("invalid credentials")
          }
        } catch {
          case _: IllegalArgumentException => Left("malformed Basic credentials")
        }
      case _ => Left("missing Basic authorization")
    }
  }

  private def handler(f: HttpExchange => Unit): HttpHandler =
    new HttpHandler {
      override def handle(ex: HttpExchange): Unit =
        try f(ex)
        catch {
          case e: Exception =>
            try err(ex, 500, String.valueOf(e.getMessage))
            catch { case _: Exception => () }
        }
    }

  // ------------------------------------------------------------ endpoints

  private def handleIngest(ex: HttpExchange): Unit = {
    // a querier node does not mount ingest routes (reference modal split)
    if (role == Cluster.Querier) {
      err(ex, 404, "ingest is not available on a querier node"); return
    }
    if (ex.getRequestMethod != "POST") { err(ex, 405, "POST only"); return }
    authedUser(ex) match {
      case Left(msg) => err(ex, 401, msg)
      case Right(user) =>
        val tenant = tenantOf(user)
        Option(ex.getRequestHeaders.getFirst("X-P-Stream")) match {
          case None => err(ex, 400, "missing X-P-Stream header")
          case Some(stream) if user.exists(
                !Rbac.authorized(_, Rbac.IngestAction,
                  tenantKey(tenant, stream))) =>
            err(ex, 403,
              s"user '${user.get}' lacks ingest access to stream '$stream'")
          case Some(stream) =>
            val body = new String(ex.getRequestBody.readAllBytes(), UTF_8)
            // storage path and registry are tenant-scoped: the same stream
            // NAME in two tenants is two disjoint tables
            val cfg = configs.computeIfAbsent(tenantKey(tenant, stream),
              key => {
                // advertise new streams in the shared metastore so the
                // cluster's querier nodes can resolve them
                metaStore.putStream(key)
                IngestPipeline.StreamConfig(key)
              })
            val ua =
              Option(ex.getRequestHeaders.getFirst("User-Agent")).getOrElse("")
            val ip = ex.getRemoteAddress.getAddress.getHostAddress
            IngestPipeline.ingest(spark, registry, cfg, body, ua, ip) match {
              case Left(msg) => err(ex, 400, msg)
              case Right(df) =>
                val n = df.count()
                appendWithStats(df, cfg)
                ingestCalls.incrementAndGet()
                ingestedEvents.addAndGet(n)
                respond(ex, 200, mapper.writeValueAsString(
                  mapper.createObjectNode()
                    .put("status", "ok").put("events", n)))
            }
        }
    }
  }

  /** OTLP/HTTP ingestion (reference `get_ingest_otel_factory`,
    * `server.rs:653-682`: `POST /v1/logs|metrics|traces` with
    * `X-P-Stream`): the OTLP JSON payload flattens through
    * [[graft.ingest.OtelFlatten]] into wide rows, then rides the exact
    * same pipeline as plain JSON ingest (schema registry, enrichment,
    * partitioned append, stats catalog).
    */
  private def handleOtelIngest(ex: HttpExchange): Unit = {
    if (role == Cluster.Querier) {
      err(ex, 404, "ingest is not available on a querier node"); return
    }
    if (ex.getRequestMethod != "POST") { err(ex, 405, "POST only"); return }
    val signal = Option(ex.getRequestURI.getPath)
      .map(_.stripPrefix("/v1").stripPrefix("/")).getOrElse("")
    val flatten: String => Seq[com.fasterxml.jackson.databind.node.ObjectNode] =
      signal match {
        case "logs"    => graft.ingest.OtelFlatten.flattenLogs
        case "metrics" => graft.ingest.OtelFlatten.flattenMetrics
        case "traces"  => graft.ingest.OtelFlatten.flattenTraces
        case other => err(ex, 404, s"unknown OTLP signal '$other'"); return
      }
    authedUser(ex) match {
      case Left(msg) => err(ex, 401, msg)
      case Right(user) =>
        val tenant = tenantOf(user)
        Option(ex.getRequestHeaders.getFirst("X-P-Stream")) match {
          case None => err(ex, 400, "missing X-P-Stream header")
          case Some(stream) if user.exists(
                !Rbac.authorized(_, Rbac.IngestAction,
                  tenantKey(tenant, stream))) =>
            err(ex, 403,
              s"user '${user.get}' lacks ingest access to stream '$stream'")
          case Some(stream) =>
            val body = new String(ex.getRequestBody.readAllBytes(), UTF_8)
            val events =
              try flatten(body)
              catch {
                case e: com.fasterxml.jackson.core.JacksonException =>
                  err(ex, 400,
                    s"malformed OTLP JSON: ${e.getOriginalMessage}")
                  return
              }
            val cfg = configs.computeIfAbsent(tenantKey(tenant, stream),
              key => { metaStore.putStream(key)
                IngestPipeline.StreamConfig(key) })
            val ua =
              Option(ex.getRequestHeaders.getFirst("User-Agent")).getOrElse("")
            val ip = ex.getRemoteAddress.getAddress.getHostAddress
            IngestPipeline.ingestEvents(spark, registry, cfg, events, ua, ip,
                format = s"otel-$signal") match {
              case Left(msg) => err(ex, 400, msg)
              case Right(df) =>
                val n = df.count()
                appendWithStats(df, cfg)
                ingestCalls.incrementAndGet()
                ingestedEvents.addAndGet(n)
                respond(ex, 200, mapper.writeValueAsString(
                  mapper.createObjectNode()
                    .put("status", "ok").put("events", n)))
            }
        }
    }
  }

  private def handleQuery(ex: HttpExchange): Unit = {
    // an ingestor node does not mount query routes (reference modal split)
    if (role == Cluster.Ingestor) {
      err(ex, 404, "query is not available on an ingestor node"); return
    }
    // the /query context also receives its sub-path (reference mounts
    // POST /query/context as a sibling resource)
    if (ex.getRequestURI.getPath.stripSuffix("/") == "/api/v1/query/context") {
      handleQueryContext(ex); return
    }
    if (ex.getRequestMethod != "POST") { err(ex, 405, "POST only"); return }
    authedUser(ex) match {
      case Left(msg) => err(ex, 401, msg)
      case Right(user) =>
        val body =
          try mapper.readTree(
            new String(ex.getRequestBody.readAllBytes(), UTF_8))
          catch {
            case e: com.fasterxml.jackson.core.JacksonException =>
              err(ex, 400, s"malformed JSON body: ${e.getOriginalMessage}")
              return
          }
        queryCalls.incrementAndGet()
        val sql = Option(body.get("query")).map(_.asText())
        val start = Option(body.get("startTime")).map(_.asText())
        val end = Option(body.get("endTime")).map(_.asText())
        (sql, start, end) match {
          case (Some(q), Some(s0), Some(e0)) =>
            val range =
              try TimeRange.parse(s0, e0)
              catch {
                case e: Exception => err(ex, 400, s"bad time: ${e.getMessage}")
                  return
              }
            // stream names resolve strictly inside the caller's tenant —
            // another tenant's streams are absent from this map entirely
            val visible = streamsFor(tenantOf(user))
            // reference `handle_count_query`: a bare COUNT(*) over a
            // catalog-backed stream answers from manifest row counts for
            // the window (one-bin density) — no data scan
            QueryService.bareCountStar(spark, q) match {
              case Some((table, outName))
                  if visible.get(table).exists(_.catalogPath.isDefined) &&
                    user.forall(Rbac.authorized(_, Rbac.QueryAction,
                      tenantKey(tenantOf(user), table))) =>
                val st = visible(table)
                val startMs = range.start.toEpochMilli
                val endMs = math.max(startMs + 1, range.end.toEpochMilli)
                val dense =
                  try Counts.binDensityFromStats(
                    graft.catalog.StatsCatalog.resolve(spark,
                      st.catalogPath.get),
                    st.timeCol, startMs, endMs, binMillis = endMs - startMs,
                    readFiles = paths => spark.read.parquet(paths: _*))
                  catch { case _: Exception => None }
                dense match {
                  case Some(pairs) =>
                    val o = mapper.createArrayNode()
                    o.addObject().put(outName, pairs.map(_._2).sum)
                    respond(ex, 200, mapper.writeValueAsString(o))
                    return
                  case None => () // fall through to normal execution
                }
              case _ => ()
            }
            val tenant = tenantOf(user)
            val referenced = QueryService.referencedTables(spark, q)
            // every referenced relation must be a stream the caller can
            // see — silently dropping unknown names would let resolution
            // fall through to whatever the shared session catalog happens
            // to hold (another tenant's view, a leftover table). One
            // message for both "absent" and "other tenant's": no
            // cross-tenant existence oracle.
            val unknown = referenced.filterNot(visible.contains)
            val result =
              if (unknown.nonEmpty)
                Left("unknown or unauthorized table(s): " +
                  unknown.mkString(", "))
              else user match {
                case Some(u) =>
                  referenced.find(n => !Rbac.authorized(u, Rbac.QueryAction,
                      tenantKey(tenant, n))) match {
                    case Some(n) =>
                      Left(s"user '$u' lacks query access to stream '$n'")
                    case None =>
                      Right(QueryService.query(spark, visible, q, range,
                        scope = tenant))
                  }
                case None =>
                  Right(QueryService.query(spark, visible, q, range,
                    scope = tenant))
              }
            result match {
              case Left(msg) => err(ex, 403, msg)
              case Right(df) =>
                val ndjson = Option(ex.getRequestHeaders.getFirst("Accept"))
                  .exists(_.contains("application/x-ndjson"))
                if (ndjson) {
                  ex.getResponseHeaders
                    .set("Content-Type", "application/x-ndjson")
                  ex.sendResponseHeaders(200, 0) // chunked
                  val w = new java.io.OutputStreamWriter(
                    ex.getResponseBody, UTF_8)
                  try ResponseWriter.writeNdjson(df, w)
                  finally { w.close(); ex.close() }
                } else respond(ex, 200, ResponseWriter.toJsonArray(df))
            }
          case _ => err(ex, 400, "need query, startTime, endTime")
        }
    }
  }

  /** The stream's per-file stats catalog (the reference's manifest),
    * maintained incrementally on every append so `/counts` (bin density)
    * and stats fast paths answer from metadata.
    */
  private def statsPath(streamKey: String): String =
    s"$root/.stats/$streamKey"

  // per-stream serialization of catalog rewrites: two concurrent appends
  // must not interleave list-then-overwrite (one would drop the other's
  // rows, and the catalog is load-bearing for reads)
  private val statsLocks =
    new java.util.concurrent.ConcurrentHashMap[String, Object]()

  /** Exact event count via the catalog, reconciling it first (one listing
    * — what a bare parquet count pays anyway) so files written or DELETED
    * out-of-band (compaction, retention, manual copies) are folded in and
    * later reads through the catalog see them too. None when no catalog is
    * maintained.
    */
  private def syncedCountStar(streamKey: String): Option[Long] = {
    val cat = statsPath(streamKey)
    if (!new java.io.File(cat).isDirectory) None
    else {
      val lock = statsLocks.computeIfAbsent(streamKey, _ => new Object)
      lock.synchronized {
        try {
          graft.catalog.TxnCatalog.reconcile(spark, s"$root/$streamKey",
            cat, Seq("p_timestamp"))
          Some(graft.catalog.StatsCatalog.countStar(spark, cat))
        } catch { case _: Exception => None }
      }
    }
  }

  private def appendWithStats(df: org.apache.spark.sql.DataFrame,
                              cfg: IngestPipeline.StreamConfig): Unit = {
    IngestPipeline.append(df, root, cfg)
    // live-tail fan-out (reference livetail.rs `process`): only pay the
    // collect when someone is actually tailing; persisted=true because the
    // rows are already in the table (no staging double count)
    if (graft.streaming.LiveTail.subscriberCount(cfg.name) > 0)
      graft.streaming.LiveTail.publish(cfg.name, df, persisted = true)
    val timeCol = cfg.timePartition.getOrElse("p_timestamp")
    val lock = statsLocks.computeIfAbsent(cfg.name, _ => new Object)
    lock.synchronized {
      // stats upkeep must never fail an ingest, but queries read THROUGH
      // the catalog once it exists — on failure, drop it entirely so
      // readers fall back to full listing (correct, just slower); the next
      // successful sync rebuilds it. The hot path is the transaction log's
      // watermarked append: O(new partitions) listed per ingest, one
      // atomic catalog version appended — never a full relist or a
      // full-catalog rewrite (the economics that survive 100 TB).
      try {
        graft.catalog.TxnCatalog.appendNewFilesWatermarked(spark,
          s"$root/${cfg.name}", statsPath(cfg.name), Seq(timeCol))
        graft.catalog.TxnCatalog.vacuum(statsPath(cfg.name), keep = 3)
      } catch {
        case _: Exception =>
          val dir = new org.apache.hadoop.fs.Path(statsPath(cfg.name))
          try dir.getFileSystem(spark.sessionState.newHadoopConf())
            .delete(dir, true)
          catch { case _: Exception => () }
          ()
      }
    }
  }

  /** `POST /api/v1/counts` (reference `query::get_counts`,
    * `CountsRequest` at `src/query/mod.rs:516-527`): per-bin record counts
    * of one stream over a time range, the console's histogram strip. Body
    * `{"stream": "s", "startTime": "...", "endTime": "...",
    * "numBins": 30?, "conditions": <where-tree>?}`; times accept the
    * human forms ("now", "10m", RFC3339). Bins are equal slices of the
    * range (absent numBins → the auto interval of [[Counts.autoBinMillis]]),
    * returned DENSE — empty bins report zero, as the console expects.
    *
    * Scale: one map-side-combinable groupBy on the bin index over a
    * time-pruned scan; the driver materializes at most `MaxCountBins`
    * rows.
    */
  private def handleCounts(ex: HttpExchange): Unit = {
    if (role == Cluster.Ingestor) {
      err(ex, 404, "query is not available on an ingestor node"); return
    }
    if (ex.getRequestMethod != "POST") { err(ex, 405, "POST only"); return }
    authedUser(ex) match {
      case Left(msg) => err(ex, 401, msg)
      case Right(user) =>
        val body =
          try mapper.readTree(
            new String(ex.getRequestBody.readAllBytes(), UTF_8))
          catch {
            case e: com.fasterxml.jackson.core.JacksonException =>
              err(ex, 400, s"malformed JSON body: ${e.getOriginalMessage}")
              return
          }
        val streamName = body.path("stream").asText("")
        val start = body.path("startTime").asText("")
        val end = body.path("endTime").asText("")
        if (streamName.isEmpty || start.isEmpty || end.isEmpty) {
          err(ex, 400, "need stream, startTime, endTime"); return
        }
        val tenant = tenantOf(user)
        val stream = streamsFor(tenant).get(streamName) match {
          case Some(s) => s
          case None => err(ex, 404, s"stream '$streamName' not found"); return
        }
        if (user.exists(!Rbac.authorized(_, Rbac.QueryAction,
            tenantKey(tenant, streamName)))) {
          err(ex, 403,
            s"user '${user.get}' lacks query access to stream '$streamName'")
          return
        }
        val range =
          try TimeRange.parse(start, end)
          catch {
            case e: Exception => err(ex, 400, s"bad time: ${e.getMessage}")
              return
          }
        val startMs = range.start.toEpochMilli
        val rangeMs = math.max(1L, range.end.toEpochMilli - startMs)
        val binMillis = Option(body.get("numBins")).map(_.asLong()) match {
          case Some(n) if n <= 0 =>
            err(ex, 400, "numBins must be positive"); return
          case Some(n) => math.max(1L, (rangeMs + n - 1) / n)
          case None    => Counts.autoBinMillis(range.duration)
        }
        val bins = ((rangeMs + binMillis - 1) / binMillis).toInt
        if (bins > GraftHttpServer.MaxCountBins) {
          err(ex, 400, s"$bins bins exceed the ${GraftHttpServer.MaxCountBins}" +
            " cap; widen the bins or narrow the range")
          return
        }
        val where = Option(body.get("conditions")) match {
          case None => None
          case Some(c) => alertStore.parseCondition(c) match {
            case Left(msg)   => err(ex, 400, msg); return
            case Right(node) => Some(Alerts.Conditions.toColumn(node))
          }
        }
        // manifest fast path (reference `get_bin_density`): an unfiltered
        // histogram answers from the stream's stats catalog — only files
        // straddling a bin boundary are scanned
        val catDir = statsPath(tenantKey(tenant, streamName))
        if (where.isEmpty && new java.io.File(catDir).isDirectory) {
          val dense =
            try Counts.binDensityFromStats(
              graft.catalog.StatsCatalog.resolve(spark, catDir),
              stream.timeCol, startMs, range.end.toEpochMilli, binMillis,
              paths => spark.read.parquet(paths: _*))
            catch { case _: Exception => None }
          dense match {
            case Some(pairs) =>
              respondCounts(ex, startMs, binMillis, bins, pairs.toMap)
              return
            case None => () // fall through to the scan
          }
        }
        val t = col(stream.timeCol).cast("timestamp")
        val filtered =
          try QueryService.windowedRead(spark, streamName, stream, range)
          catch {
            case _: org.apache.spark.sql.AnalysisException =>
              respondCounts(ex, startMs, binMillis, bins, Map.empty); return
          }
        val sparse = where.foldLeft(filtered)(_ filter _)
          .groupBy(floor((unix_millis(t) - startMs) / binMillis)
            .cast("int").as("bin"))
          .agg(count(lit(1)).as("cnt"))
          .collect()
          .map(r => r.getInt(0) -> r.getLong(1)).toMap
        respondCounts(ex, startMs, binMillis, bins, sparse)
    }
  }

  private def respondCounts(ex: HttpExchange, startMs: Long, binMillis: Long,
                            bins: Int, counts: Map[Int, Long]): Unit = {
    val o = mapper.createObjectNode()
    val fields = o.putArray("fields")
    Seq("start_time", "end_time", "count").foreach(fields.add)
    val records = o.putArray("records")
    (0 until bins).foreach { i =>
      val r = records.addObject()
      r.put("start_time",
        java.time.Instant.ofEpochMilli(startMs + i * binMillis).toString)
      r.put("end_time",
        java.time.Instant.ofEpochMilli(startMs + (i + 1) * binMillis).toString)
      r.put("count", counts.getOrElse(i, 0L))
    }
    respond(ex, 200, mapper.writeValueAsString(o))
  }

  /** `POST /api/v1/query/context` (reference `query_context.rs`
    * `LogContextRequest`): the page of logs AROUND an anchor timestamp —
    * `pageSize/2` newest rows strictly before it plus `pageSize/2` rows
    * from it onward, both inside `contextWindow` (default 10m each way),
    * returned oldest-first with the anchor's index. Keyset semantics as in
    * [[LogContext]]: both sides are time-pruned scans with top-k limits —
    * page cost is independent of stream size.
    */
  private def handleQueryContext(ex: HttpExchange): Unit = {
    if (ex.getRequestMethod != "POST") { err(ex, 405, "POST only"); return }
    authedUser(ex) match {
      case Left(msg) => err(ex, 401, msg)
      case Right(user) =>
        val body =
          try mapper.readTree(
            new String(ex.getRequestBody.readAllBytes(), UTF_8))
          catch {
            case e: com.fasterxml.jackson.core.JacksonException =>
              err(ex, 400, s"malformed JSON body: ${e.getOriginalMessage}")
              return
          }
        val dataset = body.path("dataset").asText("")
        val anchorText = body.path("pTimestamp").asText("")
        if (dataset.isEmpty || anchorText.isEmpty) {
          err(ex, 400, "need dataset, pTimestamp"); return
        }
        val anchor =
          try java.time.ZonedDateTime.parse(anchorText,
              java.time.format.DateTimeFormatter.ISO_DATE_TIME).toInstant
          catch {
            case e: Exception =>
              err(ex, 400, s"bad pTimestamp: ${e.getMessage}"); return
          }
        val window = body.path("contextWindow").asText("10m") match {
          case GraftHttpServer.RelativeWindow(n, unit) =>
            val amount = n.toLong
            unit match {
              case "s" => java.time.Duration.ofSeconds(amount)
              case "m" => java.time.Duration.ofMinutes(amount)
              case "h" => java.time.Duration.ofHours(amount)
              case "d" => java.time.Duration.ofDays(amount)
            }
          case other => err(ex, 400, s"bad contextWindow '$other'"); return
        }
        val pageSize = math.min(
          Option(body.get("pageSize")).map(_.asInt())
            .getOrElse(GraftHttpServer.DefaultContextPageSize),
          10 * GraftHttpServer.DefaultContextPageSize)
        if (pageSize <= 0) { err(ex, 400, "pageSize must be positive"); return }
        val tenant = tenantOf(user)
        val stream = streamsFor(tenant).get(dataset) match {
          case Some(s) => s
          case None => err(ex, 404, s"stream '$dataset' not found"); return
        }
        if (user.exists(!Rbac.authorized(_, Rbac.QueryAction,
            tenantKey(tenant, dataset)))) {
          err(ex, 403,
            s"user '${user.get}' lacks query access to stream '$dataset'")
          return
        }
        val df =
          try QueryService.windowedRead(spark, dataset, stream,
            TimeRange(anchor.minus(window), anchor.plus(window).plusMillis(1)))
          catch {
            case _: org.apache.spark.sql.AnalysisException =>
              err(ex, 404, s"stream '$dataset' has no data"); return
          }
        val t = col(stream.timeCol).cast("timestamp")
        val anchorTs = lit(java.sql.Timestamp.from(anchor))
        val half = math.max(1, pageSize / 2)
        val beforeDf = df.filter(t < anchorTs)
          .orderBy(t.desc).limit(half)
        val afterDf = df.filter(t >= anchorTs)
          .orderBy(t.asc).limit(pageSize - half)
        val beforeArr = mapper.readTree(ResponseWriter.toJsonArray(beforeDf))
        val afterArr = mapper.readTree(ResponseWriter.toJsonArray(afterDf))
        val o = mapper.createObjectNode()
        o.put("scope", "contextWindow")
        o.put("contextStartTime", anchor.minus(window).toString)
        o.put("contextEndTime", anchor.plus(window).toString)
        o.put("limit", pageSize)
        o.put("anchorIndex", beforeArr.size())
        val records = o.putArray("records")
        // before-page arrives newest-first; the response is oldest-first
        (beforeArr.size() - 1 to 0 by -1).foreach(i =>
          records.add(beforeArr.get(i)))
        afterArr.forEach(r => { records.add(r); () })
        respond(ex, 200, mapper.writeValueAsString(o))
    }
  }

  /** Saved filters / dashboards CRUD (reference `src/users/filters.rs`,
    * `src/users/dashboards.rs`): objects live under the calling user's own
    * (tenant, user) namespace — other users' ids are 404 by construction.
    * Filters additionally name a stream and require query access to it.
    */
  private def handleUserConfigs(kind: UserConfigs.Kind)
                               (ex: HttpExchange): Unit = {
    authedUser(ex) match {
      case Left(msg) => err(ex, 401, msg)
      case Right(userOpt) =>
        val user = userOpt.getOrElse("anonymous")
        val tenant = tenantOf(userOpt)
        val base = s"/api/v1/${kind.name}"
        val id = Option(ex.getRequestURI.getPath)
          .map(_.stripPrefix(base).stripPrefix("/")).filter(_.nonEmpty)
        def parseBody(): Option[com.fasterxml.jackson.databind.node.ObjectNode] =
          try mapper.readTree(
              new String(ex.getRequestBody.readAllBytes(), UTF_8)) match {
            case o: com.fasterxml.jackson.databind.node.ObjectNode => Some(o)
            case _ => err(ex, 400, "body must be a JSON object"); None
          } catch {
            case e: com.fasterxml.jackson.core.JacksonException =>
              err(ex, 400, s"malformed JSON body: ${e.getOriginalMessage}")
              None
          }
        def canQueryStream(s: String): Boolean = userOpt.forall(
          Rbac.authorized(_, Rbac.QueryAction, tenantKey(tenant, s)))
        // per-kind validation: filters bind one stream (reference filter
        // authorization); correlations bind exactly two, with matching
        // join tables (reference `CorrelationConfig::validate`,
        // `src/correlation.rs:280-314`)
        def validate(node: com.fasterxml.jackson.databind.node.ObjectNode)
            : Either[(Int, String), Unit] = kind match {
          case UserConfigs.Filters =>
            Option(node.get("stream_name")).map(_.asText()) match {
              case Some(s) if !canQueryStream(s) =>
                Left((403,
                  s"user '$user' lacks query access to the filter's stream"))
              case _ => Right(())
            }
          case UserConfigs.Correlations =>
            val tables = Option(node.get("tableConfigs")).toSeq
              .flatMap(_.elements().asScala)
              .map(_.path("tableName").asText()).toSet
            val joinTables = Option(node.get("joinConfig")).toSeq
              .flatMap(c => Option(c.get("joinConditions")).toSeq)
              .flatMap(_.elements().asScala)
              .map(_.path("tableName").asText()).toSet
            if (tables.size != 2)
              Left((400, "must provide config for two unique tables"))
            else if (joinTables.nonEmpty && joinTables != tables)
              Left((400,
                "must provide same tables for join config and table config"))
            else tables.find(!canQueryStream(_)) match {
              case Some(s) =>
                Left((403, s"user '$user' lacks query access to '$s'"))
              case None => Right(())
            }
          case _ => Right(())
        }
        (ex.getRequestMethod, id) match {
          case ("POST", None) =>
            parseBody().foreach { node =>
              validate(node) match {
                case Left((code, msg)) => err(ex, code, msg)
                case Right(()) => respond(ex, 200, mapper.writeValueAsString(
                  userConfigs.create(tenant, user, kind, node)))
              }
            }
          case ("GET", None) =>
            respond(ex, 200, mapper.writeValueAsString(
              mapper.valueToTree[com.fasterxml.jackson.databind.JsonNode](
                userConfigs.list(tenant, user, kind).toArray)))
          case ("GET", Some(oid)) =>
            userConfigs.get(tenant, user, kind, oid) match {
              case Some(node) =>
                respond(ex, 200, mapper.writeValueAsString(node))
              case None => err(ex, 404, s"${kind.name} '$oid' not found")
            }
          case ("PUT", Some(oid)) =>
            parseBody().foreach { node =>
              validate(node) match {
                case Left((code, msg)) => err(ex, code, msg)
                case Right(()) =>
                  userConfigs.update(tenant, user, kind, oid, node) match {
                    case Some(updated) =>
                      respond(ex, 200, mapper.writeValueAsString(updated))
                    case None =>
                      err(ex, 404, s"${kind.name} '$oid' not found")
                  }
              }
            }
          case ("DELETE", Some(oid)) =>
            if (userConfigs.delete(tenant, user, kind, oid))
              respond(ex, 200, """{"status":"deleted"}""")
            else err(ex, 404, s"${kind.name} '$oid' not found")
          case _ => err(ex, 405, "unsupported method/path")
        }
    }
  }

  /** Roles CRUD (reference `src/handlers/http/role.rs`, admin-gated):
    *   - `PUT /api/v1/role/{name}` — body is a JSON array of privilege
    *     objects `{"privilege": "admin|editor|writer|reader|ingestor",
    *     "stream": "s"?}` (absent stream = all streams);
    *   - `GET /api/v1/role` (list) / `GET /api/v1/role/{name}`;
    *   - `DELETE /api/v1/role/{name}` — refused while users hold it;
    *   - `PUT /api/v1/role/{name}/users` — body `["user", …]` assigns the
    *     role (reference user-role mapping).
    * Stream scopes are tenant-scoped for the CALLING admin's tenant, so a
    * tenant admin cannot mint privileges on another tenant's streams.
    */
  private def handleRoles(ex: HttpExchange): Unit = {
    authedUser(ex) match {
      case Left(msg) => err(ex, 401, msg)
      case Right(userOpt) =>
        if (requireAuth && !userOpt.exists(Rbac.isAdmin)) {
          err(ex, 403, "role management requires admin privileges")
          return
        }
        val tenant = tenantOf(userOpt)
        val rest = Option(ex.getRequestURI.getPath)
          .map(_.stripPrefix("/api/v1/role").stripPrefix("/"))
          .filter(_.nonEmpty).map(_.split("/", 2).toSeq)
        def parsePrivileges(node: com.fasterxml.jackson.databind.JsonNode)
            : Either[String, Seq[Rbac.Privilege]] =
          if (!node.isArray) Left("body must be a JSON array of privileges")
          else {
            val out = Seq.newBuilder[Rbac.Privilege]
            val it = node.elements()
            while (it.hasNext) {
              val p = it.next()
              val stream = Option(p.get("stream")).map(_.asText())
                .map(tenantKey(tenant, _))
              val kind = Option(p.get("privilege")).map(_.asText().toLowerCase)
              // a tenant admin may only mint privileges scoped to its own
              // tenant's streams — global/wildcard privileges would reach
              // across tenants
              if (tenant != DefaultTenant &&
                  (stream.isEmpty || kind.exists(Set("admin", "editor"))))
                return Left("tenant-scoped roles must name a stream and " +
                  "cannot be admin/editor")
              kind match {
                case Some("admin")    => out += Rbac.Admin()
                case Some("editor")   => out += Rbac.Editor()
                case Some("writer")   => out += Rbac.Writer(stream)
                case Some("reader")   => out += Rbac.Reader(stream)
                case Some("ingestor") => out += Rbac.Ingestor(stream)
                case other => return Left(s"unknown privilege: $other")
              }
            }
            Right(out.result())
          }
        def privilegesJson(ps: Seq[Rbac.Privilege]): String = {
          val arr = mapper.createArrayNode()
          ps.foreach { p =>
            val o = arr.addObject()
            o.put("privilege", p match {
              case Rbac.Admin()       => "admin"
              case Rbac.Editor()      => "editor"
              case _: Rbac.Writer     => "writer"
              case _: Rbac.Reader     => "reader"
              case _: Rbac.Ingestor   => "ingestor"
            })
            p.stream.foreach(o.put("stream", _))
          }
          mapper.writeValueAsString(arr)
        }
        def body(): com.fasterxml.jackson.databind.JsonNode =
          mapper.readTree(new String(ex.getRequestBody.readAllBytes(), UTF_8))
        (ex.getRequestMethod, rest) match {
          case ("GET", None) =>
            val o = mapper.createObjectNode()
            Rbac.listRoles().toSeq.sortBy(_._1).foreach { case (n, ps) =>
              o.set[com.fasterxml.jackson.databind.JsonNode](
                n, mapper.readTree(privilegesJson(ps)))
            }
            respond(ex, 200, mapper.writeValueAsString(o))
          case ("GET", Some(Seq(name))) =>
            Rbac.getRole(name) match {
              case Some(ps) => respond(ex, 200, privilegesJson(ps))
              case None     => err(ex, 404, s"role '$name' not found")
            }
          case ("PUT", Some(Seq(name))) =>
            parsePrivileges(body()) match {
              case Left(msg) => err(ex, 400, msg)
              case Right(ps) =>
                Rbac.putRole(name, ps)
                respond(ex, 200, """{"status":"ok"}""")
            }
          case ("PUT", Some(Seq(name, "users"))) =>
            val b = body()
            if (!b.isArray) { err(ex, 400, "body must be a JSON array"); return }
            val users = (0 until b.size()).map(b.get(_).asText())
            val failure = users.iterator.map(u =>
              Rbac.assignRoles(u, (Rbac.rolesOf(u) :+ name).distinct))
              .collectFirst { case Left(msg) => msg }
            failure match {
              case Some(msg) => err(ex, 400, msg)
              case None      => respond(ex, 200, """{"status":"ok"}""")
            }
          case ("DELETE", Some(Seq(name))) =>
            Rbac.deleteRole(name) match {
              case Left(msg) => err(ex, 409, msg)
              case Right(()) => respond(ex, 200, """{"status":"deleted"}""")
            }
          case _ => err(ex, 405, "unsupported method/path")
        }
    }
  }

  /** Cluster management (reference `cluster/mod.rs` handlers, served by
    * querier-class nodes; admin-gated):
    *   - `GET /api/v1/cluster/info` — every registered node with a live
    *     reachability probe;
    *   - `DELETE /api/v1/cluster/{nodeId}` — drop a DEAD node's
    *     registration (refused with 400 while the node answers liveness).
    */
  private def handleCluster(ex: HttpExchange): Unit = {
    if (role == Cluster.Ingestor) {
      err(ex, 404, "cluster management is not available on an ingestor node")
      return
    }
    authedUser(ex) match {
      case Left(msg) => err(ex, 401, msg)
      case Right(userOpt) =>
        if (requireAuth && !userOpt.exists(Rbac.isAdmin)) {
          err(ex, 403, "cluster management requires admin privileges")
          return
        }
        val rest = Option(ex.getRequestURI.getPath)
          .map(_.stripPrefix("/api/v1/cluster").stripPrefix("/"))
          .filter(_.nonEmpty)
        (ex.getRequestMethod, rest) match {
          case ("GET", Some("info")) =>
            val arr = mapper.createArrayNode()
            Cluster.clusterInfo(metaStore, root, httpClient).foreach { n =>
              val o = arr.addObject()
                .put("node_id", n.nodeId).put("url", n.url)
                .put("role", n.role).put("reachable", n.reachable)
                .put("storage_path", n.storagePath)
              n.status.foreach(o.put("status", _))
              n.error.foreach(o.put("error", _))
            }
            respond(ex, 200, mapper.writeValueAsString(arr))
          case ("DELETE", Some(id)) if id.nonEmpty && id != "info" =>
            Cluster.removeNode(metaStore, id, httpClient) match {
              case Left(msg)    => err(ex, 400, msg)
              case Right(true)  => respond(ex, 200,
                s"""{"status":"node '$id' removed"}""")
              case Right(false) => err(ex, 404, s"node '$id' not found")
            }
          case _ => err(ex, 405, "unsupported method/path")
        }
    }
  }

  // ---------------------------------------------------- stream management

  /** Stream management (reference `src/handlers/http/logstream.rs`):
    *   - `GET /api/v1/logstream` — visible streams (query-authorized only);
    *   - `PUT /api/v1/logstream/{name}` — create (ingest privilege);
    *   - `DELETE /api/v1/logstream/{name}` — drop data + registration
    *     (admin);
    *   - `GET …/{name}/schema` — the stream's accumulated schema;
    *   - `GET …/{name}/stats` — event count + storage bytes;
    *   - `GET|PUT …/{name}/retention` — retention config
    *     ([[graft.catalog.Retention]], reference `storage/retention.rs`);
    *   - `POST …/{name}/retention/cleanup` — enforce now (admin), returns
    *     the removed `date=…` partitions.
    */
  private def handleLogstream(ex: HttpExchange): Unit = {
    authedUser(ex) match {
      case Left(msg) => err(ex, 401, msg)
      case Right(userOpt) =>
        val tenant = tenantOf(userOpt)
        val rest = Option(ex.getRequestURI.getPath)
          .map(_.stripPrefix("/api/v1/logstream").stripPrefix("/"))
          .filter(_.nonEmpty).map(_.split("/", 2).toSeq)
        def key(name: String) = tenantKey(tenant, name)
        def canQuery(name: String): Boolean =
          userOpt.forall(Rbac.authorized(_, Rbac.QueryAction, key(name)))
        def canIngest(name: String): Boolean =
          userOpt.forall(Rbac.authorized(_, Rbac.IngestAction, key(name)))
        def isAdminUser: Boolean =
          !requireAuth || userOpt.exists(Rbac.isAdmin)
        def streamDir(name: String) = s"$root/${key(name)}"
        def retentionPath(name: String) =
          new org.apache.hadoop.fs.Path(streamDir(name), "_retention.json")
        def hadoopFs(p: org.apache.hadoop.fs.Path) =
          p.getFileSystem(spark.sessionState.newHadoopConf())
        def exists(name: String): Boolean =
          streamsFor(tenant).contains(name)
        (ex.getRequestMethod, rest) match {
          case ("GET", None) =>
            val arr = mapper.createArrayNode()
            streamsFor(tenant).keys.toSeq.sorted
              .filter(canQuery)
              .foreach(n => arr.addObject().put("name", n))
            respond(ex, 200, mapper.writeValueAsString(arr))
          case ("POST", Some(Seq("schema", "detect"))) =>
            // reference detect_schema: infer the flattened schema a JSON
            // payload WOULD get, without creating anything
            val body = new String(ex.getRequestBody.readAllBytes(), UTF_8)
            (try IngestPipeline.prepare(body,
              IngestPipeline.StreamConfig("__detect"))
            catch {
              case e: com.fasterxml.jackson.core.JacksonException =>
                Left(s"malformed JSON body: ${e.getOriginalMessage}")
            }) match {
              case Left(msg) => err(ex, 400, msg)
              case Right(events) =>
                val schema = events
                  .map(graft.ingest.SchemaInference.inferSchema)
                  .foldLeft(new org.apache.spark.sql.types.StructType()) {
                    (acc, s) => graft.ingest.SchemaInference
                      .tryMerge(acc, s).getOrElse(acc)
                  }
                respond(ex, 200, schema.json)
            }
          case ("PUT", Some(Seq(name))) =>
            if (!canIngest(name)) {
              err(ex, 403,
                s"user lacks privilege to create stream '$name'"); return
            }
            configs.computeIfAbsent(key(name), k => {
              metaStore.putStream(k)
              IngestPipeline.StreamConfig(k)
            })
            respond(ex, 200, s"""{"status":"created stream '$name'"}""")
          case ("DELETE", Some(Seq(name))) =>
            if (!isAdminUser) {
              err(ex, 403, "stream deletion requires admin privileges")
              return
            }
            if (!exists(name)) {
              err(ex, 404, s"stream '$name' not found"); return
            }
            val dir = new org.apache.hadoop.fs.Path(streamDir(name))
            hadoopFs(dir).delete(dir, true)
            val cat = new org.apache.hadoop.fs.Path(statsPath(key(name)))
            hadoopFs(cat).delete(cat, true)
            configs.remove(key(name))
            registry.remove(key(name))
            metaStore.removeStream(key(name))
            respond(ex, 200, s"""{"status":"deleted stream '$name'"}""")
          case ("GET", Some(Seq(name, "schema"))) =>
            if (!canQuery(name)) { err(ex, 403, "forbidden"); return }
            // stored parquet is authoritative (includes enrichment columns
            // like p_timestamp); the registry covers not-yet-written streams
            (try Some(spark.read.parquet(streamDir(name)).schema)
             catch { case _: Exception => None })
              .orElse(registry.get(key(name))) match {
              case Some(schema) => respond(ex, 200, schema.json)
              case None => err(ex, 404, s"stream '$name' not found")
            }
          case ("GET", Some(Seq(name, "stats"))) =>
            if (!canQuery(name)) { err(ex, 403, "forbidden"); return }
            if (!exists(name)) {
              err(ex, 404, s"stream '$name' not found"); return
            }
            val dir = new org.apache.hadoop.fs.Path(streamDir(name))
            val fs = hadoopFs(dir)
            val (events, bytes) =
              if (!fs.exists(dir)) (0L, 0L)
              else {
                val sum = fs.getContentSummary(dir)
                // synced-catalog num_rows when maintained (no file opens,
                // and the sync folds in out-of-band files); else parquet
                // footer-metadata count
                val n = syncedCountStar(key(name)).getOrElse(
                  try spark.read.parquet(streamDir(name)).count()
                  catch { case _: Exception => 0L })
                (n, sum.getLength)
              }
            val o = mapper.createObjectNode().put("stream", name)
            o.putObject("ingestion").put("count", events)
            o.putObject("storage").put("size", bytes)
            respond(ex, 200, mapper.writeValueAsString(o))
          case ("GET", Some(Seq(name, "retention"))) =>
            if (!canQuery(name)) { err(ex, 403, "forbidden"); return }
            val p = retentionPath(name)
            val fs = hadoopFs(p)
            if (!fs.exists(p)) { respond(ex, 200, "[]"); return }
            val in = fs.open(p)
            val json =
              try new String(in.readAllBytes(), UTF_8) finally in.close()
            respond(ex, 200, json)
          case ("PUT", Some(Seq(name, "retention"))) =>
            if (!isAdminUser) {
              err(ex, 403, "retention config requires admin privileges")
              return
            }
            if (!exists(name)) {
              err(ex, 404, s"stream '$name' not found"); return
            }
            val body = new String(ex.getRequestBody.readAllBytes(), UTF_8)
            graft.catalog.Retention.parse(body) match {
              case Left(msg) => err(ex, 400, msg)
              case Right(tasks) =>
                val p = retentionPath(name)
                val out = hadoopFs(p).create(p, true)
                try out.write(
                  graft.catalog.Retention.render(tasks).getBytes(UTF_8))
                finally out.close()
                respond(ex, 200, """{"status":"ok"}""")
            }
          case ("POST", Some(Seq(name, "retention/cleanup"))) =>
            if (!isAdminUser) {
              err(ex, 403, "retention cleanup requires admin privileges")
              return
            }
            val removed = enforceRetention(name, tenant)
            // the catalog must forget the dropped partitions' files
            if (removed.nonEmpty) { syncedCountStar(key(name)); () }
            val o = mapper.createObjectNode()
            val arr = o.putArray("removed")
            removed.foreach(arr.add)
            respond(ex, 200, mapper.writeValueAsString(o))
          // hot tier (reference put/get/delete_stream_hot_tier,
          // logstream.rs:421-560): pin the newest date partitions of the
          // stream into the executor-local cache tier
          case ("PUT", Some(Seq(name, "hottier"))) =>
            if (!isAdminUser) {
              err(ex, 403, "hot tier requires admin privileges"); return
            }
            if (!exists(name)) {
              err(ex, 404, s"stream '$name' not found"); return
            }
            val body =
              try mapper.readTree(
                new String(ex.getRequestBody.readAllBytes(), UTF_8))
              catch {
                case e: com.fasterxml.jackson.core.JacksonException =>
                  err(ex, 400,
                    s"malformed JSON body: ${e.getOriginalMessage}")
                  return
              }
            Option(body.get("size")).foreach(s =>
              graft.catalog.HotTier.budgetBytes = s.asLong())
            val keep = Option(body.get("keep_dates")).map(_.asInt())
              .getOrElse(1)
            if (keep < 0) { err(ex, 400, "keep_dates must be >= 0"); return }
            hotTierKeep.put(key(name), keep)
            val pinned = graft.catalog.HotTier.refresh(spark, root,
              key(name), keep)
            val o = mapper.createObjectNode().put("keep_dates", keep)
            val arr = o.putArray("pinned")
            pinned.foreach(arr.add)
            respond(ex, 200, mapper.writeValueAsString(o))
          case ("GET", Some(Seq(name, "hottier"))) =>
            if (!canQuery(name)) { err(ex, 403, "forbidden"); return }
            Option(hotTierKeep.get(key(name))) match {
              case None =>
                err(ex, 404, s"hot tier not configured for '$name'")
              case Some(keep) =>
                val o = mapper.createObjectNode().put("keep_dates", keep)
                  .put("used_bytes", graft.catalog.HotTier.usedBytes(spark))
                respond(ex, 200, mapper.writeValueAsString(o))
            }
          case ("DELETE", Some(Seq(name, "hottier"))) =>
            if (!isAdminUser) {
              err(ex, 403, "hot tier requires admin privileges"); return
            }
            if (Option(hotTierKeep.remove(key(name))).isEmpty) {
              err(ex, 404, s"hot tier not configured for '$name'"); return
            }
            graft.catalog.HotTier.refresh(spark, root, key(name), 0)
            respond(ex, 200, """{"status":"hot tier disabled"}""")
          case _ => err(ex, 405, "unsupported method/path")
        }
    }
  }

  /** Run the stream's configured retention delete task now; returns the
    * removed `date=…` partition names. A deployment runs this daily (the
    * reference's midnight scheduler) — here it's an explicit admin call so
    * enforcement time is under the operator's control.
    */
  def enforceRetention(name: String,
                       tenant: String = DefaultTenant): Seq[String] = {
    val dir = s"$root/${tenantKey(tenant, name)}"
    val p = new org.apache.hadoop.fs.Path(dir, "_retention.json")
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(p)) Seq.empty
    else {
      val in = fs.open(p)
      val json =
        try new String(in.readAllBytes(), UTF_8) finally in.close()
      graft.catalog.Retention.parse(json) match {
        case Left(_) => Seq.empty
        case Right(tasks) => tasks.flatMap(t =>
          // metadata before data (the reference's ordering): enforce drops
          // the stream's catalog rows first, then the partitions — a crash
          // between the two leaves only unreferenced files, never a
          // catalog pointing at deleted data
          graft.catalog.Retention.enforce(spark, dir, t.days,
            java.time.LocalDate.now(),
            catalogPath = Some(statsPath(tenantKey(tenant, name)))))
      }
    }
  }

  /** Alert + notification-target CRUD and evaluation (reference
    * `src/handlers/http/alerts.rs`, `targets.rs`; engine in
    * [[graft.query.Alerts]] / [[AlertStore]]). Mutations sit behind the
    * reference's `PutAlert` permission — Admin or Editor here; reads are
    * open to any authenticated user of the tenant.
    */
  private def canManageAlerts(userOpt: Option[String]): Boolean =
    !requireAuth || userOpt.exists(u =>
      Rbac.effectivePrivileges(u).exists {
        case Rbac.Admin() | Rbac.Editor() => true
        case _                            => false
      })

  private def handleTargets(ex: HttpExchange): Unit =
    authedUser(ex) match {
      case Left(msg) => err(ex, 401, msg)
      case Right(userOpt) =>
        val tenant = tenantOf(userOpt)
        val id = Option(ex.getRequestURI.getPath)
          .map(_.stripPrefix("/api/v1/targets").stripPrefix("/"))
          .filter(_.nonEmpty)
        def parseBody(): Option[com.fasterxml.jackson.databind.node.ObjectNode] =
          try mapper.readTree(
              new String(ex.getRequestBody.readAllBytes(), UTF_8)) match {
            case o: com.fasterxml.jackson.databind.node.ObjectNode => Some(o)
            case _ => err(ex, 400, "body must be a JSON object"); None
          } catch {
            case e: com.fasterxml.jackson.core.JacksonException =>
              err(ex, 400, s"malformed JSON body: ${e.getOriginalMessage}")
              None
          }
        val mutation = ex.getRequestMethod != "GET"
        if (mutation && !canManageAlerts(userOpt)) {
          err(ex, 403, "target management requires admin or editor"); return
        }
        (ex.getRequestMethod, id) match {
          case ("GET", None) =>
            respond(ex, 200, mapper.writeValueAsString(
              mapper.valueToTree[com.fasterxml.jackson.databind.JsonNode](
                alertStore.listTargets(tenant).toArray)))
          case ("POST", None) =>
            parseBody().foreach(node =>
              alertStore.createTarget(tenant, node) match {
                case Left(msg)      => err(ex, 400, msg)
                case Right(stamped) =>
                  respond(ex, 200, mapper.writeValueAsString(stamped))
              })
          case ("GET", Some(tid)) =>
            alertStore.getTarget(tenant, tid) match {
              case Some(node) =>
                respond(ex, 200, mapper.writeValueAsString(node))
              case None => err(ex, 404, s"target '$tid' not found")
            }
          case ("PUT", Some(tid)) =>
            parseBody().foreach(node =>
              alertStore.updateTarget(tenant, tid, node) match {
                case Left(msg) => err(ex, 400, msg)
                case Right(None) => err(ex, 404, s"target '$tid' not found")
                case Right(Some(stamped)) =>
                  respond(ex, 200, mapper.writeValueAsString(stamped))
              })
          case ("DELETE", Some(tid)) =>
            alertStore.deleteTarget(tenant, tid) match {
              case Left(msg)     => err(ex, 409, msg)
              case Right(false)  => err(ex, 404, s"target '$tid' not found")
              case Right(true)   => respond(ex, 200, """{"status":"deleted"}""")
            }
          case _ => err(ex, 405, "unsupported method/path")
        }
    }

  private def handleAlerts(ex: HttpExchange): Unit =
    authedUser(ex) match {
      case Left(msg) => err(ex, 401, msg)
      case Right(userOpt) =>
        val tenant = tenantOf(userOpt)
        val path = Option(ex.getRequestURI.getPath)
          .map(_.stripPrefix("/api/v1/alerts").stripPrefix("/"))
          .filter(_.nonEmpty).map(_.split("/").toSeq)
        def parseBody(): Option[com.fasterxml.jackson.databind.node.ObjectNode] =
          try mapper.readTree(
              new String(ex.getRequestBody.readAllBytes(), UTF_8)) match {
            case o: com.fasterxml.jackson.databind.node.ObjectNode => Some(o)
            case _ => err(ex, 400, "body must be a JSON object"); None
          } catch {
            case e: com.fasterxml.jackson.core.JacksonException =>
              err(ex, 400, s"malformed JSON body: ${e.getOriginalMessage}")
              None
          }
        val mutation = ex.getRequestMethod != "GET"
        if (mutation && !canManageAlerts(userOpt)) {
          err(ex, 403, "alert management requires admin or editor"); return
        }
        // creating/updating an alert additionally needs query access to
        // its stream (reference `user_auth_for_alert_config`)
        def streamAllowed(
            node: com.fasterxml.jackson.databind.node.ObjectNode): Boolean =
          userOpt.forall { u =>
            val s = node.path("stream").asText("")
            s.isEmpty || Rbac.authorized(u, Rbac.QueryAction,
              tenantKey(tenant, s))
          }
        (ex.getRequestMethod, path) match {
          case ("GET", None) =>
            // reference list params: `tags` filter + offset/limit paging
            val params = queryParams(ex)
            val tags = params.get("tags").toSeq
              .flatMap(_.split(",")).map(_.trim).filter(_.nonEmpty).toSet
            val offset = params.get("offset").flatMap(_.toIntOption)
              .getOrElse(0)
            val limit = params.get("limit").flatMap(_.toIntOption)
              .getOrElse(100)
            val all = alertStore.listAlerts(tenant)
              .filter(a => tags.isEmpty || a.path("tags").elements().asScala
                .exists(t => tags.contains(t.asText())))
              .slice(offset, offset + limit)
              .map(alertStore.summary(tenant, _))
            respond(ex, 200, mapper.writeValueAsString(
              mapper.valueToTree[com.fasterxml.jackson.databind.JsonNode](
                all.toArray)))
          case ("POST", None) =>
            parseBody().foreach { node =>
              if (!streamAllowed(node))
                err(ex, 403, "user lacks query access to the alert's stream")
              else alertStore.createAlert(tenant, node) match {
                case Left(msg)      => err(ex, 400, msg)
                case Right(stamped) =>
                  respond(ex, 200, mapper.writeValueAsString(stamped))
              }
            }
          case ("GET", Some(Seq(aid))) =>
            alertStore.getAlert(tenant, aid) match {
              case Some(node) =>
                node.put("state", alertStore.stateOf(tenant, node))
                respond(ex, 200, mapper.writeValueAsString(node))
              case None => err(ex, 404, s"alert '$aid' not found")
            }
          case ("PUT", Some(Seq(aid))) =>
            parseBody().foreach { node =>
              if (!streamAllowed(node))
                err(ex, 403, "user lacks query access to the alert's stream")
              else alertStore.updateAlert(tenant, aid, node) match {
                case Left(msg)   => err(ex, 400, msg)
                case Right(None) => err(ex, 404, s"alert '$aid' not found")
                case Right(Some(stamped)) =>
                  respond(ex, 200, mapper.writeValueAsString(stamped))
              }
            }
          case ("DELETE", Some(Seq(aid))) =>
            if (alertStore.deleteAlert(tenant, aid))
              respond(ex, 200, """{"status":"deleted"}""")
            else err(ex, 404, s"alert '$aid' not found")
          case ("PUT", Some(Seq(aid, "disable"))) =>
            alertStore.setDisabled(tenant, aid, disabled = true) match {
              case Some(_) => respond(ex, 200, """{"state":"disabled"}""")
              case None    => err(ex, 404, s"alert '$aid' not found")
            }
          case ("PUT", Some(Seq(aid, "enable"))) =>
            alertStore.setDisabled(tenant, aid, disabled = false) match {
              case Some(_) => respond(ex, 200, """{"state":"not-triggered"}""")
              case None    => err(ex, 404, s"alert '$aid' not found")
            }
          case ("PUT" | "POST", Some(Seq(aid, "evaluate_alert"))) =>
            alertStore.evaluate(spark, tenant, aid,
                name => streamsFor(tenant).get(name)) match {
              case Left(msg) => err(ex, 400, msg)
              case Right(o)  => respond(ex, 200, mapper.writeValueAsString(o))
            }
          case _ => err(ex, 405, "unsupported method/path")
        }
    }

  /** `GET /api/v1/about` (reference `handlers/http/about.rs`): instance
    * metadata for the console. `deploymentId` persists in the storage
    * root, so every node of a cluster (and every restart) reports the
    * same id — the reference stores it in object-store metadata the same
    * way.
    */
  private def handleAbout(ex: HttpExchange): Unit =
    authedUser(ex) match {
      case Left(msg) => err(ex, 401, msg)
      case Right(_) =>
        val o = mapper.createObjectNode()
        o.put("version", GraftHttpServer.Version)
        o.put("commit", GraftHttpServer.Commit)
        o.put("deploymentId", deploymentId)
        o.put("mode", role.name)
        o.put("oidcActive", oidc.isDefined)
        o.put("license", "AGPL-3.0-only")
        o.put("staging", root)
        val store = o.putObject("store")
        store.put("type", "filesystem")
        store.put("path", root)
        respond(ex, 200, mapper.writeValueAsString(o))
    }

  private lazy val deploymentId: String = {
    val p = java.nio.file.Paths.get(root, ".graft", "deployment_id")
    if (java.nio.file.Files.isRegularFile(p))
      new String(java.nio.file.Files.readAllBytes(p), UTF_8).trim
    else {
      val id = randomToken().take(16)
      java.nio.file.Files.createDirectories(p.getParent)
      java.nio.file.Files.write(p, id.getBytes(UTF_8))
      id
    }
  }

  /** `GET /api/v1/demodata?action=…` (reference `demo_data.rs`): seed the
    * instance with sample data. `action=ingest` generates a deterministic
    * batch of structured web-access events into the `demodata` stream
    * in-process (the reference shells out to a script that POSTs the same
    * kind of payload); `filters` / `dashboards` / `alerts` create one
    * sample saved object each, so a fresh console has something to show.
    */
  private def handleDemoData(ex: HttpExchange): Unit =
    authedUser(ex) match {
      case Left(msg) => err(ex, 401, msg)
      case Right(userOpt) =>
        if (role == Cluster.Querier) {
          err(ex, 404, "demo data needs an ingest-capable node"); return
        }
        val tenant = tenantOf(userOpt)
        queryParams(ex).get("action") match {
          case None => err(ex, 400, "missing query parameter 'action'")
          case Some("ingest") =>
            val events = GraftHttpServer.demoEvents(200)
            val cfg = configs.computeIfAbsent(tenantKey(tenant, "demodata"),
              key => { metaStore.putStream(key); IngestPipeline.StreamConfig(key) })
            IngestPipeline.ingest(spark, registry, cfg,
                events, "demo-data", "127.0.0.1") match {
              case Left(msg) => err(ex, 500, msg)
              case Right(df) =>
                val n = df.count()
                appendWithStats(df, cfg)
                ingestedEvents.addAndGet(n)
                respond(ex, 200, mapper.writeValueAsString(
                  mapper.createObjectNode()
                    .put("status", "ok").put("stream", "demodata")
                    .put("events", n)))
            }
          case Some("filters") =>
            val node = mapper.createObjectNode()
            node.put("filter_name", "demo 5xx errors")
            node.put("stream_name", "demodata")
            node.put("query", "SELECT * FROM demodata WHERE status >= 500")
            val user = userOpt.getOrElse("anonymous")
            respond(ex, 200, mapper.writeValueAsString(
              userConfigs.create(tenant, user, UserConfigs.Filters, node)))
          case Some("dashboards") =>
            val node = mapper.createObjectNode()
            node.put("name", "Demo traffic")
            node.putArray("tiles").addObject()
              .put("title", "Requests per minute")
              .put("stream", "demodata")
            val user = userOpt.getOrElse("anonymous")
            respond(ex, 200, mapper.writeValueAsString(
              userConfigs.create(tenant, user, UserConfigs.Dashboards, node)))
          case Some("alerts") =>
            val node = mapper.createObjectNode()
            node.put("title", "Demo error spike")
            node.put("stream", "demodata")
            node.put("agg", "count")
            node.put("column", "status")
            node.put("operator", "above")
            node.put("threshold", 100)
            alertStore.createAlert(tenant, node) match {
              case Left(msg)      => err(ex, 500, msg)
              case Right(stamped) =>
                respond(ex, 200, mapper.writeValueAsString(stamped))
            }
          case Some(other) => err(ex, 400, s"unknown action '$other'")
        }
    }

  /** OTel demo generator (reference `handlers/http/otel_generator.rs`):
    * `POST /api/v1/otel_generator` (`{"durationSecs": n,
    * "intervalMillis": m?}`) starts one background producer per tenant
    * that pushes a deterministic OTLP logs batch through the SAME
    * flatten/ingest pipeline as `/v1/logs` every interval, into the
    * `otel-demo-logs` stream; `DELETE` stops it; `GET` reports status.
    * 202/409 start semantics as in the reference.
    */
  private final class OtelGenerator(tenant: String, durationSecs: Long,
                                    intervalMillis: Long) {
    val startedAtMs: Long = System.currentTimeMillis()
    @volatile var batches: Long = 0L
    @volatile private var stopRequested = false
    private val thread = new Thread(() => {
      val deadline = startedAtMs + durationSecs * 1000L
      val cfg = configs.computeIfAbsent(tenantKey(tenant, "otel-demo-logs"),
        key => { metaStore.putStream(key); IngestPipeline.StreamConfig(key) })
      while (!stopRequested && System.currentTimeMillis() < deadline) {
        try {
          val events = graft.ingest.OtelFlatten.flattenLogs(
            GraftHttpServer.otelDemoBatch(batches, 5))
          IngestPipeline.ingestEvents(spark, registry, cfg, events,
              "otel-generator", "127.0.0.1")
            .foreach { df => df.count(); appendWithStats(df, cfg) }
          batches += 1
        } catch { case _: Exception => () } // never kill the loop
        Thread.sleep(intervalMillis)
      }
      generators.remove(tenant, this)
      ()
    }, s"graft-otel-generator-$tenant")
    thread.setDaemon(true)
    def start(): Unit = thread.start()
    def stop(): Unit = { stopRequested = true }
    def running: Boolean = thread.isAlive && !stopRequested
  }

  private val generators =
    new java.util.concurrent.ConcurrentHashMap[String, OtelGenerator]()

  private def handleOtelGenerator(ex: HttpExchange): Unit =
    authedUser(ex) match {
      case Left(msg) => err(ex, 401, msg)
      case Right(userOpt) =>
        if (role == Cluster.Querier) {
          err(ex, 404, "the generator needs an ingest-capable node"); return
        }
        val tenant = tenantOf(userOpt)
        ex.getRequestMethod match {
          case "POST" =>
            val body =
              try mapper.readTree(new String(
                ex.getRequestBody.readAllBytes(), UTF_8))
              catch {
                case _: com.fasterxml.jackson.core.JacksonException =>
                  mapper.createObjectNode()
              }
            val duration = body.path("durationSecs").asLong(86400L)
            if (duration <= 0 || duration > GraftHttpServer.MaxGeneratorSecs) {
              err(ex, 400, "durationSecs must be between 1 and " +
                s"${GraftHttpServer.MaxGeneratorSecs}")
              return
            }
            val interval = math.max(50L,
              body.path("intervalMillis").asLong(1000L))
            val fresh = new OtelGenerator(tenant, duration, interval)
            if (generators.putIfAbsent(tenant, fresh) != null) {
              err(ex, 409, "generator already running for this tenant")
            } else {
              fresh.start()
              respond(ex, 202, """{"status":"accepted",""" +
                """"message":"OTel demo generator started"}""")
            }
          case "DELETE" =>
            Option(generators.remove(tenant)) match {
              case Some(g) =>
                g.stop()
                respond(ex, 200, """{"status":"stopped"}""")
              case None => respond(ex, 200, """{"status":"not running"}""")
            }
          case "GET" =>
            Option(generators.get(tenant)) match {
              case Some(g) =>
                respond(ex, 200, mapper.writeValueAsString(
                  mapper.createObjectNode()
                    .put("status", if (g.running) "running" else "stopping")
                    .put("startedAt",
                      java.time.Instant.ofEpochMilli(g.startedAtMs).toString)
                    .put("batches", g.batches)))
              case None =>
                respond(ex, 200, """{"status":"not running"}""")
            }
          case _ => err(ex, 405, "POST, DELETE or GET")
        }
    }

  /** `GET /api/v1/metrics` — Prometheus text exposition of the server's
    * request counters (the reference mounts `actix_web_prometheus`
    * here). Unauthenticated, as scrapers expect.
    */
  private def handleMetrics(ex: HttpExchange): Unit = {
    val up = (System.currentTimeMillis() - startedAtMs) / 1000.0
    val body = new StringBuilder
    def metric(name: String, help: String, kind: String, v: String): Unit = {
      body ++= s"# HELP $name $help\n# TYPE $name $kind\n$name $v\n"
      ()
    }
    metric("graft_uptime_seconds", "Seconds since server start", "gauge",
      f"$up%.1f")
    metric("graft_ingest_requests_total", "Ingest API calls", "counter",
      ingestCalls.get.toString)
    metric("graft_ingested_events_total", "Events accepted via HTTP ingest",
      "counter", ingestedEvents.get.toString)
    metric("graft_query_requests_total", "Query API calls", "counter",
      queryCalls.get.toString)
    metric("graft_streams", "Registered streams (all tenants)", "gauge",
      (configs.keySet.asScala.toSet ++ metaStore.streams()).size.toString)
    respond(ex, 200, body.toString,
      contentType = "text/plain; version=0.0.4; charset=utf-8")
  }

  /** Prism — the console's aggregated landing surface (reference
    * `src/prism/`):
    *   - `GET /api/v1/prism/home` — visible datasets, the onboarding
    *     checklist, and the triggered-alert count in one response
    *     (`prism/home/mod.rs` `HomeResponse`);
    *   - `GET /api/v1/prism/home/search?key=…` — one search box over
    *     datasets, alerts, saved filters and dashboards
    *     (`HomeSearchResponse`);
    *   - `GET /api/v1/prism/logstream/{name}/info` — schema + stats +
    *     retention of one stream in one call (`prism/logstream/mod.rs`
    *     `PrismLogstreamInfo`).
    * Pure aggregation over the store/catalog pieces the individual
    * endpoints already use — the reference builds these the same way.
    */
  /** Live log tail (reference `src/handlers/livetail.rs` over gRPC
    * Flight; here `GET /api/v1/livetail/{stream}` as chunked NDJSON —
    * the HTTP-native spelling of the same push): every batch ingested
    * into the stream while the connection is open is fanned out to the
    * subscriber, one JSON object per row, in ingest order. Tenant- and
    * RBAC-scoped like a query. Backpressure mirrors the reference's
    * bounded pipe: a slow consumer's overflow is dropped and surfaced as
    * a `{"skipped": n}` marker (livetail.rs `Message::Skipped`), never
    * buffered unboundedly. `maxEvents`/`timeoutMs` query params bound the
    * tail (a tail holds one server thread; the default cap is 5 min).
    */
  private def handleLivetail(ex: HttpExchange): Unit = authedUser(ex) match {
    case Left(msg) => err(ex, 401, msg)
    case Right(userOpt) =>
      if (ex.getRequestMethod != "GET") { err(ex, 405, "GET only"); return }
      val name = ex.getRequestURI.getPath
        .stripPrefix("/api/v1/livetail").stripPrefix("/")
      if (name.isEmpty || name.contains('/')) {
        err(ex, 400, "use /api/v1/livetail/{stream}"); return
      }
      val tenant = tenantOf(userOpt)
      if (!streamsFor(tenant).contains(name)) {
        err(ex, 404, s"stream '$name' not found"); return
      }
      if (userOpt.exists(u => !Rbac.authorized(u, Rbac.QueryAction,
          tenantKey(tenant, name)))) {
        err(ex, 403, s"user lacks query access to stream '$name'"); return
      }
      val params = queryParams(ex)
      val maxEvents = params.get("maxEvents").flatMap(_.toLongOption)
        .filter(_ > 0).getOrElse(Long.MaxValue)
      val timeoutMs = params.get("timeoutMs").flatMap(_.toLongOption)
        .filter(_ > 0).getOrElse(300000L)
      val queue =
        new java.util.concurrent.LinkedBlockingQueue[graft.streaming.LiveTail.Batch](256)
      val skipped = new java.util.concurrent.atomic.AtomicLong
      val unsubscribe =
        graft.streaming.LiveTail.subscribe(tenantKey(tenant, name)) { b =>
          if (!queue.offer(b)) { skipped.addAndGet(b.rows.length.toLong); () }
        }
      val w = new java.io.OutputStreamWriter(ex.getResponseBody, UTF_8)
      try {
        ex.getResponseHeaders.set("Content-Type", "application/x-ndjson")
        ex.sendResponseHeaders(200, 0) // chunked
        // hello line: the subscription is registered — rows ingested from
        // here on WILL be delivered (clients can sequence on this)
        w.write(mapper.writeValueAsString(
          mapper.createObjectNode().put("livetail", name)) + "\n")
        w.flush()
        val deadline = System.currentTimeMillis() + timeoutMs
        var sent = 0L
        while (sent < maxEvents && System.currentTimeMillis() < deadline) {
          val b = queue.poll(200, java.util.concurrent.TimeUnit.MILLISECONDS)
          if (b != null) {
            val sk = skipped.getAndSet(0L)
            if (sk > 0L)
              w.write(mapper.writeValueAsString(
                mapper.createObjectNode().put("skipped", sk)) + "\n")
            var i = 0
            while (i < b.rows.length && sent < maxEvents) {
              w.write(rowJson(b.schema, b.rows(i)) + "\n")
              sent += 1; i += 1
            }
            w.flush()
          }
        }
      } catch {
        case _: java.io.IOException => () // client went away — clean up
      } finally {
        unsubscribe()
        try w.close() catch { case _: Exception => () }
        ex.close()
      }
  }

  /** One collected Row as a JSON object keyed by the batch schema. */
  private def rowJson(schema: org.apache.spark.sql.types.StructType,
                      row: org.apache.spark.sql.Row): String = {
    val o = mapper.createObjectNode()
    schema.fields.zipWithIndex.foreach { case (f, i) =>
      if (row.isNullAt(i)) o.putNull(f.name)
      else row.get(i) match {
        case s: String               => o.put(f.name, s)
        case n: java.lang.Long       => o.put(f.name, n.longValue())
        case n: java.lang.Integer    => o.put(f.name, n.intValue())
        case n: java.lang.Double     => o.put(f.name, n.doubleValue())
        case n: java.lang.Float      => o.put(f.name, n.floatValue())
        case b: java.lang.Boolean    => o.put(f.name, b.booleanValue())
        case t: java.sql.Timestamp   => o.put(f.name, t.toInstant.toString)
        case d: java.math.BigDecimal => o.put(f.name, d)
        case other                   => o.put(f.name, String.valueOf(other))
      }
    }
    mapper.writeValueAsString(o)
  }

  /** APM trace endpoints (reference `get_traces_webscope`,
    * `src/handlers/http/modal/server.rs:282-295`):
    * `POST /api/v1/services/traces/list` and `…/detail`, RBAC-gated as
    * Query on the dataset stream. Query shapes live in [[TracesApi]].
    */
  private def handleTraces(ex: HttpExchange): Unit = authedUser(ex) match {
    case Left(msg) => err(ex, 401, msg)
    case Right(userOpt) =>
      if (ex.getRequestMethod != "POST") { err(ex, 405, "POST only"); return }
      val sub = ex.getRequestURI.getPath
        .stripPrefix("/api/v1/services/traces").stripPrefix("/")
      val body =
        try mapper.readTree(ex.getRequestBody)
        catch {
          case e: com.fasterxml.jackson.core.JacksonException =>
            err(ex, 400, s"malformed JSON body: ${e.getOriginalMessage}")
            return
        }
      val tenant = tenantOf(userOpt)
      val dataset = Option(body.get("dataset")).map(_.asText()).getOrElse("")
      if (dataset.isEmpty) { err(ex, 400, "dataset is required"); return }
      val visible = streamsFor(tenant)
      visible.get(dataset) match {
        case None =>
          err(ex, 404, s"stream '$dataset' not found")
        case Some(stream) =>
          if (userOpt.exists(u => !Rbac.authorized(u, Rbac.QueryAction,
              tenantKey(tenant, dataset)))) {
            err(ex, 403,
              s"user lacks query access to stream '$dataset'")
            return
          }
          val range =
            (Option(body.get("startTime")).map(_.asText()),
              Option(body.get("endTime")).map(_.asText())) match {
              case (Some(s0), Some(e0)) =>
                try TimeRange.parse(s0, e0)
                catch {
                  case e: Exception =>
                    err(ex, 400, s"bad time: ${e.getMessage}"); return
                }
              case _ =>
                err(ex, 400, "need startTime and endTime"); return
            }
          val df = QueryService.windowedRead(spark, dataset, stream, range)
          val conditions = Option(body.get("conditions")) match {
            case None => None
            case Some(c) => alertStore.parseCondition(c) match {
              case Left(msg)   => err(ex, 400, msg); return
              case Right(node) => Some(Alerts.Conditions.toColumn(node))
            }
          }
          sub match {
            case "list" =>
              val serviceNameRaw =
                Option(body.get("serviceName")).map(_.asText())
              val serviceName = serviceNameRaw.map(_.trim).filter(_.nonEmpty)
              if (serviceNameRaw.isDefined && serviceName.isEmpty) {
                err(ex, 400, "serviceName must not be empty when provided")
                return
              }
              val limit = Option(body.get("limit")).map(_.asInt())
                .getOrElse(TracesApi.DefaultLimit)
              if (limit <= 0 || limit > TracesApi.MaxLimit) {
                err(ex, 400, s"limit must be between 1 and " +
                  s"${TracesApi.MaxLimit}, got $limit")
                return
              }
              val offset =
                Option(body.get("offset")).map(_.asInt()).getOrElse(0)
              val option = Option(body.get("options"))
                .orElse(Option(body.get("option")))
                .map(_.asText()).getOrElse("spans")
              val sortBy = Option(body.get("sortBy")).map(_.asText())
                .getOrElse("mostRecent")
              TracesApi.list(df, serviceName, conditions, option, sortBy,
                offset, limit) match {
                case Left(msg) => err(ex, 400, msg)
                case Right(page) =>
                  val n =
                    TracesApi.count(df, serviceName, conditions, option)
                  val o = mapper.createObjectNode()
                    .put("count", n).put("offset", offset)
                    .put("limit", limit)
                  o.set[com.fasterxml.jackson.databind.node.ObjectNode]("records", mapper.readTree(
                    ResponseWriter.toJsonArray(page)))
                  respond(ex, 200, mapper.writeValueAsString(o))
              }
            case "detail" =>
              val traceId = Option(body.get("traceId")).map(_.asText().trim)
                .getOrElse("")
              if (traceId.isEmpty) {
                err(ex, 400, "traceId is required"); return
              }
              TracesApi.bounds(df, stream.timeCol, traceId) match {
                case None =>
                  err(ex, 404,
                    s"trace $traceId not found in dataset '$dataset'")
                case Some((s0, e0)) =>
                  // include the minute containing the final span, as the
                  // reference does (`traces.rs:311-315`)
                  val full = TimeRange(s0.toInstant,
                    e0.toInstant.plusSeconds(60))
                  val spans = QueryService.windowedRead(spark, dataset,
                    stream, full)
                  TracesApi.detail(spans, stream.timeCol, traceId) match {
                    case Left(msg) => err(ex, 400, msg)
                    case Right(out) =>
                      val o = mapper.createObjectNode()
                        .put("startTime", s0.toInstant.toString)
                        .put("endTime", e0.toInstant.toString)
                      o.set[com.fasterxml.jackson.databind.node.ObjectNode]("records", mapper.readTree(
                        ResponseWriter.toJsonArray(out)))
                      respond(ex, 200, mapper.writeValueAsString(o))
                  }
              }
            case other => err(ex, 404, s"no such trace endpoint: $other")
          }
      }
  }

  private def handlePrism(ex: HttpExchange): Unit = {
    if (role == Cluster.Ingestor) {
      err(ex, 404, "prism is not available on an ingestor node"); return
    }
    authedUser(ex) match {
      case Left(msg) => err(ex, 401, msg)
      case Right(userOpt) =>
        if (ex.getRequestMethod != "GET") { err(ex, 405, "GET only"); return }
        val tenant = tenantOf(userOpt)
        val user = userOpt.getOrElse("anonymous")
        def canQuery(name: String): Boolean =
          userOpt.forall(Rbac.authorized(_, Rbac.QueryAction,
            tenantKey(tenant, name)))
        val visible = streamsFor(tenant).keys.toSeq.sorted.filter(canQuery)
        def hasData(name: String): Boolean = {
          val p = new org.apache.hadoop.fs.Path(
            s"$root/${tenantKey(tenant, name)}")
          try p.getFileSystem(spark.sessionState.newHadoopConf()).exists(p)
          catch { case _: Exception => false }
        }
        val rest = Option(ex.getRequestURI.getPath)
          .map(_.stripPrefix("/api/v1/prism").stripPrefix("/"))
          .filter(_.nonEmpty).map(_.split("/").toSeq)
        rest match {
          case Some(Seq("home")) =>
            val o = mapper.createObjectNode()
            val datasets = o.putArray("datasets")
            visible.foreach { n =>
              val d = datasets.addObject()
              d.put("title", n)
              d.put("ingestion", hasData(n))
            }
            val alerts = alertStore.listAlerts(tenant)
            val checklist = o.putObject("checklist")
            checklist.put("dataIngested", visible.exists(hasData))
            checklist.put("alertCreated", alerts.nonEmpty)
            checklist.put("userAdded", users.nonEmpty)
            checklist.put("keystoneCreated",
              userConfigs.list(tenant, user, UserConfigs.Filters).nonEmpty ||
              userConfigs.list(tenant, user, UserConfigs.Dashboards).nonEmpty)
            o.put("triggeredAlertsCount",
              alerts.count(a => alertStore.stateOf(tenant, a) == "triggered"))
            respond(ex, 200, mapper.writeValueAsString(o))
          case Some(Seq("home", "search")) =>
            val needle = queryParams(ex).getOrElse("key", "").toLowerCase
            if (needle.isEmpty) {
              err(ex, 400, "missing query parameter 'key'"); return
            }
            val o = mapper.createObjectNode()
            val resources = o.putArray("resources")
            def add(id: String, name: String, kind: String): Unit =
              if (name.toLowerCase.contains(needle)) {
                val r = resources.addObject()
                r.put("id", id); r.put("name", name)
                r.put("resource_type", kind)
                ()
              }
            visible.foreach(n => add(n, n, "DataSet"))
            alertStore.listAlerts(tenant).foreach(a =>
              add(a.path("id").asText(), a.path("title").asText(), "Alert"))
            userConfigs.list(tenant, user, UserConfigs.Filters).foreach(f =>
              add(f.path("filter_id").asText(),
                f.path("filter_name").asText(), "Filter"))
            userConfigs.list(tenant, user, UserConfigs.Dashboards).foreach(d =>
              add(d.path("dashboardId").asText(),
                d.path("name").asText(), "Dashboard"))
            userConfigs.list(tenant, user, UserConfigs.Correlations)
              .foreach(c => add(c.path("id").asText(),
                c.path("title").asText(), "Correlation"))
            respond(ex, 200, mapper.writeValueAsString(o))
          case Some(Seq("logstream", name, "info")) =>
            if (!canQuery(name)) { err(ex, 403, "forbidden"); return }
            if (!streamsFor(tenant).contains(name)) {
              err(ex, 404, s"stream '$name' not found"); return
            }
            val dirStr = s"$root/${tenantKey(tenant, name)}"
            val o = mapper.createObjectNode()
            o.putObject("info").put("stream", name)
            val schema =
              (try Some(spark.read.parquet(dirStr).schema)
               catch { case _: Exception => None })
                .orElse(registry.get(tenantKey(tenant, name)))
            schema match {
              case Some(s) => o.set[com.fasterxml.jackson.databind.node.ObjectNode](
                "schema", mapper.readTree(s.json))
              case None => o.putNull("schema")
            }
            val dir = new org.apache.hadoop.fs.Path(dirStr)
            val fs = dir.getFileSystem(spark.sessionState.newHadoopConf())
            val stats = o.putObject("stats")
            if (fs.exists(dir)) {
              stats.put("size", fs.getContentSummary(dir).getLength)
              stats.put("count",
                syncedCountStar(tenantKey(tenant, name)).getOrElse(
                  try spark.read.parquet(dirStr).count()
                  catch { case _: Exception => 0L }))
            } else { stats.put("size", 0L); stats.put("count", 0L) }
            val rp = new org.apache.hadoop.fs.Path(dir, "_retention.json")
            val retention =
              if (fs.exists(rp)) {
                val in = fs.open(rp)
                try new String(in.readAllBytes(), UTF_8) finally in.close()
              } else "[]"
            o.set[com.fasterxml.jackson.databind.node.ObjectNode](
              "retention", mapper.readTree(retention))
            respond(ex, 200, mapper.writeValueAsString(o))
          case _ => err(ex, 404, "unknown prism path")
        }
    }
  }

  server.createContext("/api/v1/ingest", handler(handleIngest))
  server.createContext("/v1", handler(handleOtelIngest))
  server.createContext("/api/v1/logstream", handler(handleLogstream))
  server.createContext("/api/v1/cluster", handler(handleCluster))
  server.createContext("/api/v1/query", handler(handleQuery))
  server.createContext("/api/v1/counts", handler(handleCounts))
  server.createContext("/api/v1/role", handler(handleRoles))
  server.createContext("/api/v1/filters",
    handler(handleUserConfigs(UserConfigs.Filters)))
  server.createContext("/api/v1/dashboards",
    handler(handleUserConfigs(UserConfigs.Dashboards)))
  server.createContext("/api/v1/correlation",
    handler(handleUserConfigs(UserConfigs.Correlations)))
  server.createContext("/api/v1/o", handler(handleOidc))
  server.createContext("/api/v1/alerts", handler(handleAlerts))
  server.createContext("/api/v1/targets", handler(handleTargets))
  /** `GET /api/v1/sse` — server-sent alert trigger events (reference
    * `src/sse/mod.rs` + the broadcast at `alerts/mod.rs:735-748`): each
    * alert that transitions to Triggered pushes one `data:` frame with the
    * reference's `SSEEvent` JSON to every connected client of the tenant.
    * Keep-alive comments flush periodically so disconnects are noticed.
    * Each client pins one pool thread — the console-scale contract, as in
    * the reference (size `threads` accordingly).
    */
  private def handleSse(ex: HttpExchange): Unit =
    authedUser(ex) match {
      case Left(msg) => err(ex, 401, msg)
      case Right(userOpt) =>
        if (ex.getRequestMethod != "GET") { err(ex, 405, "GET only"); return }
        val tenant = tenantOf(userOpt)
        ex.getResponseHeaders.set("Content-Type", "text/event-stream")
        ex.getResponseHeaders.set("Cache-Control", "no-cache")
        ex.sendResponseHeaders(200, 0) // chunked
        val os = ex.getResponseBody
        val queue = new java.util.concurrent.LinkedBlockingQueue[String]()
        val registration = alertStore.addSseListener(tenant, m => {
          queue.offer(m); ()
        })
        try {
          while (!stopping) {
            val msg =
              queue.poll(2, java.util.concurrent.TimeUnit.SECONDS)
            if (msg == null) os.write(": keep-alive\n\n".getBytes(UTF_8))
            else os.write(s"data: $msg\n\n".getBytes(UTF_8))
            os.flush() // throws once the client went away → loop ends
          }
        } catch {
          case _: java.io.IOException    => ()
          case _: InterruptedException => ()
        } finally {
          registration.close()
          try ex.close() catch { case _: Exception => () }
        }
    }

  @volatile private var stopping = false

  server.createContext("/api/v1/services/traces", handler(handleTraces))
  server.createContext("/api/v1/livetail", handler(handleLivetail))
  server.createContext("/api/v1/prism", handler(handlePrism))
  server.createContext("/api/v1/sse", handler(handleSse))
  server.createContext("/api/v1/about", handler(handleAbout))
  server.createContext("/api/v1/demodata", handler(handleDemoData))
  server.createContext("/api/v1/metrics", handler(handleMetrics))
  server.createContext("/api/v1/otel_generator",
    handler(handleOtelGenerator))
  server.createContext("/api/v1/liveness",
    handler(ex => respond(ex, 200, """{"status":"alive"}""")))
  server.createContext("/api/v1/readiness",
    handler(ex => respond(ex, 200, """{"status":"ready"}""")))

  def start(): Unit = {
    server.start()
    // cluster-mode nodes register in the shared metastore (standalone
    // [[Cluster.All]] nodes don't participate in a cluster)
    if (role != Cluster.All)
      metaStore.register(Cluster.NodeMetadata(myNodeId,
        s"http://127.0.0.1:$boundPort", role.name,
        System.currentTimeMillis()))
  }

  def stop(): Unit = {
    stopping = true // unblocks SSE loops at their next keep-alive tick
    generators.values().asScala.foreach(_.stop())
    generators.clear()
    server.stop(0)
    // the fixed pool's threads are non-daemon: without this, every
    // started server leaks `threads` live threads for the JVM's lifetime
    pool.shutdown()
    alertStore.close() // stops alert repeat-notification tasks
  }
}

object GraftHttpServer {
  /** The un-prefixed tenant single-tenant deployments implicitly use
    * (reference `DEFAULT_TENANT`).
    */
  val DefaultTenant = "default"

  /** Session lifetime (reference `COOKIE_AGE_DAYS` = 7). */
  val SessionTtlMs: Long = 7L * 24 * 3600 * 1000

  /** Single-use login-state lifetime — ample for a human round trip
    * through the provider, short enough to bound replay.
    */
  val StateTtlMs: Long = 10L * 60 * 1000

  /** Driver-side cap on /counts bins (the response is materialized). */
  val MaxCountBins = 1000

  /** Surfaced by `/about`; a library build has no release pipeline, so
    * these identify the engine rather than a binary.
    */
  val Version = "graft-dev"
  val Commit = "unreleased"

  /** Deterministic demo batch (reference `resources/ingest_demo_data.sh`
    * generates the same shape of synthetic web-access logs): JSON array of
    * `n` events — method/path/status/latency/host — seeded by index, so
    * repeated calls are reproducible.
    */
  private[http] def demoEvents(n: Int): String = {
    val methods = Vector("GET", "GET", "GET", "POST", "PUT", "DELETE")
    val paths = Vector("/", "/login", "/api/items", "/api/items/42",
      "/health", "/search")
    val statuses = Vector(200, 200, 200, 201, 301, 404, 500, 503)
    val sb = new StringBuilder("[")
    (0 until n).foreach { i =>
      // splitmix64-style scramble keeps neighboring events uncorrelated
      var h = i.toLong * 0x9E3779B97F4A7C15L
      h ^= h >>> 30; h *= 0xBF58476D1CE4E5B9L; h ^= h >>> 27
      def pick[A](v: Vector[A], salt: Int): A =
        v((((h >>> (salt * 7)) % v.size + v.size) % v.size).toInt)
      if (i > 0) sb += ','
      sb ++= s"""{"method": "${pick(methods, 1)}",""" +
        s""""path": "${pick(paths, 2)}",""" +
        s""""status": ${pick(statuses, 3)},""" +
        s""""latency_ms": ${(h >>> 40) % 500},""" +
        s""""host": "host-${(h >>> 16) % 8}"}"""
    }
    sb += ']'
    sb.toString
  }

  /** Reference `DEFAULT_LOG_CONTEXT_PAGE_SIZE`. */
  val DefaultContextPageSize = 500

  private[http] val RelativeWindow = """^(\d+)\s*(s|m|h|d)$""".r

  /** Reference `MAX_DURATION_SECS` (7 days). */
  val MaxGeneratorSecs: Long = 7L * 24 * 60 * 60

  /** Deterministic OTLP logs payload for the demo generator: `n` records
    * seeded by `(batch, index)`, wearing realistic severity/service/body
    * variety. Timestamps are the CALL time (the stream must look live).
    */
  private[http] def otelDemoBatch(batch: Long, n: Int): String = {
    val services = Vector("checkout", "auth", "catalog", "payments")
    val bodies = Vector("request completed", "cache miss", "retrying upstream",
      "slow query detected", "connection reset by peer")
    val severities = Vector(5, 9, 9, 9, 13, 17) // debug/info×3/warn/error
    val nowNs = System.currentTimeMillis() * 1000000L
    val records = (0 until n).map { i =>
      var h = (batch * 1024 + i) * 0x9E3779B97F4A7C15L
      h ^= h >>> 30; h *= 0xBF58476D1CE4E5B9L; h ^= h >>> 27
      def pick[A](v: Vector[A], salt: Int): A =
        v((((h >>> (salt * 7)) % v.size + v.size) % v.size).toInt)
      s"""{"timeUnixNano":"${nowNs + i}",
         |"severityNumber":${pick(severities, 1)},
         |"body":{"stringValue":"${pick(bodies, 2)}"},
         |"attributes":[{"key":"service.name",
         |"value":{"stringValue":"${pick(services, 3)}"}}]}""".stripMargin
    }.mkString(",")
    s"""{"resourceLogs":[{"resource":{"attributes":[
       |{"key":"telemetry.sdk.name","value":{"stringValue":"graft-demo"}}]},
       |"scopeLogs":[{"scope":{"name":"graft-otel-generator"},
       |"logRecords":[$records]}]}]}""".stripMargin
  }
}

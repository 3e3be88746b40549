package graft.http

import java.nio.charset.StandardCharsets.UTF_8

import scala.jdk.CollectionConverters._

import com.sun.net.httpserver.HttpExchange
import org.apache.spark.sql.functions.{col, count, floor, lit, unix_millis}

import graft.ingest.IngestPipeline
import graft.query.{Alerts, Counts, QueryService, Rbac, ResponseWriter, TimeRange}

import GraftHttpServer._

/** Saved filters/dashboards/correlations CRUD and role management.
  *
  * One surface of [[GraftHttpServer]] — split out for maintainability;
  * state and shared plumbing stay on the server class (self-type).
  */
private[http] trait UserRoutes { self: GraftHttpServer =>

  /** Saved filters / dashboards CRUD (reference `src/users/filters.rs`,
    * `src/users/dashboards.rs`): objects live under the calling user's own
    * (tenant, user) namespace — other users' ids are 404 by construction.
    * Filters additionally name a stream and require query access to it.
    */
  private[http] def handleUserConfigs(kind: UserConfigs.Kind)
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
          // reference dashboards::list_tags / alerts::list_tags — the
          // tenant-wide sorted distinct tag inventory (GET {base}/list_tags)
          case ("GET", Some("list_tags"))
              if kind == UserConfigs.Dashboards =>
            val tags = userConfigs.listTenant(tenant, kind)
              .flatMap(d => Option(d.get("tags")).toSeq
                .flatMap(_.elements().asScala))
              .map(_.asText()).filter(_.nonEmpty).distinct.sorted
            respond(ex, 200, mapper.writeValueAsString(
              mapper.valueToTree[com.fasterxml.jackson.databind.JsonNode](
                tags.toArray)))
          // reference dashboards::add_tile (PUT {base}/{id}/add_tile):
          // append one tile to an owned dashboard; tile_id required and
          // unique within the dashboard
          case ("PUT", Some(oid))
              if kind == UserConfigs.Dashboards &&
                oid.endsWith("/add_tile") =>
            val did = oid.stripSuffix("/add_tile").stripSuffix("/")
            parseBody().foreach { tile =>
              val tid = tile.path("tile_id").asText("")
              if (tid.isEmpty) { err(ex, 400, "Tile ID must be provided") }
              else userConfigs.get(tenant, user, kind, did) match {
                case None => err(ex, 404, s"dashboard '$did' not found")
                case Some(dash) =>
                  val node = dash.deepCopy[com.fasterxml.jackson.databind
                    .node.ObjectNode]()
                  val tiles = Option(node.get("tiles")) match {
                    case Some(a: com.fasterxml.jackson.databind.node
                        .ArrayNode) => a
                    case _ => node.putArray("tiles")
                  }
                  if (tiles.elements().asScala
                      .exists(_.path("tile_id").asText() == tid))
                    err(ex, 400, "Tile already exists")
                  else {
                    tiles.add(tile)
                    userConfigs.update(tenant, user, kind, did, node) match {
                      case Some(updated) =>
                        respond(ex, 200, mapper.writeValueAsString(updated))
                      case None =>
                        err(ex, 404, s"dashboard '$did' not found")
                    }
                  }
              }
            }
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

  /** User management (reference `src/handlers/http/rbac.rs` user
    * webscope):
    *   - `GET /api/v1/user` — list the tenant's dynamic users (admin);
    *   - `POST /api/v1/user/{id}` — create; optional body = JSON array of
    *     role names (must exist); responds with the generated password,
    *     shown once (admin);
    *   - `DELETE /api/v1/user/{id}` — remove the user and their grants;
    *   - `GET /api/v1/user/{id}/role` — the user's roles (admin or self);
    *   - `PATCH /api/v1/user/{id}/role/add|remove` — body = JSON array;
    *   - `POST /api/v1/user/{id}/generate-new-password` — reset, return
    *     the new password.
    * Statically-configured users are protected (the reference's
    * `DisAllowRootUser`): they cannot be created over, deleted, have
    * passwords reset, or roles mutated through this surface.
    */
  private[http] def handleUsers(ex: HttpExchange): Unit =
    authedUser(ex) match {
      case Left(msg) => err(ex, 401, msg)
      case Right(userOpt) =>
        val caller = userOpt.getOrElse("anonymous")
        val tenant = tenantOf(userOpt)
        val sub = Option(ex.getRequestURI.getPath)
          .map(_.stripPrefix("/api/v1/user").stripPrefix("/"))
          .filter(_.nonEmpty).map(_.split("/").toSeq)
        def adminOnly(): Boolean =
          if (requireAuth && !userOpt.exists(Rbac.isAdmin)) {
            err(ex, 403, "user management requires admin privileges"); false
          } else true
        def readRoles(): Option[Seq[String]] =
          try {
            val node = mapper.readTree(ex.getRequestBody)
            if (node == null || node.isNull || node.isMissingNode) Some(Nil)
            else if (!node.isArray) {
              err(ex, 400, "body must be a JSON array of role names"); None
            } else Some(node.elements().asScala.map(_.asText()).toSeq)
          } catch {
            case _: com.fasterxml.jackson.core.JacksonException => Some(Nil)
          }
        def rolesExist(names: Seq[String]): Boolean = {
          val missing = names.filterNot(Rbac.getRole(_).nonEmpty)
          if (missing.nonEmpty) {
            err(ex, 400, s"role(s) do not exist: ${missing.mkString(", ")}")
            false
          } else true
        }
        def protectedUser(u: String): Boolean =
          if (users.contains(u)) {
            err(ex, 403, s"'$u' is a server-configured user"); true
          } else false
        (ex.getRequestMethod, sub) match {
          case ("GET", None) =>
            if (adminOnly()) {
              val arr = mapper.createArrayNode()
              userAccounts.list(tenant).foreach(arr.add)
              respond(ex, 200, mapper.writeValueAsString(arr))
            }
          case ("POST", Some(Seq(uid))) =>
            if (adminOnly() && !protectedUser(uid))
              readRoles().foreach { roles =>
                if (rolesExist(roles))
                  userAccounts.create(uid, tenant) match {
                    case Left(msg) => err(ex, 400, msg)
                    case Right(password) =>
                      if (roles.nonEmpty) {
                        val _ = Rbac.assignRoles(uid, roles)
                      }
                      respond(ex, 200, mapper.writeValueAsString(password))
                  }
              }
          case ("DELETE", Some(Seq(uid))) =>
            if (adminOnly() && !protectedUser(uid)) {
              if (userAccounts.delete(uid))
                respond(ex, 200, """{"status":"deleted"}""")
              else err(ex, 404, s"user '$uid' does not exist")
            }
          case ("GET", Some(Seq(uid, "role"))) =>
            // reference authorize_for_user: a user may read their own
            val selfRead = userOpt.contains(uid)
            if (selfRead || adminOnly()) {
              val arr = mapper.createArrayNode()
              Rbac.rolesOf(uid).foreach(arr.add)
              respond(ex, 200, mapper.writeValueAsString(arr))
            }
          case ("PATCH", Some(Seq(uid, "role", verb)))
              if verb == "add" || verb == "remove" =>
            if (adminOnly() && !protectedUser(uid))
              readRoles().foreach { roles =>
                if (verb == "remove" || rolesExist(roles)) {
                  if (!userAccounts.exists(uid))
                    err(ex, 404, s"user '$uid' does not exist")
                  else {
                    val cur = Rbac.rolesOf(uid)
                    val next =
                      if (verb == "add") (cur ++ roles).distinct
                      else cur.filterNot(roles.contains)
                    val _ = Rbac.assignRoles(uid, next)
                    respond(ex, 200, mapper.writeValueAsString(
                      s"Roles updated successfully for $uid"))
                  }
                }
              }
          case ("POST", Some(Seq(uid, "generate-new-password"))) =>
            if (adminOnly() && !protectedUser(uid))
              userAccounts.resetPassword(uid) match {
                case Left(msg) => err(ex, 404, msg)
                case Right(password) =>
                  respond(ex, 200, mapper.writeValueAsString(password))
              }
          case _ => err(ex, 405, "unsupported method/path")
        }
    }

  /** API-key CRUD (reference `src/handlers/http/apikeys.rs`, admin-gated):
    *   - `POST /api/v1/apikeys` — `{"keyName", "roles": [..]}` → the full
    *     key value, returned ONCE;
    *   - `GET /api/v1/apikeys` — list, key values masked to the last 4;
    *   - `GET /api/v1/apikeys/{keyId}` — one key, full value;
    *   - `DELETE /api/v1/apikeys/{keyId}` — revoke;
    *   - `POST /api/v1/apikeys/validate` — `{"apiKey"}` → `{"valid"}`.
    */
  private[http] def handleApiKeys(ex: HttpExchange): Unit =
    authedUser(ex) match {
      case Left(msg) => err(ex, 401, msg)
      case Right(userOpt) =>
        if (requireAuth && !userOpt.exists(Rbac.isAdmin)) {
          err(ex, 403, "Only admins can manage API keys"); return
        }
        val caller = userOpt.getOrElse("anonymous")
        val tenant = tenantOf(userOpt)
        val sub = Option(ex.getRequestURI.getPath)
          .map(_.stripPrefix("/api/v1/apikeys").stripPrefix("/"))
          .filter(_.nonEmpty)
        def parseBody(): Option[com.fasterxml.jackson.databind.JsonNode] =
          try Some(mapper.readTree(ex.getRequestBody))
          catch {
            case e: com.fasterxml.jackson.core.JacksonException =>
              err(ex, 400, s"malformed JSON body: ${e.getOriginalMessage}")
              None
          }
        (ex.getRequestMethod, sub) match {
          case ("POST", None) =>
            parseBody().foreach { node =>
              val name = node.path("keyName").asText("")
              if (name.isEmpty) { err(ex, 400, "keyName is required"); return }
              val roles = Option(node.get("roles")).toSeq
                .flatMap(_.elements().asScala.map(_.asText()))
              val missing = roles.filterNot(Rbac.getRole(_).nonEmpty)
              if (missing.nonEmpty) {
                err(ex, 400,
                  s"role(s) do not exist: ${missing.mkString(", ")}")
                return
              }
              val key = apiKeyStore.create(name, roles, caller, tenant)
              respond(ex, 200, mapper.writeValueAsString(
                apiKeyStore.toJson(key, mask = false)))
            }
          case ("GET", None) =>
            val arr = mapper.createArrayNode()
            apiKeyStore.list(tenant)
              .foreach(k => arr.add(apiKeyStore.toJson(k, mask = true)))
            respond(ex, 200, mapper.writeValueAsString(arr))
          case ("POST", Some("validate")) =>
            parseBody().foreach { node =>
              val o = mapper.createObjectNode().put("valid", apiKeyStore
                .validInTenant(node.path("apiKey").asText(""), tenant))
              respond(ex, 200, mapper.writeValueAsString(o))
            }
          case ("GET", Some(keyId)) =>
            apiKeyStore.get(tenant, keyId) match {
              case Some(k) => respond(ex, 200, mapper.writeValueAsString(
                apiKeyStore.toJson(k, mask = false)))
              case None => err(ex, 404, s"API key '$keyId' not found")
            }
          case ("DELETE", Some(keyId)) =>
            apiKeyStore.delete(tenant, keyId) match {
              case Some(k) =>
                val o = mapper.createObjectNode()
                  .put("keyId", k.keyId).put("keyName", k.keyName)
                  .put("message", "API key deleted successfully")
                respond(ex, 200, mapper.writeValueAsString(o))
              case None => err(ex, 404, s"API key '$keyId' not found")
            }
          case _ => err(ex, 405, "unsupported method/path")
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
  private[http] def handleRoles(ex: HttpExchange): Unit = {
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
}

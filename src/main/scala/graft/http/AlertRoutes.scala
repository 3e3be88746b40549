package graft.http

import java.nio.charset.StandardCharsets.UTF_8

import scala.jdk.CollectionConverters._

import com.sun.net.httpserver.HttpExchange
import org.apache.spark.sql.functions.{col, count, floor, lit, unix_millis}

import graft.ingest.IngestPipeline
import graft.query.{Alerts, Counts, QueryService, Rbac, ResponseWriter, TimeRange}

import GraftHttpServer._

/** Alert and notification-target CRUD plus the SSE trigger-event
  * stream.
  *
  * One surface of [[GraftHttpServer]] — split out for maintainability;
  * state and shared plumbing stay on the server class (self-type).
  */
private[http] trait AlertRoutes { self: GraftHttpServer =>

  /** Alert + notification-target CRUD and evaluation (reference
    * `src/handlers/http/alerts.rs`, `targets.rs`; engine in
    * [[graft.query.Alerts]] / [[AlertStore]]). Mutations sit behind the
    * reference's `PutAlert` permission — Admin or Editor here; reads are
    * open to any authenticated user of the tenant.
    */
  private[http] def canManageAlerts(userOpt: Option[String]): Boolean =
    !requireAuth || userOpt.exists(u =>
      Rbac.effectivePrivileges(u).exists {
        case Rbac.Admin() | Rbac.Editor() => true
        case _                            => false
      })

  private[http] def handleTargets(ex: HttpExchange): Unit =
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
        // outbound policy gate (reference validate_outbound_policy in the
        // targets handler): once an admin set a policy for the tenant,
        // every created/updated target's endpoint must pass it
        def policyOk(
            node: com.fasterxml.jackson.databind.node.ObjectNode): Boolean =
          OutboundPolicy.load(root, tenant) match {
            case None => true
            case Some(policy) =>
              OutboundPolicy.checkEndpoint(
                node.path("endpoint").asText(""),
                node.path("type").asText(""),
                node.path("skipTlsCheck").asBoolean(false), policy) match {
                case Right(()) => true
                case Left(msg) => err(ex, 400, msg); false
              }
          }
        (ex.getRequestMethod, id) match {
          case ("GET", None) =>
            respond(ex, 200, mapper.writeValueAsString(
              mapper.valueToTree[com.fasterxml.jackson.databind.JsonNode](
                alertStore.listTargets(tenant).toArray)))
          case ("POST", None) =>
            parseBody().filter(policyOk).foreach(node =>
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
            parseBody().filter(policyOk).foreach(node =>
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

  /** `GET|PUT /api/v1/alert-target-policy` (reference
    * `alert_target_policy.rs`): the tenant's outbound-HTTP policy for
    * alert targets. PUT validates before replacing — a bad policy never
    * becomes active. Admin-only, like the reference's `Action::All`.
    */
  private[http] def handleTargetPolicy(ex: HttpExchange): Unit =
    authedUser(ex) match {
      case Left(msg) => err(ex, 401, msg)
      case Right(userOpt) =>
        if (requireAuth && !userOpt.exists(Rbac.isAdmin)) {
          err(ex, 403, "alert target policy requires admin privileges")
          return
        }
        val tenant = tenantOf(userOpt)
        ex.getRequestMethod match {
          case "GET" =>
            respond(ex, 200, OutboundPolicy.toJson(OutboundPolicy
              .load(root, tenant).getOrElse(OutboundPolicy.Config())))
          case "PUT" =>
            val node =
              try mapper.readTree(ex.getRequestBody)
              catch {
                case e: com.fasterxml.jackson.core.JacksonException =>
                  err(ex, 400, s"malformed JSON body: ${e.getOriginalMessage}")
                  return
              }
            val cfg = OutboundPolicy.fromJson(node)
            OutboundPolicy.validate(cfg) match {
              case Left(msg) => err(ex, 400, msg)
              case Right(()) =>
                OutboundPolicy.store(root, tenant, cfg)
                respond(ex, 200, OutboundPolicy.toJson(cfg))
            }
          case _ => err(ex, 405, "GET or PUT only")
        }
    }

  private[http] def handleAlerts(ex: HttpExchange): Unit =
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
          // reference alerts::list_tags — sorted distinct tags across the
          // tenant's alerts (must match before the alert-id route)
          case ("GET", Some(Seq("list_tags"))) =>
            val tags = alertStore.listAlerts(tenant)
              .flatMap(a => Option(a.get("tags")).toSeq
                .flatMap(_.elements().asScala))
              .map(_.asText()).filter(_.nonEmpty).distinct.sorted
            respond(ex, 200, mapper.writeValueAsString(
              mapper.valueToTree[com.fasterxml.jackson.databind.JsonNode](
                tags.toArray)))
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

  /** `GET /api/v1/sse` — server-sent alert trigger events (reference
    * `src/sse/mod.rs` + the broadcast at `alerts/mod.rs:735-748`): each
    * alert that transitions to Triggered pushes one `data:` frame with the
    * reference's `SSEEvent` JSON to every connected client of the tenant.
    * Keep-alive comments flush periodically so disconnects are noticed.
    * Each client pins one pool thread — the console-scale contract, as in
    * the reference (size `threads` accordingly).
    */
  private[http] def handleSse(ex: HttpExchange): Unit =
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
}

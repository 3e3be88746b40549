package graft.http

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets.UTF_8
import java.util.Base64

import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.ObjectMapper
import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}
import org.apache.spark.sql.SparkSession

import graft.ingest.IngestPipeline
import graft.query.{QueryService, Rbac, ResponseWriter, TimeRange}

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
  *   - `GET /api/v1/liveness`, `GET /api/v1/readiness` — health probes.
  *
  * Auth: when `requireAuth` is set, requests carry HTTP Basic credentials;
  * the username feeds the [[Rbac]] grants table, and queries run through
  * [[QueryService.authorizedQuery]] (reference `user_auth_for_datasets`).
  * Passwords are checked against the `users` map.
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
    threads: Int = 8) {

  private val mapper = new ObjectMapper()
  private val configs =
    new java.util.concurrent.ConcurrentHashMap[String, IngestPipeline.StreamConfig]()
  val registry = new IngestPipeline.SchemaRegistry

  private val server =
    HttpServer.create(new InetSocketAddress("127.0.0.1", port), 0)
  private val pool =
    java.util.concurrent.Executors.newFixedThreadPool(threads)
  server.setExecutor(pool)

  /** Ephemeral-port deployments read the bound port after construction. */
  def boundPort: Int = server.getAddress.getPort

  /** Streams known to this server (ingested at least once), as the query
    * registry [[QueryService.query]] expects.
    */
  def streams: Map[String, QueryService.Stream] =
    configs.keys().asScala.map { name =>
      name -> QueryService.Stream(s"$root/$name", "p_timestamp")
    }.toMap

  /** Pre-register a stream (e.g. one written by a previous process) so
    * queries can see it without a prior ingest through this server.
    */
  def registerStream(name: String,
                     cfg: IngestPipeline.StreamConfig): Unit = {
    configs.put(name, cfg); ()
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

  /** Basic-auth user, if valid; Right(None) when auth is not required. */
  private def authedUser(ex: HttpExchange): Either[String, Option[String]] = {
    if (!requireAuth) Right(None)
    else Option(ex.getRequestHeaders.getFirst("Authorization")) match {
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
    if (ex.getRequestMethod != "POST") { err(ex, 405, "POST only"); return }
    authedUser(ex) match {
      case Left(msg) => err(ex, 401, msg)
      case Right(user) =>
        Option(ex.getRequestHeaders.getFirst("X-P-Stream")) match {
          case None => err(ex, 400, "missing X-P-Stream header")
          case Some(stream)
              if user.exists(!Rbac.authorized(_, Rbac.IngestAction, stream)) =>
            err(ex, 403,
              s"user '${user.get}' lacks ingest access to stream '$stream'")
          case Some(stream) =>
            val body = new String(ex.getRequestBody.readAllBytes(), UTF_8)
            val cfg = configs.computeIfAbsent(stream,
              n => IngestPipeline.StreamConfig(n))
            val ua =
              Option(ex.getRequestHeaders.getFirst("User-Agent")).getOrElse("")
            val ip = ex.getRemoteAddress.getAddress.getHostAddress
            IngestPipeline.ingest(spark, registry, cfg, body, ua, ip) match {
              case Left(msg) => err(ex, 400, msg)
              case Right(df) =>
                val n = df.count()
                IngestPipeline.append(df, root, cfg)
                respond(ex, 200, mapper.writeValueAsString(
                  mapper.createObjectNode()
                    .put("status", "ok").put("events", n)))
            }
        }
    }
  }

  private def handleQuery(ex: HttpExchange): Unit = {
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
            val result = user match {
              case Some(u) =>
                QueryService.authorizedQuery(spark, streams, q, range, u)
              case None => Right(QueryService.query(spark, streams, q, range))
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

  server.createContext("/api/v1/ingest", handler(handleIngest))
  server.createContext("/api/v1/query", handler(handleQuery))
  server.createContext("/api/v1/liveness",
    handler(ex => respond(ex, 200, """{"status":"alive"}""")))
  server.createContext("/api/v1/readiness",
    handler(ex => respond(ex, 200, """{"status":"ready"}""")))

  def start(): Unit = server.start()

  def stop(): Unit = {
    server.stop(0)
    // the fixed pool's threads are non-daemon: without this, every
    // started server leaks `threads` live threads for the JVM's lifetime
    pool.shutdown()
  }
}

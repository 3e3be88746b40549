package graft.http

import com.sun.net.httpserver.HttpExchange
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.ml.Similarity
import graft.query.{QueryService, Rbac, TimeRange}

import GraftHttpServer._

/** ANN served over the wire — the engine's recommended similarity entry
  * points get an API surface, the way the reference serves every query
  * capability over HTTP (`src/handlers/http/query.rs`). Two routes:
  *
  *   - `POST /api/v1/similarity/index` — build (and optionally
  *     [[graft.ml.Similarity.calibrateIvfIndex calibrate]]) a persisted
  *     IVF index over a stream window's vector column. The index lives
  *     under the stream's dotted `.simindex/<column>` dir — invisible to
  *     parquet partition discovery, co-located with the data it serves.
  *   - `POST /api/v1/similarity/search` — top-k neighbors for query ids
  *     or raw query vectors. Served from the persisted index when one
  *     exists (at its stored probe calibration via the `nProbe = -1`
  *     contract); otherwise falls back to the ad-hoc
  *     [[graft.ml.Similarity.annSearch]] default path (build + calibrate
  *     per request — correct, but deployments that care index once).
  *
  * One surface of [[GraftHttpServer]] — state and shared plumbing stay on
  * the server class (self-type), same split as [[PrismRoutes]].
  */
private[http] trait SimilarityRoutes { self: GraftHttpServer =>

  /** Vector columns become filesystem path segments under `.simindex` —
    * pin to identifier characters so a crafted field name cannot escape
    * the stream's index dir.
    */
  private val SafeField = "^[A-Za-z0-9_]{1,64}$".r

  private def indexDir(key: String, vecField: String): String =
    s"$root/$key/.simindex/$vecField"

  private def indexExists(key: String, vecField: String): Boolean =
    java.nio.file.Files.isDirectory(
      java.nio.file.Paths.get(indexDir(key, vecField), "centroids"))

  private[http] def handleSimilarity(ex: HttpExchange): Unit = {
    val sub = Option(ex.getRequestURI.getPath).getOrElse("")
      .stripPrefix("/api/v1/similarity").stripSuffix("/")
    sub match {
      case "/index" => handleSimIndex(ex)
      case "/search" => handleSimSearch(ex)
      case _ => err(ex, 404, "unknown similarity route")
    }
  }

  /** Shared request plumbing: auth → method → body parse → dataset
    * resolution → RBAC → time window → (stream key, windowed scan).
    */
  private def withSimRequest(ex: HttpExchange)(
      body: (com.fasterxml.jackson.databind.JsonNode, String) => Unit): Unit =
    authedUser(ex) match {
      case Left(msg) => err(ex, 401, msg)
      case Right(userOpt) =>
        if (ex.getRequestMethod != "POST") { err(ex, 405, "POST only"); return }
        val b =
          try mapper.readTree(ex.getRequestBody)
          catch {
            case e: com.fasterxml.jackson.core.JacksonException =>
              err(ex, 400, s"malformed JSON body: ${e.getOriginalMessage}")
              return
          }
        val dataset = b.path("datasetName").asText("")
        val vecField = b.path("vectorField").asText("")
        val idField = b.path("idField").asText("")
        if (dataset.isEmpty || vecField.isEmpty || idField.isEmpty) {
          err(ex, 400, "datasetName, vectorField and idField are required")
          return
        }
        if (!SafeField.matches(vecField)) {
          err(ex, 400, "vectorField must match [A-Za-z0-9_]{1,64}")
          return
        }
        val tenant = tenantOf(userOpt)
        streamsFor(tenant).get(dataset) match {
          case None => err(ex, 404, s"stream '$dataset' not found")
          case Some(_) =>
            if (userOpt.exists(u => !Rbac.authorized(u, Rbac.QueryAction,
                tenantKey(tenant, dataset)))) {
              err(ex, 403, s"user lacks query access to stream '$dataset'")
              return
            }
            body(b, tenant)
        }
    }

  /** The windowed (id, vector) frame: ids as long, vectors as
    * array<float> — one vector dtype through index build, persisted
    * search and ad-hoc search, whatever width the JSON ingest inferred.
    */
  private def vectorScan(dataset: String, b: com.fasterxml.jackson.databind.JsonNode,
                         idField: String, vecField: String,
                         tenant: String): Either[String, DataFrame] = {
    val range =
      try TimeRange.parse(b.path("startTime").asText(""),
        b.path("endTime").asText(""))
      catch { case e: Exception => return Left(s"bad time: ${e.getMessage}") }
    val stream = streamsFor(tenant)(dataset)
    val df = QueryService.windowedRead(spark, dataset, stream, range)
    Right(df
      .select(col(idField).cast("long").as(idField),
        col(vecField).cast("array<float>").as(vecField))
      .filter(col(idField).isNotNull && col(vecField).isNotNull))
  }

  /** `POST /api/v1/similarity/index`: `{"datasetName", "vectorField",
    * "idField", "startTime", "endTime", "numCentroids"?, "spill"?,
    * "targetRecall"?, "k"?}`. Builds the persisted IVF index (sized by
    * [[Similarity.autoCoarseCentroids]] unless pinned); with
    * `targetRecall` it also calibrates the serving probe count, so every
    * later search at the default `nProbe = -1` serves AT the stored
    * calibration. Rebuild semantics come from [[Similarity.saveIvfIndex]]
    * (a rebuild clears a stale calibration). Response:
    * `{"status","rows","numCentroids","spill","nProbe"?}`.
    */
  private[http] def handleSimIndex(ex: HttpExchange): Unit =
    withSimRequest(ex) { (b, tenant) =>
      val dataset = b.path("datasetName").asText("")
      val vecField = b.path("vectorField").asText("")
      val idField = b.path("idField").asText("")
      withSqlTimeout(ex) {
        try {
          vectorScan(dataset, b, idField, vecField, tenant) match {
            case Left(m) => err(ex, 400, m)
            case Right(df) =>
              val rows = df.count()
              if (rows == 0L) { err(ex, 400, "window holds no vectors"); return }
              val cents =
                if (b.hasNonNull("numCentroids")) b.get("numCentroids").asInt
                else Similarity.autoCoarseCentroids(rows)
              if (cents < 1) { err(ex, 400, "numCentroids must be >= 1"); return }
              val spill = b.path("spill").asInt(1)
              val key = tenantKey(tenant, dataset)
              val dir = indexDir(key, vecField)
              Similarity.saveIvfIndex(df, idField, vecField, cents, dir,
                spill = spill)
              val o = mapper.createObjectNode()
                .put("status", "indexed").put("rows", rows)
                .put("numCentroids", cents).put("spill", spill)
              if (b.hasNonNull("targetRecall")) {
                val k = b.path("k").asInt(10)
                val np = Similarity.calibrateIvfIndex(spark, dir, k,
                  b.get("targetRecall").asDouble)
                o.put("nProbe", np)
                ()
              }
              respond(ex, 200, mapper.writeValueAsString(o))
          }
        } catch {
          case e: IllegalArgumentException =>
            err(ex, 400, String.valueOf(e.getMessage))
          case _: org.apache.spark.sql.AnalysisException =>
            err(ex, 400, "window schema lacks the requested fields")
        }
      }
    }

  /** `POST /api/v1/similarity/search`: `{"datasetName", "vectorField",
    * "idField", "k"?, "queryIds": [id…]?` XOR `"queryVectors":
    * [[f…]…]?, "targetRecall"?, "startTime", "endTime"}`. Persisted
    * index present → [[Similarity.ivfSearchPersisted]] at `nProbe = -1`
    * (the stored calibration, or the fixed-fraction fallback); absent →
    * the ad-hoc [[Similarity.annSearch]] default path at `targetRecall`
    * over the windowed scan. `queryVectors` key results by POSITION
    * (q_id = array index). Response: `{"served_from", "results":
    * [{"q_id", "neighbors": [{"id", "rank", "score"}…]}…]}` — score is
    * probed-cosine on the persisted path, exact L2² on the ad-hoc path
    * (each documented by `score_kind`).
    */
  private[http] def handleSimSearch(ex: HttpExchange): Unit =
    withSimRequest(ex) { (b, tenant) =>
      val dataset = b.path("datasetName").asText("")
      val vecField = b.path("vectorField").asText("")
      val idField = b.path("idField").asText("")
      val k = b.path("k").asInt(10)
      if (k < 1) { err(ex, 400, "k must be >= 1"); return }
      val hasIds = b.hasNonNull("queryIds")
      val hasVecs = b.hasNonNull("queryVectors")
      if (hasIds == hasVecs) {
        err(ex, 400, "exactly one of queryIds or queryVectors is required")
        return
      }
      withSqlTimeout(ex) {
        try {
          vectorScan(dataset, b, idField, vecField, tenant) match {
            case Left(m) => err(ex, 400, m)
            case Right(scan) =>
              import scala.jdk.CollectionConverters._
              val queries: DataFrame =
                if (hasIds) {
                  val ids = b.get("queryIds").elements().asScala
                    .map(_.asLong).toSeq
                  if (ids.isEmpty) { err(ex, 400, "queryIds is empty"); return }
                  val q = scan.filter(col(idField).isin(ids: _*))
                  if (q.isEmpty) {
                    err(ex, 400, "no queryIds found in the window")
                    return
                  }
                  q
                } else {
                  val vecs = b.get("queryVectors").elements().asScala
                    .map(v => v.elements().asScala.map(_.floatValue).toArray)
                    .toSeq
                  if (vecs.isEmpty) { err(ex, 400, "queryVectors is empty"); return }
                  import spark.implicits._
                  vecs.zipWithIndex.map { case (v, i) => (i.toLong, v) }
                    .toDF(idField, vecField)
                }
              val key = tenantKey(tenant, dataset)
              // raw-vector queries carry SYNTHETIC positional ids — id
              // equality with a corpus row is a coincidence, not a self
              // match, so only the queryIds path excludes self
              val (res, servedFrom, scoreKind) =
                if (indexExists(key, vecField))
                  (Similarity.ivfSearchPersisted(spark,
                    indexDir(key, vecField), queries, idField, vecField, k,
                    nProbe = -1, excludeSelf = hasIds),
                    "persisted_index", "cosine")
                else {
                  val target = b.path("targetRecall").asDouble(0.9)
                  val dim = queries.select(size(col(vecField))).head.getInt(0)
                  (Similarity.annSearch(scan, queries, idField, vecField, k,
                    targetRecall = target, dim = dim,
                    excludeSelf = hasIds), "ad_hoc_ann", "l2sq")
                }
              val scoreCol =
                res.columns.find(c => c == "cosine" || c == "dist" || c == "adc")
                  .getOrElse("rk")
              val rows = res
                .select(col("q_id"), col("n_id"), col("rk"),
                  col(scoreCol).cast("double").as("score"))
                .orderBy(col("q_id"), col("rk")).collect()
              val o = mapper.createObjectNode()
                .put("served_from", servedFrom).put("score_kind", scoreKind)
              val arr = o.putArray("results")
              rows.groupBy(_.getLong(0)).toSeq.sortBy(_._1).foreach {
                case (qId, ns) =>
                  val qo = arr.addObject()
                  qo.put("q_id", qId)
                  val na = qo.putArray("neighbors")
                  ns.sortBy(_.getInt(2)).foreach { r =>
                    na.addObject().put("id", r.getLong(1))
                      .put("rank", r.getInt(2)).put("score", r.getDouble(3))
                  }
              }
              respond(ex, 200, mapper.writeValueAsString(o))
          }
        } catch {
          case e: IllegalArgumentException =>
            err(ex, 400, String.valueOf(e.getMessage))
          case _: org.apache.spark.sql.AnalysisException =>
            err(ex, 400, "window schema lacks the requested fields")
        }
      }
    }
}

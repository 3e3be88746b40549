package graft.http

import java.net.{HttpURLConnection, URL}
import java.nio.charset.StandardCharsets.UTF_8

import com.fasterxml.jackson.databind.ObjectMapper

import graft.SparkSuite

/** `POST /api/v1/similarity/{index,search}` — the calibrated-ANN serving
  * path over the wire: ingest vectors through the normal JSON ingest,
  * search ad-hoc (annSearch fallback), then build + calibrate the
  * persisted IVF index and search again from it (the `nProbe = -1`
  * stored-calibration contract). Assertions are structural — k DISTINCT
  * ranked neighbors from the right cluster — so the spec pins the wire
  * contract, not floating-point id orders.
  */
class SimilarityHttpSpec extends SparkSuite {

  private val mapper = new ObjectMapper()

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

  test("ingest vectors -> ad-hoc search -> index+calibrate -> persisted " +
      "search: k distinct cluster-correct neighbors on both paths") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-sim").toString
    val srv = new GraftHttpServer(spark, tmp)
    srv.start()
    try {
      val base = s"http://127.0.0.1:${srv.boundPort}/api/v1"
      assert(http("PUT", s"$base/logstream/vecs")._1 == 200)
      // two tight 8-dim clusters: A = ids 1..10 near (10,1,0,...),
      // B = ids 11..20 near (0,0,10,1,0,...) — deterministic jitter
      def vec(id: Int): Seq[Double] = {
        val v = Array.fill(8)(0.01 * (id % 5))
        if (id <= 10) { v(0) = 10.0; v(1) = 1.0 + 0.1 * id }
        else { v(2) = 10.0; v(3) = 1.0 + 0.1 * (id - 10) }
        v.toSeq
      }
      val events = (1 to 20).map(id =>
        s"""{"vid":$id,"emb":[${vec(id).mkString(",")}]}""")
      val (is, ib) = http("POST", s"$base/ingest",
        Map("X-P-Stream" -> "vecs"), Some(events.mkString("[", ",", "]")))
      assert(is == 200, ib)

      val end = java.time.Instant.now().plusSeconds(60).toString
      val window = s""""startTime":"10m","endTime":"$end""""
      def ask(route: String, bodyJson: String): (Int, String) =
        http("POST", s"$base/similarity/$route", body = Some(bodyJson))

      def checkNeighbors(bodyText: String, expectFrom: String,
                         k: Int, clusterA: Boolean,
                         excludeSelf: Option[Long]): Unit = {
        val o = mapper.readTree(bodyText)
        assert(o.get("served_from").asText == expectFrom, bodyText)
        val results = o.get("results")
        assert(results.size() == 1, bodyText)
        val ns = results.get(0).get("neighbors")
        assert(ns.size() == k, bodyText)
        val ids = (0 until k).map(i => ns.get(i).get("id").asLong)
        assert(ids.distinct.size == k, s"duplicate neighbors: $ids")
        val ranks = (0 until k).map(i => ns.get(i).get("rank").asInt)
        assert(ranks == (1 to k), s"ranks not 1..$k: $ranks")
        ids.foreach { id =>
          if (clusterA) assert(id >= 1 && id <= 10, s"cross-cluster $id")
          else assert(id >= 11 && id <= 20, s"cross-cluster $id")
        }
        excludeSelf.foreach(self =>
          assert(!ids.contains(self), s"self in neighbors: $ids"))
      }

      // ad-hoc path: no index yet — a raw query vector near cluster A
      val (as, ab) = ask("search",
        s"""{"datasetName":"vecs","vectorField":"emb","idField":"vid",
           |"k":3,"queryVectors":[[10,1,0,0,0,0,0,0]],$window}"""
          .stripMargin.replace("\n", " "))
      assert(as == 200, ab)
      // 20 rows < the exact floor: ad-hoc serving is brute force here
      checkNeighbors(ab, "ad_hoc_exact", 3, clusterA = true, None)

      // build + calibrate the persisted index
      val (xs, xb) = ask("index",
        s"""{"datasetName":"vecs","vectorField":"emb","idField":"vid",
           |"numCentroids":4,"targetRecall":0.9,"k":3,$window}"""
          .stripMargin.replace("\n", " "))
      assert(xs == 200, xb)
      val xo = mapper.readTree(xb)
      assert(xo.get("status").asText == "indexed", xb)
      assert(xo.get("rows").asLong == 20L, xb)
      assert(xo.has("nProbe") && xo.get("nProbe").asInt >= 1, xb)

      // persisted path: by id, served at the stored calibration;
      // the query row itself must not come back
      val (ps, pb) = ask("search",
        s"""{"datasetName":"vecs","vectorField":"emb","idField":"vid",
           |"k":3,"queryIds":[15],$window}"""
          .stripMargin.replace("\n", " "))
      assert(ps == 200, pb)
      checkNeighbors(pb, "persisted_index", 3, clusterA = false, Some(15L))

      // raw-vector queries carry POSITIONAL ids — position 1 collides
      // with corpus id 1, which must NOT be self-excluded: query #1
      // duplicates row 1's vector exactly, so row 1 is its rank-1
      // neighbor (the regression this pins: synthetic-id self-exclusion
      // silently dropped the best match)
      val v1 = Seq(10.0, 1.1) ++ Seq.fill(6)(0.01)
      val (cs, cb) = ask("search",
        s"""{"datasetName":"vecs","vectorField":"emb","idField":"vid",
           |"k":3,"queryVectors":[[0,0,10,1,0,0,0,0],
           |[${v1.mkString(",")}]],$window}"""
          .stripMargin.replace("\n", " "))
      assert(cs == 200, cb)
      val co = mapper.readTree(cb)
      assert(co.get("served_from").asText == "persisted_index", cb)
      val byQ = (0 until co.get("results").size())
        .map(i => co.get("results").get(i))
        .map(r => r.get("q_id").asLong -> r.get("neighbors")).toMap
      assert(byQ.keySet == Set(0L, 1L), cb)
      assert(byQ(1L).get(0).get("id").asLong == 1L,
        s"positional q_id 1 self-excluded corpus row 1: $cb")
      assert((0 until byQ(0L).size()).map(i => byQ(0L).get(i).get("id").asLong)
        .forall(id => id >= 11 && id <= 20), cb)

      // queryIds none of which are in the window → 400, not a crash
      assert(ask("search", s"""{"datasetName":"vecs","vectorField":"emb","idField":"vid","queryIds":[999],$window}""")._1 == 400)

      // error surfaces
      assert(ask("search", s"""{"datasetName":"nope","vectorField":"emb","idField":"vid","queryIds":[1],$window}""")._1 == 404)
      assert(ask("search", s"""{"datasetName":"vecs","vectorField":"emb",$window}""")._1 == 400)
      assert(ask("search", s"""{"datasetName":"vecs","vectorField":"emb","idField":"vid","queryIds":[1],"queryVectors":[[1]],$window}""")._1 == 400)
      assert(ask("search", s"""{"datasetName":"vecs","vectorField":"emb","idField":"vid",$window}""")._1 == 400)
      // path-injection guard: a vector field is a filesystem segment
      assert(ask("index", s"""{"datasetName":"vecs","vectorField":"../emb","idField":"vid",$window}""")._1 == 400)
      assert(ask("search", s"""{"datasetName":"vecs","vectorField":"a/b","idField":"vid","queryIds":[1],$window}""")._1 == 400)
      assert(http("GET", s"$base/similarity/search")._1 == 405)
      assert(ask("nosuch", "{}")._1 == 404)
    } finally srv.stop()
  }

  test("filtered + diversified search, delete/compact lifecycle, and " +
      "write-privileged maintenance: a Reader searches but cannot " +
      "mutate the index other readers serve from") {
    import java.util.Base64
    def basic(user: String, pass: String): Map[String, String] =
      Map("Authorization" -> ("Basic " + Base64.getEncoder
        .encodeToString(s"$user:$pass".getBytes(UTF_8))))
    val tmp = java.nio.file.Files.createTempDirectory("graft-simf").toString
    val srv = new GraftHttpServer(spark, tmp, requireAuth = true,
      users = Map("wr" -> "pw", "rd" -> "pr"))
    srv.start()
    graft.query.Rbac.grant("wr", Seq(graft.query.Rbac.Writer(Some("fvecs"))))
    graft.query.Rbac.grant("rd", Seq(graft.query.Rbac.Reader(Some("fvecs"))))
    try {
      val base = s"http://127.0.0.1:${srv.boundPort}/api/v1"
      val wr = basic("wr", "pw")
      val rd = basic("rd", "pr")
      assert(http("PUT", s"$base/logstream/fvecs", wr)._1 == 200)
      // same two clusters as above, now with a tag attribute:
      // A = ids 1..10 tag "a", B = ids 11..20 tag "b"
      def vec(id: Int): Seq[Double] = {
        val v = Array.fill(8)(0.01 * (id % 5))
        if (id <= 10) { v(0) = 10.0; v(1) = 1.0 + 0.1 * id }
        else { v(2) = 10.0; v(3) = 1.0 + 0.1 * (id - 10) }
        v.toSeq
      }
      val events = (1 to 20).map(id =>
        s"""{"vid":$id,"emb":[${vec(id).mkString(",")}],
           |"tag":"${if (id <= 10) "a" else "b"}"}"""
          .stripMargin.replace("\n", ""))
      assert(http("POST", s"$base/ingest", wr + ("X-P-Stream" -> "fvecs"),
        Some(events.mkString("[", ",", "]")))._1 == 200)

      val end = java.time.Instant.now().plusSeconds(60).toString
      val window = s""""startTime":"10m","endTime":"$end""""
      def ask(route: String, who: Map[String, String],
              bodyJson: String): (Int, String) =
        http("POST", s"$base/similarity/$route", who, Some(bodyJson))
      def neighborIds(bodyText: String): Seq[Long] = {
        val o = mapper.readTree(bodyText)
        assert(o.has("results") && o.get("results").size() > 0,
          s"no results in: $bodyText")
        val ns = o.get("results").get(0).get("neighbors")
        (0 until ns.size()).map(i => ns.get(i).get("id").asLong)
      }
      val qA = """[10,1,0,0,0,0,0,0]"""

      // AD-HOC filtered search (no index yet): a cluster-A query with
      // where tag = "b" must return the best B rows — pre-filtering,
      // not a post-filtered top-k that comes back empty
      val (fs0, fb0) = ask("search", rd,
        s"""{"datasetName":"fvecs","vectorField":"emb","idField":"vid",
           |"k":3,"queryVectors":[$qA],
           |"where":{"column":"tag","op":"=","value":"b"},$window}"""
          .stripMargin.replace("\n", " "))
      assert(fs0 == 200, fb0)
      assert(mapper.readTree(fb0).get("served_from").asText == "ad_hoc_exact")
      assert(neighborIds(fb0).forall(id => id >= 11 && id <= 20), fb0)
      // facetCap needs the persisted attribute rows
      assert(ask("search", rd,
        s"""{"datasetName":"fvecs","vectorField":"emb","idField":"vid",
           |"k":4,"queryVectors":[$qA],
           |"facetCap":{"field":"tag","max":2},$window}"""
          .stripMargin.replace("\n", " "))._1 == 400)
      // an unsatisfiable ad-hoc filter is a client error, not a crash
      assert(ask("search", rd,
        s"""{"datasetName":"fvecs","vectorField":"emb","idField":"vid",
           |"k":3,"queryVectors":[$qA],
           |"where":{"column":"tag","op":"=","value":"zzz"},$window}"""
          .stripMargin.replace("\n", " "))._1 == 400)

      // index build is write-privileged: Reader 403, Writer 200
      val idxBody =
        s"""{"datasetName":"fvecs","vectorField":"emb","idField":"vid",
           |"numCentroids":4,"targetRecall":0.9,"k":3,
           |"attrFields":["tag"],$window}"""
          .stripMargin.replace("\n", " ")
      assert(ask("index", rd, idxBody)._1 == 403)
      val (xs, xb) = ask("index", wr, idxBody)
      assert(xs == 200, xb)
      assert(mapper.readTree(xb).get("attrFields").get(0).asText == "tag")

      // persisted filtered search, both predicate directions. nProbe = 4
      // (full depth, = exact filtered search): a selective predicate
      // anti-correlated with the query's nearest lists ("tag = b" on a
      // deep-in-"a" query) can otherwise probe past every match — the
      // per-request widening knob exists exactly for this
      def filtered(tag: String): Seq[Long] = {
        val (s, b) = ask("search", rd,
          s"""{"datasetName":"fvecs","vectorField":"emb","idField":"vid",
             |"k":3,"queryVectors":[$qA],"nProbe":4,
             |"where":{"column":"tag","op":"=","value":"$tag"},$window}"""
            .stripMargin.replace("\n", " "))
        assert(s == 200, b)
        assert(mapper.readTree(b).get("served_from").asText ==
          "persisted_index", b)
        neighborIds(b)
      }
      assert(filtered("a").forall(id => id >= 1 && id <= 10))
      assert(filtered("b").forall(id => id >= 11 && id <= 20))

      // autoProbe = the self-tuning form of the same widening: 10 "b"
      // matches over 4 lists -> ceil(4*4*3/10) clamps to full depth, so
      // the result equals the hand-widened nProbe:4 search
      val (aps, apb) = ask("search", rd,
        s"""{"datasetName":"fvecs","vectorField":"emb","idField":"vid",
           |"k":3,"queryVectors":[$qA],"autoProbe":true,
           |"where":{"column":"tag","op":"=","value":"b"},$window}"""
          .stripMargin.replace("\n", " "))
      assert(aps == 200, apb)
      assert(neighborIds(apb).forall(id => id >= 11 && id <= 20), apb)
      // and its misuse surfaces are loud
      assert(ask("search", rd,
        s"""{"datasetName":"fvecs","vectorField":"emb","idField":"vid",
           |"k":3,"queryVectors":[$qA],"autoProbe":true,$window}"""
          .stripMargin.replace("\n", " "))._1 == 400)
      assert(ask("search", rd,
        s"""{"datasetName":"fvecs","vectorField":"emb","idField":"vid",
           |"k":3,"queryVectors":[$qA],"autoProbe":true,"nProbe":2,
           |"where":{"column":"tag","op":"=","value":"b"},$window}"""
          .stripMargin.replace("\n", " "))._1 == 400)

      // diversified search: at most 2 neighbors per tag value
      val (ds, db) = ask("search", rd,
        s"""{"datasetName":"fvecs","vectorField":"emb","idField":"vid",
           |"k":4,"queryVectors":[$qA],"nProbe":4,
           |"facetCap":{"field":"tag","max":2},$window}"""
          .stripMargin.replace("\n", " "))
      assert(ds == 200, db)
      val dIds = neighborIds(db)
      assert(dIds.size == 4, db)
      assert(dIds.count(id => id <= 10) == 2 && dIds.count(_ > 10) == 2,
        s"facetCap 2-per-tag violated: $dIds")

      // a typo'd probe count fails loudly, it does not silently serve
      assert(ask("search", rd,
        s"""{"datasetName":"fvecs","vectorField":"emb","idField":"vid",
           |"k":3,"queryVectors":[$qA],"nProbe":0,$window}"""
          .stripMargin.replace("\n", " "))._1 == 400)

      // delete tombstones out of every later search; compact keeps it so
      val exact3 =
        s"""{"datasetName":"fvecs","vectorField":"emb","idField":"vid",
           |"k":1,"queryVectors":[[${vec(3).mkString(",")}]],$window}"""
          .stripMargin.replace("\n", " ")
      assert(neighborIds(ask("search", rd, exact3)._2) == Seq(3L))
      val delBody =
        s"""{"datasetName":"fvecs","vectorField":"emb","idField":"vid",
           |"deleteIds":[3]}""".stripMargin.replace("\n", " ")
      assert(ask("delete", rd, delBody)._1 == 403)
      assert(ask("delete", wr, delBody)._1 == 200)
      assert(!neighborIds(ask("search", rd, exact3)._2).contains(3L))
      val cmpBody = """{"datasetName":"fvecs","vectorField":"emb"}"""
      assert(ask("compact", rd, cmpBody)._1 == 403)
      assert(ask("compact", wr, cmpBody)._1 == 200)
      assert(!neighborIds(ask("search", rd, exact3)._2).contains(3L))
      // maintenance on a field with no index → 404
      assert(ask("delete", wr,
        s"""{"datasetName":"fvecs","vectorField":"emb2","idField":"vid",
           |"deleteIds":[1]}""".stripMargin.replace("\n", " "))._1 == 404)
      assert(ask("compact", wr,
        """{"datasetName":"fvecs","vectorField":"emb2"}""")._1 == 404)
    } finally {
      srv.stop()
      graft.query.Rbac.clear()
    }
  }
}

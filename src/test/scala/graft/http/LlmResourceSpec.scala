package graft.http

import java.net.{HttpURLConnection, InetSocketAddress, URL}
import java.nio.charset.StandardCharsets.UTF_8
import java.util.Base64
import java.util.concurrent.atomic.AtomicReference

import com.fasterxml.jackson.databind.ObjectMapper
import com.sun.net.httpserver.HttpServer

import graft.SparkSuite
import graft.query.Rbac

/** Prompt-to-SQL endpoint against a stub chat-completions provider
  * (reference `src/handlers/http/llm.rs`), and resource-guard load
  * shedding on the ingest path (reference
  * `src/handlers/http/resource_check.rs`).
  */
class LlmResourceSpec extends SparkSuite {

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

  private def basic(user: String, pass: String): Map[String, String] =
    Map("Authorization" -> ("Basic " + Base64.getEncoder
      .encodeToString(s"$user:$pass".getBytes(UTF_8))))

  test("llm/generate builds a schema-aware prompt, forwards bearer auth, " +
       "returns the completion; unconfigured and provider errors are 500") {
    // stub provider: records the prompt it received, returns canned SQL
    val lastPrompt = new AtomicReference[String]("")
    val lastAuth = new AtomicReference[String]("")
    val provider = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    provider.createContext("/v1/chat/completions", ex => {
      lastAuth.set(ex.getRequestHeaders.getFirst("Authorization"))
      val req = mapper.readTree(ex.getRequestBody)
      lastPrompt.set(req.get("messages").get(0).get("content").asText())
      val body =
        """{"choices":[{"message":{"role":"assistant",
          |"content":"-- count rows\nSELECT COUNT(*) FROM qlogs"}}]}"""
          .stripMargin.replace("\n", "")
      val bytes = body.getBytes(UTF_8)
      ex.sendResponseHeaders(200, bytes.length.toLong)
      ex.getResponseBody.write(bytes)
      ex.close()
    })
    provider.start()
    val tmp = java.nio.file.Files.createTempDirectory("graft-llm").toString
    Rbac.clear()
    val srv = new GraftHttpServer(spark, tmp, requireAuth = true,
      users = Map("alice" -> "pw"),
      llm = Some(Llm.Config(
        url = s"http://127.0.0.1:${provider.getAddress.getPort}/v1/chat/completions",
        apiKey = "sk-test-key")))
    srv.start()
    try {
      val base = s"http://127.0.0.1:${srv.boundPort}/api/v1"
      Rbac.grant("alice",
        Seq(Rbac.Reader(Some("qlogs")), Rbac.Ingestor(Some("qlogs"))))
      assert(http("POST", s"$base/ingest",
        basic("alice", "pw") + ("X-P-Stream" -> "qlogs"),
        Some("""{"level": "info", "latency_ms": 12}"""))._1 == 200)

      val (s1, b1) = http("POST", s"$base/llm/generate", basic("alice", "pw"),
        Some("""{"prompt": "count all rows", "stream": "qlogs"}"""))
      assert(s1 == 200, b1)
      // response is the completion content as one JSON string
      assert(mapper.readTree(b1).asText().contains("SELECT COUNT(*)"))
      // the stub saw a schema-aware prompt with our columns and the bearer
      val p = lastPrompt.get()
      assert(p.contains("I have a table called qlogs"), p)
      assert(p.contains("level") && p.contains("latency_ms"), p)
      assert(p.contains("count all rows"))
      assert(lastAuth.get() == "Bearer sk-test-key")

      // unknown stream → 500 (reference maps StreamNotFound to 500)
      assert(http("POST", s"$base/llm/generate", basic("alice", "pw"),
        Some("""{"prompt": "x", "stream": "nope"}"""))._1 == 500)
      // missing fields → 400
      assert(http("POST", s"$base/llm/generate", basic("alice", "pw"),
        Some("""{"prompt": "x"}"""))._1 == 400)
    } finally { srv.stop(); provider.stop(0); Rbac.clear() }

    // a server with NO llm config answers 500 InvalidAPIKey
    val srvNo = new GraftHttpServer(spark, tmp)
    srvNo.start()
    try {
      val (s, b) = http("POST",
        s"http://127.0.0.1:${srvNo.boundPort}/api/v1/llm/generate",
        body = Some("""{"prompt": "x", "stream": "qlogs"}"""))
      assert(s == 500 && b.contains("key"), s"$s $b")
    } finally srvNo.stop()
  }

  test("resource guard sheds ingest load over threshold and recovers; " +
       "query path stays open") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-rc").toString
    // injectable sampler driven by the test
    val usage = new AtomicReference[(Double, Double)]((10.0, 10.0))
    val srv = new GraftHttpServer(spark, tmp,
      resourceCheck = Some(ResourceMonitor.Config(
        cpuThresholdPct = 90.0, memThresholdPct = 80.0,
        intervalMillis = 50L, sampler = () => usage.get())))
    srv.start()
    try {
      val base = s"http://127.0.0.1:${srv.boundPort}/api/v1"
      def ingestStatus(): Int = http("POST", s"$base/ingest",
        Map("X-P-Stream" -> "rlogs"), Some("""{"m": 1}"""))._1
      def await(want: Int): Unit = {
        val deadline = System.currentTimeMillis() + 20000
        while (ingestStatus() != want &&
               System.currentTimeMillis() < deadline) Thread.sleep(100)
      }
      assert(ingestStatus() == 200)

      usage.set((95.0, 10.0)) // CPU over threshold
      await(503)
      assert(ingestStatus() == 503)
      // reads stay open while ingest sheds
      val end = java.time.Instant.now().plusSeconds(60).toString
      assert(http("POST", s"$base/query", body = Some(
        s"""{"query": "SELECT m FROM rlogs", "startTime": "10m",
           |"endTime": "$end"}""".stripMargin.replace("\n", " ")))._1 == 200)

      usage.set((10.0, 10.0)) // recovered
      await(200)
      assert(ingestStatus() == 200)
    } finally srv.stop()
  }
}

package graft.http

import java.net.{HttpURLConnection, URL}
import java.nio.charset.StandardCharsets.UTF_8

import com.fasterxml.jackson.databind.ObjectMapper

import graft.SparkSuite

/** PUT /logstream creation headers over the wire (reference
  * `create_update_stream`): static-schema streams, custom partitions,
  * update semantics, duplicate-create refusal, and GET .../info.
  */
class StaticSchemaHttpSpec extends SparkSuite {

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

  private val goodSchema =
    """{"fields":[{"name":"level","data_type":"string"},
      |{"name":"code","data_type":"int"},
      |{"name":"elapsed","data_type":"double"},
      |{"name":"at","data_type":"datetime"}]}""".stripMargin

  test("static-schema stream: fixed fields enforced at ingest") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-ss").toString
    val srv = new GraftHttpServer(spark, tmp)
    srv.start()
    val base = s"http://127.0.0.1:${srv.boundPort}/api/v1"
    try {
      val (cs, cb) = http("PUT", s"$base/logstream/fixed",
        Map("X-P-Static-Schema-Flag" -> "true"), Some(goodSchema))
      assert(cs == 200, cb)
      // schema visible before any event arrives
      val (ss, sb) = http("GET", s"$base/logstream/fixed/schema")
      assert(ss == 200 && sb.contains("level") && sb.contains("code"))
      // conforming event ingests
      assert(http("POST", s"$base/ingest", Map("X-P-Stream" -> "fixed"),
        Some("""{"level":"info","code":7}"""))._1 == 200)
      // unknown field → 400 (the defining static-schema behavior)
      val (rs, rb) = http("POST", s"$base/ingest",
        Map("X-P-Stream" -> "fixed"), Some("""{"level":"info","extra":1}"""))
      assert(rs == 400 && rb.contains("not in static schema"), rb)
      // mistyped value → 400 (schema-first parse, not silent coercion)
      val (ts, tb) = http("POST", s"$base/ingest",
        Map("X-P-Stream" -> "fixed"), Some("""{"code":"not a number"}"""))
      assert(ts == 400 && tb.contains("declared"), tb)
      // a datetime column accepts ISO input and refuses garbage
      assert(http("POST", s"$base/ingest", Map("X-P-Stream" -> "fixed"),
        Some("""{"at":"2026-01-02T03:04:05Z","level":"ok"}"""))._1 == 200)
      assert(http("POST", s"$base/ingest", Map("X-P-Stream" -> "fixed"),
        Some("""{"at":"yesterday-ish"}"""))._1 == 400)
    } finally srv.stop()
  }

  test("static-schema body validation: bad types, duplicates, reserved, empty") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-ss").toString
    val srv = new GraftHttpServer(spark, tmp)
    srv.start()
    val base = s"http://127.0.0.1:${srv.boundPort}/api/v1"
    val flag = Map("X-P-Static-Schema-Flag" -> "true")
    try {
      assert(http("PUT", s"$base/logstream/b1", flag,
        Some("""{"fields":[{"name":"x","data_type":"uuid"}]}"""))._1 == 400)
      assert(http("PUT", s"$base/logstream/b2", flag,
        Some("""{"fields":[{"name":"x","data_type":"int"},
          |{"name":"x","data_type":"string"}]}""".stripMargin))._1 == 400)
      assert(http("PUT", s"$base/logstream/b3", flag,
        Some("""{"fields":[{"name":"p_timestamp","data_type":"datetime"}]}"""))
        ._1 == 400)
      assert(http("PUT", s"$base/logstream/b4", flag)._1 == 400) // no body
      // none of the refused creates left a stream behind
      assert(http("GET", s"$base/logstream")._2 == "[]")
    } finally srv.stop()
  }

  test("custom partition: layout honored; must exist in a static schema") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-ss").toString
    val srv = new GraftHttpServer(spark, tmp)
    srv.start()
    val base = s"http://127.0.0.1:${srv.boundPort}/api/v1"
    try {
      // custom partition column absent from the static schema → 400
      assert(http("PUT", s"$base/logstream/cp0",
        Map("X-P-Static-Schema-Flag" -> "true",
          "X-P-Custom-Partition" -> "region"), Some(goodSchema))._1 == 400)
      // two keys → reference cap of one
      assert(http("PUT", s"$base/logstream/cp1",
        Map("X-P-Custom-Partition" -> "a,b"))._1 == 400)
      // dynamic stream with one custom partition: written layout carries it
      assert(http("PUT", s"$base/logstream/cp2",
        Map("X-P-Custom-Partition" -> "level"))._1 == 200)
      assert(http("POST", s"$base/ingest", Map("X-P-Stream" -> "cp2"),
        Some("""{"level":"warn","msg":"hi"}"""))._1 == 200)
      // skip dot-prefixed metadata (`.stream/stream.json` — HTTP create
      // persists durable stream metadata there, exactly like partition
      // discovery skips hidden paths)
      def sub(fs: Array[java.io.File]): Array[java.io.File] =
        fs.filter(f => f.isDirectory && !f.getName.startsWith("."))
          .flatMap(_.listFiles)
      val dirs = sub(sub(sub(new java.io.File(s"$tmp/cp2").listFiles())))
        .map(_.getName)
      assert(dirs.exists(_.startsWith("level=warn")), dirs.toSeq)
    } finally srv.stop()
  }

  test("update semantics: duplicate create 400, schema change refused, info") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-ss").toString
    val srv = new GraftHttpServer(spark, tmp)
    srv.start()
    val base = s"http://127.0.0.1:${srv.boundPort}/api/v1"
    try {
      assert(http("PUT", s"$base/logstream/s1")._1 == 200)
      // repeated create without the update flag → reference 400
      val (ds, db) = http("PUT", s"$base/logstream/s1")
      assert(ds == 400 && db.contains("already exists"), db)
      // update on a missing stream → 404
      assert(http("PUT", s"$base/logstream/nope",
        Map("X-P-Update-Stream" -> "true"))._1 == 404)
      // altering the schema of an existing stream is restricted
      assert(http("PUT", s"$base/logstream/s1",
        Map("X-P-Update-Stream" -> "true",
          "X-P-Static-Schema-Flag" -> "true"), Some(goodSchema))._1 == 400)
      // set a retention-metadata limit, then read it back via info
      assert(http("PUT", s"$base/logstream/s1",
        Map("X-P-Update-Stream" -> "true",
          "X-P-Time-Partition-Limit" -> "30d"))._1 == 200)
      assert(http("PUT", s"$base/logstream/s1",
        Map("X-P-Update-Stream" -> "true",
          "X-P-Time-Partition-Limit" -> "oops"))._1 == 400)
      // update the custom partition
      assert(http("PUT", s"$base/logstream/s1",
        Map("X-P-Update-Stream" -> "true",
          "X-P-Custom-Partition" -> "level"))._1 == 200)
      http("POST", s"$base/ingest", Map("X-P-Stream" -> "s1"),
        Some("""{"level":"info","msg":"x"}"""))
      val (is, ib) = http("GET", s"$base/logstream/s1/info")
      assert(is == 200, ib)
      val info = mapper.readTree(ib)
      assert(info.get("stream").asText() == "s1")
      assert(info.get("time_partition_limit").asText() == "30d")
      assert(info.get("custom_partition").asText() == "level")
      assert(!info.get("static_schema_flag").asBoolean())
      assert(!info.get("first_event_at").isNull) // one event stored
      // info on a missing stream
      assert(http("GET", s"$base/logstream/ghost/info")._1 == 404)
    } finally srv.stop()
  }
}

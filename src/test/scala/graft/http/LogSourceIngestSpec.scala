package graft.http

import java.net.{HttpURLConnection, URL}
import java.nio.charset.StandardCharsets.UTF_8

import graft.SparkSuite

/** `X-P-Log-Source` / `X-P-Extract-Log` over the wire: inline known-format
  * extraction at ingest (reference `ingest.rs:86-123` +
  * `known_schema.rs check_or_extract`).
  */
class LogSourceIngestSpec extends SparkSuite {

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

  test("known-format source: raw lines extract into columns, flags stamped") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-ls").toString
    val srv = new GraftHttpServer(spark, tmp)
    srv.start()
    val base = s"http://127.0.0.1:${srv.boundPort}/api/v1"
    val hdrs = Map("X-P-Stream" -> "applogs",
      "X-P-Log-Source" -> "app_log_level", "X-P-Extract-Log" -> "raw")
    try {
      // one extractable line, one garbage line, one pre-structured event
      assert(http("POST", s"$base/ingest", hdrs, Some(
        """[{"raw":"2026-01-02T03:04:05Z ERROR [db] connection refused"},
          |{"raw":"not a structured line at all"},
          |{"timestamp":"2026-01-02T03:04:06Z","level":"INFO",
          | "logger":"web","message":"ok"}]""".stripMargin))._1 == 200)
      val rows = spark.read.parquet(s"$tmp/applogs")
        .select("level", "message", "p_format_verified", "p_format")
        .collect()
      assert(rows.length == 3)
      assert(rows.forall(_.getAs[String]("p_format") == "app_log_level"))
      val byVerify = rows.groupBy(r =>
        Option(r.getAs[String]("p_format_verified")))
      // extracted line: verified=true with captured fields
      val ok = byVerify(Some("true"))
      assert(ok.length == 1 && ok.head.getAs[String]("level") == "ERROR" &&
        ok.head.getAs[String]("message") == "connection refused")
      // garbage line: flagged, still ingested
      assert(byVerify(Some("false")).length == 1)
      // pre-structured event: untouched, no verify stamp
      val pre = byVerify(None)
      assert(pre.length == 1 && pre.head.getAs[String]("level") == "INFO")
    } finally srv.stop()
  }

  test("unknown format 400; otel sources refused on /ingest; builtin passes") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-ls").toString
    val srv = new GraftHttpServer(spark, tmp)
    srv.start()
    val base = s"http://127.0.0.1:${srv.boundPort}/api/v1"
    try {
      val (us, ub) = http("POST", s"$base/ingest",
        Map("X-P-Stream" -> "s", "X-P-Log-Source" -> "no_such_format"),
        Some("""{"a":1}"""))
      assert(us == 400 && ub.contains("Unknown log format"), ub)
      assert(http("POST", s"$base/ingest",
        Map("X-P-Stream" -> "s", "X-P-Log-Source" -> "otel-logs"),
        Some("""{"a":1}"""))._1 == 400)
      assert(http("POST", s"$base/ingest",
        Map("X-P-Stream" -> "s", "X-P-Log-Source" -> "pmeta"),
        Some("""{"a":1}"""))._1 == 200)
      val pf = spark.read.parquet(s"$tmp/s").select("p_format")
        .head.getString(0)
      assert(pf == "pmeta")
    } finally srv.stop()
  }

  test("x-p-* headers become custom-field columns; event fields win") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-ls").toString
    val srv = new GraftHttpServer(spark, tmp)
    srv.start()
    val base = s"http://127.0.0.1:${srv.boundPort}/api/v1"
    try {
      assert(http("POST", s"$base/ingest",
        Map("X-P-Stream" -> "cf", "X-P-Environment" -> "prod",
          "X-P-Tag" -> "canary", "X-P-Level" -> "header-level"),
        Some("""{"msg":"hello","level":"event-level"}"""))._1 == 200)
      val row = spark.read.parquet(s"$tmp/cf")
        .select("environment", "tag", "level").head
      assert(row.getString(0) == "prod")
      assert(row.getString(1) == "canary")
      // duplicate key: the EVENT's own field wins, header value dropped
      assert(row.getString(2) == "event-level")
    } finally srv.stop()
  }
}

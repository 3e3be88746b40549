package graft.ingest

import graft.SparkSuite

class KnownFormatsSpec extends SparkSuite {

  private val accessLine =
    """192.168.1.9 - alice [10/Oct/2024:13:55:36 +0000] "GET /idx.html HTTP/1.1" 200 2326"""
  private val appLine = "2024-01-02T10:11:12Z ERROR [http] connection refused"

  test("per-event extraction with named groups") {
    val m = KnownFormats.extract("access_log", accessLine).get
    assert(m("client_ip") == "192.168.1.9")
    assert(m("method") == "GET" && m("status") == "200")
    assert(KnownFormats.extract("access_log", "garbage").isEmpty)
  }

  test("app log level format") {
    val m = KnownFormats.extract("app_log_level", appLine).get
    assert(m("level") == "ERROR" && m("logger") == "http")
    assert(m("message") == "connection refused")
  }

  test("format detection by majority vote") {
    assert(KnownFormats.detect(Seq(accessLine, accessLine, "junk")).contains("access_log"))
    assert(KnownFormats.detect(Seq("a", "b", "c")).isEmpty)
  }

  test("columnar extraction is codegen-friendly and sets p_format_verified") {
    import spark.implicits._
    val df = Seq(accessLine, "not a log line").toDF("raw")
    val out = KnownFormats.extractColumns(df, "raw", "access_log")
    val rows = out.orderBy(org.apache.spark.sql.functions.col("raw"))
      .select("status", "p_format_verified").collect()
    assert(rows.exists(r => r.getString(0) == "200" && r.getBoolean(1)))
    assert(rows.exists(r => r.getString(0) == "" && !r.getBoolean(1)))
    // no UDF in the plan: extraction must stay inside codegen stages
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("BatchEvalPython") && !plan.contains("ScalaUDF"))
  }
}

package graft.ingest

import graft.SparkSuite

class KnownFormatsSpec extends SparkSuite {

  private val accessLine = FormatSamples.accessLine
  private val appLine = FormatSamples.appLine

  test("every builtin format extracts its sample line") {
    val samples = FormatSamples.samples
        samples.foreach { case (name, (line, (field, expected))) =>
      val m = KnownFormats.extract(name, line)
      assert(m.isDefined, s"format $name did not match its sample")
      assert(m.get(field) == expected, s"format $name: $field=${m.get.get(field)}")
    }
    assert(KnownFormats.all.size >= 53)
  }

  test("zero-field recognizer format (web_robot_log)") {
    val bot = """192.0.2.9 - - [01/Jan/2024:12:00:00 +0000] "GET /robots.txt HTTP/1.1" 200 123 "-" "Googlebot/2.1""""
    assert(KnownFormats.extract("web_robot_log", bot).contains(Map.empty))
    assert(KnownFormats.extract("web_robot_log", "plain line").isEmpty)
  }

  test("full reference format inventory is present (formats.json, 53 names)") {
    val referenceNames = Seq(
      "access_log", "alb_log", "block_log", "candlepin_log",
      "choose_repo_log", "cloudvm_ram_log", "cups_log", "dpkg_log",
      "elb_log", "engine_log", "env_logger_log", "error_log",
      "esx_syslog_log", "haproxy_log", "katello_log", "lnav_debug_log",
      "nextflow_log", "openam_log", "openamdb_log", "openstack_log",
      "page_log", "procstate_log", "proxifier_log", "rails_log",
      "redis_log", "s3_log", "simple_rs_log", "snaplogic_log", "sssd_log",
      "strace_log", "sudo_log", "syslog_log", "tcf_log", "tcsh_history",
      "uwsgi_log", "vmk_log", "vmw_log", "vmw_py_log", "vmw_vc_svc_log",
      "vpostgres_log", "web_robot_log", "xmlrpc_log", "zookeeper_log",
      "kubernetes_log", "postgresql_log", "java", "nginx_access",
      "postgres", "zookeeper", "klog", "parseable_server_logs",
      "boomi_container_log", "boomi_webserver_log")
    assert(referenceNames.size == 53)
    val missing = referenceNames.filterNot(n => KnownFormats.get(n).isDefined)
    assert(missing.isEmpty, s"missing formats: $missing")
  }

  test("multi-variant format falls through to later variants") {
    // error_log variant 2 (legacy shape, no pid/client segments)
    val m = KnownFormats.extract("error_log",
      "[Mon Jan 01 12:00:00 2024] [error] client denied").get
    assert(m("level") == "error" && m("body") == "client denied")
    assert(!m.contains("pid"))
  }

  test("multi-variant columnar extraction coalesces across variants") {
    import spark.implicits._
    val lines = Seq(
      "[Mon Jan 01 12:00:00.123456 2024] [core:error] [pid 123:tid 456] [client 192.0.2.7:50000] File does not exist",
      "[Mon Jan 01 12:00:00 2024] [warn] legacy line",
      "not a log line")
    val out = KnownFormats.extractColumns(lines.toDF("raw"), "raw", "error_log")
    val rows = out.select("level", "pid", "p_format_verified").collect()
    assert(rows.exists(r => r.getString(0) == "error" && r.getString(1) == "123" && r.getBoolean(2)))
    assert(rows.exists(r => r.getString(0) == "warn" && r.isNullAt(1) && r.getBoolean(2)))
    assert(rows.exists(r => !r.getBoolean(2)))
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("BatchEvalPython") && !plan.contains("ScalaUDF"))
  }

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
    assert(rows.exists(r => r.isNullAt(0) && !r.getBoolean(1)))
    // no UDF in the plan: extraction must stay inside codegen stages
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("BatchEvalPython") && !plan.contains("ScalaUDF"))
  }
}

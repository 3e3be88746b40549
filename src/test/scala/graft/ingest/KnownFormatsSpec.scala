package graft.ingest

import graft.SparkSuite

class KnownFormatsSpec extends SparkSuite {

  private val accessLine =
    """192.168.1.9 - alice [10/Oct/2024:13:55:36 +0000] "GET /idx.html HTTP/1.1" 200 2326"""
  private val appLine = "2024-01-02T10:11:12Z ERROR [http] connection refused"

  test("every builtin format extracts its sample line") {
    val samples = Map(
      "nginx_access" -> ("""10.0.0.1 - bob [10/Oct/2024:13:55:36 +0000] "POST /api HTTP/2.0" 201 99 "https://ref.example" "curl/8.0"""",
        "method" -> "POST"),
      "klog" -> ("""I0812 06:33:45.123456    1234 controller.go:123] syncing deployment""",
        "source" -> "controller.go:123"),
      "java_log" -> ("""2024-01-01 12:00:00,123 [main] INFO com.example.Foo - started ok""",
        "logger" -> "com.example.Foo"),
      "redis_log" -> ("""4321:M 01 Jan 2024 12:00:00.123 * Ready to accept connections""",
        "role" -> "M"),
      "postgresql_log" -> ("""2024-01-01 12:00:00.123 UTC [77] LOG:  checkpoint starting""",
        "pid" -> "77"),
      "zookeeper_log" -> ("""2024-01-01 12:00:00,123 [myid:1] - INFO  [main:Server@123] - binding to port""",
        "level" -> "INFO"),
      "s3_log" -> ("""79a59df bucket1 [06/Feb/2024:00:00:38 +0000] 192.0.2.3 arn:aws:iam::1:user/u 3E57427F3 REST.GET.OBJECT photos/1.jpg "GET /photos/1.jpg HTTP/1.1" 200 - 2662""",
        "operation" -> "REST.GET.OBJECT"),
      "elb_log" -> ("""2024-02-06T00:00:38Z my-elb 192.0.2.1:2817 10.0.0.1:80 0.000073 0.001048 0.000057 200 200 0 29 "GET http://x/ HTTP/1.1"""",
        "status" -> "200"),
      "dpkg_log" -> ("""2024-01-01 12:00:00 install curl:amd64 8.0.1""",
        "package" -> "curl:amd64"),
      "sudo_log" -> ("""alice : TTY=pts/0 ; PWD=/home/alice ; USER=root ; COMMAND=/bin/ls -la""",
        "target_user" -> "root"),
      "uwsgi_log" -> ("""[pid: 123|app: 0|req: 1/9] 192.0.2.4 () {32 vars in 380 bytes} [Mon Jan  1 12:00:00 2024] GET /path => generated 123 bytes in 4 msecs (HTTP/1.1 200)""",
        "status" -> "200"),
      "rails_log" -> ("""Started GET "/users/1" for 192.0.2.5 at 2024-01-01 12:00:00 +0000""",
        "path" -> "/users/1"),
      "strace_log" -> ("""12:00:00.123456 openat(AT_FDCWD, "/etc/passwd", O_RDONLY) = 3""",
        "syscall" -> "openat"),
      "openstack_log" -> ("""2024-01-01 12:00:00.123 4567 INFO nova.compute.manager [req-abc-123] VM started""",
        "module" -> "nova.compute.manager"),
      "haproxy_log" -> ("""192.0.2.6:51000 [01/Jan/2024:12:00:00.123] fe be/srv1 0/0/1/2/3 200 456 - - ---- 1/1/0/0/0 0/0 "GET / HTTP/1.1"""",
        "backend" -> "be"),
    )
    samples.foreach { case (name, (line, (field, expected))) =>
      val m = KnownFormats.extract(name, line)
      assert(m.isDefined, s"format $name did not match its sample")
      assert(m.get(field) == expected, s"format $name: $field=${m.get.get(field)}")
    }
    assert(KnownFormats.all.size >= 20)
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
    assert(rows.exists(r => r.getString(0) == "" && !r.getBoolean(1)))
    // no UDF in the plan: extraction must stay inside codegen stages
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("BatchEvalPython") && !plan.contains("ScalaUDF"))
  }
}

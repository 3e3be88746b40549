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
      "java" -> ("""2024-01-01 12:00:00,123 [main] INFO com.example.Foo - started ok""",
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
      "alb_log" -> ("""http 2024-01-01T12:00:00.000000Z app/my-alb/50dc6c 192.0.2.1:46532 10.0.1.5:80 0.000 0.001 0.000 200 200 34 366 "GET http://www.example.com:80/ HTTP/1.1" "curl/7.46.0" ECDHE-RSA-AES128 TLSv1.2 arn:aws:elasticloadbalancing:us-east-1:1:targetgroup/tg/1 "Root=1-58337262-36d228ad"""",
        "elb_status_code" -> "200"),
      "block_log" -> ("""2024-01-01T12:00:00Z: starting block""",
        "body" -> "starting block"),
      "candlepin_log" -> ("""2024-01-01 12:00:00,123 [req=abc123, org=acme] INFO  org.candlepin.Foo - done""",
        "org" -> "acme"),
      "choose_repo_log" -> ("""[2024-01-01 12:00:00] INFO: selecting repo""",
        "level" -> "INFO"),
      "cloudvm_ram_log" -> ("""2024-01-01 12:00:00: RAM usage 4096 MB""",
        "body" -> "RAM usage 4096 MB"),
      "cups_log" -> ("""E [01/Jan/2024:12:00:00 +0000] Unable to open printer""",
        "level" -> "E"),
      "engine_log" -> ("""2024-01-01 12:00:00,123 INFO  [org.ovirt.engine.core] (default task-1) Running command""",
        "tid" -> "default task-1"),
      "env_logger_log" -> ("""[2024-01-01T12:00:00Z INFO  my_app::server] listening on 8080""",
        "module" -> "my_app::server"),
      "error_log" -> ("""[Mon Jan 01 12:00:00.123456 2024] [core:error] [pid 123:tid 456] [client 192.0.2.7:50000] File does not exist""",
        "level" -> "error"),
      "esx_syslog_log" -> ("""2024-01-01T12:00:00.123Z info(14) Hostd[12345]: task completed""",
        "syslog_pri" -> "14"),
      "katello_log" -> ("""2024-01-01 12:00:00 [I] katello: task started""",
        "alert_level" -> "I"),
      "lnav_debug_log" -> ("""2024-01-01T12:00:00.123 [DEBUG] (main) lnav.cc:123 initializing""",
        "srcfile" -> "lnav.cc"),
      "nextflow_log" -> ("""Jan-01 12:00:00.123 [main] DEBUG nextflow.cli - launching""",
        "module" -> "nextflow.cli"),
      "openam_log" -> ("\"2024-01-01 12:00:00\"\tdata1\tuser1\tctx\t192.0.2.8\tINFO\tdc=example\tadmin\tAUTH-1\tauth\tname1\thost1",
        "ipaddr" -> "192.0.2.8"),
      "openamdb_log" -> ("""Jan 1, 2024 12:00:00 PM amSDK: thread[main]: connection ok""",
        "module" -> "amSDK"),
      "page_log" -> ("""printer1 alice 123 [01/Jan/2024:12:00:00 +0000] 1 2 billing host1""",
        "num_copies" -> "2"),
      "procstate_log" -> ("""2024-01-01 12:00:00 ---- vmstat snapshot""",
        "body" -> "vmstat snapshot"),
      "proxifier_log" -> ("""[01.01 12:00:00] chrome.exe (1234) - example.com:443 open through proxy""",
        "target_host" -> "example.com"),
      "simple_rs_log" -> ("""2024-01-01 12:00:00.123 INFO [server] started""",
        "module" -> "server"),
      "snaplogic_log" -> ("""2024-01-01T12:00:00.123Z INFO main com.snaplogic [inv1] [res1] [pipe1] [comp1] [msg1] pipeline started""",
        "msgid" -> "msg1"),
      "sssd_log" -> ("""(Mon Jan  1 12:00:00 2024) [sssd[nss]] [ldap_search] (0x0100): searching""",
        "function" -> "ldap_search"),
      "tcf_log" -> ("""12:00:00.123 TCP: ----> C token123 RunControl getContext""",
        "service" -> "RunControl"),
      "tcsh_history" -> ("""#+1704110400 ls -la""",
        "body" -> "ls -la"),
      "vmk_log" -> ("""2024-01-01T12:00:00.123Z cpu1:12345)Net: link up""",
        "subsystem" -> "Net"),
      "vmw_log" -> ("""2024-01-01T12:00:00.123Z [7F2CD8D1 info 'Default' opID=abc user=root] Task completed""",
        "comp" -> "Default"),
      "vmw_py_log" -> ("""2024-01-01 12:00:00,123 1234 INFO vsan-mgmt starting""",
        "module" -> "vsan-mgmt"),
      "vmw_vc_svc_log" -> ("""2024-01-01T12:00:00.123Z info vpxd-svcs opId=abc [main.cpp:42] started""",
        "srcline" -> "42"),
      "vpostgres_log" -> ("""2024-01-01 12:00:00.123 UTC 123 0 vcdb postgres 127.0.0.1(5432) 5e1f 1 LOG: statement: SELECT 1""",
        "db_name" -> "vcdb"),
      "xmlrpc_log" -> ("""2024-01-01 12:00:00,123 4567 192.0.2.10: auth.login('user') elapsed 12ms""",
        "function" -> "login"),
      "kubernetes_log" -> ("""I0101 12:00:00.123456    1234 controller.go:123] syncing""",
        "source_file" -> "controller.go"),
      "postgres" -> ("""2024-01-01T12:00:00.000000000Z stdout F 2024-01-01 12:00:00.123 UTC [77] LOG:  checkpoint starting""",
        "process_id" -> "77"),
      "zookeeper" -> ("""2024-01-01T12:00:00.000000000Z stdout F 2024-01-01 12:00:00,123 [myid:1] - INFO  [main:Server@123] - binding to port""",
        "thread" -> "main:Server@123"),
      "parseable_server_logs" -> ("""2024-01-01T12:00:00.123Z INFO ThreadId(02) parseable::storage: 42: syncing to object store""",
        "thread_id" -> "02"),
      "boomi_container_log" -> ("""2024-01-01 12:00:00.123 INFO [com.boomi.container.core] container started""",
        "logger" -> "com.boomi.container.core"),
      "boomi_webserver_log" -> ("""192.0.2.11 admin [01/Jan/2024:12:00:00 +0000] "GET /ws/status?verbose=1 HTTP/1.1" 200 512 34 "https://ref" "Mozilla/5.0"""",
        "cs_uri_stem" -> "/ws/status"),
      "syslog_log" -> ("""<14>Jan  1 12:00:00 host1 sshd[4242]: Accepted publickey for root""",
        "process" -> "sshd"),
      "kv_pairs" -> ("""ts=2024-01-01T12:00:00Z level=warn msg="disk nearly full" disk=/dev/sda1""",
        "msg" -> "disk nearly full"),
      "json_embedded" -> ("""app[1]: {"event": "login", "user": "u1"}""",
        "json_payload" -> """{"event": "login", "user": "u1"}"""),
    )
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

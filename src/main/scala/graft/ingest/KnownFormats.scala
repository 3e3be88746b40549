package graft.ingest

import scala.util.matching.Regex

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Known-log-format detection: named regexes whose capture groups become
  * columns, with a `p_format_verified` flag.
  *
  * Plays the role of the reference's format library (parseable
  * `src/event/format/known_schema.rs:93-234` over `resources/formats.json`,
  * 53 formats, each a list of regex variants tried in order). The format
  * NAMES and field names here mirror that public inventory; every regex is
  * our own definition of the underlying well-known log shape. The set is
  * extensible at runtime via [[register]].
  *
  * Two execution paths:
  *   - [[extract]]: pure-Scala per-event extraction on the ingest path;
  *   - [[extractColumns]]: the same format as codegen'd `regexp_extract`
  *     columns for at-rest re-parsing — this is the 100 TB path (no UDF, no
  *     driver loop; whole-stage codegen keeps the regex in the scan stage).
  *     Multi-variant formats coalesce per-field over the first matching
  *     variant, still as pure column expressions.
  */
object KnownFormats {

  /** One regex alternative of a format; capture group i binds fields(i). */
  final case class Variant(pattern: Regex, fields: Seq[String])

  final case class LogFormat(name: String, variants: Seq[Variant]) {
    def pattern: Regex = variants.head.pattern
    def fields: Seq[String] = variants.head.fields
    def allFields: Seq[String] = variants.flatMap(_.fields).distinct
  }

  private def fmt(name: String, pattern: String, fields: String*): LogFormat =
    LogFormat(name, Seq(Variant(pattern.r, fields)))

  private def fmtV(name: String, variants: (String, Seq[String])*): LogFormat =
    LogFormat(name, variants.map { case (p, f) => Variant(p.r, f) })

  /** Built-in formats (public, ubiquitous shapes). */
  val builtin: Seq[LogFormat] = Seq(
    fmt("access_log",
      """^(\S+) \S+ (\S+) \[([^\]]+)\] "(\S+) (\S+) ([^"]+)" (\d{3}) (\d+|-)""",
      "client_ip", "user", "timestamp", "method", "path", "protocol",
      "status", "bytes"),
    fmt("app_log_level",
      """^(\d{4}-\d{2}-\d{2}[T ]\d{2}:\d{2}:\d{2}\S*)\s+(TRACE|DEBUG|INFO|WARN|ERROR|FATAL)\s+(?:\[([^\]]+)\]\s+)?(.*)$""",
      "timestamp", "level", "logger", "message"),
    fmt("syslog_log",
      """^<(\d+)>(\w{3}\s+\d+\s+\d{2}:\d{2}:\d{2})\s+(\S+)\s+([^:\[]+)(?:\[(\d+)\])?:\s*(.*)$""",
      "priority", "timestamp", "host", "process", "pid", "message"),
    fmt("kv_pairs",
      """^(?=.*\bts=(\S+))(?=.*\blevel=(\S+))(?=.*\bmsg="([^"]*)").*$""",
      "ts", "level", "msg"),
    fmt("json_embedded",
      """^[^{]*(\{.*\})\s*$""",
      "json_payload"),
    fmt("nginx_access",
      """^(\S+) - (\S+) \[([^\]]+)\] "(\S+) (\S+) ([^"]+)" (\d{3}) (\d+|-) "([^"]*)" "([^"]*)"""",
      "client_ip", "user", "timestamp", "method", "path", "protocol",
      "status", "bytes", "referrer", "user_agent"),
    fmt("klog",
      """^([IWEF])(\d{4}) (\d{2}:\d{2}:\d{2}\.\d+)\s+(\d+)\s+([\w.-]+:\d+)\]\s*(.*)$""",
      "level", "date", "time", "pid", "source", "message"),
    fmt("java",
      """^(\d{4}-\d{2}-\d{2}[T ]\d{2}:\d{2}:\d{2}[.,]\d+)\s+\[([^\]]+)\]\s+(TRACE|DEBUG|INFO|WARN|ERROR|FATAL)\s+(\S+)\s+-\s+(.*)$""",
      "timestamp", "thread", "level", "logger", "message"),
    fmt("redis_log",
      """^(\d+):([XCSM]) (\d{2} \w{3} \d{4} \d{2}:\d{2}:\d{2}\.\d{3}) ([-*#.]) (.*)$""",
      "pid", "role", "timestamp", "level", "message"),
    fmt("postgresql_log",
      """^(\d{4}-\d{2}-\d{2} \d{2}:\d{2}:\d{2}\.\d+) (\S+) \[(\d+)\] (\w+):\s+(.*)$""",
      "timestamp", "timezone", "pid", "level", "message"),
    fmt("zookeeper_log",
      """^(\d{4}-\d{2}-\d{2} \d{2}:\d{2}:\d{2},\d+) \[myid:(\d*)\] - (\w+)\s+\[([^\]]+)\] - (.*)$""",
      "timestamp", "myid", "level", "source", "message"),
    fmt("s3_log",
      """^(\S+) (\S+) \[([^\]]+)\] (\S+) (\S+) (\S+) (\S+) (\S+) "([^"]*)" (\d{3}|-) (\S+) (\d+|-)""",
      "bucket_owner", "bucket", "timestamp", "client_ip", "requester",
      "request_id", "operation", "key", "request_uri", "status",
      "error_code", "bytes_sent"),
    fmt("elb_log",
      """^(\S+) (\S+) (\S+):(\d+) (\S+) ([\d.-]+) ([\d.-]+) ([\d.-]+) (\d{3}|-) (\d{3}|-) (\d+) (\d+) "([^"]*)"""",
      "timestamp", "elb", "client_ip", "client_port", "backend",
      "request_processing_time", "backend_processing_time",
      "response_processing_time", "status", "backend_status",
      "received_bytes", "sent_bytes", "request"),
    fmt("dpkg_log",
      """^(\d{4}-\d{2}-\d{2} \d{2}:\d{2}:\d{2}) (install|upgrade|remove|purge|configure|trigproc|status) (\S+) (\S+)(?: (\S+))?$""",
      "timestamp", "action", "package", "version", "new_version"),
    fmt("sudo_log",
      """^\s*(\S+) : TTY=(\S+) ; PWD=(\S+) ; USER=(\S+) ; COMMAND=(.*)$""",
      "user", "tty", "pwd", "target_user", "command"),
    fmt("uwsgi_log",
      """^\[pid: (\d+)\|app: (\d+)\|req: (\d+)/(\d+)\] (\S+) .* \[([^\]]+)\] (\S+) (\S+) => generated (\d+) bytes in (\d+) (?:msecs|micros) \(HTTP/[\d.]+ (\d{3})\)""",
      "pid", "app", "req_n", "req_total", "client_ip", "timestamp",
      "method", "path", "response_bytes", "duration", "status"),
    fmt("rails_log",
      """^Started (\S+) "([^"]*)" for (\S+) at (.*)$""",
      "method", "path", "client_ip", "timestamp"),
    fmt("strace_log",
      """^(\d{2}:\d{2}:\d{2}(?:\.\d+)?) (\w+)\((.*)\)\s+= (-?\d+|\?)(.*)$""",
      "time", "syscall", "args", "result", "annotation"),
    fmt("openstack_log",
      """^(\d{4}-\d{2}-\d{2} \d{2}:\d{2}:\d{2}\.\d+) (\d+) (TRACE|DEBUG|INFO|AUDIT|WARNING|ERROR|CRITICAL) (\S+) (?:\[([^\]]*)\] )?(.*)$""",
      "timestamp", "pid", "level", "module", "request_id", "message"),
    fmt("haproxy_log",
      """^(\S+):(\d+) \[([^\]]+)\] (\S+) (\S+)/(\S+) (-?\d+)/(-?\d+)/(-?\d+)/(-?\d+)/(-?\d+) (\d{3}|-1) (\d+) \S+ \S+ (\S+) \d+/\d+/\d+/\d+/\d+ \d+/\d+ "([^"]*)"$""",
      "client_ip", "client_port", "timestamp", "frontend", "backend",
      "server", "tq", "tw", "tc", "tr", "tt", "status", "bytes",
      "termination_state", "request"),

    // ---- remaining reference inventory (known_schema.rs over formats.json).
    fmt("alb_log",
      """^(\S+) (\S+) (\S+) ([\d.]+):(\d+) ([\d.]+|-):?(\d+)? ([\d.-]+) ([\d.-]+) ([\d.-]+) (\d{3}|-) (\d{3}|-) (\d+) (\d+) "(\S+) (\S+) (\S+)" "([^"]*)" (\S+) (\S+) (\S+) "([^"]*)"""",
      "type", "timestamp", "elb", "client_ip", "client_port", "target_ip",
      "target_port", "request_processing_time", "target_processing_time",
      "response_processing_time", "elb_status_code", "target_status_code",
      "received_bytes", "sent_bytes", "cs_method", "cs_uri_whole",
      "cs_version", "user_agent", "ssl_cipher", "ssl_protocol",
      "target_group_arn", "trace_id"),
    fmt("block_log",
      """^(\d{4}-\d{2}-\d{2}[T ]\d{2}:\d{2}:\d{2}(?:\.\d+)?(?:Z|[-+]\d{2}:?\d{2})?):?\s*(.*)$""",
      "timestamp", "body"),
    fmt("candlepin_log",
      """^(\d{4}-\d{2}-\d{2} \d{2}:\d{2}:\d{2},\d{3}) \[(?:req=([^,\]]*), )?org=([^\]]*)\] (\w+)\s+(\S+)\s*-\s*(.*)$""",
      "timestamp", "req", "org", "alert_level", "module", "body"),
    fmt("choose_repo_log",
      """^\[?(\d{4}-\d{2}-\d{2} \d{2}:\d{2}:\d{2})\]? (\w+):\s*(.*)$""",
      "timestamp", "level", "body"),
    fmt("cloudvm_ram_log",
      """^(\d{4}-\d{2}-\d{2} \d{2}:\d{2}:\d{2}(?:\.\d+)?):?\s+(.*(?:[Rr][Aa][Mm]|[Mm]em).*)$""",
      "timestamp", "body"),
    fmt("cups_log",
      """^([A-Z]) \[([^\]]+)\] (?:\[([^\]]+)\] )?(.*)$""",
      "level", "timestamp", "section", "body"),
    fmt("engine_log",
      """^(\d{4}-\d{2}-\d{2} \d{2}:\d{2}:\d{2},\d{3}) (\w+)\s+\[([^\]]+)\] \(([^)]+)\) (.*)$""",
      "timestamp", "level", "logger", "tid", "body"),
    fmt("env_logger_log",
      """^\[(\d{4}-\d{2}-\d{2}T\d{2}:\d{2}:\d{2}\S*) (\w+)\s+([\w:]+)\] (.*)$""",
      "timestamp", "level", "module", "body"),
    fmtV("error_log",
      ("""^\[(\w{3} \w{3} \d+ \d{2}:\d{2}:\d{2}(?:\.\d+)? \d{4})\] \[(\w+):(\w+)\] \[pid (\d+)(?::tid (\d+))?\](?: \[client ([\d.]+):(\d+)\])? (.*)$""",
        Seq("timestamp", "module", "level", "pid", "tid", "c_ip", "c_port",
          "body")),
      ("""^\[(\w{3} \w{3} \d+ \d{2}:\d{2}:\d{2}(?:\.\d+)? \d{4})\] \[(\w+)\] (.*)$""",
        Seq("timestamp", "level", "body"))),
    fmt("esx_syslog_log",
      """^(\w{3}\s+\d{1,2} \d{2}:\d{2}:\d{2}|\d{4}-\d{2}-\d{2}T\d{2}:\d{2}:\d{2}(?:\.\d+)?Z)\s+(\w+)\((\d+)\)\s+([^:\[]+)(?:\[(\d+)\])?:\s*(.*)$""",
      "timestamp", "level", "syslog_pri", "log_syslog_tag", "log_pid",
      "body"),
    fmt("katello_log",
      """^(\d{4}-\d{2}-\d{2} \d{2}:\d{2}:\d{2}) \[(\w+)\](?: (\S+):)? (.*)$""",
      "timestamp", "alert_level", "module", "message"),
    fmt("lnav_debug_log",
      """^(\d{4}-\d{2}-\d{2}[T ]\d{2}:\d{2}:\d{2}\.\d+) \[(\w+)\] \(([^)]+)\) ([^:]+):(\d+) (.*)$""",
      "timestamp", "level", "thread", "srcfile", "srcline", "body"),
    fmt("nextflow_log",
      """^(\w{3}-\d{2} \d{2}:\d{2}:\d{2}\.\d{3}) \[([^\]]+)\] (\w+)\s+(\S+) - (.*)$""",
      "timestamp", "thread", "level", "module", "body"),
    fmt("openam_log",
      """^"([^"\t]+)"\t([^\t]*)\t([^\t]*)\t([^\t]*)\t([^\t]*)\t([^\t]*)\t([^\t]*)\t([^\t]*)\t([^\t]*)\t([^\t]*)\t([^\t]*)(?:\t(.*))?$""",
      "timestamp", "data", "loginid", "contextid", "ipaddr", "level",
      "domain", "loggedby", "messageid", "modulename", "nameid",
      "hostname"),
    fmt("openamdb_log",
      """^(\w{3} \d{1,2}, \d{4} \d{1,2}:\d{2}:\d{2} (?:AM|PM)) (\S+): thread\[([^\]]+)\]:? (.*)$""",
      "timestamp", "module", "thread", "body"),
    fmtV("page_log",
      ("""^(\S+) (\S+) (\d+) \[([^\]]+)\] (\d+|total) (\d+) (\S+) (\S+) (\S+) (\S+) (.*)$""",
        Seq("printer", "username", "job_id", "timestamp", "page_number",
          "num_copies", "job_billing", "job_originating_hostname",
          "job_name", "media", "sides")),
      ("""^(\S+) (\S+) (\d+) \[([^\]]+)\] (\d+|total) (\d+) (\S+) (\S+)$""",
        Seq("printer", "username", "job_id", "timestamp", "page_number",
          "num_copies", "job_billing", "job_originating_hostname"))),
    fmt("procstate_log",
      """^(\d{4}-\d{2}-\d{2} \d{2}:\d{2}:\d{2})\s+-+\s*(.*)$""",
      "timestamp", "body"),
    fmt("proxifier_log",
      """^\[(\d{2}\.\d{2} \d{2}:\d{2}:\d{2})\] (\S+?)(?: \((\d+)\))? - ([^:\s]+):(\d+)(?: (\w+))?[:,]?\s*(.*)$""",
      "timestamp", "app_name", "app_pid", "target_host", "target_port",
      "level", "body"),
    fmt("simple_rs_log",
      """^(\d{4}-\d{2}-\d{2} \d{2}:\d{2}:\d{2}(?:\.\d+)?) (\w+) \[([\w:]+)\] (.*)$""",
      "timestamp", "level", "module", "body"),
    fmt("snaplogic_log",
      """^(\S+) (\w+) (\S+) (\S+) \[([^\]]*)\] \[([^\]]*)\] \[([^\]]*)\] \[([^\]]*)\] \[([^\]]*)\] (.*)$""",
      "timestamp", "level", "logger", "facility", "invoker",
      "resource_name", "pipe_rid", "comp_rid", "msgid", "body"),
    fmt("sssd_log",
      """^\(([^)]+)\) \[(\w+)(?:\[([^\]]*)\])?\] \[([^\]]+)\] \((0x[0-9a-fA-F]+)\): (.*)$""",
      "timestamp", "service", "module", "function", "debug_level", "body"),
    fmt("tcf_log",
      """^(\d{2}:\d{2}:\d{2}\.\d+) (\S+): (---->|<----) (\w)(?: (\S+))?(?: (\S+))?(?: (.*))?$""",
      "timestamp", "name", "dir", "type", "token", "service", "msg"),
    fmt("tcsh_history",
      """^#\+(\d{9,11})\s*(.*)$""",
      "timestamp", "body"),
    fmt("vmk_log",
      """^(\d{4}-\d{2}-\d{2}T\d{2}:\d{2}:\d{2}(?:\.\d+)?Z) (?:(\w+)\()?cpu(\d+):(\d+)(?:\s+opID=([^)\s]+))?\)\s*(?:(\w+):)?\s*(.*)$""",
      "timestamp", "level", "cpu", "world_id", "opid", "subsystem",
      "body"),
    fmt("vmw_log",
      """^(\S+) \[(\w+) (\w+) '([^']+)'(?: opID=([^\s\]]+))?(?: user=([^\s\]]+))?\] (.*)$""",
      "timestamp", "tid", "level", "comp", "opid", "user", "body"),
    fmt("vmw_py_log",
      """^(\d{4}-\d{2}-\d{2} \d{2}:\d{2}:\d{2},\d{3}) (\d+) (\w+) (\S+) (.*)$""",
      "timestamp", "pid", "level", "module", "body"),
    fmt("vmw_vc_svc_log",
      """^(\S+) (\w+) (\S+?)(?: opId=(\S+))? \[([^:\]]+):(\d+)\] (.*)$""",
      "timestamp", "level", "module", "opid", "srcfile", "srcline",
      "body"),
    fmt("vpostgres_log",
      """^(\d{4}-\d{2}-\d{2} \d{2}:\d{2}:\d{2}\.\d+ \S+) (\d+) (\S*) (\S*) (\S*) (\S*) (\S*) (\d+) (\w+):\s*(.*)$""",
      "timestamp", "pid", "transaction_id", "db_name", "user",
      "remote_pair", "session_id", "num_line", "level", "body"),
    LogFormat("web_robot_log", Seq(Variant(
      """^\S+ \S+ \S+ \[[^\]]+\] "[^"]*" \d{3} \S+ "[^"]*" "[^"]*[Bb]ot[^"]*"$""".r,
      Seq.empty))),
    fmt("xmlrpc_log",
      """^(\d{4}-\d{2}-\d{2} \d{2}:\d{2}:\d{2},\d+) (\d+) ([\d.]+): (\w+)\.(\w+)\(([^)]*)\)\s*(.*)$""",
      "timestamp", "pid", "client_ip", "module", "function", "arguments",
      "body"),
    fmt("kubernetes_log",
      """^([IWEF])(\d{2})(\d{2}) (\d{2}:\d{2}:\d{2}\.\d+)\s+(\d+) ([\w.-]+):(\d+)\] (.*)$""",
      "severity", "month", "day", "time", "pid", "source_file",
      "line_number", "message"),
    fmt("postgres",
      """^(\S+) (stdout|stderr) \S (\d{4}-\d{2}-\d{2} \d{2}:\d{2}:\d{2}\.\d+ \S+) \[(\d+)\] (\w+):\s*(?:(\w+):\s*)?(.*)$""",
      "timestamp_fb", "stream", "timestamp", "process_id", "log_type",
      "log_level", "message"),
    fmt("zookeeper",
      """^(\S+) (stdout|stderr) \S (\d{4}-\d{2}-\d{2} \d{2}:\d{2}:\d{2},\d+) \[myid:(\d*)\] - (\w+)\s+\[([^\]]+)\] - (?:(\w+):\s*)?(.*)$""",
      "timestamp_fb", "stream", "timestamp", "myid", "log_level",
      "thread", "log_type", "message"),
    fmtV("parseable_server_logs",
      ("""^(\S+)\s+(TRACE|DEBUG|INFO|WARN|ERROR)\s+ThreadId\((\d+)\)\s+([\w:]+):\s*(\d+):\s*(.*)$""",
        Seq("timestamp", "level", "thread_id", "module", "line_number",
          "body")),
      ("""^(\S+)\s+(TRACE|DEBUG|INFO|WARN|ERROR)\s+([\w:]+):\s*(.*)$""",
        Seq("timestamp", "level", "module", "body"))),
    fmt("boomi_container_log",
      """^(\d{4}-\d{2}-\d{2} \d{2}:\d{2}:\d{2}(?:[.,]\d+)?) (\w+) \[([^\]]+)\]\s*(.*)$""",
      "timestamp", "level", "logger", "body"),
    fmt("boomi_webserver_log",
      """^(\S+) (\S+) \[([^\]]+)\] "(\S+) ([^?\s"]+)(?:\?(\S*))? (\S+)" (\d{3}) (\d+|-) (\d+) "([^"]*)" "([^"]*)"$""",
      "c_ip", "cs_username", "timestamp", "cs_method", "cs_uri_stem",
      "cs_uri_query", "cs_version", "sc_status", "sc_bytes", "duration",
      "cs_referer", "cs_user_agent"),
  )

  @volatile private var registered: Map[String, LogFormat] =
    builtin.map(f => f.name -> f).toMap

  def register(f: LogFormat): Unit = synchronized {
    registered = registered + (f.name -> f)
  }

  def all: Seq[LogFormat] = registered.values.toSeq.sortBy(_.name)

  def get(name: String): Option[LogFormat] = registered.get(name)

  /** Per-event extraction: first matching variant's captured fields, or None
    * if no variant matches (caller sets `p_format_verified=false`, reference
    * known_schema.rs:196-234).
    */
  def extract(format: String, line: String): Option[Map[String, String]] =
    get(format).flatMap { f =>
      f.variants.iterator.flatMap { v =>
        v.pattern.findFirstMatchIn(line).map { m =>
          v.fields.zipWithIndex.collect {
            case (name, i) if m.group(i + 1) != null => name -> m.group(i + 1)
          }.toMap
        }
      }.nextOption()
    }

  /** Inline ingest-path extraction for `X-P-Log-Source: <format>` payloads
    * (reference `known_schema.rs check_or_extract`:93-146 via
    * `extract_from_inline_log`:196-234): per event,
    *   - an object already carrying ALL of some variant's fields passes
    *     through untouched (pre-structured upstream — nothing to prove);
    *   - else the `extractLog` field's raw line is tried against the
    *     format's variants: a match merges the captured fields into the
    *     event and stamps `p_format_verified=true`;
    *   - no match (or no raw field) stamps `p_format_verified=false` —
    *     the event still ingests, flagged for later triage.
    * Unknown format names refuse the batch (the reference's
    * `Error::Unknown` → 400).
    */
  def applyInline(events: Seq[com.fasterxml.jackson.databind.node.ObjectNode],
                  format: String, extractLog: Option[String])
      : Either[String, Seq[com.fasterxml.jackson.databind.node.ObjectNode]] =
    get(format) match {
      case None => Left(s"Unknown log format: $format")
      case Some(f) => Right(events.map { ev =>
        val preStructured = f.variants.exists(_.fields.forall(ev.has))
        if (preStructured) ev
        else {
          val line = extractLog.flatMap(fl => Option(ev.get(fl)))
            .filter(_.isTextual).map(_.asText)
          line.flatMap(extract(format, _)) match {
            case Some(fields) =>
              fields.foreach { case (k, v) => ev.put(k, v) }
              ev.put("p_format_verified", "true")
            case None =>
              ev.put("p_format_verified", "false")
          }
          ev
        }
      })
    }

  /** Columnar extraction: per-field coalesce over the first matching variant,
    * each as a codegen'd `regexp_extract`; plus the verification flag.
    * No UDF — everything stays in whole-stage codegen.
    */
  def extractColumns(df: DataFrame, lineCol: String, format: String): DataFrame = {
    val f = get(format).getOrElse(
      throw new IllegalArgumentException(s"unknown format: $format"))
    val matched: Seq[Column] = f.variants.map(v => col(lineCol).rlike(v.pattern.regex))
    val withFields = f.allFields.foldLeft(df) { case (d, name) =>
      val expr = f.variants.zipWithIndex.foldRight(lit(null).cast("string")) {
        case ((v, i), acc) =>
          val idx = v.fields.indexOf(name)
          if (idx < 0) acc
          else when(matched(i),
            regexp_extract(col(lineCol), v.pattern.regex, idx + 1)).otherwise(acc)
      }
      d.withColumn(name, expr)
    }
    withFields.withColumn("p_format_verified", matched.reduce(_ || _))
  }

  /** Detect which known format a sample of lines matches (majority vote). */
  def detect(lines: Seq[String]): Option[String] =
    all
      .map(f => f.name ->
        lines.count(l => f.variants.exists(_.pattern.findFirstMatchIn(l).isDefined)))
      .filter(_._2 * 2 > lines.size)
      .sortBy { case (n, c) => (-c, n) }
      .headOption
      .map(_._1)
}

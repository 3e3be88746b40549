package graft.ingest

import scala.util.matching.Regex

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Known-log-format detection: named regexes whose capture groups become
  * columns, with a `p_format_verified` flag.
  *
  * Plays the role of the reference's format library (parseable
  * `src/event/format/known_schema.rs:93-234` over `resources/formats.json`,
  * 53 formats). Formats here are our own definitions of the ubiquitous
  * public log shapes; the set is extensible at runtime via [[register]].
  *
  * Two execution paths:
  *   - [[extract]]: pure-Scala per-event extraction on the ingest path;
  *   - [[extractColumns]]: the same format as codegen'd `regexp_extract`
  *     columns for at-rest re-parsing — this is the 100 TB path (no UDF, no
  *     driver loop; whole-stage codegen keeps the regex in the scan stage).
  */
object KnownFormats {

  final case class LogFormat(name: String, pattern: Regex, fields: Seq[String])

  private def fmt(name: String, pattern: String, fields: String*): LogFormat =
    LogFormat(name, pattern.r, fields)

  /** Built-in formats (public, ubiquitous shapes). */
  val builtin: Seq[LogFormat] = Seq(
    fmt("access_log",
      """^(\S+) \S+ (\S+) \[([^\]]+)\] "(\S+) (\S+) ([^"]+)" (\d{3}) (\d+|-)""",
      "client_ip", "user", "timestamp", "method", "path", "protocol",
      "status", "bytes"),
    fmt("app_log_level",
      """^(\d{4}-\d{2}-\d{2}[T ]\d{2}:\d{2}:\d{2}\S*)\s+(TRACE|DEBUG|INFO|WARN|ERROR|FATAL)\s+(?:\[([^\]]+)\]\s+)?(.*)$""",
      "timestamp", "level", "logger", "message"),
    fmt("syslog",
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
    fmt("java_log",
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
  )

  @volatile private var registered: Map[String, LogFormat] =
    builtin.map(f => f.name -> f).toMap

  def register(f: LogFormat): Unit = synchronized {
    registered = registered + (f.name -> f)
  }

  def all: Seq[LogFormat] = registered.values.toSeq.sortBy(_.name)

  def get(name: String): Option[LogFormat] = registered.get(name)

  /** Per-event extraction: returns captured fields, or None if the line does
    * not match (caller sets `p_format_verified=false`, reference
    * known_schema.rs:196-234).
    */
  def extract(format: String, line: String): Option[Map[String, String]] =
    get(format).flatMap { f =>
      f.pattern.findFirstMatchIn(line).map { m =>
        f.fields.zipWithIndex.collect {
          case (name, i) if m.group(i + 1) != null => name -> m.group(i + 1)
        }.toMap
      }
    }

  /** Columnar extraction: one `regexp_extract` column per capture group plus
    * the verification flag. Codegen-friendly — no UDF.
    */
  def extractColumns(df: DataFrame, lineCol: String, format: String): DataFrame = {
    val f = get(format).getOrElse(
      throw new IllegalArgumentException(s"unknown format: $format"))
    val p = f.pattern.regex
    val withFields = f.fields.zipWithIndex.foldLeft(df) { case (d, (name, i)) =>
      d.withColumn(name, regexp_extract(col(lineCol), p, i + 1))
    }
    withFields.withColumn("p_format_verified", col(lineCol).rlike(p))
  }

  /** Detect which known format a sample of lines matches (majority vote). */
  def detect(lines: Seq[String]): Option[String] =
    all
      .map(f => f.name -> lines.count(l => f.pattern.findFirstMatchIn(l).isDefined))
      .filter(_._2 * 2 > lines.size)
      .sortBy(-_._2)
      .headOption
      .map(_._1)
}

package graft.ingest

import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import com.fasterxml.jackson.databind.node.{ArrayNode, JsonNodeFactory, ObjectNode}

/** OTLP (OpenTelemetry JSON) → flat wide-column events, mirroring the
  * reference's custom flatteners (parseable `src/otel/logs.rs:286-298`,
  * `src/otel/traces.rs:159-185`, `src/otel/metrics.rs:594-716`,
  * value rules `src/otel/otel_utils.rs:26-204`).
  *
  * Semantics preserved:
  *   - AnyValue mapping: string/bool pass through; **int → string**;
  *     double → number; array → its JSON text; kvlist → merged into the
  *     parent (no prefix); bytes (base64 in OTLP JSON) → UTF-8 text.
  *   - nano timestamps render as `yyyy-MM-ddTHH:mm:ss.nnnnnnnnnZ` strings.
  *   - logs: severity number→text, `p_log_category` from severity with
  *     body-scan fallback; string bodies that parse as JSON objects also
  *     flatten to `body_<key>` columns.
  *   - traces: one output row per span event and per link, each carrying
  *     every span-level field; bare spans emit one row.
  *   - metrics: one row per data point (gauge/sum/histogram/exponential
  *     histogram/summary), resource+scope envelope merged, plus a stable
  *     `__series_hash_u64` over sorted label pairs. (Hash function here is
  *     md5-derived, not the reference's FxHash — the contract is stability
  *     and label-set identity, not bit-parity with a Rust hasher.)
  */
object OtelFlatten {

  private val mapper = new ObjectMapper()
  private val nf = JsonNodeFactory.instance

  val SeriesHashColumn = "__series_hash_u64"

  /** Known sample-level metric fields — everything else on a metrics row is
    * a series label (reference `src/otel/metrics.rs:42-104`).
    */
  val MetricsKnownFields: Set[String] = Set(
    "metric_name", "metric_description", "metric_unit", "metric_type",
    "start_time_unix_nano", "time_unix_nano", "data_point_value",
    "data_point_count", "data_point_sum", "data_point_min", "data_point_max",
    "data_point_bucket_counts", "data_point_explicit_bounds",
    "data_point_scale", "data_point_zero_count",
    "positive_offset", "positive_bucket_count",
    "negative_offset", "negative_bucket_count",
    "data_point_quantile_values", "data_point_flags",
    "data_point_flags_description", "aggregation_temporality",
    "aggregation_temporality_description", "is_monotonic",
    "scope_name", "scope_version", "scope_schema_url",
    "scope_dropped_attributes_count", "resource_schema_url",
    "resource_dropped_attributes_count", "schema_url", SeriesHashColumn)

  // ------------------------------------------------------------- utilities

  private def get(n: JsonNode, names: String*): Option[JsonNode] =
    names.iterator.map(n.get).find(v => v != null && !v.isNull)

  private def arr(n: JsonNode, names: String*): Seq[JsonNode] =
    get(n, names: _*).map(_.elements().asScala.toSeq).getOrElse(Nil)

  private def longOf(n: JsonNode): Long =
    if (n.isTextual) java.lang.Long.parseLong(n.asText) else n.asLong()

  /** ns epoch → `yyyy-MM-ddTHH:mm:ss.nnnnnnnnnZ` (reference
    * `otel_utils.rs:206-209`).
    */
  def nanosToTimestamp(ns: Long): String = {
    val secs = Math.floorDiv(ns, 1000000000L)
    val frac = Math.floorMod(ns, 1000000000L)
    val dt = java.time.LocalDateTime.ofEpochSecond(
      secs, frac.toInt, java.time.ZoneOffset.UTC)
    val base = dt.format(java.time.format.DateTimeFormatter
      .ofPattern("yyyy-MM-dd'T'HH:mm:ss"))
    f"$base.$frac%09dZ"
  }

  /** Insert one OTLP AnyValue under `key` (reference value mapping,
    * `otel_utils.rs:33-80`). Returns nothing; kvlists merge siblings.
    */
  private def putAnyValue(out: ObjectNode, key: String, v: JsonNode): Unit = {
    get(v, "stringValue", "string_value").foreach(s => out.put(key, s.asText))
    get(v, "boolValue", "bool_value").foreach(b => out.put(key, b.asBoolean))
    // ints become STRINGS (reference keeps Int64 out of the inferred schema)
    get(v, "intValue", "int_value").foreach(i => out.put(key, longOf(i).toString))
    get(v, "doubleValue", "double_value").foreach(d => out.put(key, d.asDouble))
    get(v, "bytesValue", "bytes_value").foreach { b =>
      val decoded = try new String(java.util.Base64.getDecoder.decode(b.asText),
        java.nio.charset.StandardCharsets.UTF_8)
      catch { case _: IllegalArgumentException => b.asText }
      out.put(key, decoded)
    }
    get(v, "arrayValue", "array_value").foreach { a =>
      out.put(key, mapper.writeValueAsString(arrayValueToJson(a)))
    }
    get(v, "kvlistValue", "kvlist_value").foreach { kvl =>
      arr(kvl, "values").foreach { kv =>
        get(kv, "value").foreach(vv =>
          putAnyValue(out, get(kv, "key").map(_.asText).getOrElse(""), vv))
      }
    }
  }

  /** ArrayValue → plain JSON array (recursive; `otel_utils.rs:85-122`). */
  private def arrayValueToJson(a: JsonNode): ArrayNode = {
    val out = nf.arrayNode()
    arr(a, "values").foreach { v =>
      get(v, "stringValue", "string_value").foreach(s => out.add(s.asText))
      get(v, "boolValue", "bool_value").foreach(b => out.add(b.asBoolean))
      get(v, "intValue", "int_value").foreach(i => out.add(longOf(i)))
      get(v, "doubleValue", "double_value").foreach(d => out.add(d.asDouble))
      get(v, "bytesValue", "bytes_value").foreach(b => out.add(b.asText))
      get(v, "arrayValue", "array_value").foreach(n => out.add(arrayValueToJson(n)))
      get(v, "kvlistValue", "kvlist_value").foreach { kvl =>
        val o = nf.objectNode()
        arr(kvl, "values").foreach { kv =>
          get(kv, "value").foreach(vv =>
            putAnyValue(o, get(kv, "key").map(_.asText).getOrElse(""), vv))
        }
        out.add(o)
      }
    }
    out
  }

  private def putAttributes(out: ObjectNode, node: JsonNode): Unit =
    arr(node, "attributes").foreach { kv =>
      get(kv, "value").foreach(v =>
        putAnyValue(out, get(kv, "key").map(_.asText).getOrElse(""), v))
    }

  private def putCount(out: ObjectNode, field: String, node: JsonNode,
                       names: String*): Unit =
    out.put(field, get(node, names: _*).map(longOf).getOrElse(0L))

  // ------------------------------------------------------------------ logs

  /** severity number → enum text (OTel proto `SeverityNumber` names minus
    * the prefix: TRACE..TRACE4, DEBUG.., INFO.., WARN.., ERROR.., FATAL..).
    */
  def severityText(n: Int): String =
    if (n < 1 || n > 24) "UNSPECIFIED"
    else {
      val base = Seq("TRACE", "DEBUG", "INFO", "WARN", "ERROR", "FATAL")((n - 1) / 4)
      val idx = (n - 1) % 4
      if (idx == 0) base else s"$base${idx + 1}"
    }

  private def categoryFromSeverity(n: Int): Option[String] = n match {
    case x if x >= 1 && x <= 4   => Some("TRACE")
    case x if x >= 5 && x <= 8   => Some("DEBUG")
    case x if x >= 9 && x <= 12  => Some("INFO")
    case x if x >= 13 && x <= 16 => Some("WARN")
    case x if x >= 17 && x <= 20 => Some("ERROR")
    case x if x >= 21 && x <= 24 => Some("FATAL")
    case _                       => None
  }

  /** Most-severe-first substring scan of the body (fallback categoriser,
    * `logs.rs:88-114`).
    */
  private val bodyCategories = Seq(
    "critical" -> "FATAL", "fatal" -> "FATAL", "error" -> "ERROR",
    "warning" -> "WARN", "warn" -> "WARN", "info" -> "INFO",
    "debug" -> "DEBUG", "trace" -> "TRACE", "verbose" -> "TRACE")

  private def categoryFromBody(body: String): String = {
    val lower = body.toLowerCase
    bodyCategories.collectFirst {
      case (pat, cat) if lower.contains(pat) => cat
    }.getOrElse("UNSPECIFIED")
  }

  /** Flatten an OTLP logs payload into one flat object per log record. */
  def flattenLogs(json: String): Seq[ObjectNode] = {
    val root = mapper.readTree(json)
    arr(root, "resourceLogs", "resource_logs").flatMap { rl =>
      val resource = nf.objectNode()
      get(rl, "resource").foreach { r =>
        putAttributes(resource, r)
        putCount(resource, "resource_dropped_attributes_count", r,
          "droppedAttributesCount", "dropped_attributes_count")
      }
      resource.put("schema_url",
        get(rl, "schemaUrl", "schema_url").map(_.asText).getOrElse(""))
      arr(rl, "scopeLogs", "scope_logs").flatMap { sl =>
        val scope = nf.objectNode()
        get(sl, "scope").foreach { s =>
          scope.put("scope_name", get(s, "name").map(_.asText).getOrElse(""))
          scope.put("scope_version", get(s, "version").map(_.asText).getOrElse(""))
          putAttributes(scope, s)
          putCount(scope, "scope_dropped_attributes_count", s,
            "droppedAttributesCount", "dropped_attributes_count")
        }
        scope.put("scope_log_schema_url",
          get(sl, "schemaUrl", "schema_url").map(_.asText).getOrElse(""))
        arr(sl, "logRecords", "log_records").map { rec =>
          val out = nf.objectNode()
          out.setAll[ObjectNode](scope)
          out.setAll[ObjectNode](flattenLogRecord(rec))
          out.setAll[ObjectNode](resource)
          out
        }
      }
    }
  }

  private def flattenLogRecord(rec: JsonNode): ObjectNode = {
    val out = nf.objectNode()
    out.put("time_unix_nano", nanosToTimestamp(
      get(rec, "timeUnixNano", "time_unix_nano").map(longOf).getOrElse(0L)))
    out.put("observed_time_unix_nano", nanosToTimestamp(
      get(rec, "observedTimeUnixNano", "observed_time_unix_nano")
        .map(longOf).getOrElse(0L)))
    val sev = get(rec, "severityNumber", "severity_number").map(_.asInt).getOrElse(0)
    out.put("severity_number", sev)
    out.put("severity_text", severityText(sev))
    var category = categoryFromSeverity(sev)
    get(rec, "body").foreach { body =>
      val bodyJson = nf.objectNode()
      putAnyValue(bodyJson, "body", body)
      out.setAll[ObjectNode](bodyJson)
      // a string body that parses as a JSON object also flattens to
      // body_<key> columns (original body kept verbatim, logs.rs:141-161)
      bodyJson.properties().asScala.foreach { e =>
        if (e.getValue.isTextual) {
          val parsed = try Some(mapper.readTree(e.getValue.asText))
          catch { case _: Exception => None }
          parsed.filter(_.isObject).foreach { obj =>
            JsonFlattener.flattenEvent(obj.asInstanceOf[ObjectNode], "_")
              .foreach(_.foreach { flatRow =>
                flatRow.properties().asScala.foreach(f =>
                  out.set[JsonNode](s"${e.getKey}_${f.getKey}", f.getValue))
              })
          }
        }
      }
      if (category.isEmpty) {
        val bodyText = bodyJson.properties().asScala.map { e =>
          if (e.getValue.isTextual) e.getValue.asText else e.getValue.toString
        }.mkString(" ")
        category = Some(categoryFromBody(bodyText))
      }
    }
    putAttributes(out, rec)
    // after attributes so a client-sent field cannot override it
    out.put("p_log_category", category.getOrElse("UNSPECIFIED"))
    putCount(out, "log_record_dropped_attributes_count", rec,
      "droppedAttributesCount", "dropped_attributes_count")
    out.put("flags", get(rec, "flags").map(longOf).getOrElse(0L))
    out.put("span_id", get(rec, "spanId", "span_id").map(_.asText).getOrElse(""))
    out.put("trace_id", get(rec, "traceId", "trace_id").map(_.asText).getOrElse(""))
    out
  }

  // ---------------------------------------------------------------- traces

  private def spanKindDescription(k: Int): String = k match {
    case 0 => "UNSPECIFIED"; case 1 => "INTERNAL"; case 2 => "SERVER"
    case 3 => "CLIENT"; case 4 => "PRODUCER"; case 5 => "CONSUMER"; case _ => ""
  }

  private def spanFlagsDescription(f: Long): String = f match {
    case 0 => "DO_NOT_USE"; case 255 => "TRACE_FLAGS_MASK"
    case 256 => "CONTEXT_HAS_IS_REMOTE_MASK"; case 512 => "CONTEXT_IS_REMOTE_MASK"
    case _ => ""
  }

  private def statusDescription(c: Int): String = c match {
    case 0 => "UNSET"; case 1 => "OK"; case 2 => "ERROR"; case _ => ""
  }

  /** Flatten an OTLP traces payload: a row per span event and per link
    * (each carrying all span fields); bare spans yield one row.
    */
  def flattenTraces(json: String): Seq[ObjectNode] = {
    val root = mapper.readTree(json)
    arr(root, "resourceSpans", "resource_spans").flatMap { rs =>
      val resource = nf.objectNode()
      get(rs, "resource").foreach { r =>
        putAttributes(resource, r)
        putCount(resource, "resource_dropped_attributes_count", r,
          "droppedAttributesCount", "dropped_attributes_count")
      }
      resource.put("schema_url",
        get(rs, "schemaUrl", "schema_url").map(_.asText).getOrElse(""))
      arr(rs, "scopeSpans", "scope_spans").flatMap { ss =>
        val scope = nf.objectNode()
        get(ss, "scope").foreach { s =>
          scope.put("scope_name", get(s, "name").map(_.asText).getOrElse(""))
          scope.put("scope_version", get(s, "version").map(_.asText).getOrElse(""))
          putAttributes(scope, s)
        }
        scope.put("scope_schema_url",
          get(ss, "schemaUrl", "schema_url").map(_.asText).getOrElse(""))
        arr(ss, "spans").flatMap { span =>
          flattenSpan(span).map { row =>
            val out = nf.objectNode()
            out.setAll[ObjectNode](scope)
            out.setAll[ObjectNode](row)
            out.setAll[ObjectNode](resource)
            out
          }
        }
      }
    }
  }

  private def flattenSpan(span: JsonNode): Seq[ObjectNode] = {
    val s = nf.objectNode()
    s.put("span_trace_id", get(span, "traceId", "trace_id").map(_.asText).getOrElse(""))
    s.put("span_span_id", get(span, "spanId", "span_id").map(_.asText).getOrElse(""))
    s.put("span_trace_state", get(span, "traceState", "trace_state").map(_.asText).getOrElse(""))
    s.put("span_parent_span_id",
      get(span, "parentSpanId", "parent_span_id").map(_.asText).getOrElse(""))
    val flags = get(span, "flags").map(longOf).getOrElse(0L)
    s.put("span_flags", flags)
    s.put("span_flags_description", spanFlagsDescription(flags))
    s.put("span_name", get(span, "name").map(_.asText).getOrElse(""))
    val kind = get(span, "kind").map(_.asInt).getOrElse(0)
    s.put("span_kind", kind)
    s.put("span_kind_description", spanKindDescription(kind))
    val start = get(span, "startTimeUnixNano", "start_time_unix_nano")
      .map(longOf).getOrElse(0L)
    val end = get(span, "endTimeUnixNano", "end_time_unix_nano")
      .map(longOf).getOrElse(0L)
    s.put("span_start_time_unix_nano", nanosToTimestamp(start))
    s.put("span_start_time_unix_nano_epoch", start)
    s.put("span_end_time_unix_nano", nanosToTimestamp(end))
    s.put("span_end_time_unix_nano_epoch", end)
    s.put("span_duration_ns", Math.max(end - start, 0L))
    putAttributes(s, span)
    putCount(s, "span_dropped_attributes_count", span,
      "droppedAttributesCount", "dropped_attributes_count")
    putCount(s, "span_dropped_events_count", span,
      "droppedEventsCount", "dropped_events_count")
    putCount(s, "span_dropped_links_count", span,
      "droppedLinksCount", "dropped_links_count")
    get(span, "status").foreach { st =>
      s.put("span_status_message", get(st, "message").map(_.asText).getOrElse(""))
      val code = get(st, "code").map(_.asInt).getOrElse(0)
      s.put("span_status_code", code)
      s.put("span_status_description", statusDescription(code))
    }
    val eventRows = arr(span, "events").map { ev =>
      val e = nf.objectNode()
      val t = get(ev, "timeUnixNano", "time_unix_nano").map(longOf).getOrElse(0L)
      e.put("event_time_unix_nano", nanosToTimestamp(t))
      e.put("event_time_unix_nano_epoch", t)
      e.put("event_name", get(ev, "name").map(_.asText).getOrElse(""))
      e.put("event_duration_ns", Math.max(t - start, 0L))
      putAttributes(e, ev)
      putCount(e, "event_dropped_attributes_count", ev,
        "droppedAttributesCount", "dropped_attributes_count")
      e
    }
    val linkRows = arr(span, "links").map { l =>
      val o = nf.objectNode()
      o.put("link_span_id", get(l, "spanId", "span_id").map(_.asText).getOrElse(""))
      o.put("link_trace_id", get(l, "traceId", "trace_id").map(_.asText).getOrElse(""))
      putAttributes(o, l)
      putCount(o, "link_dropped_attributes_count", l,
        "droppedAttributesCount", "dropped_attributes_count")
      o
    }
    val children = eventRows ++ linkRows
    if (children.isEmpty) Seq(s)
    else children.map { c => c.setAll[ObjectNode](s); c }
  }

  // --------------------------------------------------------------- metrics

  private def putTemporality(out: ObjectNode, node: JsonNode): Unit = {
    val t = get(node, "aggregationTemporality", "aggregation_temporality")
      .map(_.asInt).getOrElse(0)
    out.put("aggregation_temporality", t)
    out.put("aggregation_temporality_description", t match {
      case 0 => "UNSPECIFIED"; case 1 => "DELTA"; case 2 => "CUMULATIVE"; case _ => ""
    })
  }

  private def putDataPointFlags(out: ObjectNode, node: JsonNode): Unit = {
    val f = get(node, "flags").map(longOf).getOrElse(0L)
    out.put("data_point_flags", f)
    out.put("data_point_flags_description", f match {
      case 0 => "DO_NOT_USE"; case 1 => "NO_RECORDED_VALUE_MASK"; case _ => ""
    })
  }

  private def putTimes(out: ObjectNode, dp: JsonNode): Unit = {
    out.put("start_time_unix_nano", nanosToTimestamp(
      get(dp, "startTimeUnixNano", "start_time_unix_nano").map(longOf).getOrElse(0L)))
    out.put("time_unix_nano", nanosToTimestamp(
      get(dp, "timeUnixNano", "time_unix_nano").map(longOf).getOrElse(0L)))
  }

  private def numberDataPoint(dp: JsonNode): ObjectNode = {
    val out = nf.objectNode()
    putAttributes(out, dp)
    putTimes(out, dp)
    putDataPointFlags(out, dp)
    // value as double or int — both land in data_point_value
    get(dp, "asDouble", "as_double").foreach(d => out.put("data_point_value", d.asDouble))
    get(dp, "asInt", "as_int").foreach(i => out.put("data_point_value", longOf(i)))
    out
  }

  private def histogramDataPoint(dp: JsonNode, parent: JsonNode): ObjectNode = {
    val out = nf.objectNode()
    putAttributes(out, dp)
    putTimes(out, dp)
    putCount(out, "data_point_count", dp, "count")
    get(dp, "sum").foreach(s => out.put("data_point_sum", s.asDouble))
    val buckets = nf.arrayNode()
    arr(dp, "bucketCounts", "bucket_counts").foreach(c => buckets.add(longOf(c)))
    out.set[JsonNode]("data_point_bucket_counts", buckets)
    val bounds = nf.arrayNode()
    arr(dp, "explicitBounds", "explicit_bounds").foreach(b => bounds.add(b.asDouble))
    out.set[JsonNode]("data_point_explicit_bounds", bounds)
    putDataPointFlags(out, dp)
    get(dp, "min").foreach(m => out.put("data_point_min", m.asDouble))
    get(dp, "max").foreach(m => out.put("data_point_max", m.asDouble))
    putTemporality(out, parent)
    out
  }

  private def expHistogramDataPoint(dp: JsonNode, parent: JsonNode): ObjectNode = {
    val out = nf.objectNode()
    putAttributes(out, dp)
    putTimes(out, dp)
    putCount(out, "data_point_count", dp, "count")
    get(dp, "sum").foreach(s => out.put("data_point_sum", s.asDouble))
    out.put("data_point_scale",
      get(dp, "scale").map(_.asInt).getOrElse(0))
    out.put("data_point_zero_count",
      get(dp, "zeroCount", "zero_count").map(longOf).getOrElse(0L))
    Seq("positive" -> get(dp, "positive"), "negative" -> get(dp, "negative"))
      .foreach { case (prefix, b) =>
        b.foreach { bucket =>
          out.put(s"${prefix}_offset", get(bucket, "offset").map(_.asInt).getOrElse(0))
          val counts = nf.arrayNode()
          arr(bucket, "bucketCounts", "bucket_counts").foreach(c => counts.add(longOf(c)))
          out.set[JsonNode](s"${prefix}_bucket_count", counts)
        }
      }
    putTemporality(out, parent)
    out
  }

  private def summaryDataPoint(dp: JsonNode): ObjectNode = {
    val out = nf.objectNode()
    putAttributes(out, dp)
    putTimes(out, dp)
    putCount(out, "data_point_count", dp, "count")
    out.put("data_point_sum", get(dp, "sum").map(_.asDouble).getOrElse(0.0))
    val qs = nf.arrayNode()
    arr(dp, "quantileValues", "quantile_values").foreach { q =>
      val o = nf.objectNode()
      o.put("quantile", get(q, "quantile").map(_.asDouble).getOrElse(0.0))
      o.put("value", get(q, "value").map(_.asDouble).getOrElse(0.0))
      qs.add(o)
    }
    out.set[JsonNode]("data_point_quantile_values", qs)
    out
  }

  /** Stable 60-bit series hash over (metric_name, sorted label pairs). */
  def seriesHash(row: ObjectNode): Long = {
    val labels = row.properties().asScala.toSeq
      .map(e => e.getKey -> e.getValue)
      .filterNot { case (k, _) =>
        MetricsKnownFields.contains(k) || k.startsWith("exemplars_")
      }
      .map { case (k, v) => k -> (if (v.isTextual) v.asText else v.toString) }
      .sortBy(_._1)
    val name = Option(row.get("metric_name")).map(_.asText).getOrElse("")
    val canonical = name + " " +
      labels.map { case (k, v) => s"$k=$v" }.mkString(" ")
    java.lang.Long.parseLong(
      java.security.MessageDigest.getInstance("MD5")
        .digest(canonical.getBytes(java.nio.charset.StandardCharsets.UTF_8))
        .take(8).map(b => f"$b%02x").mkString.substring(0, 15), 16)
  }

  /** Flatten an OTLP metrics payload: one row per data point with the
    * resource/scope envelope and series hash.
    */
  def flattenMetrics(json: String): Seq[ObjectNode] = {
    val root = mapper.readTree(json)
    arr(root, "resourceMetrics", "resource_metrics").flatMap { rm =>
      val envelope = nf.objectNode()
      get(rm, "resource").foreach { r =>
        putAttributes(envelope, r)
        putCount(envelope, "resource_dropped_attributes_count", r,
          "droppedAttributesCount", "dropped_attributes_count")
      }
      envelope.put("resource_schema_url",
        get(rm, "schemaUrl", "schema_url").map(_.asText).getOrElse(""))
      arr(rm, "scopeMetrics", "scope_metrics").flatMap { sm =>
        val env = envelope.deepCopy()
        get(sm, "scope").foreach { s =>
          env.put("scope_name", get(s, "name").map(_.asText).getOrElse(""))
          env.put("scope_version", get(s, "version").map(_.asText).getOrElse(""))
          putAttributes(env, s)
          putCount(env, "scope_dropped_attributes_count", s,
            "droppedAttributesCount", "dropped_attributes_count")
        }
        env.put("scope_schema_url",
          get(sm, "schemaUrl", "schema_url").map(_.asText).getOrElse(""))
        arr(sm, "metrics").flatMap { metric =>
          flattenMetric(metric).map { dp =>
            env.properties().asScala.foreach(e => dp.set[JsonNode](e.getKey, e.getValue))
            dp.put(SeriesHashColumn, seriesHash(dp))
            dp
          }
        }
      }
    }
  }

  private def flattenMetric(metric: JsonNode): Seq[ObjectNode] = {
    val kinds: Seq[(String, JsonNode => Seq[ObjectNode], Seq[String])] = Seq(
      ("gauge", (g: JsonNode) => arr(g, "dataPoints", "data_points").map(numberDataPoint),
        Seq("gauge")),
      ("sum", (su: JsonNode) => arr(su, "dataPoints", "data_points").map { dp =>
        val o = numberDataPoint(dp)
        putTemporality(o, su)
        o.put("is_monotonic",
          get(su, "isMonotonic", "is_monotonic").exists(_.asBoolean))
        o
      }, Seq("sum")),
      ("histogram", (h: JsonNode) =>
        arr(h, "dataPoints", "data_points").map(dp => histogramDataPoint(dp, h)),
        Seq("histogram")),
      ("exponential_histogram", (h: JsonNode) =>
        arr(h, "dataPoints", "data_points").map(dp => expHistogramDataPoint(dp, h)),
        Seq("exponentialHistogram", "exponential_histogram")),
      ("summary", (su: JsonNode) =>
        arr(su, "dataPoints", "data_points").map(summaryDataPoint),
        Seq("summary")))
    val rows = kinds.flatMap { case (typeName, flatten, keys) =>
      get(metric, keys: _*).toSeq.flatMap { node =>
        val dps = flatten(node)
        val out = if (dps.isEmpty) {
          // metric with no data points still emits one descriptive row
          val single = nf.objectNode()
          if (typeName == "sum") {
            putTemporality(single, node)
            single.put("is_monotonic",
              get(node, "isMonotonic", "is_monotonic").exists(_.asBoolean))
          }
          if (typeName == "histogram" || typeName == "exponential_histogram")
            putTemporality(single, node)
          Seq(single)
        } else dps
        out.foreach(_.put("metric_type", typeName))
        out
      }
    }
    rows.foreach { r =>
      r.put("metric_name", get(metric, "name").map(_.asText).getOrElse(""))
      r.put("metric_description", get(metric, "description").map(_.asText).getOrElse(""))
      r.put("metric_unit", get(metric, "unit").map(_.asText).getOrElse(""))
      get(metric, "metadata").foreach(m => putAttributes(r, mkAttrHolder(m)))
    }
    rows
  }

  private def mkAttrHolder(attrs: JsonNode): ObjectNode = {
    val o = nf.objectNode()
    o.set[JsonNode]("attributes", attrs)
    o
  }
}

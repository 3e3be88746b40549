package graft.ingest

import org.scalatest.funsuite.AnyFunSuite

class OtelFlattenSpec extends AnyFunSuite {

  private val logsPayload =
    """{"resourceLogs":[{
      |  "resource":{"attributes":[
      |    {"key":"service.name","value":{"stringValue":"api"}},
      |    {"key":"port","value":{"intValue":"8080"}},
      |    {"key":"ratio","value":{"doubleValue":0.5}},
      |    {"key":"tags","value":{"arrayValue":{"values":[{"stringValue":"a"},{"intValue":"2"}]}}},
      |    {"key":"nested","value":{"kvlistValue":{"values":[{"key":"inner","value":{"boolValue":true}}]}}}],
      |    "droppedAttributesCount":1},
      |  "schemaUrl":"https://otel/1.0",
      |  "scopeLogs":[{
      |    "scope":{"name":"lib","version":"2.1"},
      |    "schemaUrl":"https://otel/scope",
      |    "logRecords":[
      |      {"timeUnixNano":"1700000000123456789","observedTimeUnixNano":"1700000001000000000",
      |       "severityNumber":9,"body":{"stringValue":"hello world"},
      |       "attributes":[{"key":"http.method","value":{"stringValue":"GET"}}],
      |       "traceId":"0af7651916cd43dd8448eb211c80319c","spanId":"b7ad6b7169203331","flags":1},
      |      {"timeUnixNano":"1700000002000000000","observedTimeUnixNano":"1700000002000000000",
      |       "severityNumber":0,"body":{"stringValue":"fatal crash occurred"}},
      |      {"timeUnixNano":"1700000003000000000","observedTimeUnixNano":"1700000003000000000",
      |       "severityNumber":17,"body":{"stringValue":"{\"code\":500,\"msg\":\"boom\"}"}}
      |    ]}]}]}""".stripMargin

  test("logs: envelope, value mapping, severity, category") {
    val rows = OtelFlatten.flattenLogs(logsPayload)
    assert(rows.length == 3)
    val r = rows.head
    assert(r.get("service.name").asText == "api")
    assert(r.get("port").asText == "8080" && r.get("port").isTextual) // int→string
    assert(r.get("ratio").asDouble == 0.5)
    assert(r.get("tags").asText == """["a",2]""") // array→JSON text
    assert(r.get("inner").asBoolean) // kvlist merges into parent
    assert(r.get("resource_dropped_attributes_count").asLong == 1L)
    assert(r.get("schema_url").asText == "https://otel/1.0")
    assert(r.get("scope_name").asText == "lib")
    assert(r.get("scope_log_schema_url").asText == "https://otel/scope")
    assert(r.get("severity_number").asInt == 9)
    assert(r.get("severity_text").asText == "INFO")
    assert(r.get("p_log_category").asText == "INFO")
    assert(r.get("time_unix_nano").asText == "2023-11-14T22:13:20.123456789Z")
    assert(r.get("body").asText == "hello world")
    assert(r.get("trace_id").asText == "0af7651916cd43dd8448eb211c80319c")

    // severity 0 → category from body scan ("fatal")
    assert(rows(1).get("severity_text").asText == "UNSPECIFIED")
    assert(rows(1).get("p_log_category").asText == "FATAL")

    // JSON-object body also flattens to body_<key> columns
    val r3 = rows(2)
    assert(r3.get("body").asText.contains("\"code\":500"))
    assert(r3.get("body_code").asLong == 500L)
    assert(r3.get("body_msg").asText == "boom")
    assert(r3.get("p_log_category").asText == "ERROR")
  }

  test("severityText covers the full enum surface") {
    assert(OtelFlatten.severityText(1) == "TRACE")
    assert(OtelFlatten.severityText(2) == "TRACE2")
    assert(OtelFlatten.severityText(13) == "WARN")
    assert(OtelFlatten.severityText(24) == "FATAL4")
    assert(OtelFlatten.severityText(0) == "UNSPECIFIED")
  }

  private val tracesPayload =
    """{"resourceSpans":[{
      |  "resource":{"attributes":[{"key":"service.name","value":{"stringValue":"api"}}]},
      |  "scopeSpans":[{
      |    "scope":{"name":"tracer"},
      |    "spans":[
      |      {"traceId":"abc","spanId":"s1","parentSpanId":"","name":"GET /",
      |       "kind":2,"startTimeUnixNano":"1700000000000000000","endTimeUnixNano":"1700000001500000000",
      |       "status":{"code":2,"message":"bad"},
      |       "events":[{"timeUnixNano":"1700000000500000000","name":"exception",
      |                  "attributes":[{"key":"exception.type","value":{"stringValue":"IO"}}]}],
      |       "links":[{"traceId":"other","spanId":"s9"}]},
      |      {"traceId":"abc","spanId":"s2","name":"inner","kind":1,
      |       "startTimeUnixNano":"1700000000100000000","endTimeUnixNano":"1700000000200000000"}
      |    ]}]}]}""".stripMargin

  test("traces: span fields replicated onto event and link rows") {
    val rows = OtelFlatten.flattenTraces(tracesPayload)
    // span1 → 1 event row + 1 link row; span2 → 1 bare row
    assert(rows.length == 3)
    val ev = rows.find(r => r.has("event_name")).get
    assert(ev.get("event_name").asText == "exception")
    assert(ev.get("event_duration_ns").asLong == 500000000L)
    assert(ev.get("exception.type").asText == "IO")
    assert(ev.get("span_span_id").asText == "s1")
    assert(ev.get("span_kind_description").asText == "SERVER")
    assert(ev.get("span_status_description").asText == "ERROR")
    assert(ev.get("span_duration_ns").asLong == 1500000000L)
    assert(ev.get("service.name").asText == "api")
    val link = rows.find(r => r.has("link_span_id")).get
    assert(link.get("link_trace_id").asText == "other")
    assert(link.get("span_span_id").asText == "s1")
    val bare = rows.find(r => r.get("span_span_id").asText == "s2").get
    assert(!bare.has("event_name") && !bare.has("link_span_id"))
    assert(bare.get("span_kind_description").asText == "INTERNAL")
  }

  private val metricsPayload =
    """{"resourceMetrics":[{
      |  "resource":{"attributes":[{"key":"host","value":{"stringValue":"h1"}}]},
      |  "scopeMetrics":[{
      |    "scope":{"name":"meter"},
      |    "metrics":[
      |      {"name":"req_total","unit":"1","sum":{"aggregationTemporality":2,"isMonotonic":true,
      |        "dataPoints":[
      |          {"timeUnixNano":"1700000000000000000","asInt":"42",
      |           "attributes":[{"key":"code","value":{"intValue":"200"}}]},
      |          {"timeUnixNano":"1700000000000000000","asInt":"7",
      |           "attributes":[{"key":"code","value":{"intValue":"500"}}]}]}},
      |      {"name":"latency","histogram":{"aggregationTemporality":1,
      |        "dataPoints":[{"timeUnixNano":"1700000000000000000","count":"3","sum":1.5,
      |          "bucketCounts":["1","2"],"explicitBounds":[0.5]}]}},
      |      {"name":"gc","summary":{"dataPoints":[
      |        {"timeUnixNano":"1700000000000000000","count":"2","sum":0.2,
      |         "quantileValues":[{"quantile":0.5,"value":0.1}]}]}}
      |    ]}]}]}""".stripMargin

  test("metrics: one row per data point with envelope + series hash") {
    val rows = OtelFlatten.flattenMetrics(metricsPayload)
    assert(rows.length == 4)
    val sums = rows.filter(_.get("metric_type").asText == "sum")
    assert(sums.length == 2)
    assert(sums.head.get("data_point_value").asLong == 42L)
    assert(sums.head.get("is_monotonic").asBoolean)
    assert(sums.head.get("aggregation_temporality_description").asText == "CUMULATIVE")
    assert(sums.head.get("host").asText == "h1")
    assert(sums.head.get("scope_name").asText == "meter")
    // different label values → different series hash; same labels → equal
    assert(sums(0).get(OtelFlatten.SeriesHashColumn).asLong !=
      sums(1).get(OtelFlatten.SeriesHashColumn).asLong)
    val h = rows.find(_.get("metric_type").asText == "histogram").get
    assert(h.get("data_point_count").asLong == 3L)
    assert(h.get("data_point_bucket_counts").toString == "[1,2]")
    assert(h.get("data_point_explicit_bounds").toString == "[0.5]")
    assert(h.get("aggregation_temporality_description").asText == "DELTA")
    val su = rows.find(_.get("metric_type").asText == "summary").get
    assert(su.get("data_point_quantile_values").toString ==
      """[{"quantile":0.5,"value":0.1}]""")
  }

  test("series hash is stable across runs and label order") {
    val a = OtelFlatten.flattenMetrics(metricsPayload)
    val b = OtelFlatten.flattenMetrics(metricsPayload)
    assert(a.map(_.get(OtelFlatten.SeriesHashColumn).asLong) ==
      b.map(_.get(OtelFlatten.SeriesHashColumn).asLong))
  }
}

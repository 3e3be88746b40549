package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.{GroupStateTimeout, TestGroupState}

import graft.SparkSuite
import graft.streaming.StreamingTraces.{OpenTrace, Span, TraceSummary}

class StreamingTracesSpec extends SparkSuite {
  import spark.implicits._

  private def ts(ms: Long) = new Timestamp(ms)

  test("step accumulates the running summary; emits only on timeout") {
    val st = TestGroupState.create[OpenTrace](
      org.apache.spark.api.java.Optional.empty(),
      GroupStateTimeout.EventTimeTimeout, 0L,
      org.apache.spark.api.java.Optional.of[scala.Long](500L),
      hasTimedOut = false)
    val spans = Iterator(
      Span(1L, 2L, Some(1L), "db", ts(1100L), 50L, isError = true),
      Span(1L, 1L, None, "api", ts(1000L), 500L, isError = false))
    val out = StreamingTraces.step(1L, spans, st, quietMillis = 1000L)
    assert(out.isEmpty) // nothing emits while the trace is open
    val t = st.get
    assert(t == OpenTrace(2L, 1L, 1000L, 1500L, "api"))

    // timeout pass flushes the summary and clears state
    val timedOut = TestGroupState.create[OpenTrace](
      org.apache.spark.api.java.Optional.of(t),
      GroupStateTimeout.EventTimeTimeout, 0L,
      org.apache.spark.api.java.Optional.of[scala.Long](10_000L),
      hasTimedOut = true)
    val fin = StreamingTraces.step(1L, Iterator.empty, timedOut, 1000L).toSeq
    assert(fin == Seq(TraceSummary(1L, 2L, 1L, 1000L, 1500L, "api")))
    assert(timedOut.isRemoved)
  }

  test("quiet traces finalize once the watermark passes; late spans merge first") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[Span]
    val spans = input.toDS().withWatermark("eventTime", "1 second")
    val q = StreamingTraces.assemble(spans, quietMillis = 2000L)
      .writeStream.format("memory").queryName("trace_out")
      .outputMode("append").start()
    try {
      val t0 = 1700000000000L
      input.addData(
        Span(1L, 0L, None, "api", ts(t0), 100L, isError = false),
        Span(2L, 0L, None, "web", ts(t0 + 10), 10L, isError = false))
      q.processAllAvailable()
      // out-of-order span for trace 1 lands in a later micro-batch
      input.addData(Span(1L, 1L, Some(0L), "db", ts(t0 + 5), 20L,
        isError = true))
      q.processAllAvailable()
      assert(spark.table("trace_out").count() == 0) // still open
      // far-future spans push the watermark past both quiet deadlines
      input.addData(Span(9L, 0L, None, "x", ts(t0 + 600_000), 1L,
        isError = false))
      q.processAllAvailable()
      input.addData(Span(9L, 1L, Some(0L), "x", ts(t0 + 601_000), 1L,
        isError = false))
      q.processAllAvailable()
      val done = spark.table("trace_out").as[TraceSummary].collect()
        .sortBy(_.traceId).toSeq
      assert(done == Seq(
        TraceSummary(1L, 2L, 1L, t0, t0 + 100L, "api"),
        TraceSummary(2L, 1L, 0L, t0 + 10, t0 + 20L, "web")))
    } finally q.stop()
  }
}

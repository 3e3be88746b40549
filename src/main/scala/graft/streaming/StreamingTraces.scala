package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming trace assembly: spans arrive out of order across micro-
  * batches; buffer them per trace id in stream state and emit ONE summary
  * row per trace once the trace has been quiet past the watermark (event-
  * time timeout) — the step streaming tail sampling and trace search
  * need, since per-trace decisions require complete traces.
  *
  * State per open trace is a running summary (span count, error count,
  * time bounds, root service) — O(1) per trace, NOT the span list: spans
  * themselves flow to storage through the normal ingest path; this state
  * machine only decides when a trace is complete and what its rollup row
  * says. A batch twin of the same rollup is `Traces.traceList`.
  *
  * The caller sets the watermark on `eventTime` (kept as a typed field so
  * the analyzer sees the watermark column flow into the stateful
  * operator): `spans.withWatermark("eventTime", "...")` before
  * [[assemble]].
  */
object StreamingTraces {

  final case class Span(traceId: Long, spanId: Long, parentId: Option[Long],
                        service: String, eventTime: Timestamp,
                        durMillis: Long, isError: Boolean)
  final case class OpenTrace(nSpans: Long, nErrors: Long, start: Long,
                             end: Long, rootService: String)
  final case class TraceSummary(traceId: Long, nSpans: Long, nErrors: Long,
                                start: Long, end: Long, rootService: String)

  /** Fold one micro-batch of a trace's spans into its open summary; emit
    * the finished summary only on timeout (trace quiet past the
    * watermark). Pure function — unit-testable without a stream.
    */
  def step(traceId: Long, spans: Iterator[Span],
           state: GroupState[OpenTrace],
           quietMillis: Long): Iterator[TraceSummary] = {
    if (state.hasTimedOut) {
      val done = state.getOption.map(t => TraceSummary(traceId, t.nSpans,
        t.nErrors, t.start, t.end, t.rootService))
      state.remove()
      return done.iterator
    }
    var t = state.getOption.getOrElse(
      OpenTrace(0L, 0L, Long.MaxValue, Long.MinValue, ""))
    spans.toSeq.sortBy(s => (s.eventTime.getTime, s.spanId)).foreach { s =>
      val ts = s.eventTime.getTime
      t = OpenTrace(
        t.nSpans + 1,
        t.nErrors + (if (s.isError) 1L else 0L),
        math.min(t.start, ts),
        math.max(t.end, ts + s.durMillis),
        // root = the span with no parent; first one wins (re-sent roots
        // cannot flap the summary)
        if (t.rootService.isEmpty && s.parentId.isEmpty) s.service
        else t.rootService)
    }
    state.update(t)
    // deadline clamps past the current watermark: a trace whose spans are
    // all older than the watermark is already quiet and times out on the
    // very next trigger rather than throwing
    scala.util.Try(state.getCurrentWatermarkMs()).toOption.foreach { wm =>
      state.setTimeoutTimestamp(math.max(t.end + quietMillis, wm + 1))
    }
    Iterator.empty
  }

  /** Wire the assembler over a streaming span Dataset (watermark on
    * `eventTime` set by the caller).
    */
  def assemble(spans: Dataset[Span], quietMillis: Long): Dataset[TraceSummary] = {
    implicit val so = Encoders.product[OpenTrace]
    implicit val ts = Encoders.product[TraceSummary]
    spans.groupByKey(_.traceId)(Encoders.scalaLong)
      .flatMapGroupsWithState[OpenTrace, TraceSummary](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout())(
        (k, it, st) => step(k, it, st, quietMillis))
  }
}

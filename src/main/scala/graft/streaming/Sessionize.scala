package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming gap-based sessionization — the custom-state streaming operator
  * (SURVEY §2.9): `flatMapGroupsWithState` keyed by user, closing a session
  * whenever the gap to the next event exceeds `gapMs` (or the state times
  * out).
  *
  * The batch equivalent (lag + running-sum windows) is `q_sessionize` in
  * [[graft.SparkEntry]]; this is the incremental form for live streams —
  * state per key is O(1) (start/last/count), so a billion users is a
  * billion tiny state rows sharded across executors by the groupBy key.
  */
object Sessionize {

  final case class Event(userId: Long, eventId: Long, tsMillis: Long)
  final case class SessionState(start: Long, last: Long, count: Long)
  final case class Session(userId: Long, sessStart: Long, sessEnd: Long,
                           nEvents: Long)

  /** Fold one micro-batch of a user's events into the open-session state,
    * emitting every session that closed. Pure function — unit-testable
    * without a streaming query.
    */
  def step(userId: Long, events: Iterator[Event],
           state: GroupState[SessionState], gapMs: Long): Iterator[Session] = {
    if (state.hasTimedOut) {
      val closed = state.getOption.map(s =>
        Session(userId, s.start, s.last, s.count))
      state.remove()
      return closed.iterator
    }
    val sorted = events.toSeq.sortBy(e => (e.tsMillis, e.eventId))
    var open = state.getOption
    val out = Seq.newBuilder[Session]
    sorted.foreach { e =>
      open match {
        case Some(s) if e.tsMillis - s.last <= gapMs =>
          open = Some(SessionState(s.start, math.max(s.last, e.tsMillis),
            s.count + 1))
        case Some(s) =>
          out += Session(userId, s.start, s.last, s.count)
          open = Some(SessionState(e.tsMillis, e.tsMillis, 1L))
        case None =>
          open = Some(SessionState(e.tsMillis, e.tsMillis, 1L))
      }
    }
    open match {
      case Some(s) =>
        state.update(s)
        if (state.getOption.isDefined && hasWatermark(state))
          state.setTimeoutTimestamp(s.last + gapMs)
      case None => state.remove()
    }
    out.result().iterator
  }

  private def hasWatermark(state: GroupState[SessionState]): Boolean =
    scala.util.Try(state.getCurrentWatermarkMs()).isSuccess

  /** Wire the stateful step over a streaming Dataset. With
    * `EventTimeTimeout` (and a watermark set upstream) idle sessions flush
    * on timeout; with the default `NoTimeout`, a session closes only when a
    * later event arrives past the gap.
    */
  def sessions(events: Dataset[Event], gapMs: Long,
               timeout: GroupStateTimeout = GroupStateTimeout.NoTimeout())
      : Dataset[Session] = {
    implicit val se = Encoders.product[SessionState]
    implicit val so = Encoders.product[Session]
    events.groupByKey(_.userId)(Encoders.scalaLong)
      .flatMapGroupsWithState[SessionState, Session](
        OutputMode.Append(), timeout)(
        (k, it, st) => step(k, it, st, gapMs))
  }
}

package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming ordered-funnel detection — the incremental twin of
  * `graft.query.Analytics.funnel`: emit each user the first time their
  * buffered step events contain a strictly-ordered completion of every
  * step.
  *
  * Completion is MONOTONE (more events can only keep a complete cascade
  * complete — an earlier step-1 time only widens later steps' candidate
  * sets), so the emitted user set converges to the batch answer; the
  * emitted step times are the cascade over data seen at emission.
  *
  * State discipline: only step-matching events are buffered (the funnel's
  * own events, not the whole stream), and a user who completed collapses
  * to an empty-buffer tombstone so duplicates are never emitted. With an
  * upstream watermark + `EventTimeTimeout`, stale buffers and tombstones
  * are GC'd once the watermark passes `tsMillis + delayMs`.
  */
object StreamingFunnel {

  final case class StepEvent(userId: Long, tsMillis: Long, step: Int)
  final case class FunnelState(buffer: Seq[StepEvent], emitted: Boolean)
  final case class Completion(userId: Long, stepTimes: Seq[Long])

  /** First-completion cascade over (ts, step) events: step k's time is the
    * minimum ts strictly after step k-1's — identical to the batch
    * cascade. None until every step has a valid time.
    */
  def cascade(events: Seq[StepEvent], numSteps: Int): Option[Seq[Long]] = {
    var prev = Long.MinValue
    val times = Seq.newBuilder[Long]
    var k = 0
    while (k < numSteps) {
      val cands = events
        .filter(e => e.step == k && (k == 0 || e.tsMillis > prev))
        .map(_.tsMillis)
      if (cands.isEmpty) return None
      prev = cands.min
      times += prev
      k += 1
    }
    Some(times.result())
  }

  /** Fold one micro-batch of a user's step events into the funnel state.
    * Pure — unit-testable via TestGroupState.
    */
  def step(userId: Long, events: Iterator[StepEvent],
           state: GroupState[FunnelState], numSteps: Int,
           delayMs: Long): Iterator[Completion] = {
    if (state.hasTimedOut) { state.remove(); return Iterator.empty }
    val prior = state.getOption.getOrElse(FunnelState(Nil, emitted = false))
    if (prior.emitted) { touchTimeout(state, delayMs); return Iterator.empty }
    val buf = prior.buffer ++ events
    cascade(buf, numSteps) match {
      case Some(times) =>
        state.update(FunnelState(Nil, emitted = true)) // tombstone
        touchTimeout(state, delayMs)
        Iterator.single(Completion(userId, times))
      case None =>
        state.update(FunnelState(buf, emitted = false))
        touchTimeout(state, delayMs)
        Iterator.empty
    }
  }

  private def touchTimeout(state: GroupState[FunnelState],
                           delayMs: Long): Unit =
    scala.util.Try(
      state.setTimeoutTimestamp(state.getCurrentWatermarkMs() + delayMs))

  /** Project a raw event frame to step events: one row per (event, step)
    * whose condition matched — an event may serve several steps, matching
    * the batch semantics.
    */
  def stepEvents(df: DataFrame, userCol: String, tsCol: String,
                 steps: Seq[org.apache.spark.sql.Column]): Dataset[StepEvent] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(userCol).cast("long").as("userId"),
        unix_millis(col(tsCol).cast("timestamp")).as("tsMillis"),
        posexplode(array(steps.map(_.cast("boolean")): _*))
          .as(Seq("step", "m")))
      .filter(col("m")).drop("m")
      .as[StepEvent]
  }

  /** Wire the stateful step over a streaming Dataset. */
  def completions(events: Dataset[StepEvent], numSteps: Int,
                  delayMs: Long = 0L,
                  timeout: GroupStateTimeout = GroupStateTimeout.NoTimeout())
      : Dataset[Completion] = {
    implicit val fs = Encoders.product[FunnelState]
    implicit val co = Encoders.product[Completion]
    events.groupByKey(_.userId)(Encoders.scalaLong)
      .flatMapGroupsWithState[FunnelState, Completion](
        OutputMode.Append(), timeout)(
        (k, it, st) => step(k, it, st, numSteps, delayMs))
  }
}

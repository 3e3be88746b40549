package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming alert routing — the reference's alert state machine
  * (`alerts_utils.rs` update_alert_state: Triggered / NotTriggered, notify
  * only on transitions) run as distributed stream state instead of a
  * driver-side map: one boolean per alert key in `flatMapGroupsWithState`,
  * fed by any violation stream (threshold filters,
  * [[StreamingAnomaly]] flags, burn-rate bins).
  *
  * Contract matches the batch machine exactly: a violation while
  * NotTriggered emits a trigger and flips the state; an all-clear batch
  * while Triggered emits a resolution; repeated violations stay silent
  * (no notification storms); evaluations fold in (tsMillis, then
  * violation-first) order inside each micro-batch so back-to-back flips
  * within one batch emit deterministically.
  */
object StreamingAlerts {

  final case class Eval(key: String, tsMillis: Long, violating: Boolean)
  final case class Transition(key: String, tsMillis: Long,
                              triggered: Boolean)

  /** Fold one micro-batch of evaluations for a key, emitting only state
    * transitions. Pure function — unit-testable without a stream.
    */
  def step(key: String, evals: Iterator[Eval],
           state: GroupState[Boolean]): Iterator[Transition] = {
    if (state.hasTimedOut) { state.remove(); return Iterator.empty }
    var triggered = state.getOption.getOrElse(false)
    val out = Seq.newBuilder[Transition]
    evals.toSeq.sortBy(e => (e.tsMillis, !e.violating)).foreach { e =>
      if (e.violating && !triggered) {
        triggered = true
        out += Transition(key, e.tsMillis, triggered = true)
      } else if (!e.violating && triggered) {
        triggered = false
        out += Transition(key, e.tsMillis, triggered = false)
      }
    }
    state.update(triggered)
    out.result().iterator
  }

  /** Wire the state machine over a streaming violation Dataset. */
  def route(evals: Dataset[Eval],
            timeout: GroupStateTimeout = GroupStateTimeout.NoTimeout())
      : Dataset[Transition] = {
    implicit val st = Encoders.scalaBoolean
    implicit val tr = Encoders.product[Transition]
    evals.groupByKey(_.key)(Encoders.STRING)
      .flatMapGroupsWithState[Boolean, Transition](
        OutputMode.Append(), timeout)(
        (k, it, s) => step(k, it, s))
  }
}

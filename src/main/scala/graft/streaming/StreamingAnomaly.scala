package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming statistical anomaly detection — the incremental twin of
  * [[graft.query.TimeSeries.zscore]] / `Alerts.anomalyFrame`: per key,
  * maintain running moments (Welford's algorithm: count, mean, M2) in
  * stream state and flag each arriving value whose z-score against the
  * moments accumulated BEFORE it exceeds `threshold`.
  *
  * State per key is three numbers — O(keys) total, volume-independent —
  * where the batch z-score needs the key's full history per evaluation.
  * Events are folded in (tsMillis, eventId) order inside each micro-batch,
  * so flags are deterministic for a given arrival batching. The first
  * `minN` values per key never flag (moments too noisy), matching the
  * usual warm-up convention.
  */
object StreamingAnomaly {

  final case class Point(key: String, eventId: Long, tsMillis: Long,
                         value: Double)
  final case class Moments(n: Long, mean: Double, m2: Double)
  final case class Flag(key: String, eventId: Long, tsMillis: Long,
                        value: Double, z: Double, anomaly: Boolean)

  /** Fold one micro-batch of a key's points into the running moments,
    * emitting one flagged row per point. Pure function — unit-testable
    * without a streaming query.
    */
  def step(key: String, points: Iterator[Point], state: GroupState[Moments],
           threshold: Double, minN: Long): Iterator[Flag] = {
    if (state.hasTimedOut) { state.remove(); return Iterator.empty }
    var m = state.getOption.getOrElse(Moments(0L, 0.0, 0.0))
    val out = Seq.newBuilder[Flag]
    points.toSeq.sortBy(p => (p.tsMillis, p.eventId)).foreach { p =>
      val z =
        if (m.n >= minN && m.m2 > 0.0) {
          val std = math.sqrt(m.m2 / m.n)
          (p.value - m.mean) / std
        } else 0.0
      out += Flag(p.key, p.eventId, p.tsMillis, p.value, z,
        anomaly = math.abs(z) > threshold)
      // Welford update AFTER scoring: a spike must not mask itself
      val n1 = m.n + 1
      val d = p.value - m.mean
      val mean1 = m.mean + d / n1
      m = Moments(n1, mean1, m.m2 + d * (p.value - mean1))
    }
    state.update(m)
    out.result().iterator
  }

  /** Wire the stateful step over a streaming Dataset. */
  def flags(points: Dataset[Point], threshold: Double = 3.0,
            minN: Long = 10,
            timeout: GroupStateTimeout = GroupStateTimeout.NoTimeout())
      : Dataset[Flag] = {
    implicit val sm = Encoders.product[Moments]
    implicit val sf = Encoders.product[Flag]
    points.groupByKey(_.key)(Encoders.STRING)
      .flatMapGroupsWithState[Moments, Flag](
        OutputMode.Append(), timeout)(
        (k, it, st) => step(k, it, st, threshold, minN))
  }
}

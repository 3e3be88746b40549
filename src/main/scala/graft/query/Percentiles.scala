package graft.query

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact distributed percentiles by index selection.
  *
  * Selects the element at rank `floor(p * (n-1))` per group (0-indexed over
  * the tie-broken sort order) — a *discrete* percentile: the result is
  * always an actual data value, never an interpolation. That makes it
  * reproducible bit-for-bit across engines (interpolated definitions differ
  * in last-ulp arithmetic form), and the tie-break column makes it
  * deterministic under duplicate values.
  *
  * Plan shape: one shuffle on the group key; rank + count come from the
  * same window, all requested percentiles resolve in that single pass
  * (conditional aggregation), so p50/p95/p99 cost the same as one.
  * For sketch-accuracy-is-fine paths use Spark's `approx_percentile`
  * (t-digest) instead; this is the exact twin (reference field-stats keeps
  * exact distinct-value counts the same way, `src/storage/field_stats.rs`).
  */
object Percentiles {

  def exact(df: DataFrame, groupCol: String, valueCol: String,
            tieCol: String, ps: Seq[Double]): DataFrame =
    exactBy(df, Seq(groupCol), valueCol, tieCol, ps)

  /** [[exact]] over a composite group key — the p99-per-service-per-bin
    * observability shape. Same single-shuffle plan: the window partitions
    * by all group columns at once.
    */
  def exactBy(df: DataFrame, groupCols: Seq[String], valueCol: String,
              tieCol: String, ps: Seq[Double]): DataFrame = {
    val gcols = groupCols.map(col)
    val w = Window.partitionBy(gcols: _*)
      .orderBy(col(valueCol).asc, col(tieCol).asc)
    val ranked = df
      .withColumn("__rn", row_number().over(w))
      .withColumn("__n", count(lit(1)).over(Window.partitionBy(gcols: _*)))
    val picks: Seq[Column] = ps.map { p =>
      max(when(col("__rn") - 1 ===
        floor(lit(p) * (col("__n") - 1)), col(valueCol)))
        .as(s"p${(p * 100).round}")
    }
    ranked.groupBy(gcols: _*).agg(picks.head, picks.tail: _*)
  }

  /** Exemplar selection (the Prometheus/OTel "exemplars" feature): per
    * group, the WHOLE ROW sitting at quantile rank `p` — not just the
    * value, but the trace/span identifiers a human clicks through to.
    * Same rank-selection machinery as [[exactBy]]; `tieCols` make the
    * pick deterministic. One shuffle on the group key.
    */
  def exemplarAt(df: DataFrame, groupCols: Seq[String], valueCol: String,
                 tieCols: Seq[String], p: Double): DataFrame = {
    val gcols = groupCols.map(col)
    val w = Window.partitionBy(gcols: _*)
      .orderBy(col(valueCol).asc +: tieCols.map(col(_).asc): _*)
    df.withColumn("__rn", row_number().over(w))
      .withColumn("__n", count(lit(1)).over(Window.partitionBy(gcols: _*)))
      .filter(col("__rn") - 1 === floor(lit(p) * (col("__n") - 1)))
      .drop("__rn", "__n")
  }

  /** PROMETHEUS-STYLE `histogram_quantile` over PRE-BUCKETED counts —
    * the quantile when the raw observations are gone and only the
    * histogram survived (the agent-side aggregation shape every metrics
    * pipeline ships): rows of (group…, `leCol` = bucket upper bound on
    * an integer grid, `countCol` = observations in that bucket,
    * NON-cumulative), quantile φ as a micro fraction. The target rank
    * compares in pure BIGINT (`cum·10⁶ ≥ φ·total` — no fp rank), the
    * answering bucket is the lowest that covers it, and the classic
    * linear interpolation within it runs as a FIXED IEEE double tree
    * over exact BIGINT inputs, floored back to the le grid — the
    * corrByGroup determinism convention. First bucket interpolates from
    * 0 (the Prometheus convention); an empty group (total 0) yields
    * null. Shape: one keyed aggregate + one group-partitioned
    * cumulative window over BUCKET rows (≤ |le grid| per group — never
    * observation-sized) + one min_by aggregate.
    * Returns (groupCols…, total, q_micro).
    */
  def histogramQuantile(buckets: DataFrame, groupCols: Seq[String],
                        leCol: String, countCol: String,
                        phiMicro: Long): DataFrame = {
    require(phiMicro > 0 && phiMicro <= 1000000L,
      "phiMicro must be in (0, 1e6]")
    val gcols = groupCols.map(col)
    val per = buckets.groupBy(gcols :+ col(leCol).cast("long").as("__le"): _*)
      .agg(coalesce(sum(col(countCol).cast("long")), lit(0L)).as("__cnt"))
    val w = Window.partitionBy(gcols: _*).orderBy(col("__le"))
    val cum = per
      .withColumn("__cum", sum(col("__cnt")).over(
        w.rowsBetween(Window.unboundedPreceding, 0)))
      .withColumn("__lower", coalesce(lag(col("__le"), 1).over(w), lit(0L)))
      .withColumn("__total", sum(col("__cnt")).over(
        Window.partitionBy(gcols: _*)))
    // lowest bucket whose cumulative count covers the micro rank —
    // BIGINT comparison on both sides, no fp rank
    val eligible = col("__cum") * lit(1000000L) >=
      lit(phiMicro) * col("__total")
    cum.groupBy(gcols: _*)
      .agg(max(col("__total")).as("total"),
        min_by(
          struct(col("__le"), col("__lower"), col("__cnt"), col("__cum")),
          when(eligible && col("__cnt") > 0, col("__le"))).as("__b"))
      .select(gcols :+ col("total") :+
        when(col("total") > 0,
          floor(col("__b.__lower").cast("double") +
            (col("__b.__le") - col("__b.__lower")).cast("double") *
              ((lit(phiMicro.toDouble) * col("total").cast("double") -
                (col("__b.__cum") - col("__b.__cnt")).cast("double") *
                  lit(1000000.0)) /
                (col("__b.__cnt").cast("double") * lit(1000000.0))))
            .cast("long"))
          .as("q_micro"): _*)
  }
}

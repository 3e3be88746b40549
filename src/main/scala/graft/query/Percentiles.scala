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
}

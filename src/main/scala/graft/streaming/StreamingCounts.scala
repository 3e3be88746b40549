package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Streaming counts/histogram — the incremental twin of
  * [[graft.query.Counts.histogram]] (reference counts API,
  * `src/query/mod.rs:659-687`): tumbling event-time windows with a
  * watermark bounding state.
  *
  * State per key = one running count per (window, group) — watermark
  * expiry drops windows older than `delayThreshold`, so state is
  * O(groups × windows-in-watermark) regardless of stream length. Output
  * mode governs semantics: `append` emits each window once when it
  * finalizes (exactly the reference's histogram rows, incrementally);
  * `update` re-emits running counts per trigger.
  */
object StreamingCounts {

  /** Tumbling windowed counts over `timeCol` with optional group columns.
    * Caller picks output mode at the sink; append requires the watermark.
    */
  def windowedCounts(events: DataFrame, timeCol: String, binSeconds: Long,
                     delayThreshold: String = "10 minutes",
                     groupCols: Seq[String] = Nil): DataFrame = {
    val wm = events.withWatermark(timeCol, delayThreshold)
    val win = window(col(timeCol), s"$binSeconds seconds")
    val keys: Seq[Column] = win +: groupCols.map(col)
    wm.groupBy(keys: _*)
      .agg(count(lit(1)).as("bin_count"))
      .select((Seq(col("window.start").as("bin_start"),
        col("window.end").as("bin_end")) ++
        groupCols.map(col) :+ col("bin_count")): _*)
  }

  /** Continuously-maintained top-k groups by total count — the streaming
    * twin of [[graft.query.Counts.topKCounts]]'s totals side (reference
    * counts top-k, `src/query/mod.rs:708-735`).
    *
    * Running counts are the ONLY distributed state (one counter per
    * group, incrementally merged map-side per micro-batch); the
    * sort+limit ranks the current totals at each trigger. Requires
    * `complete` output mode (Structured Streaming only allows
    * sort-after-aggregation there), which is exactly the top-k contract:
    * the sink holds k rows, re-emitted per trigger. Ties break by group
    * ascending, matching the batch operator.
    */
  def topKCounts(events: DataFrame, groupCols: Seq[String],
                 k: Int = 10): DataFrame = {
    val gcols = groupCols.map(col)
    events.groupBy(gcols: _*)
      .agg(count(lit(1)).as("total_count"))
      .orderBy(col("total_count").desc +: gcols.map(_.asc): _*)
      .limit(k)
  }

  /** Live percentiles per tumbling window: one KLL sketch per
    * (window, group) maintained incrementally in stream state — the
    * streaming twin of [[graft.query.Percentiles.exactBy]], answering
    * "p99 latency right now" without buffering raw values.
    *
    * State is O(groups × windows-in-watermark × sketch), with the sketch a
    * few KB regardless of event volume — exact streaming percentiles would
    * need every value in state. The emitted row carries the serialized
    * `sketch` alongside the decoded quantiles, so downstream batch jobs
    * can roll windows up to coarser bins with
    * [[graft.query.QuantileSketch.mergeSketches]] — no rescan, the same
    * mergeable-sketch contract as the batch side. Append mode emits each
    * window once when the watermark closes it.
    */
  def windowedPercentiles(events: DataFrame, timeCol: String,
      valueCol: String, binSeconds: Long,
      delayThreshold: String = "10 minutes",
      groupCols: Seq[String] = Nil,
      quantiles: Seq[Double] = Seq(0.5, 0.95, 0.99)): DataFrame = {
    val wm = events.withWatermark(timeCol, delayThreshold)
    val win = window(col(timeCol), s"$binSeconds seconds")
    val keys: Seq[Column] = win +: groupCols.map(col)
    val agged = wm.groupBy(keys: _*)
      .agg(
        graft.query.QuantileSketch.kllAgg(col(valueCol).cast("double"))
          .as("sketch"),
        count(lit(1)).as("n"))
    val withQs = quantiles.foldLeft(agged) { (d, q) =>
      d.withColumn(s"p${(q * 100).round}",
        graft.query.QuantileSketch.kllQuantile(col("sketch"), lit(q)))
    }
    withQs.select((Seq(col("window.start").as("bin_start"),
      col("window.end").as("bin_end")) ++
      groupCols.map(col) ++
      Seq(col("n"), col("sketch")) ++
      quantiles.map(q => col(s"p${(q * 100).round}"))): _*)
  }

  /** Live distinct counts per tumbling window: one HLL sketch per
    * (window, group) in stream state — the streaming twin of
    * [[graft.query.FieldStats.sketchByGroup]] (lgK matches the
    * reference's 4096-register HLL). Same mergeable contract as
    * [[windowedPercentiles]]: the emitted `sketch` unions into coarser
    * bins via [[graft.query.FieldStats.mergeSketches]] with zero rescan.
    * State per key is one 4 KB sketch regardless of stream cardinality —
    * streaming COUNT(DISTINCT) would hold the full value set.
    */
  def windowedDistinct(events: DataFrame, timeCol: String, field: String,
      binSeconds: Long, delayThreshold: String = "10 minutes",
      groupCols: Seq[String] = Nil): DataFrame = {
    val wm = events.withWatermark(timeCol, delayThreshold)
    val win = window(col(timeCol), s"$binSeconds seconds")
    val keys: Seq[Column] = win +: groupCols.map(col)
    wm.groupBy(keys: _*)
      .agg(
        hll_sketch_agg(col(field).cast("string"),
          lit(graft.query.FieldStats.LgK)).as("sketch"),
        count(lit(1)).as("n"))
      .withColumn("distinct_estimate",
        hll_sketch_estimate(col("sketch")).cast("long"))
      .select((Seq(col("window.start").as("bin_start"),
        col("window.end").as("bin_end")) ++
        groupCols.map(col) ++
        Seq(col("n"), col("sketch"), col("distinct_estimate"))): _*)
  }

  /** Live heavy hitters per tumbling window: one Misra-Gries sketch per
    * (window, group) in stream state — bounded-memory top values where
    * [[topKCounts]]' exact running counters need one counter per DISTINCT
    * group (unbounded for high-cardinality fields like user ids or URLs).
    * Completes the streaming sketch triad next to [[windowedPercentiles]]
    * (KLL) and [[windowedDistinct]] (HLL); the emitted `sketch` unions
    * into coarser bins via
    * [[graft.query.FrequencySketch.mergeTopK]].
    */
  def windowedHeavyHitters(events: DataFrame, timeCol: String,
      field: String, binSeconds: Long,
      delayThreshold: String = "10 minutes",
      groupCols: Seq[String] = Nil): DataFrame = {
    val wm = events.withWatermark(timeCol, delayThreshold)
    val win = window(col(timeCol), s"$binSeconds seconds")
    val keys: Seq[Column] = win +: groupCols.map(col)
    wm.groupBy(keys: _*)
      .agg(
        graft.query.FrequencySketch.freqAgg(col(field).cast("string"))
          .as("sketch"),
        count(lit(1)).as("n"))
      .select((Seq(col("window.start").as("bin_start"),
        col("window.end").as("bin_end")) ++
        groupCols.map(col) ++
        Seq(col("n"), col("sketch"))): _*)
  }

  /** Live APDEX per tumbling window — the streaming twin of
    * [[graft.query.TimeSeries.apdexBy]] with the window as the group:
    * three running counters per (window, group), watermark-bounded
    * state, the same exact doubled-numerator BIGINT score (division-form
    * overflow guard included). Append mode emits each window's final
    * score once when the watermark closes it — the per-window Apdex
    * trend an SLO dashboard plots, incrementally.
    */
  def windowedApdex(events: DataFrame, timeCol: String,
      quantized: Column, thresholdT: Long, binSeconds: Long,
      delayThreshold: String = "10 minutes",
      groupCols: Seq[String] = Nil): DataFrame = {
    require(thresholdT > 0, "thresholdT must be positive")
    val vq = quantized.cast("long")
    val wm = events.withWatermark(timeCol, delayThreshold)
    val win = window(col(timeCol), s"$binSeconds seconds")
    val keys: Seq[Column] = win +: groupCols.map(col)
    wm.groupBy(keys: _*)
      .agg(count(lit(1)).as("total"),
        sum(when(vq <= thresholdT, 1L).otherwise(0L)).as("satisfied"),
        sum(when(vq > thresholdT && vq <= 4L * thresholdT, 1L)
          .otherwise(0L)).as("tolerating"))
      .select((Seq(col("window.start").as("bin_start"),
        col("window.end").as("bin_end")) ++
        groupCols.map(col) ++
        Seq(col("total"), col("satisfied"), col("tolerating"),
          (col("total") - col("satisfied") - col("tolerating"))
            .as("frustrated"),
          when(col("total") <= lit(Long.MaxValue / 2000000L),
            expr("(2 * satisfied + tolerating) * 1000000 div (2 * total)"))
            .otherwise(expr("raise_error('windowedApdex: window count " +
              "overflows the exact micro grid — bin finer')").cast("long"))
            .as("apdex_micro"))): _*)
  }
}

package graft.query

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series operators over event streams: gap-filled histograms, counter
  * rates, and statistical anomaly flags — the standard observability
  * follow-ups to the reference's counts API (its UI zero-fills missing bins
  * client-side; here the engine produces the dense series).
  *
  * Scale design (100 TB):
  *   - [[gapfill]] materializes only `range / bin` grid rows — independent of
  *     input row count; the heavy input is touched once by the aggregation.
  *   - [[rate]] is one window pass partitioned by series key: each series
  *     sorts locally within its hash partition, no global sort.
  *   - [[zscore]] computes per-group moments with map-side partial
  *     aggregation and broadcasts the (tiny) stats frame back — the big
  *     input is scanned twice but never shuffled in full.
  *
  * Float determinism (oracle-proof): every derived statistic is built from
  * exact integer counts/sums with a FIXED IEEE expression tree (each single
  * +,-,*,/ and sqrt is exactly specified by IEEE 754, so any engine that
  * evaluates the same tree over the same operands produces bit-identical
  * doubles). Only multi-term float summation is order-dependent, and none
  * of these operators ever sums raw doubles across rows.
  */
object TimeSeries {

  /** Dense (zero-filled) time-binned counts: every `binMillis`-wide bin
    * between the first and last non-empty bin appears, empty bins with
    * `bin_count = 0`.
    *
    * The grid is generated from one `sequence()` over the min/max bin of the
    * aggregated frame and left-joined back — bounded by the time range, not
    * the data volume. Empty input yields an empty result (null bounds →
    * null sequence → no rows).
    */
  def gapfill(df: DataFrame, timeCol: String, binMillis: Long): DataFrame = {
    val binned = Counts.histogram(df, timeCol, binMillis)
    val grid = binned
      .agg(min(col("bin_start")).as("lo"), max(col("bin_start")).as("hi"))
      .select(explode(sequence(col("lo"), col("hi"),
        make_dt_interval(lit(0), lit(0), lit(0), lit(binMillis / 1000.0))))
        .as("bin_start"))
    grid.join(binned, Seq("bin_start"), "left")
      .select(col("bin_start"),
        coalesce(col("bin_count"), lit(0L)).as("bin_count"))
  }

  /** Per-series counter rate between consecutive samples, with monotonic
    * counter reset handling (value < previous ⇒ the counter restarted, so
    * the delta is the new raw value — the PromQL `rate`/`increase`
    * convention).
    *
    * Output adds `delta` and `rate_per_sec` (null on each series' first
    * sample, and on zero/negative time gaps). One window pass; `tieBreak`
    * makes the order total for equal timestamps.
    */
  def rate(df: DataFrame, seriesCols: Seq[String], timeCol: String,
           valueCol: String, tieBreak: String): DataFrame = {
    val w = Window.partitionBy(seriesCols.map(col): _*)
      .orderBy(col(timeCol).asc, col(tieBreak).asc)
    val us = unix_micros(col(timeCol).cast("timestamp"))
    val prevV = lag(col(valueCol), 1).over(w)
    val dtSec = (us - lag(us, 1).over(w)).cast("double") / lit(1000000.0)
    val delta = when(col(valueCol) < prevV, col(valueCol))
      .otherwise(col(valueCol) - prevV)
    df.withColumn("delta", delta)
      .withColumn("rate_per_sec", when(dtSec > 0.0, col("delta") / dtSec))
  }

  /** TOTAL INCREASE per series from cumulative-counter samples — the
    * PromQL `increase()` roll-up that recovers event counts from the
    * scrape-style counters a metrics pipeline actually ships: per
    * (series) sum of reset-aware deltas. A sample below its predecessor
    * means the counter restarted; the whole new value counts (increments
    * between the last pre-reset scrape and the restart are lost — the
    * standard Prometheus undercount). Each series' FIRST sample counts
    * in full (counters are born at 0), so a series appearing mid-range
    * contributes everything it ever saw — documented to differ from
    * PromQL range queries, which start at the first in-range sample.
    *
    * `quantized` is the caller-gridded BIGINT counter value (exact —
    * BIGINT sums are order-independent, so the result is repartition-
    * invariant). One window pass partitioned by series (local per-series
    * sort inside the hash partition, no global sort) + one hash
    * aggregate. Returns per series: (seriesCols..., n_samples,
    * first_ts, last_ts, increase).
    */
  def increaseBy(df: DataFrame, seriesCols: Seq[String], timeCol: String,
                 quantized: Column, tieBreak: String): DataFrame = {
    val gcols = seriesCols.map(col)
    val w = Window.partitionBy(gcols: _*)
      .orderBy(col(timeCol).asc, col(tieBreak).asc)
    val v = quantized.cast("long")
    val prevV = lag(v, 1).over(w)
    val delta = when(prevV.isNull || (v < prevV), v).otherwise(v - prevV)
    df.withColumn("__d", delta)
      .groupBy(gcols: _*)
      .agg(count(lit(1)).as("n_samples"),
        min(col(timeCol)).as("first_ts"),
        max(col(timeCol)).as("last_ts"),
        sum(col("__d")).as("increase"))
  }

  /** Forward fill (LOCF — last observation carried forward): each row gets
    * the most recent non-null `valueCol` within its series, in
    * (`timeCol`, `tieBreak`) order. One window pass with a rows-frame
    * running `last(ignoreNulls)` — no self-join, no explode.
    */
  def forwardFill(df: DataFrame, seriesCols: Seq[String], timeCol: String,
                  valueCol: String, tieBreak: String,
                  as: String = "filled"): DataFrame = {
    val w = Window.partitionBy(seriesCols.map(col): _*)
      .orderBy(col(timeCol).asc, col(tieBreak).asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn(as, last(col(valueCol), ignoreNulls = true).over(w))
  }

  /** Sliding time-window aggregates per series: for every row, the count
    * and (integer-quantized) sum over the trailing `windowMillis` — a
    * RANGE frame on epoch millis, so gaps in the series are handled
    * exactly (unlike a rows-frame approximation). The quantized sum keeps
    * the aggregate exact: no float addition order to disagree on.
    */
  def rolling(df: DataFrame, seriesCols: Seq[String], timeCol: String,
              quantized: Column, windowMillis: Long): DataFrame = {
    val w = Window.partitionBy(seriesCols.map(col): _*)
      .orderBy(unix_millis(col(timeCol).cast("timestamp")))
      .rangeBetween(-windowMillis, 0)
    df.withColumn("vq", quantized.cast("long"))
      .withColumn("w_count", count(lit(1)).over(w))
      .withColumn("w_sum", sum(col("vq")).over(w))
  }

  /** Per-group z-score outlier flags over an integer-quantized measure.
    *
    * `quantized` must be an integral column (quantize doubles with
    * `floor(x * scale)` — exact BIGINT sums, no fp-order drift). Sample
    * statistics derive from (n, Σv, Σv²) via a fixed expression tree; rows
    * with `|z| > threshold` are flagged.
    */
  def zscore(df: DataFrame, groupCol: String, quantized: Column,
             threshold: Double): DataFrame =
    zscoreBy(df, Seq(groupCol), quantized, threshold)

  /** [[zscore]] against a COMPOSITE baseline key (multiple group
    * columns) — the generalization seasonal baselining needs.
    */
  def zscoreBy(df: DataFrame, groupCols: Seq[String], quantized: Column,
               threshold: Double): DataFrame = {
    val q = df.withColumn("vq", quantized.cast("long"))
    val stats = q.groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("n_"), sum(col("vq")).as("s_"),
        sum(col("vq") * col("vq")).as("ss_"))
    val mean = col("s_").cast("double") / col("n_").cast("double")
    val variance = (col("ss_").cast("double") - col("s_").cast("double") * mean) /
      (col("n_") - 1).cast("double")
    val sd = sqrt(variance)
    // zero variance ⇒ z undefined ⇒ null (and never an anomaly); a plain
    // division would throw DIVIDE_BY_ZERO under ANSI mode
    val z = when(sd =!= 0.0, (col("vq").cast("double") - mean) / sd)
    q.join(broadcast(stats), groupCols)
      .withColumn("z", z)
      .withColumn("is_anomaly", abs(col("z")) > lit(threshold))
  }

  /** ROBUST (median/MAD) anomaly baseline — the spike-resistant twin of
    * [[zscoreBy]]: a handful of outliers inflates mean AND stddev, so a
    * moment-based z-score under-flags exactly when the metric is
    * misbehaving; the median and the median absolute deviation have a
    * 50% breakdown point. `z = (vq − median) / MAD`, in MAD UNITS —
    * no 1.4826 normal-consistency factor, so the arithmetic stays on
    * the exact half/quarter grid (integer-gridded inputs: medians
    * interpolate to multiples of 0.5, MAD to 0.25 — all IEEE-exact and
    * bit-identical across engines); a σ-unit threshold t translates to
    * t·1.4826 MAD units. Zero MAD (≥ half the group identical) ⇒ z
    * null, never an anomaly — the [[zscoreBy]] zero-variance contract.
    *
    * Shape: two keyed aggregates (median, then MAD over the deviations)
    * + two broadcast joins of the tiny group-stats frames. Spark's
    * exact percentile buffers per-group DISTINCT-value counts — bounded
    * for gridded metrics (the quantize-first house convention), which
    * is what keeps the exact median viable at 100 TB.
    */
  def robustZscoreBy(df: DataFrame, groupCols: Seq[String],
                     quantized: Column, threshold: Double): DataFrame = {
    val q = df.withColumn("vq", quantized.cast("long"))
    val meds = q.groupBy(groupCols.map(col): _*)
      .agg(median(col("vq")).as("med_"))
    val dev = q.join(broadcast(meds), groupCols)
      .withColumn("adev", abs(col("vq").cast("double") - col("med_")))
    val mads = dev.groupBy(groupCols.map(col): _*)
      .agg(median(col("adev")).as("mad_"))
    val z = when(col("mad_") =!= 0.0,
      (col("vq").cast("double") - col("med_")) / col("mad_"))
    dev.join(broadcast(mads), groupCols)
      .withColumn("z", z)
      .withColumn("is_anomaly", abs(col("z")) > lit(threshold))
      .drop("adev")
  }

  /** SEASONALITY-AWARE anomaly flags — the observability staple: a value
    * is anomalous relative to its OWN recurring time slot's baseline
    * ("is this normal for 3 am?"), not the global mean. The season key
    * is hour-of-day (0–23); the baseline is the per-(group, season)
    * z-score over the same exact integer moments as [[zscore]]. A
    * diurnal load pattern that trips a global z-score all evening is
    * flat under its per-hour baseline, while a genuine 3 am spike
    * stands out harder. One hash aggregate over (group, season) — 24×
    * the stats rows, the same single shuffle.
    */
  def seasonalZscore(df: DataFrame, groupCol: String, tsCol: String,
                     quantized: Column, threshold: Double): DataFrame =
    zscoreBy(df.withColumn("season", hour(col(tsCol)).cast("long")),
      Seq(groupCol, "season"), quantized, threshold)

  /** [[robustZscoreBy]] against the per-(group, hour-of-day) baseline —
    * [[seasonalZscore]]'s spike-resistant twin: "is this normal for
    * 3 am?" where even the 3 am history itself may contain bursts.
    * Same 24× stats rows, same two keyed aggregates.
    */
  def seasonalRobustZscore(df: DataFrame, groupCol: String, tsCol: String,
                           quantized: Column,
                           threshold: Double): DataFrame =
    robustZscoreBy(df.withColumn("season", hour(col(tsCol)).cast("long")),
      Seq(groupCol, "season"), quantized, threshold)

  /** CUSUM CHANGEPOINT scores per series — the sustained-shift detector
    * the z-score family can't be (Page 1954): a z-score flags one big
    * bin, CUSUM accumulates many small deviations until a LEVEL SHIFT
    * (error rate quietly doubled, latency drifted up 10%) crosses the
    * decision threshold. Per (group, `binMillis` bin): x = Σ `measure`
    * (integer-gridded, quantize-first convention), target μ = the
    * series' own mean bin (`total div n_bins` — floored, exact), slack
    * κ = `slack`, and the classic recursions
    *
    *   s⁺_t = max(0, s⁺_{t−1} + x_t − μ − κ)   (upward shift)
    *   s⁻_t = max(0, s⁻_{t−1} − x_t + μ − κ)   (downward shift)
    *
    * computed WITHOUT recursion through the prefix-sum identity
    * `s_t = S_t − min(0, min_{j≤t} S_j)` (S = running sum of the
    * deviations) — two built-in cumulative windows per side, both
    * PARTITIONED by group, all BIGINT-exact, so the distributed plan is
    * sort-once-per-series + codegen'd running aggregates and the oracle
    * mirrors it with the same window functions. Alarm when a score
    * exceeds `decision` (h). Missing bins are simply absent (gapfill
    * upstream to charge empty bins against the target). Input bins are
    * bounded by time range / binMillis per series — the Alerts.scala
    * bounded-timeline argument. Returns per (group, bin):
    * (groupCol, bin_start, x, s_pos, s_neg, is_shift).
    */
  /** APDEX score per group — the industry-standard user-satisfaction
    * roll-up over a latency-like measure: satisfied (`vq ≤ T`),
    * tolerating (`T < vq ≤ 4T`), frustrated (rest);
    * `apdex = (satisfied + tolerating/2) / total`, emitted exactly as
    * `(2·satisfied + tolerating)·10⁶ div (2·total)` — one conditional-
    * sum hash aggregate, BIGINT end to end (the half stays exact under
    * the doubled numerator/denominator). Pre-bin `tsCol` into a group
    * column for the per-window trend. Returns
    * (groupCols…, total, satisfied, tolerating, frustrated,
    * apdex_micro); an empty group can't occur (groups come from rows),
    * so the division is always defined.
    */
  def apdexBy(df: DataFrame, groupCols: Seq[String], quantized: Column,
              thresholdT: Long): DataFrame = {
    require(thresholdT > 0, "thresholdT must be positive")
    val vq = quantized.cast("long")
    df.groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("total"),
        sum(when(vq <= thresholdT, 1L).otherwise(0L)).as("satisfied"),
        sum(when(vq > thresholdT && vq <= 4L * thresholdT, 1L)
          .otherwise(0L)).as("tolerating"))
      .withColumn("frustrated",
        col("total") - col("satisfied") - col("tolerating"))
      .withColumn("apdex_micro",
        // division-form overflow guard (aucGuardOk precedent): the
        // numerator is ≤ 2·total·10⁶
        when(col("total") <= lit(Long.MaxValue / 2000000L),
          expr("(2 * satisfied + tolerating) * 1000000 div (2 * total)"))
          .otherwise(expr("raise_error('apdexBy: group count overflows " +
            "the exact micro grid — bin the series finer')").cast("long")))
  }

  def cusumBy(df: DataFrame, groupCol: String, tsCol: String,
              binMillis: Long, measure: Column, slack: Long,
              decision: Long): DataFrame =
    cusumOverBins(binTable(df, groupCol, tsCol, binMillis, measure),
      groupCol, slack, decision)

  /** The (group, bin-start-millis, summed measure) table [[cusumBy]]
    * scores — exposed so the streaming twin can maintain it
    * incrementally (`StreamOps.cusumStream`'s generation ledger) and
    * re-score with the identical plan.
    */
  def binTable(df: DataFrame, groupCol: String, tsCol: String,
               binMillis: Long, measure: Column): DataFrame = {
    require(binMillis > 0, "binMillis must be positive")
    df.withColumn("__bin",
        (floor(unix_millis(col(tsCol).cast("timestamp")) / lit(binMillis)) *
          lit(binMillis)).cast("long"))
      .groupBy(col(groupCol), col("__bin"))
      .agg(coalesce(sum(measure.cast("long")), lit(0L)).as("x"))
  }

  /** CUSUM scores over a pre-binned `(groupCol, __bin, x)` table — the
    * scoring half of [[cusumBy]] (see its doc for the identity and the
    * scale argument).
    */
  /** EWMA CONTROL CHART (limited-memory) per series — the smoothed
    * baseline between the z-score family (single-bin) and CUSUM
    * (sustained shift): per (group, bin) the exponentially weighted
    * mean of the k PREVIOUS bins, `Σ λ(1−λ)^j · x_{t−1−j}` normalized
    * by the weights actually present (short histories stay unbiased),
    * and a spike flag `x > (num/den) · baseline`.
    *
    * Determinism: the k weights are DRIVER-computed with a fixed
    * multiplication order and embedded as double literals (the Ln2
    * convention — no pow in the plan); the weighted sum is a fixed
    * left-associative IEEE tree over the lag chain, the baseline floors
    * to the micro grid, and the spike compare is pure BIGINT
    * (`x·10⁶·den > num·baseline_micro`, division-form overflow guard).
    * Truncation at k lags is the standard limited-memory EWMA; weights
    * beyond k are < λ(1−λ)^k of the signal. One window pass partitioned
    * by series over the BIN table (never event-sized rows). Returns
    * (groupCol, bin_start, x, ewma_prev_micro — null on each series'
    * first bin, is_spike).
    */
  def ewmaBy(df: DataFrame, groupCol: String, tsCol: String,
             binMillis: Long, measure: Column, lambda: Double = 0.25,
             k: Int = 8, spikeNum: Long = 2L,
             spikeDen: Long = 1L): DataFrame =
    ewmaOverBins(binTable(df, groupCol, tsCol, binMillis, measure),
      groupCol, lambda, k, spikeNum, spikeDen)

  /** [[ewmaBy]]'s scoring half over an existing `(groupCol, __bin, x)`
    * bin table — shared by the batch operator and the streaming twin
    * ([[graft.streaming.StreamOps.ewmaStream]]) so both run ONE plan.
    */
  def ewmaOverBins(binned: DataFrame, groupCol: String,
                   lambda: Double = 0.25, k: Int = 8,
                   spikeNum: Long = 2L, spikeDen: Long = 1L): DataFrame = {
    require(lambda > 0.0 && lambda < 1.0, "lambda must be in (0, 1)")
    require(k >= 1 && spikeNum > 0 && spikeDen > 0,
      "need k >= 1 and a positive spike ratio")
    val weights = new Array[Double](k)
    var decay = 1.0
    var j = 0
    while (j < k) {
      weights(j) = lambda * decay
      decay = decay * (1.0 - lambda)
      j += 1
    }
    val g = col(groupCol)
    val w = Window.partitionBy(g).orderBy(col("__bin"))
    def lagX(j: Int) = lag(col("x"), j + 1).over(w)
    val num = (0 until k).map(j =>
      when(lagX(j).isNotNull, lit(weights(j)) * lagX(j).cast("double"))
        .otherwise(lit(0.0))).reduce(_ + _)
    val den = (0 until k).map(j =>
      when(lagX(j).isNotNull, lit(weights(j))).otherwise(lit(0.0)))
      .reduce(_ + _)
    binned
      .withColumn("__num", num)
      .withColumn("__den", den)
      .withColumn("ewma_prev_micro",
        when(col("__den") > 0.0,
          floor(col("__num") / col("__den") * lit(1000000.0))
            .cast("long")))
      // x is validated on EVERY row (a series' FIRST bin included —
      // its value feeds later rows' baselines, so it cannot skip the
      // cap just because its own baseline is null), and BOTH sides of
      // the compare are guarded: |x|·10⁶·den on the left,
      // num·|baseline| on the right. |x| ≤ cap also bounds the floored
      // baseline itself (a convex combination of past x) to ±cap·10⁶,
      // so the double→long cast above can never saturate silently.
      .withColumn("is_spike",
        when(abs(col("x")) > lit(Long.MaxValue / 1000000L / spikeDen),
          expr("raise_error('ewmaBy: bin measure overflows the exact " +
            "spike compare — rescale the measure grid')")
            .cast("boolean"))
        .when(col("ewma_prev_micro").isNull, lit(false))
        .when(abs(col("ewma_prev_micro")) > lit(Long.MaxValue / spikeNum),
          expr("raise_error('ewmaBy: baseline overflows the exact " +
            "spike compare — rescale the measure grid')")
            .cast("boolean"))
        .otherwise(col("x") * lit(1000000L) * lit(spikeDen) >
          lit(spikeNum) * col("ewma_prev_micro")))
      .select(g,
        timestamp_millis(col("__bin")).cast("timestamp_ntz")
          .as("bin_start"),
        col("x"), col("ewma_prev_micro"), col("is_spike"))
  }

  def cusumOverBins(binned: DataFrame, groupCol: String, slack: Long,
                    decision: Long): DataFrame = {
    require(slack >= 0 && decision > 0,
      "need slack >= 0, decision > 0")
    val g = col(groupCol)
    // the per-series target rides the SAME partition the cumulative
    // windows need: a whole-partition window (no orderBy → full frame)
    // computes Σx and the bin count per group, so the plan is ONE scan
    // → ONE exchange on the group key → windows — no second corpus
    // scan and no join for the μ side (the r16 plan audit caught the
    // join form re-scanning the source twice)
    val wg = org.apache.spark.sql.expressions.Window.partitionBy(g)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(g).orderBy(col("__bin"))
    val cum = w.rowsBetween(
      org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    binned
      .withColumn("__tot", sum(col("x")).over(wg))
      .withColumn("__nb", count(lit(1)).over(wg))
      .withColumn("mu_", expr("__tot div __nb"))
      .withColumn("__sp", sum(col("x") - col("mu_") - lit(slack)).over(cum))
      .withColumn("__sn", sum(col("mu_") - col("x") - lit(slack)).over(cum))
      .withColumn("s_pos",
        col("__sp") - least(lit(0L), min(col("__sp")).over(cum)))
      .withColumn("s_neg",
        col("__sn") - least(lit(0L), min(col("__sn")).over(cum)))
      .select(g,
        timestamp_millis(col("__bin")).cast("timestamp_ntz").as("bin_start"),
        col("x"), col("s_pos"), col("s_neg"),
        (col("s_pos") > lit(decision) || col("s_neg") > lit(decision))
          .as("is_shift"))
  }
}

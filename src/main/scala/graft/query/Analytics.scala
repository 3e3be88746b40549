package graft.query

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Product-analytics operators over event streams: ordered funnels and
  * cohort retention — the two standard roll-ups a log store is asked for
  * once events carry user ids.
  *
  * Scale design (100 TB): both operators reduce the raw event stream to
  * per-user aggregates FIRST (shuffle key = user, map-side partial
  * aggregation), then join per-user frames — each join input is bounded by
  * the user count, not the event count. No collect_list of raw events, no
  * window over the full stream.
  */
object Analytics {

  /** Ordered funnel: per-user first-completion time of each step, where
    * step k must happen strictly after step k-1. Users appear iff they
    * completed the whole funnel; columns are `t_1 .. t_n` in step order.
    *
    * Cascade of filtered min-aggregations: step k's candidate events join
    * the (user, t_{k-1}) frame and keep `ts > t_{k-1}`. Each round shuffles
    * only the step's filtered events plus a users-sized frame.
    */
  def funnel(events: DataFrame, userCol: String, tsCol: String,
             steps: Seq[Column]): DataFrame = {
    require(steps.nonEmpty)
    val u = col(userCol)
    val first = events.filter(steps.head)
      .groupBy(u).agg(min(col(tsCol)).as("t_1"))
    steps.tail.zipWithIndex.foldLeft(first) { case (acc, (cond, i)) =>
      val k = i + 2
      events.filter(cond)
        .join(acc, userCol)
        .filter(col(tsCol) > col(s"t_${k - 1}"))
        .groupBy(u +: (1 until k).map(j => col(s"t_$j")): _*)
        .agg(min(col(tsCol)).as(s"t_$k"))
    }
  }

  /** Per-step completion counts for the funnel (step 1 count ≥ step 2 ≥ …):
    * `(step, users)` — the conversion chart. Each level's per-user frame
    * extends the previous one (the same cascade [[funnel]] runs), so the
    * event stream is aggregated once per step, not once per prefix.
    */
  def funnelCounts(events: DataFrame, userCol: String, tsCol: String,
                   steps: Seq[Column]): DataFrame = {
    val u = col(userCol)
    var level = events.filter(steps.head)
      .groupBy(u).agg(min(col(tsCol)).as("t_1"))
    val frames = Seq.newBuilder[DataFrame]
    frames += level.agg(count(lit(1)).as("users"))
      .select(lit(1L).as("step"), col("users"))
    steps.tail.zipWithIndex.foreach { case (cond, i) =>
      val k = i + 2
      level = events.filter(cond)
        .join(level, userCol)
        .filter(col(tsCol) > col(s"t_${k - 1}"))
        .groupBy(u +: (1 until k).map(j => col(s"t_$j")): _*)
        .agg(min(col(tsCol)).as(s"t_$k"))
      frames += level.agg(count(lit(1)).as("users"))
        .select(lit(k.toLong).as("step"), col("users"))
    }
    frames.result().reduce(_.unionAll(_))
  }

  /** TIME-BOUNDED FUNNEL — [[funnel]] with a per-transition conversion
    * window: step k counts only if it happens within `maxGapMillis` of
    * the user's step-(k−1) time ("purchased within 24 h of clicking").
    * Unbounded funnels over long retention windows credit conversions
    * that had nothing to do with the session; the gap cap is how
    * product analytics actually defines conversion. Same cascade shape
    * (one filtered min-aggregation per step, each level joining the
    * previous per-user frame), so the event stream is scanned once per
    * step and never carried whole.
    */
  def funnelWithin(events: DataFrame, userCol: String, tsCol: String,
                   steps: Seq[Column], maxGapMillis: Long): DataFrame = {
    require(steps.nonEmpty && maxGapMillis > 0,
      "need steps and a positive gap")
    val u = col(userCol)
    val first = events.filter(steps.head)
      .groupBy(u).agg(min(col(tsCol)).as("t_1"))
    steps.tail.zipWithIndex.foldLeft(first) { case (acc, (cond, i)) =>
      val k = i + 2
      val prevMs = unix_millis(col(s"t_${k - 1}").cast("timestamp"))
      val curMs = unix_millis(col(tsCol).cast("timestamp"))
      events.filter(cond)
        .join(acc, userCol)
        .filter(col(tsCol) > col(s"t_${k - 1}") &&
          curMs <= prevMs + lit(maxGapMillis))
        .groupBy(u +: (1 until k).map(j => col(s"t_$j")): _*)
        .agg(min(col(tsCol)).as(s"t_$k"))
    }
  }

  /** FUNNEL TIMING — time-to-convert for each funnel transition over the
    * FULLY-converted cohort ([[funnel]]'s output: one row per user who
    * completed every step, with the first-completion time of each):
    * per transition k−1→k the user count and exact BIGINT millisecond
    * stats (min/max/sum, truncating mean). Medians/percentiles go
    * through [[Percentiles.histogramQuantile]] over a bucketed duration
    * histogram (the scale path — an exact median would collect each
    * step's durations into one executor).
    *
    * Shape: the funnel cascade, then ONE hash aggregate over the melted
    * (step, duration) rows — K−1 rows per converted user, never
    * event-stream-sized. Returns (step, n_users, min_ms, max_ms,
    * sum_ms, avg_ms) for steps 2..K.
    */
  def funnelTiming(events: DataFrame, userCol: String, tsCol: String,
                   steps: Seq[Column]): DataFrame = {
    require(steps.size >= 2, "funnelTiming needs at least two steps")
    val full = funnel(events, userCol, tsCol, steps)
    val trans = (2 to steps.size).map { i =>
      struct(lit(i.toLong).as("step"),
        (unix_millis(col(s"t_$i").cast("timestamp")) -
          unix_millis(col(s"t_${i - 1}").cast("timestamp"))).as("d_ms"))
    }
    full.select(explode(array(trans: _*)).as("x"))
      .select(col("x.step").as("step"), col("x.d_ms").as("d_ms"))
      .groupBy(col("step"))
      .agg(count(lit(1)).as("n_users"),
        min(col("d_ms")).as("min_ms"),
        max(col("d_ms")).as("max_ms"),
        sum(col("d_ms")).as("sum_ms"))
      .withColumn("avg_ms", expr("sum_ms div n_users"))
  }

  /** Pearson correlation per group from exact integer moments: both
    * measures must be integral (quantize doubles with `floor(x·scale)`),
    * so (n, Σx, Σy, Σx², Σy², Σxy) are exact BIGINTs and the final
    * correlation derives through a fixed IEEE expression tree — engines
    * agree to the last bit, unlike built-in `corr` whose running float
    * accumulation is order-dependent.
    */
  /** DIMENSION SHIFT (contribution analysis): an incident window is
    * anomalous — WHICH dimension value drove it? Compare the window's
    * composition against the baseline (every row outside the window):
    * per dimension value its window/baseline counts, micro shares,
    * the share SHIFT (window − baseline, signed), and the share LIFT
    * (window share / baseline share on the micro grid; null for values
    * that only appear inside the window — the "new offender" case a
    * ratio can't express). The triage readout behind "errors spiked at
    * 14:00 — which service/region/tenant changed?".
    *
    * Shape: ONE pass — a single hash aggregate with conditional sums
    * per dimension value (never two scans of the event stream), plus a
    * broadcast of the 1-row totals frame (the corpus-constant
    * single-row pattern, q_corpus_report precedent). Integer-exact:
    * shares/lift as BIGINT micro divisions. Returns
    * (dimCol, n_win, n_base, share_win_micro, share_base_micro,
    * shift_micro, lift_micro).
    */
  def dimensionShift(df: DataFrame, dimCol: String, tsCol: String,
                     winStart: String, winEnd: String): DataFrame =
    dimensionShiftBy(df, dimCol, tsCol, winStart, winEnd, lit(1L))

  /** `floor(10⁶·n/t)` share with a DIVISION-FORM overflow guard
    * ([[graft.ml.Eval]]'s aucGuardOk precedent — the product form
    * itself wraps and can then PASS): a summed weight above
    * Long.MaxValue/10⁶ (~9.2·10¹², reachable for byte-weighted
    * measures at 100 TB) raises loudly instead of wrapping into
    * garbage shares. 0 when the side's total is empty.
    */
  private def shareMicro(nCol: String, tCol: String): Column =
    when(col(tCol) > 0,
      when(col(nCol) <= lit(Long.MaxValue / 1000000L),
        expr(s"$nCol * 1000000 div $tCol"))
        .otherwise(expr("raise_error('dimension shift: summed measure " +
          "overflows the exact micro grid — rescale the weight " +
          "(quantize coarser) or narrow the slice')").cast("long")))
      .otherwise(lit(0L))

  /** [[dimensionShift]] over a MEASURE instead of row counts — "which
    * service drove the latency-SECONDS", "which tenant drove the
    * bytes": `weight` is a non-negative integer-gridded column
    * (quantize-first convention; negative weights would make shares
    * meaningless), summed per (dimension, window-side) in the same
    * single pass. n_win/n_base are the summed weights.
    */
  def dimensionShiftBy(df: DataFrame, dimCol: String, tsCol: String,
                       winStart: String, winEnd: String,
                       weight: Column): DataFrame = {
    val inWin = col(tsCol) >= lit(winStart).cast("timestamp") &&
      col(tsCol) < lit(winEnd).cast("timestamp")
    val w = weight.cast("long")
    // min(w) rides the same single aggregate pass: a negative weight
    // makes shares meaningless (documented contract), so it raises
    // loudly instead of flowing through as a silently-negative share.
    val per = df.groupBy(col(dimCol))
      .agg(coalesce(sum(when(inWin, w).otherwise(0L)), lit(0L)).as("n_win"),
        coalesce(sum(when(!inWin, w).otherwise(0L)), lit(0L)).as("n_base"),
        min(w).as("__min_w"))
    val tot = per.agg(coalesce(sum(col("n_win")), lit(0L)).as("t_win"),
      coalesce(sum(col("n_base")), lit(0L)).as("t_base"))
    per.crossJoin(broadcast(tot))
      .withColumn("share_win_micro",
        when(col("__min_w") < 0, expr("raise_error('dimensionShiftBy: " +
          "negative weight — the measure must be non-negative on the " +
          "integer grid (shares are meaningless otherwise)')").cast("long"))
          .otherwise(shareMicro("n_win", "t_win")))
      .withColumn("share_base_micro",
        shareMicro("n_base", "t_base"))
      .select(col(dimCol), col("n_win"), col("n_base"),
        col("share_win_micro"), col("share_base_micro"),
        (col("share_win_micro") - col("share_base_micro"))
          .as("shift_micro"),
        when(col("share_base_micro") > 0,
          expr("share_win_micro * 1000000 div share_base_micro"))
          .as("lift_micro"))
  }

  /** [[dimensionShift]] across SEVERAL dimension columns in ONE data
    * pass — the full triage panel ("rank service, region, tenant, …
    * by how much their composition moved"): each row melts into
    * |dims| (dim, value) rows (values stringified), one hash aggregate
    * counts per (dim, value, side), and the per-DIM totals come back
    * via a broadcast EQUI-join on the |dims|-row totals frame (no
    * nested-loop shape at all). Shares within each dim sum to 10⁶ (up
    * to flooring). Returns (dim, value, n_win, n_base,
    * share_win_micro, share_base_micro, shift_micro, lift_micro).
    */
  def dimensionShiftMulti(df: DataFrame, dims: Seq[String], tsCol: String,
                          winStart: String, winEnd: String): DataFrame = {
    require(dims.nonEmpty, "at least one dimension column")
    val inWin = col(tsCol) >= lit(winStart).cast("timestamp") &&
      col(tsCol) < lit(winEnd).cast("timestamp")
    val melted = df.select(inWin.as("__w"),
        explode(array(dims.map(d =>
          struct(lit(d).as("dim"), col(d).cast("string").as("value"))): _*))
          .as("__dv"))
      .select(col("__dv.dim").as("dim"), col("__dv.value").as("value"),
        col("__w"))
    val per = melted.groupBy(col("dim"), col("value"))
      .agg(sum(when(col("__w"), 1L).otherwise(0L)).as("n_win"),
        sum(when(!col("__w"), 1L).otherwise(0L)).as("n_base"))
    val tot = per.groupBy(col("dim"))
      .agg(sum(col("n_win")).as("t_win"), sum(col("n_base")).as("t_base"))
    per.join(broadcast(tot), Seq("dim"))
      .withColumn("share_win_micro", shareMicro("n_win", "t_win"))
      .withColumn("share_base_micro", shareMicro("n_base", "t_base"))
      .select(col("dim"), col("value"), col("n_win"), col("n_base"),
        col("share_win_micro"), col("share_base_micro"),
        (col("share_win_micro") - col("share_base_micro"))
          .as("shift_micro"),
        when(col("share_base_micro") > 0,
          expr("share_win_micro * 1000000 div share_base_micro"))
          .as("lift_micro"))
  }

  def corrByGroup(df: DataFrame, groupCol: String, xQuantized: Column,
                  yQuantized: Column): DataFrame = {
    val q = df.select(col(groupCol), xQuantized.cast("long").as("x"),
      yQuantized.cast("long").as("y"))
    val m = q.groupBy(col(groupCol)).agg(
      count(lit(1)).as("n"), sum(col("x")).as("sx"), sum(col("y")).as("sy"),
      sum(col("x") * col("x")).as("sxx"), sum(col("y") * col("y")).as("syy"),
      sum(col("x") * col("y")).as("sxy"))
    val n = col("n").cast("double")
    val cov = n * col("sxy").cast("double") -
      col("sx").cast("double") * col("sy").cast("double")
    val vx = sqrt(n * col("sxx").cast("double") -
      col("sx").cast("double") * col("sx").cast("double"))
    val vy = sqrt(n * col("syy").cast("double") -
      col("sy").cast("double") * col("sy").cast("double"))
    // zero variance ⇒ correlation undefined ⇒ null (ANSI-safe: a plain
    // division would throw DIVIDE_BY_ZERO under ansi.enabled)
    m.select(col(groupCol),
      when(vx * vy =!= 0.0, cov / (vx * vy)).as("corr_xy"))
  }

  /** Cohort retention: users bucketed by the week of their first
    * `cohortCond` event, counted distinct per (cohort week, whole weeks
    * since cohort start) over their later activity.
    */
  def cohortRetention(events: DataFrame, userCol: String, tsCol: String,
                      cohortCond: Column): DataFrame = {
    val weekMs = 7L * 86400L * 1000L
    val su = events.filter(cohortCond)
      .groupBy(col(userCol)).agg(min(col(tsCol)).as("t0"))
      .withColumn("cohort_week", date_trunc("week", col("t0")).cast("timestamp_ntz"))
    events.join(su, userCol)
      .filter(col(tsCol) >= col("t0"))
      .withColumn("week_offset",
        ((unix_millis(col(tsCol).cast("timestamp")) -
          unix_millis(col("cohort_week").cast("timestamp"))) / weekMs)
          .cast("long"))
      .groupBy(col("cohort_week"), col("week_offset"))
      .agg(countDistinct(col(userCol)).as("active_users"))
  }

  /** PATH TRANSITIONS (the Sankey / "what do users do next" readout):
    * per user, events ordered by `(ts, idCol)` (the id tie-break makes
    * the sequence deterministic when timestamps collide) yield
    * consecutive `(src, dst)` event-type pairs; a pair only counts when
    * the step gap is ≤ `maxGapMillis` (a session-style break — the
    * overnight "purchase → login" edge is noise, not a path). Returns
    * the `topK` heaviest edges: (src, dst, n, rk), ordered by
    * (n DESC, src, dst) with a deterministic tie-break.
    *
    * Shape: one window PARTITIONED by user (keyed exchange — never the
    * whole stream in one partition), one hash aggregate over
    * (src, dst) — at most |event types|² rows, map-side combined — and
    * a TakeOrdered top-k ([[graft.operators.TopK.rankedLimit]], no
    * global sort). At 100 TB the only full-data shuffle is the per-user
    * window, the same exchange sessionization already pays.
    */
  def pathTransitions(events: DataFrame, userCol: String, tsCol: String,
      typeCol: String, idCol: String,
      maxGapMillis: Long = Long.MaxValue, topK: Int = 20): DataFrame = {
    require(topK > 0 && maxGapMillis > 0,
      "topK and maxGapMillis must be positive")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(userCol)).orderBy(col(tsCol).asc, col(idCol).asc)
    val edges = events
      .select(col(userCol), col(tsCol), col(idCol),
        col(typeCol).as("src"))
      .withColumn("dst", lead(col("src"), 1).over(w))
      .withColumn("gap_ms",
        lead(unix_millis(col(tsCol).cast("timestamp")), 1).over(w) -
          unix_millis(col(tsCol).cast("timestamp")))
      .filter(col("dst").isNotNull && col("gap_ms") <= maxGapMillis)
      .groupBy(col("src"), col("dst"))
      .agg(count(lit(1)).as("n"))
    graft.operators.TopK.rankedLimit(edges,
      Seq(col("n").desc, col("src").asc, col("dst").asc), topK)
  }
}

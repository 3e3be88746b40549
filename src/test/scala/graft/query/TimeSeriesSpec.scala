package graft.query

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.SparkSuite

class TimeSeriesSpec extends SparkSuite {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("gapfill densifies missing bins with zero counts") {
    val df = Seq(
      (1L, ts("2024-01-01 00:10:00")),
      (2L, ts("2024-01-01 00:50:00")),
      (3L, ts("2024-01-01 03:05:00"))) // hours 1 and 2 empty
      .toDF("id", "ts")
    val out = TimeSeries.gapfill(df, "ts", 3600L * 1000)
      .orderBy("bin_start").collect()
    assert(out.length == 4) // 00:00 .. 03:00
    assert(out.map(_.getLong(1)).toSeq == Seq(2L, 0L, 0L, 1L))
  }

  test("gapfill on empty input returns no rows") {
    val df = Seq.empty[(Long, Timestamp)].toDF("id", "ts")
    assert(TimeSeries.gapfill(df, "ts", 60000L).collect().isEmpty)
  }

  test("rate handles deltas, counter resets, and first-sample nulls") {
    val df = Seq(
      ("a", 1L, ts("2024-01-01 00:00:00"), 10.0),
      ("a", 2L, ts("2024-01-01 00:00:10"), 25.0), // +15 over 10 s
      ("a", 3L, ts("2024-01-01 00:00:20"), 5.0),  // reset: delta = 5
      ("b", 4L, ts("2024-01-01 00:00:00"), 7.0))
      .toDF("series", "id", "ts", "v")
    val out = TimeSeries.rate(df, Seq("series"), "ts", "v", "id")
      .orderBy("series", "id").collect()
    assert(out(0).isNullAt(4) && out(0).isNullAt(5)) // first of series a
    assert(out(1).getDouble(4) == 15.0 && out(1).getDouble(5) == 1.5)
    assert(out(2).getDouble(4) == 5.0 && out(2).getDouble(5) == 0.5)
    assert(out(3).isNullAt(4)) // only sample of series b
  }

  test("forwardFill carries the last non-null value, null before any") {
    val df = Seq(
      ("a", 1L, ts("2024-01-01 00:00:00"), None: Option[Double]),
      ("a", 2L, ts("2024-01-01 00:01:00"), Some(5.0)),
      ("a", 3L, ts("2024-01-01 00:02:00"), None),
      ("a", 4L, ts("2024-01-01 00:03:00"), Some(9.0)),
      ("a", 5L, ts("2024-01-01 00:04:00"), None))
      .toDF("series", "id", "ts", "v")
    val out = TimeSeries.forwardFill(df, Seq("series"), "ts", "v", "id")
      .orderBy("id").collect()
    assert(out(0).isNullAt(4))
    assert(Seq(1, 2, 3, 4).map(out(_).getDouble(4)) == Seq(5.0, 5.0, 9.0, 9.0))
  }

  test("rolling RANGE frame counts exactly the trailing window") {
    val df = Seq(
      ("a", ts("2024-01-01 00:00:00"), 1.0),
      ("a", ts("2024-01-01 00:30:00"), 2.0),
      ("a", ts("2024-01-01 01:15:00"), 4.0), // 00:00 row is outside 1 h now
      ("b", ts("2024-01-01 00:00:00"), 8.0))
      .toDF("series", "ts", "v")
    val out = TimeSeries.rolling(df, Seq("series"), "ts",
        floor(col("v")).cast("long"), 3600L * 1000)
      .orderBy("series", "ts").collect()
      .map(r => (r.getAs[Long]("w_count"), r.getAs[Long]("w_sum")))
    assert(out.toSeq == Seq((1L, 1L), (2L, 3L), (2L, 6L), (1L, 8L)))
  }

  test("zscore flags the outlier and derives exact moments") {
    // group g: nine 10s and one 100 — the 100 is the outlier
    val df = ((1 to 9).map(i => (i.toLong, "g", 10.0)) :+ (10L, "g", 100.0))
      .toDF("id", "grp", "v")
    val out = TimeSeries.zscore(df, "grp", floor(col("v")).cast("long"), 2.0)
      .filter(col("is_anomaly")).collect()
    assert(out.map(_.getAs[Long]("id")).toSeq == Seq(10L))
    // z of the outlier: mean 19, var = (9*81 + 81*81)/9 = 810, sd = 28.46
    val z = out.head.getAs[Double]("z")
    assert(math.abs(z - (100.0 - 19.0) / math.sqrt(810.0)) < 1e-12)
  }

  test("robustZscoreBy: outliers cannot hide themselves; moment z " +
      "under-flags on the same data") {
    // 8 calm values {9,9,10,10,10,10,11,11} + spikes {200,210,190}:
    // 11 values, median = 10, MAD = 1. The spikes inflate the MOMENT
    // baseline (mean ~62.7, sd ~88) so their own moment-z is ~1.5-1.7
    // — invisible at 2.0; the robust z is 180/190/200 MAD units.
    val base = Seq(9.0, 9.0, 10.0, 10.0, 10.0, 10.0, 11.0, 11.0)
    val rows = base.zipWithIndex.map { case (v, i) => (i.toLong, "g", v) } ++
      Seq((90L, "g", 200.0), (91L, "g", 210.0), (92L, "g", 190.0))
    val df = rows.toDF("id", "grp", "v")
    val robust = TimeSeries.robustZscoreBy(df, Seq("grp"),
        floor(col("v")).cast("long"), threshold = 3.5)
      .filter(col("is_anomaly")).collect()
    assert(robust.map(_.getAs[Long]("id")).toSeq.sorted ==
      Seq(90L, 91L, 92L))
    // median 10, MAD 1 → z of the 200 = 190 exactly (MAD units)
    val z200 = robust.find(_.getAs[Long]("id") == 90L).get.getAs[Double]("z")
    assert(z200 == 190.0)
    // the moment z-score on the same data flags NOTHING at 2.0 — the
    // spikes inflate their own baseline (the robust motivation)
    val moment = TimeSeries.zscoreBy(df, Seq("grp"),
        floor(col("v")).cast("long"), threshold = 2.0)
      .filter(col("is_anomaly")).count()
    assert(moment == 0L)
    // zero-MAD group: constant values → z null, never anomalous
    val const = Seq((0L, "c", 5.0), (1L, "c", 5.0), (2L, "c", 5.0),
      (3L, "c", 99.0)).toDF("id", "grp", "v")
    val cz = TimeSeries.robustZscoreBy(const, Seq("grp"),
      floor(col("v")).cast("long"), 3.5).collect()
    assert(cz.forall(r => r.isNullAt(r.fieldIndex("z"))))
    // even-count interpolation: {1,2} → median 1.5, adevs {.5,.5} →
    // MAD .5 → z = ±1 exactly (the half/quarter-grid exactness)
    val ev = Seq((0L, "e", 1.0), (1L, "e", 2.0)).toDF("id", "grp", "v")
    val ezs = TimeSeries.robustZscoreBy(ev, Seq("grp"),
        floor(col("v")).cast("long"), 9.9)
      .collect().map(_.getAs[Double]("z")).sorted
    assert(ezs.toSeq == Seq(-1.0, 1.0))
  }

  test("seasonalZscore baselines per (group, hour-of-day)") {
    // hour 3 runs hot every day (100s); one 100 at hour 12 among 10s.
    // A global z-score would flag every hour-3 row; the seasonal one
    // flags ONLY the hour-12 outlier.
    val rows =
      (1 to 8).map(i => (i.toLong, s"2024-01-0$i 03:00:00", 100.0)) ++
      (11 to 18).map(i => (i.toLong, s"2024-01-0${i - 10} 12:00:00", 10.0)) :+
      (99L, "2024-01-09 12:00:00", 100.0)
    val df = rows.toDF("id", "ts_s", "v")
      .withColumn("ts", to_timestamp(col("ts_s")))
      .withColumn("grp", lit("g"))
    val seasonal = TimeSeries.seasonalZscore(df, "grp", "ts",
        floor(col("v")).cast("long"), 2.0)
      .filter(col("is_anomaly")).collect()
    assert(seasonal.map(_.getAs[Long]("id")).toSeq == Seq(99L))
    assert(seasonal.head.getAs[Long]("season") == 12L)
    // the same data under a global baseline flags nothing at |z| > 2
    // (the hour-3 plateau inflates the global variance) — seasonality
    // is what isolates the hour-12 spike
    val global = TimeSeries.zscore(df, "grp", floor(col("v")).cast("long"), 2.0)
      .filter(col("is_anomaly")).count()
    assert(global == 0L)
    // zero-variance season (hour 3: all 100s) never divides by zero
    val h3 = TimeSeries.seasonalZscore(df, "grp", "ts",
        floor(col("v")).cast("long"), 2.0)
      .filter(col("season") === 3L).collect()
    assert(h3.forall(r => r.isNullAt(r.fieldIndex("z"))))
  }

  test("apdexBy: satisfied/tolerating/frustrated buckets and the exact " +
      "half-weighted score") {
    // T = 100: a → 2 sat (50,100), 1 tol (250, ≤400), 1 frus (900)
    //          b → all satisfied
    val df = Seq(("a", 50L), ("a", 100L), ("a", 250L), ("a", 900L),
      ("b", 10L), ("b", 99L)).toDF("svc", "lat")
    val out = TimeSeries.apdexBy(df, Seq("svc"), col("lat"), 100L)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getLong(5))).toMap
    // a: (2*2 + 1)*1e6 / (2*4) = 625000
    assert(out("a") == ((4L, 2L, 1L, 1L, 625000L)))
    assert(out("b") == ((2L, 2L, 0L, 0L, 1000000L)))
    intercept[IllegalArgumentException] {
      TimeSeries.apdexBy(df, Seq("svc"), col("lat"), 0L)
    }
  }

  test("cusumBy: window identity == the literal Page recursion; a " +
      "sustained small shift alarms where a z-score-sized single spike " +
      "resets; per-series isolation") {
    // series A: 20 bins at 10/bin, then 20 bins at 13/bin — a +30%
    // LEVEL SHIFT no single bin of which is remarkable
    // series B: flat 10/bin with ONE 25-spike — big bin, no shift
    val rowsA = (0 until 40).flatMap { h =>
      val n = if (h < 20) 10 else 13
      (0 until n).map(i => ("A", new Timestamp(1704067200000L +
        h * 3600000L + i * 1000L)))
    }
    val rowsB = (0 until 40).flatMap { h =>
      val n = if (h == 7) 25 else 10
      (0 until n).map(i => ("B", new Timestamp(1704067200000L +
        h * 3600000L + i * 1000L)))
    }
    val df = (rowsA ++ rowsB).toDF("g", "ts")
    val out = TimeSeries.cusumBy(df, "g", "ts", 3600000L,
        lit(1L), slack = 1L, decision = 15L)
      .orderBy(col("g"), col("bin_start")).collect()
      .map(r => (r.getString(0), // bin_start is NTZ → LocalDateTime
        r.getAs[java.time.LocalDateTime](1)
          .toInstant(java.time.ZoneOffset.UTC).toEpochMilli,
        r.getLong(2), r.getLong(3), r.getLong(4), r.getBoolean(5)))
    // brute force: the literal recursion per series
    val byG = out.groupBy(_._1)
    for ((_, rows) <- byG) {
      val xs = rows.sortBy(_._2).map(_._3)
      val mu = xs.sum / xs.length
      var sp = 0L; var sn = 0L
      rows.sortBy(_._2).zip(xs).foreach { case (r, x) =>
        sp = math.max(0L, sp + x - mu - 1L)
        sn = math.max(0L, sn - x + mu - 1L)
        assert(r._4 == sp && r._5 == sn, s"$r")
        assert(r._6 == (sp > 15L || sn > 15L))
      }
    }
    // the sustained shift alarms; the single spike never does
    assert(out.exists(r => r._1 == "A" && r._6))
    assert(!out.exists(r => r._1 == "B" && r._6))
    // guard
    intercept[IllegalArgumentException] {
      TimeSeries.cusumBy(df, "g", "ts", 0L, lit(1L), 0L, 1L)
    }
  }

  test("ewmaBy: matches the literal weighted-lag model, normalizes " +
      "short histories, nulls the first bin, flags the spike") {
    // series A: hourly bins x = 10,10,10,10,100 (spike at the end);
    // series B: single bin (baseline undefined)
    def rows(g: String, xs: Seq[Long]) = xs.zipWithIndex.map {
      case (x, h) => (g, ts(s"2024-01-01 0$h:00:00"), x) }
    val df = (rows("A", Seq(10L, 10L, 10L, 10L, 100L)) ++
      rows("B", Seq(7L))).toDF("g", "ts", "v")
    val out = TimeSeries.ewmaBy(df, "g", "ts", 3600000L, col("v"),
        lambda = 0.25, k = 8)
      .orderBy("g", "bin_start").collect()
      .map(r => (r.getString(0), r.getLong(2),
        if (r.isNullAt(3)) Long.MinValue else r.getLong(3),
        r.getBoolean(4)))
    // model with identical float trees (same weight loop as ewmaBy:
    // w_j = lambda * decay_j, decay multiplied up separately)
    val lambda = 0.25
    val w = new Array[Double](8)
    var decay = 1.0
    (0 until 8).foreach { j => w(j) = lambda * decay
      decay = decay * (1.0 - lambda) }
    def model(prev: Seq[Long]): Long = { // prev: most recent first
      var num = 0.0; var den = 0.0
      (0 until 8).foreach { j =>
        if (j < prev.length) { num += w(j) * prev(j).toDouble
          den += w(j) }
      }
      math.floor(num / den * 1000000.0).toLong
    }
    assert(out(0) == ("A", 10L, Long.MinValue, false)) // first bin: null
    assert(out(1) == ("A", 10L, model(Seq(10L)), false))
    assert(out(2) == ("A", 10L, model(Seq(10L, 10L)), false))
    assert(out(3) == ("A", 10L, model(Seq(10L, 10L, 10L)), false))
    // the spike: baseline ~10, x=100 > 2x baseline
    assert(out(4) == ("A", 100L,
      model(Seq(10L, 10L, 10L, 10L)), true))
    assert(out(5) == ("B", 7L, Long.MinValue, false))
    // steady series never flags
    assert(out.take(4).forall(!_._4))
    intercept[IllegalArgumentException] {
      TimeSeries.ewmaBy(df, "g", "ts", 3600000L, col("v"), lambda = 1.0)
    }
  }

  test("ewmaBy: an out-of-grid measure raises LOUDLY on every row — " +
      "including a series' FIRST bin, whose value feeds later " +
      "baselines but has no baseline of its own") {
    def msg(e: Throwable): String =
      Iterator.iterate(e)(_.getCause).takeWhile(_ != null)
        .map(t => Option(t.getMessage).getOrElse("")).mkString("\n")
    // first bin x is beyond Long.MaxValue/1e6: before the fix it took
    // the null-baseline -> false branch and polluted row 2's baseline
    val df = Seq(
      ("A", ts("2024-01-01 00:00:00"), Long.MaxValue / 1000L),
      ("A", ts("2024-01-01 01:00:00"), 10L))
      .toDF("g", "ts", "v")
    val e = intercept[Exception] {
      TimeSeries.ewmaBy(df, "g", "ts", 3600000L, col("v")).collect()
    }
    assert(msg(e).contains("overflows the exact spike compare"))
    // a baseline too large for num·baseline raises on the RIGHT side
    val df2 = Seq(
      ("A", ts("2024-01-01 00:00:00"), Long.MaxValue / 1000000L - 1L),
      ("A", ts("2024-01-01 01:00:00"), 10L))
      .toDF("g", "ts", "v")
    val e2 = intercept[Exception] {
      TimeSeries.ewmaBy(df2, "g", "ts", 3600000L, col("v"),
        spikeNum = Long.MaxValue / 4L, spikeDen = 1L).collect()
    }
    assert(msg(e2).contains("baseline overflows"))
  }

  test("increaseBy: reset-aware sum, first sample counts in full, " +
      "per-series isolation") {
    // series a: 3 -> 5 -> 2 (reset) -> 4: increase = 3 + 2 + 2 + 2 = 9
    // series b: single sample 7: increase = 7 (born at 0)
    val df = Seq(
      ("a", 0L, 3L), ("a", 1L, 5L), ("a", 2L, 2L), ("a", 3L, 4L),
      ("b", 9L, 7L))
      .toDF("series", "hr", "v")
    val out = TimeSeries.increaseBy(df, Seq("series"), "hr",
        col("v"), "hr")
      .orderBy("series").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSeq
    assert(out == Seq(("a", 4L, 0L, 3L, 9L), ("b", 1L, 9L, 9L, 7L)))
    // repartition invariance: the window sorts within the series hash
    // partition, so the result is independent of input layout
    val shuffled = TimeSeries.increaseBy(df.repartition(7), Seq("series"),
        "hr", col("v"), "hr")
      .orderBy("series").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSeq
    assert(shuffled == out)
    // an equal-to-previous sample adds zero (flat counter)
    val flat = Seq(("c", 0L, 5L), ("c", 1L, 5L)).toDF("series", "hr", "v")
    val f = TimeSeries.increaseBy(flat, Seq("series"), "hr",
      col("v"), "hr").collect().head
    assert(f.getLong(f.fieldIndex("increase")) == 5L)
  }
}

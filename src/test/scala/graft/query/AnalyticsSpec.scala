package graft.query

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.SparkSuite

class AnalyticsSpec extends SparkSuite {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private def fullMsg(e: Throwable): String =
    Iterator.iterate(e)(_.getCause).takeWhile(_ != null)
      .map(t => Option(t.getMessage).getOrElse("")).mkString("\n")

  private lazy val events = Seq(
    // u1 completes view -> click -> purchase in order
    (1L, "view", ts("2024-01-01 10:00:00")),
    (1L, "click", ts("2024-01-01 10:05:00")),
    (1L, "purchase", ts("2024-01-01 10:10:00")),
    // u2 clicks BEFORE viewing: the click must not count
    (2L, "click", ts("2024-01-01 09:00:00")),
    (2L, "view", ts("2024-01-01 09:30:00")),
    (2L, "purchase", ts("2024-01-01 09:45:00")),
    // u3 views only
    (3L, "view", ts("2024-01-01 08:00:00")))
    .toDF("user_id", "event_type", "ts")

  test("funnel enforces strict step ordering") {
    val out = Analytics.funnel(events, "user_id", "ts",
      Seq(col("event_type") === "view", col("event_type") === "click",
        col("event_type") === "purchase"))
    assert(out.select("user_id").as[Long].collect().toSeq == Seq(1L))
    val r = out.head
    assert(r.getTimestamp(1).before(r.getTimestamp(2)) &&
      r.getTimestamp(2).before(r.getTimestamp(3)))
  }

  test("funnelCounts is monotonically non-increasing per step") {
    val out = Analytics.funnelCounts(events, "user_id", "ts",
      Seq(col("event_type") === "view", col("event_type") === "click",
        col("event_type") === "purchase"))
      .orderBy("step").collect().map(_.getLong(1)).toSeq
    assert(out == Seq(3L, 1L, 1L)) // 3 viewed, 1 clicked after view, 1 bought
  }

  test("dimensionShift: the spiking dimension carries the shift; a " +
      "window-only value has null lift; shares sum to ~1e6") {
    // baseline (Jan 1): a=2, b=2; window (Jan 2): a=6, b=2, c=2
    val rows =
      (1 to 2).map(i => ("a", ts(s"2024-01-01 0$i:00:00"))) ++
      (1 to 2).map(i => ("b", ts(s"2024-01-01 1$i:00:00"))) ++
      (1 to 6).map(i => ("a", ts(s"2024-01-02 0$i:00:00"))) ++
      (1 to 2).map(i => ("b", ts(s"2024-01-02 1$i:00:00"))) ++
      (1 to 2).map(i => ("c", ts(s"2024-01-02 2$i:00:00")))
    val df = rows.toDF("dim", "ts")
    val out = Analytics.dimensionShift(df, "dim", "ts",
        "2024-01-02 00:00:00", "2024-01-03 00:00:00")
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getLong(5),
          if (r.isNullAt(6)) -1L else r.getLong(6))).toMap
    // window totals 10, baseline totals 4
    assert(out("a") == ((6L, 2L, 600000L, 500000L, 100000L, 1200000L)))
    assert(out("b") == ((2L, 2L, 200000L, 500000L, -300000L, 400000L)))
    assert(out("c") == ((2L, 0L, 200000L, 0L, 200000L, -1L))) // new offender
    // micro shares sum to 1e6 (up to div flooring)
    assert(out.values.map(_._3).sum == 1000000L)
    // empty window: all shares 0, no division error
    val ew = Analytics.dimensionShift(df, "dim", "ts",
        "2030-01-01 00:00:00", "2030-01-02 00:00:00")
      .collect().map(r => (r.getLong(1), r.getLong(3))).toSeq
    assert(ew.forall { case (nw, sw) => nw == 0L && sw == 0L })
  }

  test("dimensionShiftMulti equals per-dim dimensionShift in one pass") {
    val rows = Seq(
      ("a", "x", ts("2024-01-01 01:00:00")),
      ("a", "y", ts("2024-01-01 02:00:00")),
      ("b", "x", ts("2024-01-02 01:00:00")),
      ("a", "y", ts("2024-01-02 02:00:00")),
      ("a", "y", ts("2024-01-02 03:00:00")))
      .toDF("d1", "d2", "ts")
    val multi = Analytics.dimensionShiftMulti(rows, Seq("d1", "d2"), "ts",
        "2024-01-02 00:00:00", "2024-01-03 00:00:00")
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5),
          r.getLong(6))).toMap
    for (d <- Seq("d1", "d2")) {
      val single = Analytics.dimensionShift(rows, d, "ts",
          "2024-01-02 00:00:00", "2024-01-03 00:00:00")
        .collect().map(r => (d, r.getString(0)) ->
          (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
            r.getLong(5))).toMap
      single.foreach { case (k, v) => assert(multi(k) == v, s"$k") }
    }
    // per-dim shares sum to 1e6 up to one flooring unit per value
    for (d <- Seq("d1", "d2")) {
      val shares = multi.collect { case ((`d`, _), v) => v._3 }
      assert(shares.sum <= 1000000L &&
        shares.sum > 1000000L - shares.size)
    }
  }

  test("dimensionShiftBy guards: negative weight and micro-grid " +
      "overflow both raise LOUDLY instead of emitting garbage shares") {
    val df = Seq(
      ("a", ts("2024-01-01 01:00:00"), -5L),
      ("b", ts("2024-01-02 01:00:00"), 3L)).toDF("dim", "ts", "w")
    val eNeg = intercept[Exception] {
      Analytics.dimensionShiftBy(df, "dim", "ts",
        "2024-01-02 00:00:00", "2024-01-03 00:00:00", col("w")).collect()
    }
    assert(fullMsg(eNeg).contains("negative weight"))
    // summed weight past Long.MaxValue/1e6 (~9.2e12): the micro
    // multiply would wrap — division-form guard raises instead
    val big = Seq(
      ("a", ts("2024-01-02 01:00:00"), 5000000000000L),
      ("a", ts("2024-01-02 02:00:00"), 5000000000000L),
      ("b", ts("2024-01-01 01:00:00"), 1L)).toDF("dim", "ts", "w")
    val eOvf = intercept[Exception] {
      Analytics.dimensionShiftBy(big, "dim", "ts",
        "2024-01-02 00:00:00", "2024-01-03 00:00:00", col("w")).collect()
    }
    assert(fullMsg(eOvf).contains("overflows the exact micro grid"))
  }

  test("corrByGroup recovers perfect and inverse correlation exactly") {
    val df = (1 to 100).flatMap(i => Seq(
      ("pos", i.toLong, (2 * i + 3).toLong),  // y = 2x+3 → corr 1
      ("neg", i.toLong, (-3 * i + 7).toLong), // corr -1
      ("flat", i.toLong, 5L)))                // zero variance → NaN
      .toDF("g", "x", "y")
    val rows = Analytics.corrByGroup(df, "g", col("x"), col("y"))
      .collect().map(r => r.getString(0) -> (if (r.isNullAt(1)) None
        else Some(r.getDouble(1)))).toMap
    assert(math.abs(rows("pos").get - 1.0) < 1e-12)
    assert(math.abs(rows("neg").get + 1.0) < 1e-12)
    assert(rows("flat").isEmpty) // zero variance → undefined → null
  }

  test("cohortRetention buckets activity by whole weeks since cohort start") {
    val ev = Seq(
      (1L, "signup", ts("2024-01-01 00:00:00")), // Monday = week start
      (1L, "click", ts("2024-01-03 00:00:00")),  // week 0
      (1L, "click", ts("2024-01-09 00:00:00")),  // week 1
      (2L, "signup", ts("2024-01-02 12:00:00")), // same cohort week
      (2L, "click", ts("2024-01-10 00:00:00")))  // week 1
      .toDF("user_id", "event_type", "ts")
    val out = Analytics.cohortRetention(ev, "user_id", "ts",
        col("event_type") === "signup")
      .orderBy("cohort_week", "week_offset")
      .collect().map(r => (r.getLong(1), r.getLong(2)))
    // week 0: both signups (+u1 click); week 1: both users active
    assert(out.toSeq == Seq((0L, 2L), (1L, 2L)))
  }

  test("pathTransitions: per-user consecutive pairs, gap break, id " +
      "tie-break, deterministic top-k order") {
    val ev = Seq(
      // u1: view -> click -> purchase, then an 8h gap to view (broken)
      (10L, 1L, "view", ts("2024-01-01 10:00:00")),
      (11L, 1L, "click", ts("2024-01-01 10:05:00")),
      (12L, 1L, "purchase", ts("2024-01-01 10:10:00")),
      (13L, 1L, "view", ts("2024-01-01 18:30:00")),
      // u2: same-timestamp pair — event_id must decide the order
      (21L, 2L, "view", ts("2024-01-01 09:00:00")),
      (20L, 2L, "click", ts("2024-01-01 09:00:00")),
      // u3: view -> click again (makes view->click the heaviest edge)
      (30L, 3L, "view", ts("2024-01-01 11:00:00")),
      (31L, 3L, "click", ts("2024-01-01 11:30:00")))
      .toDF("event_id", "user_id", "event_type", "ts")
    val out = Analytics.pathTransitions(ev, "user_id", "ts",
        "event_type", "event_id", maxGapMillis = 6L * 3600 * 1000,
        topK = 10)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3))).toSeq
    // u2's tied pair orders by event_id: 20 (click) then 21 (view)
    assert(out == Seq(
      ("view", "click", 2L, 1L),
      ("click", "purchase", 1L, 2L),
      ("click", "view", 1L, 3L)))
    // purchase -> view (8h 20m gap) was dropped by the 6h break
    assert(!out.exists(e => e._1 == "purchase"))
    // topK truncates: heaviest edge only
    val top1 = Analytics.pathTransitions(ev, "user_id", "ts",
      "event_type", "event_id", topK = 1).collect()
    assert(top1.length == 1 &&
      top1.head.getString(0) == "view" && top1.head.getLong(2) == 2L)
    intercept[IllegalArgumentException] {
      Analytics.pathTransitions(ev, "user_id", "ts", "event_type",
        "event_id", topK = 0)
    }
  }
}

package graft.query

import graft.SparkSuite

class AlertStateSpec extends SparkSuite {
  import Alerts._

  private val cfg = AlertConfig(
    agg = AggCount, aggColumn = "x", where = None, groupBy = Seq("svc"),
    cmp = Above, threshold = 10.0)

  private def group(svc: String, v: Double) =
    GroupResult(Map("svc" -> svc), v)

  test("triggers on violation, resolves once, then stays silent") {
    var notes = Vector.empty[Notification]
    val sm = new StateMachine(notes :+= _)

    assert(sm.observe("a1", cfg, Seq(group("api", 5.0))) == NotTriggered)
    assert(notes.isEmpty) // quiet → quiet: no notification

    assert(sm.observe("a1", cfg, Seq(group("api", 42.0))) == Triggered)
    assert(notes.length == 1)
    assert(notes.head.state == Triggered)
    assert(notes.head.message.contains("svc=api"))
    assert(notes.head.message.contains("42.0"))

    assert(sm.observe("a1", cfg, Seq(group("api", 3.0))) == NotTriggered)
    assert(notes.length == 2) // resolution notification
    assert(notes.last.state == NotTriggered)

    assert(sm.observe("a1", cfg, Seq(group("api", 3.0))) == NotTriggered)
    assert(notes.length == 2) // silent while quiet
  }

  test("anomalyFrame flags only z-score outliers, honoring the where AST") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    // group g: nine 10.0s and one 100.0 outlier; group h: all flat
    val df = (((1 to 9).map(i => (i.toLong, "g", "svc", 10.0)) :+
      (10L, "g", "svc", 100.0)) ++
      (11 to 20).map(i => (i.toLong, "h", "svc", 50.0)) :+
      (99L, "g", "other", 1e6)) // excluded by the where filter
      .toDF("id", "grp", "service", "v")
    val cfg = Alerts.AnomalyConfig(column = "v", groupBy = "grp",
      where = Some(Alerts.Leaf("service", Alerts.Eq, Some("svc"))),
      zThreshold = 2.0)
    val out = Alerts.anomalyFrame(df, cfg).select("id").as[Long].collect()
    assert(out.toSeq == Seq(10L))
  }

  test("disabled alerts never transition or notify") {
    var notes = Vector.empty[Notification]
    val sm = new StateMachine(notes :+= _)
    sm.disable("a2")
    assert(sm.observe("a2", cfg, Seq(group("api", 42.0))) == Disabled)
    assert(notes.isEmpty)
    sm.enable("a2")
    assert(sm.observe("a2", cfg, Seq(group("api", 42.0))) == Triggered)
    assert(notes.length == 1)
  }

  test("burnRate fires only when BOTH windows exceed the threshold") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // minute bins; short=2 bins, long=4 bins; threshold 0.5
    // t0: 1/2 errors; t1: 2/2; t2: 0/2; t3: 0/2
    val t0 = 1700000000000L // t0 % 60000 == 20000, so bins are t0-20s + k min
    def ev(minute: Int, err: Boolean, n: Int) = (0 until n).map(i =>
      (new java.sql.Timestamp(t0 + minute * 60000L + i), if (err) "error" else "ok"))
    val events = (ev(0, true, 1) ++ ev(0, false, 1) ++ ev(1, true, 2) ++
      ev(2, false, 2) ++ ev(3, false, 2)).toDF("ts", "event_type")
    val fired = Alerts.burnRate(events, "ts", col("event_type") === "error",
        binMillis = 60000L, shortBins = 2, longBins = 4, threshold = 0.5)
      .collect()
    // only the t1 bin has short-rate 3/4 AND long-rate 3/4 >= 0.5;
    // t2's short window (t1,t2) is 2/4 = 0.5 but long is 3/6 = 0.5 -> fires too
    def ms(r: org.apache.spark.sql.Row) =
      r.getAs[java.time.LocalDateTime](0).toInstant(java.time.ZoneOffset.UTC)
        .toEpochMilli
    val bins = fired.map(ms).sorted
    assert(bins.nonEmpty && bins.forall(b => (b - (t0 - 20000)) % 60000 == 0))
    val t1bin = fired.find(r => ms(r) == (t0 - 20000) + 60000L)
    assert(t1bin.isDefined)
    assert(t1bin.get.getAs[Double]("short_rate") == 3.0 / 4)
  }

  test("sloReport: exact availability and budget burn per group") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // svc a: 1000 requests, 2 errors (99.8% < 99.9% target -> SLO missed,
    // budget consumed 2x); svc b: clean
    val df = ((1 to 1000).map(i => ("a", i <= 2)) ++
      (1 to 500).map(_ => ("b", false))).toDF("svc", "err")
    val r = Alerts.sloReport(df, Seq("svc"), col("err"), sloTarget = 0.999)
      .orderBy("svc").collect()
    val a = r(0)
    assert(a.getAs[Long]("requests") == 1000L && a.getAs[Long]("errors") == 2L)
    assert(a.getAs[Double]("availability") == 1.0 - 2.0 / 1000)
    assert(math.abs(a.getAs[Double]("budget_consumed") - 2.0) < 1e-9)
    assert(!a.getAs[Boolean]("slo_met"))
    val b = r(1)
    assert(b.getAs[Double]("availability") == 1.0 &&
      b.getAs[Boolean]("slo_met") &&
      b.getAs[Double]("budget_consumed") == 0.0)
  }
}

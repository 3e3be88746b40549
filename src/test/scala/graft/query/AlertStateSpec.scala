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
}

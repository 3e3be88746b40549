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

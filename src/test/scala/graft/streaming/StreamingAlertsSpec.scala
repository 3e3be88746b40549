package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkSuite
import graft.streaming.StreamingAlerts.{Eval, Transition}

class StreamingAlertsSpec extends SparkSuite {
  import spark.implicits._

  test("emits only transitions: trigger once, silent repeats, resolve once") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[Eval]
    val q = StreamingAlerts.route(input.toDS())
      .writeStream.format("memory").queryName("route_out")
      .outputMode("append").start()
    try {
      // batch 1: clear, then a violation, then repeated violations
      input.addData(
        Eval("cpu", 1000L, violating = false),
        Eval("cpu", 2000L, violating = true),
        Eval("cpu", 3000L, violating = true))
      q.processAllAvailable()
      // batch 2: still violating (silent), state carried across batches
      input.addData(Eval("cpu", 4000L, violating = true))
      q.processAllAvailable()
      // batch 3: clear -> one resolution; second clear silent
      input.addData(
        Eval("cpu", 5000L, violating = false),
        Eval("cpu", 6000L, violating = false))
      q.processAllAvailable()
      val ts = spark.table("route_out").as[Transition].collect()
        .sortBy(_.tsMillis).toSeq
      assert(ts == Seq(
        Transition("cpu", 2000L, triggered = true),
        Transition("cpu", 5000L, triggered = false)))
    } finally q.stop()
  }

  test("independent keys flip independently; same-batch flap emits both edges") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[Eval]
    val q = StreamingAlerts.route(input.toDS())
      .writeStream.format("memory").queryName("route_keys")
      .outputMode("append").start()
    try {
      input.addData(
        Eval("a", 1000L, violating = true),
        Eval("a", 2000L, violating = false), // flap inside one batch
        Eval("b", 1000L, violating = false))
      q.processAllAvailable()
      val ts = spark.table("route_keys").as[Transition].collect()
        .sortBy(t => (t.key, t.tsMillis)).toSeq
      assert(ts == Seq(
        Transition("a", 1000L, triggered = true),
        Transition("a", 2000L, triggered = false)))
    } finally q.stop()
  }
}

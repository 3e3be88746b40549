package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupStateTimeout, TestGroupState}

import graft.SparkSuite
import StreamingFunnel.{cascade, Completion, FunnelState, StepEvent}

class StreamingFunnelSpec extends SparkSuite {
  import spark.implicits._

  private def freshState = TestGroupState.create[FunnelState](
    org.apache.spark.api.java.Optional.empty(), GroupStateTimeout.NoTimeout,
    0L, org.apache.spark.api.java.Optional.empty[scala.Long](), hasTimedOut = false)

  test("cascade enforces strict step ordering") {
    // click (step 1) BEFORE the first view (step 0) must not count
    val evs = Seq(StepEvent(1, 100, 1), StepEvent(1, 200, 0),
      StepEvent(1, 300, 1), StepEvent(1, 400, 2))
    assert(cascade(evs, 3).contains(Seq(200L, 300L, 400L)))
    assert(cascade(evs.filterNot(_.tsMillis == 300), 3).isEmpty)
  }

  test("cascade picks minimum times (first completion)") {
    val evs = Seq(StepEvent(1, 100, 0), StepEvent(1, 50, 0),
      StepEvent(1, 60, 1), StepEvent(1, 500, 1), StepEvent(1, 70, 2))
    assert(cascade(evs, 3).contains(Seq(50L, 60L, 70L)))
  }

  test("step buffers across batches, emits once, tombstone blocks re-emit") {
    val st = freshState
    val none = StreamingFunnel.step(7L,
      Iterator(StepEvent(7, 100, 0), StepEvent(7, 200, 1)), st, 3, 0L).toSeq
    assert(none.isEmpty && !st.get.emitted && st.get.buffer.length == 2)
    val one = StreamingFunnel.step(7L,
      Iterator(StepEvent(7, 300, 2)), st, 3, 0L).toSeq
    assert(one == Seq(Completion(7L, Seq(100L, 200L, 300L))))
    assert(st.get.emitted && st.get.buffer.isEmpty)
    val again = StreamingFunnel.step(7L,
      Iterator(StepEvent(7, 400, 0), StepEvent(7, 500, 1),
        StepEvent(7, 600, 2)), st, 3, 0L).toSeq
    assert(again.isEmpty) // already emitted: never a duplicate
  }

  test("streaming completions converge to the batch funnel's user set") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val dir = "/root/testdata/sf0.001"
    val raw = graft.engine.GraftSession.table(spark, dir, "events")
    val conds = Seq(col("event_type") === "view",
      col("event_type") === "click", col("event_type") === "purchase")
    val stepEvs = StreamingFunnel.stepEvents(raw, "user_id", "ts", conds)
      .collect().sortBy(e => (e.tsMillis, e.userId))
    val input = MemoryStream[StepEvent]
    val q = StreamingFunnel.completions(input.toDS(), numSteps = 3)
      .writeStream.format("memory").queryName("sfunnel")
      .outputMode("append").start()
    try {
      val (c1, c2) = stepEvs.splitAt(stepEvs.length / 2)
      input.addData(c1.toIndexedSeq); q.processAllAvailable()
      input.addData(c2.toIndexedSeq); q.processAllAvailable()
      val streamed = spark.table("sfunnel").as[Completion].collect()
        .map(_.userId).toSet
      val batch = graft.query.Analytics.funnel(raw, "user_id", "ts", conds)
        .select("user_id").as[Long].collect().toSet
      assert(streamed == batch)
      // time-ordered feed ⇒ even the step times match the batch cascade
      val streamedTimes = spark.table("sfunnel").as[Completion].collect()
        .map(c => c.userId -> c.stepTimes).toMap
      val batchTimes = graft.query.Analytics.funnel(raw, "user_id", "ts", conds)
        .select(col("user_id"),
          unix_millis(col("t_1").cast("timestamp")).as("m1"),
          unix_millis(col("t_2").cast("timestamp")).as("m2"),
          unix_millis(col("t_3").cast("timestamp")).as("m3"))
        .collect().map(r => r.getLong(0) ->
          Seq(r.getLong(1), r.getLong(2), r.getLong(3))).toMap
      assert(streamedTimes == batchTimes)
    } finally q.stop()
  }
}

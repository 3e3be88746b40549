package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.{GroupStateTimeout, TestGroupState}

import graft.SparkSuite
import Sessionize.{Event, Session, SessionState}

class SessionizeSpec extends SparkSuite {
  import spark.implicits._

  private val Gap = 30 * 60 * 1000L

  private def freshState = TestGroupState.create[SessionState](
    org.apache.spark.api.java.Optional.empty(), GroupStateTimeout.NoTimeout,
    0L, org.apache.spark.api.java.Optional.empty[scala.Long](), hasTimedOut = false)

  test("step: events within the gap extend one session") {
    val st = freshState
    val out = Sessionize.step(1L, Iterator(
      Event(1L, 1L, 1000L), Event(1L, 2L, 2000L), Event(1L, 3L, 3000L)),
      st, Gap).toSeq
    assert(out.isEmpty) // session still open
    assert(st.get == SessionState(1000L, 3000L, 3L))
  }

  test("step: a gap closes the session and opens a new one") {
    val st = freshState
    val out = Sessionize.step(1L, Iterator(
      Event(1L, 1L, 1000L), Event(1L, 2L, 1000L + Gap + 1)), st, Gap).toSeq
    assert(out == Seq(Session(1L, 1000L, 1000L, 1L)))
    assert(st.get == SessionState(1000L + Gap + 1, 1000L + Gap + 1, 1L))
  }

  test("step: out-of-order events within a batch are sorted first") {
    val st = freshState
    val out = Sessionize.step(1L, Iterator(
      Event(1L, 2L, 5000L), Event(1L, 1L, 1000L)), st, Gap).toSeq
    assert(out.isEmpty)
    assert(st.get == SessionState(1000L, 5000L, 2L))
  }

  test("step: timed-out state flushes the open session") {
    val st = TestGroupState.create[SessionState](
      org.apache.spark.api.java.Optional.of(SessionState(1000L, 2000L, 2L)),
      GroupStateTimeout.EventTimeTimeout, 0L,
      org.apache.spark.api.java.Optional.of[scala.Long](Gap + 5000L), hasTimedOut = true)
    val out = Sessionize.step(1L, Iterator.empty, st, Gap).toSeq
    assert(out == Seq(Session(1L, 1000L, 2000L, 2L)))
    assert(st.isRemoved)
  }

  test("streaming end-to-end: sessions close across micro-batches") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[Event]
    val q = Sessionize.sessions(input.toDS(), Gap)
      .writeStream.format("memory").queryName("sess_out")
      .outputMode("append").start()
    try {
      input.addData(Event(1L, 1L, 1000L), Event(1L, 2L, 61000L),
        Event(2L, 3L, 1000L))
      q.processAllAvailable()
      assert(spark.table("sess_out").count() == 0) // both sessions open
      // user 1 returns after the gap → first session closes; user 2 idle
      input.addData(Event(1L, 4L, 1000L + Gap * 3))
      q.processAllAvailable()
      val closed = spark.table("sess_out").as[Session].collect().toSeq
      assert(closed == Seq(Session(1L, 1000L, 61000L, 2L)))
    } finally q.stop()
  }
}

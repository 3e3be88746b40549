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

  test("streaming sessions equal the batch window formulation on real data") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import org.apache.spark.sql.functions._
    val events = graft.engine.GraftSession
      .table(spark, "/root/testdata/sf0.001", "events")
      .select(col("user_id").as("userId"), col("event_id").as("eventId"),
        unix_millis(col("ts").cast("timestamp")).as("tsMillis"))
      .as[Event].collect().sortBy(e => (e.tsMillis, e.eventId))
    val input = MemoryStream[Event]
    val q = Sessionize.sessions(input.toDS(), Gap)
      .writeStream.format("memory").queryName("sess_eq")
      .outputMode("append").start()
    try {
      // feed in two arbitrary chunks (cross-batch state must carry)
      val (c1, c2) = events.splitAt(events.length / 2)
      input.addData(c1.toIndexedSeq); q.processAllAvailable()
      input.addData(c2.toIndexedSeq); q.processAllAvailable()
      val closed = spark.table("sess_eq").as[Session].collect()
        .map(s => (s.userId, s.sessStart, s.sessEnd, s.nEvents)).toSet

      // batch twin: q_sessionize's window formulation; drop each user's
      // LAST session (still open in the stream — never emitted)
      val batch = graft.SparkEntry.queries("q_sessionize")(spark,
        "/root/testdata/sf0.001")
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("user_id")).orderBy(col("sess_n").desc)
      val batchClosed = batch
        .withColumn("rk", row_number().over(w)).filter(col("rk") > 1)
        .select(col("user_id"),
          unix_millis(col("sess_start").cast("timestamp")),
          unix_millis(col("sess_end").cast("timestamp")), col("n_events"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getLong(3))).toSet
      assert(closed == batchClosed)
      assert(closed.nonEmpty)
    } finally q.stop()
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

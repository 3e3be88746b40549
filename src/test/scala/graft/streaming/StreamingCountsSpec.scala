package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkSuite

class StreamingCountsSpec extends SparkSuite {
  import spark.implicits._

  test("watermarked tumbling windows finalize in append mode") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[(Timestamp, String)]
    val counts = StreamingCounts.windowedCounts(
      input.toDF().toDF("ts", "kind"), "ts", binSeconds = 60,
      delayThreshold = "30 seconds", groupCols = Seq("kind"))
    val q = counts.writeStream.format("memory").queryName("wc_out")
      .outputMode("append").start()
    try {
      val t0 = 1700000000000L
      input.addData((new Timestamp(t0), "a"), (new Timestamp(t0 + 1000), "a"),
        (new Timestamp(t0 + 2000), "b"))
      q.processAllAvailable()
      // window not finalized yet (watermark hasn't passed its end)
      assert(spark.table("wc_out").count() == 0)
      // an event 3 minutes later pushes the watermark past the first window
      input.addData((new Timestamp(t0 + 180_000), "a"))
      q.processAllAvailable()
      input.addData((new Timestamp(t0 + 240_000), "a")) // advance again
      q.processAllAvailable()
      val rows = spark.table("wc_out")
        .select("kind", "bin_count").collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(rows == Map("a" -> 2L, "b" -> 1L))
    } finally q.stop()
  }

  test("late data beyond the watermark is dropped from finalized windows") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[(Timestamp, String)]
    val counts = StreamingCounts.windowedCounts(
      input.toDF().toDF("ts", "kind"), "ts", binSeconds = 60,
      delayThreshold = "30 seconds")
    val q = counts.writeStream.format("memory").queryName("wc_late")
      .outputMode("append").start()
    try {
      val t0 = 1700000000000L
      input.addData((new Timestamp(t0), "a"))
      q.processAllAvailable()
      input.addData((new Timestamp(t0 + 600_000), "a")) // watermark jumps
      q.processAllAvailable()
      input.addData((new Timestamp(t0 + 1000), "late")) // inside window 1
      q.processAllAvailable()
      input.addData((new Timestamp(t0 + 900_000), "a"))
      q.processAllAvailable()
      val first = spark.table("wc_late")
        .filter($"bin_start" === new Timestamp(t0 - t0 % 60000))
        .select("bin_count").as[Long].collect()
      assert(first.toSeq == Seq(1L)) // the late row never re-opened it
    } finally q.stop()
  }

  test("streaming topKCounts re-ranks running totals each trigger") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[String]
    val topk = StreamingCounts.topKCounts(
      input.toDF().toDF("kind"), Seq("kind"), k = 2)
    val q = topk.writeStream.format("memory").queryName("topk_out")
      .outputMode("complete").start()
    try {
      input.addData("a", "a", "b", "c")
      q.processAllAvailable()
      def snapshot() = spark.table("topk_out").collect()
        .map(r => r.getString(0) -> r.getLong(1)).toSeq
      // a=2; b/c tie at 1 -> b wins ascending tiebreak
      assert(snapshot() == Seq("a" -> 2L, "b" -> 1L))
      // counts accumulate ACROSS batches; c overtakes
      input.addData("c", "c", "c")
      q.processAllAvailable()
      assert(snapshot() == Seq("c" -> 4L, "a" -> 2L))
    } finally q.stop()
  }
}

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

  test("windowedPercentiles: incremental KLL quantiles finalize per window") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[(Timestamp, String, Double)]
    val pcts = StreamingCounts.windowedPercentiles(
      input.toDF().toDF("ts", "svc", "v"), "ts", "v", binSeconds = 60,
      delayThreshold = "30 seconds", groupCols = Seq("svc"))
    val q = pcts.writeStream.format("memory").queryName("pct_out")
      .outputMode("append").start()
    try {
      val t0 = 1700000000000L
      // 1..100 in window 1 for svc a, split over two micro-batches so the
      // sketch state is exercised across triggers
      val (half1, half2) = (1 to 100).map(i =>
        (new Timestamp(t0 + i * 10), "a", i.toDouble)).splitAt(50)
      input.addData(half1)
      q.processAllAvailable()
      input.addData(half2)
      q.processAllAvailable()
      assert(spark.table("pct_out").count() == 0) // window still open
      input.addData((new Timestamp(t0 + 300_000), "a", 0.0)) // close it
      q.processAllAvailable()
      val r = spark.table("pct_out").filter($"svc" === "a")
        .select("n", "p50", "p95", "p99").collect()
      assert(r.length == 1)
      assert(r(0).getLong(0) == 100L)
      // KLL at k=200 is exact at n=100 (no compaction below ~3k values)
      assert(r(0).getDouble(1) == 50.0)
      assert(r(0).getDouble(2) == 95.0)
      assert(r(0).getDouble(3) == 99.0)
      // emitted sketch rolls up with the batch-side merge path
      val merged = graft.query.QuantileSketch.mergeSketches(
        spark.table("pct_out").select($"svc", $"sketch"),
        Seq("svc"), Seq(0.5))
      assert(merged.filter($"svc" === "a").select("p50")
        .collect()(0).getDouble(0) == 50.0)
    } finally q.stop()
  }

  test("windowedDistinct: incremental HLL distinct estimate per window") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[(Timestamp, String)]
    val dst = StreamingCounts.windowedDistinct(
      input.toDF().toDF("ts", "user"), "ts", "user", binSeconds = 60,
      delayThreshold = "30 seconds")
    val q = dst.writeStream.format("memory").queryName("dst_out")
      .outputMode("append").start()
    try {
      val t0 = 1700000000000L
      // 40 distinct users, each seen twice, split across micro-batches
      input.addData((0 until 40).map(i =>
        (new Timestamp(t0 + i * 10), s"u$i")))
      q.processAllAvailable()
      input.addData((0 until 40).map(i =>
        (new Timestamp(t0 + 400 + i * 10), s"u$i")))
      q.processAllAvailable()
      input.addData((new Timestamp(t0 + 300_000), "x")) // close window 1
      q.processAllAvailable()
      val r = spark.table("dst_out").orderBy("bin_start").collect()(0)
      assert(r.getAs[Long]("n") == 80L)
      // HLL at lgK=12 is exact at this cardinality
      assert(r.getAs[Long]("distinct_estimate") == 40L)
      // emitted sketch unions with the batch-side merge path
      val merged = graft.query.FieldStats.mergeSketches(
        spark.table("dst_out").select($"sketch"))
      assert(merged.select("distinct_estimate").collect()(0).getLong(0) >= 40L)
    } finally q.stop()
  }

  test("windowedHeavyHitters: bounded-state top values finalize per window") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[(Timestamp, String)]
    val hh = StreamingCounts.windowedHeavyHitters(
      input.toDF().toDF("ts", "url"), "ts", "url", binSeconds = 60,
      delayThreshold = "30 seconds")
    val q = hh.writeStream.format("memory").queryName("hh_out")
      .outputMode("append").start()
    try {
      val t0 = 1700000000000L
      // skewed traffic split over two micro-batches: /hot dominates
      input.addData((0 until 60).map(i =>
        (new Timestamp(t0 + i * 10), if (i % 3 == 0) "/hot" else s"/p$i")))
      q.processAllAvailable()
      input.addData((0 until 40).map(i =>
        (new Timestamp(t0 + 700 + i * 10), "/hot")))
      q.processAllAvailable()
      input.addData((new Timestamp(t0 + 300_000), "x")) // close window 1
      q.processAllAvailable()
      val row = spark.table("hh_out").orderBy("bin_start").collect()(0)
      assert(row.getAs[Long]("n") == 100L)
      // the emitted sketch feeds the batch-side top-k reader
      val top = graft.query.FrequencySketch.mergeTopK(
        spark.table("hh_out").select($"sketch").limit(1), Nil, k = 1)
        .collect()(0)
      assert(top.getAs[String]("item") == "/hot")
      assert(top.getAs[Long]("estimate") == 60L) // exact below map capacity
    } finally q.stop()
  }

  test("windowedApdex: per-window scores finalize exactly (T=100: " +
      "satisfied/tolerating/frustrated buckets, half-weighted micro " +
      "score)") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import org.apache.spark.sql.functions.col
    val input = MemoryStream[(Timestamp, String, Long)]
    val out = StreamingCounts.windowedApdex(
      input.toDF().toDF("ts", "svc", "lat"), "ts", col("lat"),
      thresholdT = 100L, binSeconds = 60,
      delayThreshold = "30 seconds", groupCols = Seq("svc"))
    val q = out.writeStream.format("memory").queryName("apdex_out")
      .outputMode("append").start()
    try {
      val t0 = 1700000000000L
      // window 1, svc a: 2 sat (50,100), 1 tol (250), 1 frus (900)
      input.addData(
        (new Timestamp(t0), "a", 50L), (new Timestamp(t0 + 1000), "a", 100L),
        (new Timestamp(t0 + 2000), "a", 250L),
        (new Timestamp(t0 + 3000), "a", 900L),
        (new Timestamp(t0 + 4000), "b", 10L))
      q.processAllAvailable()
      input.addData((new Timestamp(t0 + 180_000), "a", 10L)) // advance wm
      q.processAllAvailable()
      input.addData((new Timestamp(t0 + 240_000), "a", 10L))
      q.processAllAvailable()
      val rows = spark.table("apdex_out")
        .select("svc", "total", "satisfied", "tolerating", "frustrated",
          "apdex_micro")
        .collect().map(r => r.getString(0) ->
          (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
            r.getLong(5))).toMap
      assert(rows("a") == ((4L, 2L, 1L, 1L, 625000L)))
      assert(rows("b") == ((1L, 1L, 0L, 0L, 1000000L)))
      // matches the batch twin on the same window's rows
      val batch = graft.query.TimeSeries.apdexBy(
          Seq(("a", 50L), ("a", 100L), ("a", 250L), ("a", 900L))
            .toDF("svc", "lat"), Seq("svc"), col("lat"), 100L)
        .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3),
          r.getLong(4), r.getLong(5))).head
      assert(rows("a") == batch)
    } finally q.stop()
  }
}

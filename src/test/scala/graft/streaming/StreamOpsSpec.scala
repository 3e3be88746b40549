package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkSuite

class StreamOpsSpec extends SparkSuite {
  import spark.implicits._

  private def ts(ms: Long) = new Timestamp(ms)
  private val t0 = 1700000000000L

  test("dedupByContent keeps first occurrence, drops in-window duplicates") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[(Long, Timestamp, String)]
    val out = StreamOps.dedupByContent(
      input.toDF().toDF("id", "ts", "text"), "ts", "1 minute", "text")
    val q = out.writeStream.format("memory").queryName("sdedup")
      .outputMode("append").start()
    try {
      input.addData(
        (1L, ts(t0), "Hello  World"),
        (2L, ts(t0 + 1000), "hello world"), // same normalized content
        (3L, ts(t0 + 2000), "different"))
      q.processAllAvailable()
      val ids = spark.table("sdedup").select("id").as[Long].collect().toSet
      assert(ids == Set(1L, 3L))
    } finally q.stop()
  }

  test("joinWithin pairs right events inside the interval, not outside") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val imps = MemoryStream[(Long, Timestamp)]
    val clicks = MemoryStream[(Long, Timestamp)]
    val joined = StreamOps.joinWithin(
      imps.toDF().toDF("k", "ts"), clicks.toDF().toDF("k", "ts"),
      "k", "ts", "ts", delay = "30 seconds", within = "1 MINUTE")
    val q = joined.writeStream.format("memory").queryName("sjoin")
      .outputMode("append").start()
    try {
      imps.addData((1L, ts(t0)), (2L, ts(t0)))
      clicks.addData(
        (1L, ts(t0 + 30_000)),  // inside the 1-minute window
        (2L, ts(t0 + 120_000))) // outside
      q.processAllAvailable()
      val ks = spark.table("sjoin").select("k").as[Long].collect().toSet
      assert(ks == Set(1L))
    } finally q.stop()
  }

  test("dedupNearStream: index-backed near-dup dedup across micro-batches") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val idx = java.nio.file.Files.createTempDirectory("sndidx").toString
    val input = MemoryStream[(Long, String)]
    val kept = scala.collection.mutable.ArrayBuffer.empty[Long]
    val q = StreamOps.dedupNearStream(
        input.toDF().toDF("doc_id", "text"), "doc_id", "text",
        s"$idx/index",
        sink = df => kept.synchronized {
          kept ++= df.select("doc_id").collect().map(_.getLong(0)) },
        n = 3, threshold = 0.5)
      .option("checkpointLocation", s"$idx/ckpt").start()
    try {
      // batch 1: A, an intra-batch near-dup of A, and a distinct B
      input.addData(
        (1L, "the quick brown fox jumps over the lazy dog"),
        (2L, "the quick brown fox jumps over the lazy cat"), // ~A, same batch
        (3L, "completely different content lives in this document here"))
      q.processAllAvailable()
      // batch 2: a near-dup of A (cross-batch, via the index) and a new C
      input.addData(
        (10L, "the quick brown fox jumps over the lazy dog"), // == A
        (11L, "yet another unrelated document about rivers and stones"))
      q.processAllAvailable()
      assert(kept.toSet == Set(1L, 3L, 11L),
        s"survivors: ${kept.sorted.mkString(",")}")
      // the index now carries every survivor's shingles (1, 3, 11)
      val refIds = spark.read.parquet(s"$idx/index/shingles")
        .select("ref_id").distinct().collect().map(_.getLong(0)).toSet
      assert(refIds == Set(1L, 3L, 11L))
    } finally q.stop()
  }

  test("dedupNearStream replay: re-delivered batch id is a no-op " +
       "(no duplicate sink rows, no duplicate index shingles)") {
    import spark.implicits._
    val idx = java.nio.file.Files.createTempDirectory("sndrp").toString
    val kept = scala.collection.mutable.ArrayBuffer.empty[Long]
    val sink: org.apache.spark.sql.DataFrame => Unit =
      df => kept.synchronized {
        kept ++= df.select("doc_id").collect().map(_.getLong(0)) }
    def run(rows: Seq[(Long, String)], batchId: Long): Unit =
      StreamOps.processDedupBatch(rows.toDF("doc_id", "text"), batchId,
        "doc_id", "text", s"$idx/index", sink, n = 3, threshold = 0.5,
        numBuckets = 64)
    val batch0 = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "completely different content lives in this document here"))
    run(batch0, 0L)
    assert(kept.sorted == Seq(1L, 2L))
    // crash-replay of batch 0: exact same delivery, same id — skipped
    run(batch0, 0L)
    assert(kept.sorted == Seq(1L, 2L), s"replay duplicated rows: $kept")
    val shingleRows = spark.read.parquet(s"$idx/index/shingles").count()
    // a NEW batch id still processes (cross-batch dedup keeps working)
    run(Seq((5L, "the quick brown fox jumps over the lazy dog"), // dup of 1
            (6L, "yet another unrelated document about rivers and stones")),
      1L)
    assert(kept.sorted == Seq(1L, 2L, 6L))
    // replaying batch 0 did not touch the index; batch 1 appended only 6
    val refIds = spark.read.parquet(s"$idx/index/shingles")
      .select("ref_id").distinct().collect().map(_.getLong(0)).toSet
    assert(refIds == Set(1L, 2L, 6L))
    assert(spark.read.parquet(s"$idx/index/shingles")
      .filter(org.apache.spark.sql.functions.col("ref_id") === 1L).count()
      > 0 && shingleRows > 0)
  }

  test("cusumStream: each trigger's scores equal batch cusumBy over ALL " +
      "data so far; LATE data re-scores exactly; replay is a no-op") {
    import org.apache.spark.sql.functions._
    import graft.query.TimeSeries
    val st = java.nio.file.Files.createTempDirectory("scusum").toString
    var last: Seq[(String, Long, Long, Long, Long, Boolean)] = Nil
    val sink: org.apache.spark.sql.DataFrame => Unit = df =>
      last = df.collect().map(r => (r.getString(0),
        r.getAs[java.time.LocalDateTime](1)
          .toInstant(java.time.ZoneOffset.UTC).toEpochMilli,
        r.getLong(2), r.getLong(3), r.getLong(4), r.getBoolean(5))).toSeq
    def run(rows: Seq[(String, Timestamp)], batchId: Long): Unit =
      StreamOps.processCusumBatch(rows.toDF("g", "ts"), batchId,
        "g", "ts", 3600000L, lit(1L), slack = 0L, decision = 3L,
        statePath = st, sink = sink)
    def expect(all: Seq[(String, Timestamp)]) =
      TimeSeries.cusumBy(all.toDF("g", "ts"), "g", "ts", 3600000L,
          lit(1L), 0L, 3L)
        .collect().map(r => (r.getString(0),
          r.getAs[java.time.LocalDateTime](1)
            .toInstant(java.time.ZoneOffset.UTC).toEpochMilli,
          r.getLong(2), r.getLong(3), r.getLong(4), r.getBoolean(5))).toSeq
    val base = 1704067200000L
    def mk(h: Int, n: Int, g: String = "A") =
      (0 until n).map(i => (g, new Timestamp(base + h * 3600000L +
        i * 1000L)))
    val b0 = mk(0, 2) ++ mk(1, 2) ++ mk(2, 2) ++ mk(0, 5, "B")
    run(b0, 0L)
    assert(last.toSet == expect(b0).toSet && last.nonEmpty)
    // batch 1: new bins ahead + a LATE event into hour 1 — the whole A
    // series re-scores exactly as if the event had always been there
    val b1 = mk(3, 7) ++ mk(1, 1)
    run(b1, 1L)
    assert(last.toSet == expect(b0 ++ b1).toSet)
    // the sustained hour-3 burst alarms under the recomputed target
    assert(last.exists(r => r._1 == "A" && r._6))
    // crash-replay of batch 1: same id — ledger untouched, sink state
    // unchanged after a fresh score pass
    val snapshot = last
    run(b1, 1L)
    assert(last == snapshot)
    // a new batch still folds
    run(mk(4, 1), 2L)
    assert(last.toSet == expect(b0 ++ b1 ++ mk(4, 1)).toSet)
  }

  test("ewmaStream: each trigger's baselines equal batch ewmaBy over " +
      "ALL data so far; LATE data re-scores exactly; replay is a no-op") {
    import org.apache.spark.sql.functions._
    import graft.query.TimeSeries
    val st = java.nio.file.Files.createTempDirectory("sewma").toString
    var last: Seq[(String, Long, Long, Boolean)] = Nil
    val sink: org.apache.spark.sql.DataFrame => Unit = df =>
      last = df.collect().map(r => (r.getString(0), r.getLong(2),
        if (r.isNullAt(3)) Long.MinValue else r.getLong(3),
        r.getBoolean(4))).toSeq
    def run(rows: Seq[(String, Timestamp, Long)], batchId: Long): Unit =
      StreamOps.processEwmaBatch(rows.toDF("g", "ts", "v"), batchId,
        "g", "ts", 3600000L, col("v"), lambda = 0.25, k = 8,
        statePath = st, sink = sink)
    def expect(all: Seq[(String, Timestamp, Long)]) =
      TimeSeries.ewmaBy(all.toDF("g", "ts", "v"), "g", "ts", 3600000L,
          col("v"), lambda = 0.25, k = 8)
        .collect().map(r => (r.getString(0), r.getLong(2),
          if (r.isNullAt(3)) Long.MinValue else r.getLong(3),
          r.getBoolean(4))).toSeq
    def mk(h: Int, v: Long, g: String = "A") =
      (g, Timestamp.valueOf(f"2024-01-01 $h%02d:00:00"), v)
    val b0 = Seq(mk(0, 10L), mk(1, 10L), mk(2, 10L), mk(0, 7L, "B"))
    run(b0, 0L)
    assert(last.toSet == expect(b0).toSet && last.nonEmpty)
    // batch 1: a spike bin ahead + a LATE partial into hour 1 — the
    // baseline fold rewrites downstream scores exactly
    val b1 = Seq(mk(3, 100L), mk(1, 5L))
    run(b1, 1L)
    assert(last.toSet == expect(b0 ++ b1).toSet)
    assert(last.exists(r => r._1 == "A" && r._2 == 100L && r._4))
    // crash-replay of batch 1: ledger untouched
    val snapshot = last
    run(b1, 1L)
    assert(last == snapshot)
    run(Seq(mk(4, 12L)), 2L)
    assert(last.toSet == expect(b0 ++ b1 ++ Seq(mk(4, 12L))).toSet)
  }

  test("increaseStream: each trigger equals batch increaseBy over ALL " +
      "samples so far; LATE/out-of-order samples re-score exactly; " +
      "replay and re-delivered samples are no-ops") {
    import org.apache.spark.sql.functions._
    import graft.query.TimeSeries
    val st = java.nio.file.Files.createTempDirectory("sincr").toString
    var last: Seq[(String, Long, Long, Long, Long)] = Nil
    val sink: org.apache.spark.sql.DataFrame => Unit = df =>
      last = df.collect().map(r => (r.getString(0), r.getLong(1),
        r.getLong(2), r.getLong(3), r.getLong(4))).toSeq
    def run(rows: Seq[(String, Long, Long)], batchId: Long): Unit =
      StreamOps.processIncreaseBatch(rows.toDF("s", "t", "v"), batchId,
        Seq("s"), "t", col("v"), statePath = st, sink = sink)
    def expect(all: Seq[(String, Long, Long)]) =
      TimeSeries.increaseBy(all.toDF("s", "t", "v"), Seq("s"), "t",
          col("v"), "t")
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
          r.getLong(3), r.getLong(4))).toSeq
    // batch 0: series a climbing, series b single sample
    val b0 = Seq(("a", 0L, 3L), ("a", 1L, 5L), ("b", 0L, 7L))
    run(b0, 0L)
    assert(last.toSet == expect(b0).toSet && last.nonEmpty)
    // batch 1: a resets (v drops) and a LATE sample lands BETWEEN the
    // two batch-0 samples — the series re-walks as if always there
    val b1 = Seq(("a", 3L, 2L), ("a", 2L, 9L))
    run(b1, 1L)
    assert(last.toSet == expect(b0 ++ b1).toSet)
    // hand-check: a = 3 +2 +4(late 9) +2(reset to 2) = 11
    assert(last.find(_._1 == "a").get._5 == 11L)
    // crash-replay of batch 1: ledger untouched
    val snapshot = last
    run(b1, 1L)
    assert(last == snapshot)
    // re-delivered sample (same series, t, v) in a NEW batch: no-op on
    // the scores; a genuinely new sample still folds
    run(Seq(("a", 2L, 9L), ("b", 5L, 1L)), 2L)
    assert(last.toSet ==
      expect(b0 ++ b1 ++ Seq(("b", 5L, 1L))).toSet)
    assert(last.find(_._1 == "b").get._5 == 8L) // 7 then reset-to-1
  }

  test("kmvStream: sketch ledger after every batch equals the batch kmv " +
      "over ALL data so far (any order); estimates match; replay and " +
      "re-delivered values are no-ops") {
    import org.apache.spark.sql.functions._
    import graft.query.ThetaSketch
    val st = java.nio.file.Files.createTempDirectory("skmv").toString
    var last: Set[(String, Long)] = Set.empty
    val sink: org.apache.spark.sql.DataFrame => Unit = df =>
      last = df.collect().map(r => (r.getString(0), r.getLong(1))).toSet
    def run(rows: Seq[(String, Long)], batchId: Long): Unit =
      StreamOps.processKmvBatch(rows.toDF("g", "v"), batchId,
        Seq("g"), col("v"), k = 16, statePath = st, sink = sink)
    def expect(all: Seq[(String, Long)]): Set[(String, Long)] =
      ThetaSketch.kmv(all.toDF("g", "v"), Seq("g"), col("v"), 16)
        .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    val b0 = (0L until 40L).map(v => ("a", v)) ++
      (0L until 5L).map(v => ("b", v))
    run(b0, 0L)
    assert(last == expect(b0) && last.nonEmpty)
    // group a is past k (16 rows kept), b exhaustive (5)
    assert(last.count(_._1 == "a") == 16 && last.count(_._1 == "b") == 5)
    // batch 1: overlapping values (structural dedup) + new ones, out of
    // order relative to batch 0
    val b1 = (30L until 80L).map(v => ("a", v)) ++ Seq(("b", 2L), ("b", 9L))
    run(b1, 1L)
    assert(last == expect(b0 ++ b1))
    // crash-replay: ledger untouched
    val snapshot = last
    run(b1, 1L)
    assert(last == snapshot)
    // estimates off the streamed ledger == estimates off the batch sketch
    val streamed = last.toSeq.toDF("g", "h")
    val est = ThetaSketch.cardinality(streamed, Seq("g"), 16)
      .orderBy("g").collect()
      .map(r => (r.getString(0), r.getAs[Long]("est_distinct"))).toSeq
    val bEst = ThetaSketch.cardinality(
        ThetaSketch.kmv((b0 ++ b1).toDF("g", "v"), Seq("g"), col("v"), 16),
        Seq("g"), 16)
      .orderBy("g").collect()
      .map(r => (r.getString(0), r.getAs[Long]("est_distinct"))).toSeq
    assert(est == bEst)
    assert(est.find(_._1 == "b").get._2 == 6L) // exhaustive: exact
  }

  test("funnelWithinStream: each trigger's cohort equals batch " +
      "funnelWithin over ALL events so far; a LATE step-1 event moves " +
      "t_1 and the cascade re-scores exactly (a conversion can appear " +
      "OR disappear); replay is a no-op") {
    import org.apache.spark.sql.functions._
    import graft.query.Analytics
    val st = java.nio.file.Files.createTempDirectory("sfunnel").toString
    val steps = Seq(col("a") === "view", col("a") === "cart")
    var last: Seq[(String, Long, Long)] = Nil
    val sink: org.apache.spark.sql.DataFrame => Unit = df =>
      last = df.collect().map(r => (r.getString(0),
        r.getTimestamp(1).getTime, r.getTimestamp(2).getTime)).toSeq
    def run(rows: Seq[(String, String, Timestamp)], batchId: Long): Unit =
      StreamOps.processFunnelWithinBatch(rows.toDF("u", "a", "ts"),
        batchId, "u", "ts", steps, maxGapMillis = 5000L,
        statePath = st, sink = sink)
    def expect(all: Seq[(String, String, Timestamp)]) =
      Analytics.funnelWithin(all.toDF("u", "a", "ts"), "u", "ts", steps,
          5000L)
        .collect().map(r => (r.getString(0),
          r.getTimestamp(1).getTime, r.getTimestamp(2).getTime)).toSeq
    def ev(u: String, a: String, s: Long) = (u, a, ts(t0 + s * 1000L))
    // u1 converts; u2's cart is outside the 5 s gap; u3 converts (for
    // now); u4 has only the cart half
    val b0 = Seq(ev("u1", "view", 10), ev("u1", "cart", 12),
      ev("u2", "view", 10), ev("u2", "cart", 20),
      ev("u3", "view", 10), ev("u3", "cart", 12),
      ev("u4", "cart", 8))
    run(b0, 0L)
    assert(last.toSet == expect(b0).toSet)
    assert(last.map(_._1).sorted == Seq("u1", "u3"))
    // LATE data: u3's earlier view@4 moves t_1 to 4 — the (4, 9] window
    // no longer admits cart@12, so u3's conversion DISAPPEARS; u4's
    // view@6 makes cart@8 qualify, so u4's conversion APPEARS
    val b1 = Seq(ev("u3", "view", 4), ev("u4", "view", 6))
    run(b1, 1L)
    assert(last.toSet == expect(b0 ++ b1).toSet)
    assert(last.map(_._1).sorted == Seq("u1", "u4"))
    assert(last.find(_._1 == "u4").get ==
      (("u4", t0 + 6000L, t0 + 8000L)))
    // crash-replay of batch 1: same id — ledger untouched
    val snapshot = last
    run(b1, 1L)
    assert(last == snapshot)
    // a later cart inside u2's window converts u2 (t_2 = min qualifying)
    val b2 = Seq(ev("u2", "cart", 13))
    run(b2, 2L)
    assert(last.toSet == expect(b0 ++ b1 ++ b2).toSet)
    assert(last.map(_._1).sorted == Seq("u1", "u2", "u4"))
    assert(last.find(_._1 == "u2").get ==
      (("u2", t0 + 10000L, t0 + 13000L)))
  }

  test("funnelTimingStream: each trigger's transition stats equal batch " +
      "funnelTiming over ALL events so far; late data moves the " +
      "durations; replay is a no-op") {
    import org.apache.spark.sql.functions._
    import graft.query.Analytics
    val st = java.nio.file.Files.createTempDirectory("sftiming").toString
    val steps = Seq(col("a") === "view", col("a") === "cart",
      col("a") === "buy")
    var last: Seq[(Long, Long, Long, Long, Long, Long)] = Nil
    val sink: org.apache.spark.sql.DataFrame => Unit = df =>
      last = df.orderBy("step").collect().map(r => (r.getLong(0),
        r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
        r.getLong(5))).toSeq
    def run(rows: Seq[(String, String, Timestamp)], batchId: Long): Unit =
      StreamOps.processFunnelTimingBatch(rows.toDF("u", "a", "ts"),
        batchId, "u", "ts", steps, statePath = st, sink = sink)
    def expect(all: Seq[(String, String, Timestamp)]) =
      Analytics.funnelTiming(all.toDF("u", "a", "ts"), "u", "ts", steps)
        .orderBy("step").collect().map(r => (r.getLong(0), r.getLong(1),
          r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))).toSeq
    def ev(u: String, a: String, s: Long) = (u, a, ts(t0 + s * 1000L))
    // u1 full cascade; u2 missing the buy (not in the timing cohort)
    val b0 = Seq(ev("u1", "view", 10), ev("u1", "cart", 14),
      ev("u1", "buy", 20),
      ev("u2", "view", 10), ev("u2", "cart", 11))
    run(b0, 0L)
    assert(last == expect(b0))
    // view->cart 4 s, cart->buy 6 s for the single converted user
    assert(last == Seq((2L, 1L, 4000L, 4000L, 4000L, 4000L),
      (3L, 1L, 6000L, 6000L, 6000L, 6000L)))
    // LATE events: u2's buy converts them; u1's EARLIER view moves its
    // first transition duration from 4 s to 6 s
    val b1 = Seq(ev("u2", "buy", 15), ev("u1", "view", 8))
    run(b1, 1L)
    assert(last == expect(b0 ++ b1))
    assert(last.head == ((2L, 2L, 1000L, 6000L, 7000L, 3500L)))
    // crash-replay: ledger untouched
    val snapshot = last
    run(b1, 1L)
    assert(last == snapshot)
  }

  test("sampleStream: ledger after every batch equals batch " +
      "perGroupSample over all data so far; replay and re-delivered " +
      "rows are no-ops; payload columns ride along") {
    import org.apache.spark.sql.functions._
    import graft.ml.Sampling
    val st = java.nio.file.Files.createTempDirectory("ssamp").toString
    var last: Set[(String, Long, String)] = Set.empty
    val sink: org.apache.spark.sql.DataFrame => Unit = df =>
      last = df.select("g", "id", "payload").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getString(2))).toSet
    def run(rows: Seq[(String, Long, String)], batchId: Long): Unit =
      StreamOps.processSampleBatch(rows.toDF("g", "id", "payload"),
        batchId, "g", "id", k = 3, salt = "e0", statePath = st,
        sink = sink)
    def expect(all: Seq[(String, Long, String)]) =
      Sampling.perGroupSample(
          all.toDF("g", "id", "payload").dropDuplicates("g", "id"),
          "g", "id", 3, "e0")
        .select("g", "id", "payload").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getString(2))).toSet
    val b0 = (1L to 10L).map(i => ("A", i, s"p$i")) ++
      (1L to 2L).map(i => ("B", i, s"q$i"))
    run(b0, 0L)
    assert(last == expect(b0) && last.count(_._1 == "A") == 3
      && last.count(_._1 == "B") == 2)
    // batch 1: more rows incl. a RE-DELIVERED row (A, 4) — no dup
    val b1 = (11L to 25L).map(i => ("A", i, s"p$i")) ++
      Seq(("A", 4L, "p4"), ("B", 3L, "q3"))
    run(b1, 1L)
    assert(last == expect(b0 ++ b1))
    // crash-replay of batch 1: same id — ledger untouched
    val snapshot = last
    run(b1, 1L)
    assert(last == snapshot)
    // convergence continues across a third batch
    val b2 = (26L to 40L).map(i => ("B", i, s"q$i"))
    run(b2, 2L)
    assert(last == expect(b0 ++ b1 ++ b2)
      && last.count(_._1 == "B") == 3)
  }
}

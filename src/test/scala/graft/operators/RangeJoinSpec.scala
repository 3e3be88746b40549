package graft.operators

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.SparkSuite

class RangeJoinSpec extends SparkSuite {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  // raise_error surfaces wrapped in SparkException layers in local
  // mode — assert against the whole cause chain
  private def fullMsg(e: Throwable): String =
    Iterator.iterate(e)(_.getCause).takeWhile(_ != null)
      .map(t => Option(t.getMessage).getOrElse("")).mkString("\n")

  test("pointInInterval matches exactly the contained points") {
    val pts = Seq(
      (1L, ts("2024-01-01 10:30:00")),
      (2L, ts("2024-01-01 11:59:59")), // boundary: inside (inclusive end)
      (3L, ts("2024-01-01 12:00:01")), // just outside
      (4L, ts("2024-01-03 05:00:00"))) // inside a long interval
      .toDF("id", "ts")
    val ivs = Seq(
      ("w1", ts("2024-01-01 10:00:00"), ts("2024-01-01 11:59:59")),
      ("w2", ts("2024-01-03 00:00:00"), ts("2024-01-03 23:59:59")))
      .toDF("name", "start", "end")
    val out = RangeJoin.pointInInterval(pts, "ts", ivs, "start", "end",
        bucketMillis = 3600L * 1000)
      .select("id", "i_name").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    assert(out == Set((1L, "w1"), (2L, "w1"), (4L, "w2")))
  }

  test("intervalOverlap: inclusive endpoints, multi-bucket pairs emit " +
      "ONCE, equals the naive theta join at any bucket size") {
    val rnd = new scala.util.Random(17)
    val base = 1704067200000L
    def mk(n: Int, maxLen: Int, seedShift: Int) = (1 to n).map { i =>
      val s = base + rnd.nextInt(86400000 - maxLen)
      (i.toLong + seedShift, new Timestamp(s),
        new Timestamp(s + 1000 + rnd.nextInt(maxLen)))
    }
    // long intervals (up to 6 h) spanning MANY 1-min buckets: the
    // canonical-bucket rule is what keeps pairs single
    val aIv = mk(60, 21600000, 0).toDF("aid", "s", "e")
    val bIv = mk(40, 21600000, 1000).toDF("bid", "s", "e")
    val naive = aIv.join(
        bIv.toDF("bid2", "s2", "e2"),
        col("s") <= col("e2") && col("s2") <= col("e"))
      .select("aid", "bid2").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted
    for (bucket <- Seq(60000L, 3600000L, 43200000L)) {
      val fast = RangeJoin.intervalOverlap(aIv, "s", "e",
          bIv, "s", "e", bucket)
        .select(col("aid"), col("i_bid")).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted
      assert(fast == naive, s"bucket $bucket") // sorted SEQ: dups fail
    }
    // touching endpoints overlap (inclusive)
    val a1 = Seq((1L, ts("2024-01-01 10:00:00"), ts("2024-01-01 11:00:00")))
      .toDF("aid", "s", "e")
    val b1 = Seq((2L, ts("2024-01-01 11:00:00"), ts("2024-01-01 12:00:00")),
        (3L, ts("2024-01-01 11:00:01"), ts("2024-01-01 12:00:00")))
      .toDF("bid", "s", "e")
    val touch = RangeJoin.intervalOverlap(a1, "s", "e", b1, "s", "e",
        3600000L)
      .select("i_bid").collect().map(_.getLong(0)).toSeq
    assert(touch == Seq(2L))
  }

  test("guards: non-positive bucket, reversed interval, span explosion " +
      "all fail LOUDLY (not a silent wrong or exploding plan)") {
    val a = Seq((1L, ts("2024-01-01 10:00:00"), ts("2024-01-01 11:00:00")))
      .toDF("aid", "s", "e")
    val pts = Seq((1L, ts("2024-01-01 10:30:00"))).toDF("id", "ts")
    intercept[IllegalArgumentException] {
      RangeJoin.intervalOverlap(a, "s", "e", a, "s", "e", 0L)
    }
    intercept[IllegalArgumentException] {
      RangeJoin.pointInInterval(pts, "ts", a, "s", "e", -1000L)
    }
    // reversed interval (end < start): loud per-row raise, not a
    // silently descending bucket sequence
    val rev = Seq((9L, ts("2024-01-01 12:00:00"), ts("2024-01-01 10:00:00")))
      .toDF("bid", "s", "e")
    val eRev = intercept[Exception] {
      RangeJoin.intervalOverlap(a, "s", "e", rev, "s", "e", 60000L).collect()
    }
    assert(fullMsg(eRev).contains("reversed interval"))
    // a year-long interval at a 1-minute bucket (~525k buckets/row):
    // raises naming the fix instead of exploding / hitting the array cap
    val yearLong = Seq((8L, ts("2024-01-01 00:00:00"),
        ts("2024-12-31 00:00:00"))).toDF("bid", "s", "e")
    val eSpan = intercept[Exception] {
      RangeJoin.intervalOverlap(a, "s", "e", yearLong, "s", "e", 60000L)
        .collect()
    }
    assert(fullMsg(eSpan).contains("widen bucketMillis"))
    val eSpanPt = intercept[Exception] {
      RangeJoin.pointInInterval(pts, "ts", yearLong, "s", "e", 60000L)
        .collect()
    }
    assert(fullMsg(eSpanPt).contains("widen bucketMillis"))
  }

  test("result equals the naive BETWEEN join regardless of bucket size") {
    val rnd = new scala.util.Random(11)
    val base = 1704067200000L
    val pts = (1 to 300).map(i =>
      (i.toLong, new Timestamp(base + rnd.nextInt(86400000))))
      .toDF("id", "ts")
    val ivs = (1 to 20).map { i =>
      val s = base + rnd.nextInt(86400000 - 7200000)
      (i.toLong, new Timestamp(s), new Timestamp(s + 1000 + rnd.nextInt(7200000)))
    }.toDF("iid", "start", "end")
    val naive = pts.join(ivs,
        col("ts") >= col("start") && col("ts") <= col("end"))
      .select("id", "iid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    for (bucket <- Seq(60000L, 3600000L, 7200000L)) {
      val fast = RangeJoin.pointInInterval(pts, "ts", ivs, "start", "end", bucket)
        .select(col("id"), col("i_iid")).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(fast == naive, s"bucket $bucket")
    }
  }
}

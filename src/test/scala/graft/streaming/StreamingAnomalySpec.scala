package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkSuite
import graft.streaming.StreamingAnomaly.{Flag, Point}

class StreamingAnomalySpec extends SparkSuite {
  import spark.implicits._

  test("step: warm-up never flags, spike flags, spike does not mask itself") {
    // drive the pure step function through the streaming runtime
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[Point]
    val q = StreamingAnomaly.flags(input.toDS(), threshold = 3.0, minN = 10)
      .writeStream.format("memory").queryName("anom_out")
      .outputMode("append").start()
    try {
      // batch 1: stable baseline 10.0 ± 1.0 (20 points)
      input.addData((0 until 20).map(i =>
        Point("svc", i.toLong, 1000L + i * 1000,
          if (i % 2 == 0) 9.0 else 11.0)))
      q.processAllAvailable()
      // batch 2: one huge spike then a normal point
      input.addData(
        Point("svc", 100L, 60_000L, 100.0),
        Point("svc", 101L, 61_000L, 10.0))
      q.processAllAvailable()
      val flags = spark.table("anom_out").as[Flag].collect()
        .map(f => f.eventId -> f).toMap
      // warm-up: first 10 points have z = 0 and never flag
      assert((0 until 10).forall(i => !flags(i.toLong).anomaly &&
        flags(i.toLong).z == 0.0))
      // baseline points after warm-up stay under threshold
      assert((10 until 20).forall(i => !flags(i.toLong).anomaly))
      // the spike flags hard (mean 10, std 1 -> z = 90)
      assert(flags(100L).anomaly && flags(100L).z > 50.0)
      // the NEXT normal point still scores low: the spike was folded in
      // after scoring, and one outlier in 21 baseline points widens std
      // but does not recenter the mean onto itself
      assert(!flags(101L).anomaly)
      // state carried across micro-batches: all 22 rows emitted
      assert(flags.size == 22)
    } finally q.stop()
  }

  test("keys isolate state") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[Point]
    val q = StreamingAnomaly.flags(input.toDS(), threshold = 3.0, minN = 2)
      .writeStream.format("memory").queryName("anom_keys")
      .outputMode("append").start()
    try {
      // key a has a tight baseline; key b's values would be anomalies
      // under a's moments but are b's own normal baseline
      input.addData((0 until 10).map(i =>
        Point("a", i.toLong, 1000L + i * 1000, if (i % 2 == 0) 1.0 else 2.0)) ++
        (0 until 10).map(i =>
          Point("b", 100L + i, 1000L + i * 1000,
            if (i % 2 == 0) 1000.0 else 2000.0)))
      q.processAllAvailable()
      val flags = spark.table("anom_keys").as[Flag].collect()
      assert(flags.length == 20)
      assert(flags.forall(!_.anomaly))
    } finally q.stop()
  }
}

package graft.query

import org.apache.spark.sql.functions._

import graft.SparkSuite

class PercentilesSpec extends SparkSuite {
  import spark.implicits._

  test("exact discrete percentiles select the floor(p*(n-1)) element") {
    val df = spark.range(0, 101).toDF("id")
      .withColumn("g", lit("a"))
      .withColumn("v", col("id").cast("double"))
    val row = Percentiles.exact(df, "g", "v", "id", Seq(0.0, 0.5, 0.95, 1.0))
      .collect()(0)
    // n=101: ranks 0, 50, floor(0.95*100)=95, 100
    assert(row.getDouble(row.fieldIndex("p0")) == 0.0)
    assert(row.getDouble(row.fieldIndex("p50")) == 50.0)
    assert(row.getDouble(row.fieldIndex("p95")) == 95.0)
    assert(row.getDouble(row.fieldIndex("p100")) == 100.0)
  }

  test("grouped percentiles with ties broken by the tiebreak column") {
    val df = Seq(
      ("x", 1L, 5.0), ("x", 2L, 5.0), ("x", 3L, 1.0),
      ("y", 4L, 9.0)).toDF("g", "id", "v")
    val rows = Percentiles.exact(df, "g", "v", "id", Seq(0.5))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    // x sorted: (1.0,3),(5.0,1),(5.0,2) → rank floor(0.5*2)=1 → 5.0 (id 1)
    assert(rows("x") == 5.0)
    assert(rows("y") == 9.0)
  }

  test("exactBy groups by a composite key (service × bin)") {
    val df = Seq(
      ("svc1", "d1", 1L, 10.0), ("svc1", "d1", 2L, 20.0),
      ("svc1", "d1", 3L, 30.0),
      ("svc1", "d2", 4L, 100.0),
      ("svc2", "d1", 5L, 7.0)).toDF("svc", "day", "id", "v")
    val rows = Percentiles.exactBy(df, Seq("svc", "day"), "v", "id", Seq(0.5))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2))
      .toMap
    assert(rows(("svc1", "d1")) == 20.0) // median of 3
    assert(rows(("svc1", "d2")) == 100.0)
    assert(rows(("svc2", "d1")) == 7.0)
  }

  test("exemplarAt returns the whole row at the quantile rank") {
    val df = (1 to 100).map(i => ("svc", i.toLong, i * 10.0))
      .toDF("svc", "id", "v")
    val r = Percentiles.exemplarAt(df, Seq("svc"), "v", Seq("id"), p = 0.99)
      .collect()
    // floor(0.99 * 99) = 98 -> rank 99 (1-based) -> value 990, id 99
    assert(r.length == 1)
    assert(r(0).getAs[Double]("v") == 990.0 && r(0).getAs[Long]("id") == 99L)
    // p=0 picks the minimum row
    val lo = Percentiles.exemplarAt(df, Seq("svc"), "v", Seq("id"), p = 0.0)
      .collect()
    assert(lo(0).getAs[Long]("id") == 1L)
  }

  test("histogramQuantile: Prometheus semantics — lowest covering " +
      "bucket, linear interpolation, first bucket from 0, zero-count " +
      "buckets skipped, empty group null") {
    // svc a: le 100→10 obs, le 200→30, le 400→60 (total 100)
    // p50: rank 50, bucket (100,200] covers (cum 40→10+30=40<50≤... no:
    // cum: 10, 40, 100 → p50 lands in le=400: lower=200,
    // q = 200 + 200*(50-40)/60 = 233.33→233
    val b = Seq(
      ("a", 100L, 10L), ("a", 200L, 30L), ("a", 400L, 60L),
      // svc c: a zero-count middle bucket must never be selected
      ("c", 100L, 5L), ("c", 200L, 0L), ("c", 400L, 5L),
      // svc z: all-zero → total 0 → q null
      ("z", 100L, 0L))
      .toDF("svc", "le", "cnt")
    val p50 = Percentiles.histogramQuantile(b, Seq("svc"), "le", "cnt",
        phiMicro = 500000L)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), if (r.isNullAt(2)) -1L else r.getLong(2))).toMap
    assert(p50("a") == ((100L, 233L)))
    // c: rank 5, first bucket covers (cum 5 ≥ 5): 0 + 100*5/5 = 100
    assert(p50("c") == ((10L, 100L)))
    assert(p50("z") == ((0L, -1L)))
    // p10 of a: rank 10, first bucket: 0 + 100*(10-0)/10 = 100
    val p10 = Percentiles.histogramQuantile(b, Seq("svc"), "le", "cnt",
        phiMicro = 100000L)
      .collect().filterNot(_.isNullAt(2))
      .map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(p10("a") == 100L)
    // p100 returns the top bucket's upper bound
    val p100 = Percentiles.histogramQuantile(b, Seq("svc"), "le", "cnt",
        phiMicro = 1000000L)
      .collect().filterNot(_.isNullAt(2))
      .map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(p100("a") == 400L)
    intercept[IllegalArgumentException] {
      Percentiles.histogramQuantile(b, Seq("svc"), "le", "cnt", 0L)
    }
  }
}

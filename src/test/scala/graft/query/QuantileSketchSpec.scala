package graft.query

import org.apache.spark.sql.functions._

import graft.SparkSuite

class QuantileSketchSpec extends SparkSuite {
  import spark.implicits._

  private lazy val df = (1 to 10000).map(i => (i % 4, i.toDouble))
    .toDF("g", "v")

  test("per-group sketches estimate quantiles within KLL rank error") {
    val sk = QuantileSketch.sketchByGroup(df, "v", Seq("g"))
    assert(sk.count() == 4)
    val est = QuantileSketch.mergeSketches(sk, Seq("g"), Seq(0.5))
      .select("g", "p50").collect()
      .map(r => r.getInt(0) -> r.getDouble(1)).toMap
    // each group is ~uniform over 1..10000: median ≈ 5000 ± 2% rank error
    est.values.foreach(m => assert(math.abs(m - 5000.0) < 400.0, m))
  }

  test("rollup merge over group sketches matches a direct global sketch") {
    val perGroup = QuantileSketch.sketchByGroup(df, "v", Seq("g"))
    val rolled = QuantileSketch.mergeSketches(perGroup, Nil,
      Seq(0.1, 0.5, 0.9)).collect().head
    val direct = QuantileSketch.mergeSketches(
      QuantileSketch.sketchByGroup(df, "v", Nil), Nil,
      Seq(0.1, 0.5, 0.9)).collect().head
    // both are sketches of the same 10k values: estimates agree within
    // twice the 1.65% rank error bound (they need not be identical — KLL
    // compaction is randomized)
    for (c <- Seq("p10", "p50", "p90")) {
      val a = rolled.getAs[Double](c)
      val b = direct.getAs[Double](c)
      assert(math.abs(a - b) < 10000 * 0.033, s"$c: $a vs $b")
    }
  }

  test("sketch bytes survive a shuffle boundary (serialization roundtrip)") {
    // force wide plan: repartition between sketch and merge
    val sk = QuantileSketch.sketchByGroup(df, "v", Seq("g")).repartition(7)
    val est = QuantileSketch.mergeSketches(sk, Nil, Seq(0.5))
      .select("p50").as[Double].head()
    assert(math.abs(est - 5000.0) < 400.0)
  }
}

package graft.query

import graft.SparkSuite

class FrequencySketchSpec extends SparkSuite {
  import spark.implicits._

  // skewed stream: "hot" 5000×, "warm" 2000×, tail of 1000 uniques
  private lazy val df = (
    Seq.fill(5000)("hot") ++ Seq.fill(2000)("warm") ++
      (1 to 1000).map(i => s"tail$i"))
    .zipWithIndex.map { case (v, i) => (i % 4, v) }
    .toDF("g", "v")

  test("heavy hitters are recovered with near-exact counts") {
    val sk = FrequencySketch.sketchByGroup(df, "v", Nil)
    val top = FrequencySketch.mergeTopK(sk, Nil, 2)
      .collect().map(r => (r.getString(1), r.getLong(2)))
    assert(top.map(_._1).toSeq == Seq("hot", "warm"))
    // Misra-Gries error ≤ n/MaxMapSize = 8000/512 < 16
    assert(math.abs(top(0)._2 - 5000L) <= 16)
    assert(math.abs(top(1)._2 - 2000L) <= 16)
  }

  test("per-group sketches roll up to the same answer as a direct sketch") {
    val perGroup = FrequencySketch.sketchByGroup(df, "v", Seq("g"))
    assert(perGroup.count() == 4)
    val rolled = FrequencySketch.mergeTopK(perGroup.repartition(5), Nil, 1)
      .collect().head
    assert(rolled.getString(1) == "hot")
    assert(math.abs(rolled.getLong(2) - 5000L) <= 64) // merged error adds up
  }
}

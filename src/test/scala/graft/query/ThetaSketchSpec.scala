package graft.query

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** [[ThetaSketch]] — KMV distinct-count set algebra: exhaustive sketches
  * are EXACT, estimation error is bounded, and the union path is
  * bottom-k-mergeable (the merged sketch equals the sketch rebuilt from
  * the raw union — exact frame equality, the sampleStream mergeability
  * argument).
  */
class ThetaSketchSpec extends SparkSuite {
  import spark.implicits._

  private def setDf(g: String, vs: Range) =
    vs.map(v => (g, v.toLong)).toDF("g", "v")

  test("exhaustive sketches (n < k) are exact: cardinality, " +
      "intersection and union all return true counts") {
    val df = setDf("a", 0 until 40) union setDf("b", 20 until 70)
    val sk = ThetaSketch.kmv(df, Seq("g"), col("v"), k = 128)
    val card = ThetaSketch.cardinality(sk, Seq("g"), 128)
      .orderBy("g").collect()
      .map(r => (r.getString(0), r.getLong(r.fieldIndex("est_distinct"))))
    assert(card.toSeq == Seq(("a", 40L), ("b", 50L)))
    val alg = ThetaSketch.pairwiseSetAlgebra(sk, "g", 128)
      .collect().head
    assert(alg.getString(0) == "a" && alg.getString(1) == "b")
    assert(alg.getLong(alg.fieldIndex("n_common")) == 20L)
    assert(alg.getLong(alg.fieldIndex("intersect_est")) == 20L)
    assert(alg.getLong(alg.fieldIndex("union_est")) == 70L)
  }

  test("estimation branch: 5000-distinct set at k=128 lands within 30%; " +
      "duplicates collapse before sketching") {
    val df = setDf("a", 0 until 5000) union setDf("a", 0 until 5000)
    val sk = ThetaSketch.kmv(df, Seq("g"), col("v"), k = 128)
    assert(sk.count() == 128)
    val est = ThetaSketch.cardinality(sk, Seq("g"), 128)
      .collect().head.getAs[Long]("est_distinct")
    assert(est > 3500L && est < 6500L, s"est=$est")
  }

  test("union is bottom-k-mergeable EXACTLY: the pair's union estimate " +
      "equals the cardinality of a sketch rebuilt from the raw union") {
    val a = setDf("a", 0 until 3000)
    val b = setDf("b", 1500 until 4500)
    val sk = ThetaSketch.kmv(a union b, Seq("g"), col("v"), k = 64)
    val pairUnion = ThetaSketch.pairwiseSetAlgebra(sk, "g", 64)
      .collect().head.getAs[Long]("union_est")
    val rebuilt = ThetaSketch.cardinality(
      ThetaSketch.kmv((a union b).withColumn("g", lit("u")),
        Seq("g"), col("v"), k = 64), Seq("g"), 64)
      .collect().head.getAs[Long]("est_distinct")
    assert(pairUnion == rebuilt)
    // intersection: true overlap 1500 of 4500 — wide net, the point is
    // the estimator is in the right decade and deterministic
    val inter = ThetaSketch.pairwiseSetAlgebra(sk, "g", 64)
      .collect().head.getAs[Long]("intersect_est")
    assert(inter > 500L && inter < 3200L, s"inter=$inter")
    // determinism: same inputs, same plan, same numbers
    val again = ThetaSketch.pairwiseSetAlgebra(
      ThetaSketch.kmv((a union b).repartition(7), Seq("g"), col("v"),
        k = 64), "g", 64).collect().head
    assert(again.getAs[Long]("intersect_est") == inter)
    assert(again.getAs[Long]("union_est") == pairUnion)
  }

  test("NULL values never enter the sketch: they would sort first in " +
      "Spark (displacing a real hash) but last in DuckDB, and at k=2 " +
      "with one real value a null rank-1 row would make theta 0") {
    val df = Seq(("a", Some(7L)), ("a", None), ("a", None))
      .toDF("g", "v")
    val sk = ThetaSketch.kmv(df, Seq("g"), col("v"), k = 2)
    assert(sk.count() == 1L) // only the real value's hash survives
    val card = ThetaSketch.cardinality(sk, Seq("g"), 2).collect().head
    assert(card.getAs[Long]("est_distinct") == 1L)
    assert(card.getAs[Long]("theta") > 0L)
    // the merge fold drops stray null hashes the same way
    val folded = ThetaSketch.bottomKHashes(
      sk.unionByName(Seq(("a", null.asInstanceOf[java.lang.Long]))
        .toDF("g", "h")), Seq("g"), 2)
    assert(folded.count() == 1L)
  }

  test("k bounds are enforced") {
    val df = setDf("a", 0 until 10)
    intercept[IllegalArgumentException] {
      ThetaSketch.kmv(df, Seq("g"), col("v"), k = 1)
    }
    intercept[IllegalArgumentException] {
      ThetaSketch.kmv(df, Seq("g"), col("v"), k = ThetaSketch.MaxK + 1)
    }
  }
}

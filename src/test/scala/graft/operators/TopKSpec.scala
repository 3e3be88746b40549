package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.SparkSuite

class TopKSpec extends SparkSuite {
  import spark.implicits._

  private lazy val df = spark.range(0, 10000).toDF("id")
    .withColumn("grp", (col("id") % 37).cast("long"))
    .withColumn("score", (col("id") * 2654435761L % 1000003L).cast("double"))
    .repartition(8)

  private def windowTopK(k: Int) = {
    val w = Window.partitionBy(col("grp"))
      .orderBy(col("score").desc, col("id").asc)
    df.withColumn("rk", row_number().over(w)).filter(col("rk") <= k).drop("rk")
  }

  private def asSet(d: org.apache.spark.sql.DataFrame) =
    d.select("id", "grp", "score").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet

  test("matches the window row_number formulation exactly") {
    for (k <- Seq(1, 3, 10)) {
      val custom = TopK.perGroup(df, Seq(col("grp")),
        Seq(col("score").desc, col("id").asc), k)
      assert(asSet(custom) == asSet(windowTopK(k)), s"k=$k")
    }
  }

  test("k larger than every group returns all rows") {
    val custom = TopK.perGroup(df, Seq(col("grp")),
      Seq(col("score").desc, col("id").asc), 100000)
    assert(custom.count() == 10000)
  }

  test("plan is partial -> exchange -> final, with no sort") {
    val custom = TopK.perGroup(df, Seq(col("grp")),
      Seq(col("score").desc, col("id").asc), 5)
    val plan = custom.queryExecution.executedPlan.toString
    assert(plan.contains("TopKPerGroup (partial)"))
    assert(plan.contains("TopKPerGroup (final)"))
    val partialIdx = plan.indexOf("TopKPerGroup (partial)")
    val finalIdx = plan.indexOf("TopKPerGroup (final)")
    val exchangeIdx = plan.indexOf("Exchange hashpartitioning")
    assert(finalIdx < exchangeIdx && exchangeIdx < partialIdx) // tree order
    assert(!plan.contains("Sort ")) // the whole point: no full sort
  }

  test("works through SQL extensions-installed strategy and ties break") {
    // duplicate scores: tiebreak picks lowest ids deterministically
    val dups = Seq((1L, "a", 5.0), (2L, "a", 5.0), (3L, "a", 5.0),
      (4L, "b", 1.0)).toDF("id", "grp", "score")
    val out = TopK.perGroup(dups, Seq(col("grp")),
      Seq(col("score").desc, col("id").asc), 2)
      .select("id").as[Long].collect().toSet
    assert(out == Set(1L, 2L, 4L))
  }
}

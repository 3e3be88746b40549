package graft.operators

import graft.SparkSuite

class AsOfJoinSpec extends SparkSuite {
  import spark.implicits._

  test("asOf picks the latest right row at-or-before each left time") {
    val quotes = Seq( // key, time, px
      ("A", 10L, 1.0), ("A", 20L, 2.0), ("A", 30L, 3.0),
      ("B", 15L, 9.0)).toDF("sym", "qt", "px")
    val trades = Seq( // key, time, qty
      ("A", 5L, 100L),  // before any quote -> null
      ("A", 20L, 200L), // equal time -> inclusive match (px=2.0)
      ("A", 25L, 300L), // between -> px=2.0
      ("A", 99L, 400L), // after all -> px=3.0
      ("B", 16L, 500L), // -> 9.0
      ("C", 50L, 600L)  // key never quoted -> null
    ).toDF("sym", "tt", "qty")

    val out = AsOfJoin.asOf(trades, quotes, "sym", "sym", "tt", "qt",
        Seq("px")).orderBy($"sym", $"tt")
      .select($"sym", $"tt", $"qty", $"px_asof").collect()
      .map(r => (r.getString(0), r.getLong(1),
        if (r.isNullAt(3)) None else Some(r.getDouble(3))))
    assert(out.toSeq == Seq(
      ("A", 5L, None), ("A", 20L, Some(2.0)), ("A", 25L, Some(2.0)),
      ("A", 99L, Some(3.0)), ("B", 16L, Some(9.0)), ("C", 50L, None)))
  }

  test("plan is a single window over the union — no cartesian/range join") {
    val l = Seq(("A", 1L)).toDF("k", "t")
    val r = Seq(("A", 1L, 5.0)).toDF("k", "t", "v")
    val plan = AsOfJoin.asOf(l, r, "k", "k", "t", "t", Seq("v"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"))
    assert(plan.contains("Window"))
  }
}

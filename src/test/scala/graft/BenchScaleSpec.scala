package graft

import graft.SparkSuite

/** [[BenchScale]]'s gate-health net: the row-floor assert that closes the
  * r17 τ-b gotcha (a gate whose inputs drift apart with corpus size can
  * return 0 rows at scale and "pass" while testing nothing). The net must
  * FIRE on a degenerate (empty / erroring / truncated) result and stay
  * silent on a healthy one — proven here with an intentionally degenerate
  * fixture driven through the same [[Bench.materialize]] row counting the
  * sweep uses.
  */
class BenchScaleSpec extends SparkSuite {
  import spark.implicits._

  test("the net fires on an intentionally degenerate result: an " +
      "empty-intersection frame materializes 0 rows and violates its " +
      "floor; a healthy frame passes") {
    // the r17 failure shape in miniature: two rankings whose top cuts
    // share nothing — the intersection is EMPTY, yet a hash compare of
    // two empty results would happily agree
    val a = Seq(1L, 2L, 3L).toDF("id")
    val b = Seq(10L, 20L).toDF("id")
    val degenerate = a.intersect(b)
    val rows = Bench.materialize(degenerate)
    assert(rows == 0L)
    val v = BenchScale.rowFloorViolations(
      Map("q_degenerate" -> ((0.1, rows))), "sf0.1")
    assert(v == Seq("q_degenerate@sf0.1: rows=0 < floor=1"))
    // healthy: clears the default floor — silent
    val healthy = Bench.materialize(a)
    assert(BenchScale.rowFloorViolations(
      Map("q_fine" -> ((0.1, healthy))), "sf1").isEmpty)
    // an erroring query (the sweep records -1) also trips the net
    assert(BenchScale.rowFloorViolations(
      Map("q_err" -> ((0.0, -1L))), "sf10").nonEmpty)
  }

  test("declared floors bind tighter than the default: a truncated-but-" +
      "nonempty result below its declared minimum is flagged") {
    val v = BenchScale.rowFloorViolations(
      Map("q_sketch_setops" -> ((1.0, 2L))), "sf0.1")
    assert(v == Seq("q_sketch_setops@sf0.1: rows=2 < floor=5"))
    assert(BenchScale.rowFloorViolations(
      Map("q_sketch_setops" -> ((1.0, 10L))), "sf0.1").isEmpty)
    // every declared floor names a query the sweep actually runs
    BenchScale.RowFloors.keySet.foreach { q =>
      assert(SparkEntry.queries.contains(q), s"floor for unknown gate $q")
    }
  }

  test("every swept gate carries a MEASURED floor — the default-1 net " +
      "only covers gates added to the sweep before their first green run") {
    BenchScale.Queries.foreach { q =>
      assert(BenchScale.RowFloors.contains(q), s"unmeasured floor for $q")
      assert(BenchScale.RowFloors(q) >= 1L)
    }
    // and no floor is stale: each names a swept gate
    BenchScale.RowFloors.keySet.foreach { q =>
      assert(BenchScale.Queries.contains(q), s"floor for unswept $q")
    }
  }
}

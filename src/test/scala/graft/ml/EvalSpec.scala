package graft.ml

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** [[Eval.thresholdSweep]] — one-pass precision/recall tables. */
class EvalSpec extends SparkSuite {
  import spark.implicits._

  test("sweep matches the brute-force per-threshold confusion table") {
    // scores 1..20; label = score is even
    val df = (1L to 20L).map(s => (s, s % 2 == 0)).toDF("score", "y")
    val out = Eval.thresholdSweep(df, "score", "y", Seq(5L, 10L, 15L))
      .orderBy($"threshold")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6))).toSeq
    val expected = Seq(5L, 10L, 15L).map { t =>
      val tp = (1L to 20L).count(s => s >= t && s % 2 == 0).toLong
      val fp = (1L to 20L).count(s => s >= t && s % 2 != 0).toLong
      val fn = 10L - tp
      val tn = 10L - fp
      (t, tp, fp, fn, tn, tp * 1000000L / (tp + fp), tp * 1000000L / 10L)
    }
    assert(out == expected)
  }

  test("zero denominators yield null, not a division error") {
    val df = Seq((1L, true), (2L, false)).toDF("score", "y")
    val r = Eval.thresholdSweep(df, "score", "y", Seq(100L))
      .collect().head
    assert(r.getLong(1) == 0L && r.getLong(3) == 1L) // tp 0, fn 1
    assert(r.isNullAt(5)) // precision null at tp+fp = 0
    assert(r.getLong(6) == 0L) // recall 0/1 = 0
    // all-negative labels: recall null too
    val neg = Eval.thresholdSweep(
      Seq((1L, false)).toDF("score", "y"), "score", "y", Seq(0L))
      .collect().head
    assert(neg.isNullAt(6))
  }

  test("thresholds must be strictly ascending") {
    val df = Seq((1L, true)).toDF("score", "y")
    intercept[IllegalArgumentException] {
      Eval.thresholdSweep(df, "score", "y", Seq(5L, 5L))
    }
    intercept[IllegalArgumentException] {
      Eval.thresholdSweep(df, "score", "y", Nil)
    }
  }
}

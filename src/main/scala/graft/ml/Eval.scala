package graft.ml

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Classifier-evaluation primitives for the training-data pipeline: a
  * quality/toxicity/language scorer gates millions of documents, and the
  * cut point comes from a threshold sweep over a labeled slice. All
  * arithmetic integer-exact (micro-grid fractions via BIGINT division)
  * so sweeps reproduce bit-for-bit across engines.
  */
object Eval {

  /** PRECISION/RECALL TABLE over score thresholds — one pass, not one
    * pass per threshold: `score >= t` is monotone in `t`, so each row
    * reduces to the NUMBER of thresholds it clears (a codegen'd sum of
    * comparisons), one hash aggregate counts `(bin, label)` cells
    * (≤ 2(T+1) rows — a bounded driver fold assembles the cumulative
    * tails). At 100 TB the data pass is the whole cost and it is
    * exactly one narrow projection + one map-side-combined aggregate.
    *
    * `thresholds` must be strictly ascending. Confusion counts are
    * BIGINT; `precision_micro`/`recall_micro` are
    * `floor(10⁶·tp/(tp+fp))` / `floor(10⁶·tp/(tp+fn))`, null when the
    * denominator is zero. Returns one row per threshold:
    * (threshold, tp, fp, fn, tn, precision_micro, recall_micro).
    */
  def thresholdSweep(df: DataFrame, scoreCol: String, labelCol: String,
                     thresholds: Seq[Long]): DataFrame = {
    require(thresholds.nonEmpty &&
      thresholds.sliding(2).forall(w => w.size < 2 || w(0) < w(1)),
      "thresholds must be non-empty and strictly ascending")
    val spark = df.sparkSession
    import spark.implicits._
    val score = col(scoreCol).cast("long")
    val bin = thresholds
      .map(t => when(score >= t, 1).otherwise(0)).reduce(_ + _)
    val cells = df
      .select(bin.as("bin"), col(labelCol).cast("boolean").as("y"))
      .groupBy(col("bin"), col("y")).agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getInt(0), r.getBoolean(1), r.getLong(2)))
    val posTotal = cells.filter(_._2).map(_._3).sum
    val negTotal = cells.filter(!_._2).map(_._3).sum
    val rows = thresholds.zipWithIndex.map { case (t, i0) =>
      val i = i0 + 1 // row predicted positive at threshold i ⇔ bin >= i
      val tp = cells.filter(c => c._1 >= i && c._2).map(_._3).sum
      val fp = cells.filter(c => c._1 >= i && !c._2).map(_._3).sum
      val fn = posTotal - tp
      val tn = negTotal - fp
      val prec = if (tp + fp > 0) Some(tp * 1000000L / (tp + fp)) else None
      val rec = if (tp + fn > 0) Some(tp * 1000000L / (tp + fn)) else None
      (t, tp, fp, fn, tn, prec, rec)
    }
    rows.toDF("threshold", "tp", "fp", "fn", "tn",
      "precision_micro", "recall_micro")
  }
}

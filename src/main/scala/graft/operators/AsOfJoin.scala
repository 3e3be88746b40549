package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join: for every left row, the single most recent right row with
  * `rightTime <= leftTime` on the same key (time-series point-in-time
  * lookup — "the order state as of this event").
  *
  * Spark-first shape (no custom physical operator needed): tag both inputs,
  * union them, and run ONE window pass per key ordered by (time, side) —
  * right rows sort before left rows at equal times, so `last(col,
  * ignoreNulls)` over the unbounded-preceding frame carries each right
  * row's payload forward to every later left row. One shuffle on the key,
  * O(1) state per column in the running frame — compare a naive range join
  * (`l.key = r.key AND r.t <= l.t` + max-per-left), which explodes to
  * |matches| rows before re-aggregating: quadratic in dense keys.
  *
  * `rightCols` must be unambiguous payload column names from `right`; they
  * appear suffixed on the output. Right rows must be unique per
  * (key, time) — pre-aggregate if not (the last-wins tie would otherwise
  * be nondeterministic).
  */
object AsOfJoin {

  def asOf(left: DataFrame, right: DataFrame,
           leftKey: String, rightKey: String,
           leftTime: String, rightTime: String,
           rightCols: Seq[String], suffix: String = "_asof"): DataFrame = {
    val leftCols = left.columns.toSeq
    // align the two sides on a shared (key, time, side, payload...) shape
    val taggedLeft = left
      .withColumn("__key", col(leftKey))
      .withColumn("__time", col(leftTime))
      .withColumn("__side", lit(1))
    val taggedRight = right.select(
      (Seq(col(rightKey).as("__key"),
        col(rightTime).as("__time"),
        lit(0).as("__side")) ++
        rightCols.map(c => col(c).as(s"__r_$c"))): _*)
    val unioned = taggedLeft.unionByName(taggedRight, allowMissingColumns = true)
    val w = Window.partitionBy(col("__key"))
      .orderBy(col("__time").asc, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = rightCols.foldLeft(unioned) { (d, c) =>
      d.withColumn(s"$c$suffix", last(col(s"__r_$c"), ignoreNulls = true).over(w))
    }
    carried.filter(col("__side") === 1)
      .select((leftCols.map(col) ++ rightCols.map(c => col(s"$c$suffix"))): _*)
  }
}

package graft.query

import java.time.Duration

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Counts/histogram API: time-binned event counts with optional top-k group
  * breakdown.
  *
  * Re-expresses the reference's counts SQL generator (parseable
  * `src/query/mod.rs:665-735`) as a declarative DataFrame plan:
  *   - `DATE_BIN('<interval>', time, epoch)` → [[dateBin]] column arithmetic
  *     (Spark lacks date_bin; floor-to-interval on epoch millis is exact for
  *     the minute/hour/day bins the API generates).
  *   - auto bin width (`src/utils/time.rs:68-80`): 1m (≤1h) … 1d.
  *   - top-k groups (`src/query/mod.rs:708-735`): totals `ORDER BY count DESC
  *     LIMIT k`, joined back with null-safe equality — the join side is tiny
  *     (k rows) so it is explicitly broadcast: no shuffle of the binned side.
  */
object Counts {

  /** Floor `time` to `binMillis`-wide bins anchored at the Unix epoch.
    * Exact equivalent of DATE_BIN(interval, time, '1970-01-01') for
    * positive-epoch data: bin = (millis div width) * width.
    */
  def dateBin(time: Column, binMillis: Long): Column =
    timestamp_millis(
      (unix_millis(time.cast("timestamp")) / binMillis).cast("long") * lit(binMillis))
      .cast("timestamp_ntz")

  /** Auto bin width: mirrors reference `src/utils/time.rs:68-80`. */
  def autoBinMillis(range: Duration): Long = {
    val m = 60L * 1000
    if (range.toHours <= 5) m // 1 minute
    else if (range.toHours <= 24) 5 * m // 5 minutes
    else if (range.toDays < 10) 60 * m // 1 hour
    else 24 * 60 * m // 1 day
  }

  /** Histogram: count of rows per time bin. */
  def histogram(df: DataFrame, timeCol: String, binMillis: Long): DataFrame =
    df.groupBy(dateBin(col(timeCol), binMillis).as("bin_start"))
      .agg(count(lit(1)).as("bin_count"))

  /** Binned counts broken down by the top-k groups (by total count).
    *
    * Two aggregations over the same shuffle key-space + a broadcast join of
    * the k winning groups — the large input is shuffled once per aggregate
    * and never joined shuffle-to-shuffle.
    *
    * Determinism: ties in total count are broken by the group columns
    * ascending, mirroring what the oracle SQL must also declare.
    */
  def topKCounts(
      df: DataFrame,
      timeCol: String,
      groupCols: Seq[String],
      binMillis: Long,
      k: Int = 10): DataFrame = {
    val gcols = groupCols.map(col)
    val topK = df
      .groupBy(gcols: _*)
      .agg(count(lit(1)).as("total_count"))
      .orderBy(col("total_count").desc +: gcols.map(_.asc): _*)
      .limit(k)

    val binned = df
      .groupBy(dateBin(col(timeCol), binMillis).as("bin_start") +: gcols: _*)
      .agg(count(lit(1)).as("bin_count"))

    // Null-safe equality mirrors the reference's `(a = b OR (a IS NULL AND
    // b IS NULL))` join predicate (src/query/mod.rs:716-735).
    val topKRenamed = topK.select(
      groupCols.map(c => col(c).as(s"__k_$c")) :+ col("total_count"): _*)
    binned
      .join(broadcast(topKRenamed),
        groupCols.map(c => binned(c) <=> col(s"__k_$c")).reduce(_ && _))
      .select(col("bin_start") +: gcols :+ col("bin_count") :+ col("total_count"): _*)
  }
}

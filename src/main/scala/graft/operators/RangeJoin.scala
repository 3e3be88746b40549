package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Bucketed range join: points (a timestamp each) joined to intervals
  * `[start, end]` — "which maintenance window / deploy / incident does
  * this event fall into".
  *
  * Spark plans a raw `p.ts BETWEEN i.start AND i.end` join as a broadcast
  * nested loop — O(|points|·|intervals|) comparisons, which is exactly
  * what dies first at 100 TB. This operator makes it an equi-join: both
  * sides key on coarse time buckets (each interval explodes to every
  * bucket it overlaps; each point to its one bucket), the join shuffles on
  * the bucket, and the exact containment predicate filters inside the
  * (small) bucket groups. Cost: shuffle of points + |interval| ·
  * (len/bucket) exploded rows — linear, not quadratic. Pick `bucketMillis`
  * near the median interval length so intervals explode to O(1) buckets.
  *
  * The same layout is the standard fix for any banded/interval join
  * (IP-range lookup, price-at-time, genomic overlap).
  */
object RangeJoin {

  /** Join `points` (timestamp `ptCol`) to `intervals` (`startCol` ..
    * `endCol`, inclusive). Interval columns come back prefixed `i_`.
    * `keyCols` optionally adds equality keys (series id) to the bucket
    * key.
    */
  def pointInInterval(points: DataFrame, ptCol: String,
                      intervals: DataFrame, startCol: String, endCol: String,
                      bucketMillis: Long,
                      keyCols: Seq[String] = Nil): DataFrame = {
    val iv = intervals.columns.foldLeft(intervals)((d, c) =>
      d.withColumnRenamed(c, s"i_$c"))
    def bucketOf(c: org.apache.spark.sql.Column) =
      floor(unix_millis(c.cast("timestamp")) / lit(bucketMillis)).cast("long")
    val ivExploded = iv.withColumn("__bucket",
      explode(sequence(bucketOf(col(s"i_$startCol")),
        bucketOf(col(s"i_$endCol")))))
    val pts = points.withColumn("__bucket", bucketOf(col(ptCol)))
    val cond = keyCols.map(k => col(k) === col(s"i_$k"))
      .foldLeft(pts("__bucket") === ivExploded("__bucket"))(_ && _)
    pts.join(ivExploded, cond)
      .filter(col(ptCol) >= col(s"i_$startCol") &&
        col(ptCol) <= col(s"i_$endCol"))
      .drop("__bucket")
  }
}

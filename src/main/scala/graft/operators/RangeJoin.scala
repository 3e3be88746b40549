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

  /** Per-interval bucket cap: one pathological interval (a year at a
    * 1-minute bucket ≈ 525k buckets) would otherwise explode into that
    * many rows PER INPUT ROW — and past Spark's max array length,
    * `sequence()` throws an opaque error mid-job. Capped loudly at the
    * row that violates it, naming the fix (widen `bucketMillis`).
    * 2¹⁶ buckets ≈ a year of intervals at 10-minute buckets — far past
    * the "pick bucketMillis near the median interval length" contract.
    */
  val MaxSpanBuckets: Long = 65536L

  /** Bucket sequence for `[s, e]` with the row-level guards: a reversed
    * interval (e < s) raises instead of silently emitting a descending
    * sequence, and a span over [[MaxSpanBuckets]] buckets raises
    * instead of exploding (both `raise_error`, evaluated per row on
    * executors — the loud-failure house convention).
    */
  private def guardedBuckets(bs: org.apache.spark.sql.Column,
                             be: org.apache.spark.sql.Column,
                             op: String): org.apache.spark.sql.Column =
    sequence(bs,
      when(be < bs, raise_error(lit(s"$op: reversed interval " +
        "(end < start) — fix or filter such rows")).cast("long"))
        .when(be - bs > lit(MaxSpanBuckets), raise_error(lit(s"$op: " +
          s"interval spans more than $MaxSpanBuckets buckets — widen " +
          "bucketMillis toward the median interval length")).cast("long"))
        .otherwise(be))

  /** Join `points` (timestamp `ptCol`) to `intervals` (`startCol` ..
    * `endCol`, inclusive). Interval columns come back prefixed `i_`.
    * `keyCols` optionally adds equality keys (series id) to the bucket
    * key.
    */
  def pointInInterval(points: DataFrame, ptCol: String,
                      intervals: DataFrame, startCol: String, endCol: String,
                      bucketMillis: Long,
                      keyCols: Seq[String] = Nil): DataFrame = {
    require(bucketMillis > 0, "bucketMillis must be positive")
    val iv = intervals.columns.foldLeft(intervals)((d, c) =>
      d.withColumnRenamed(c, s"i_$c"))
    def bucketOf(c: org.apache.spark.sql.Column) =
      floor(unix_millis(c.cast("timestamp")) / lit(bucketMillis)).cast("long")
    val ivExploded = iv.withColumn("__bucket",
      explode(guardedBuckets(bucketOf(col(s"i_$startCol")),
        bucketOf(col(s"i_$endCol")), "pointInInterval")))
    val pts = points.withColumn("__bucket", bucketOf(col(ptCol)))
    val cond = keyCols.map(k => col(k) === col(s"i_$k"))
      .foldLeft(pts("__bucket") === ivExploded("__bucket"))(_ && _)
    pts.join(ivExploded, cond)
      .filter(col(ptCol) >= col(s"i_$startCol") &&
        col(ptCol) <= col(s"i_$endCol"))
      .drop("__bucket")
  }

  /** INTERVAL × INTERVAL overlap join — "which sessions overlapped the
    * incident", "which deploys overlapped the error burst": rows of `a`
    * paired with rows of `b` whose `[start, end]` ranges overlap
    * (inclusive endpoints: `aS ≤ bE ∧ bS ≤ aE`). `b`'s columns come
    * back prefixed `i_`; `keyCols` adds equality keys to the bucket key.
    *
    * Same bucket-grid rewrite as [[pointInInterval]] (the raw theta
    * join is a nested loop): both sides explode onto coarse buckets and
    * equi-join there. A pair that shares several buckets would emit
    * once per shared bucket — instead of a post-join `distinct`
    * (a second shuffle of the OUTPUT), each pair is emitted only at its
    * CANONICAL bucket `max(bucket(aS), bucket(bS))` — the first bucket
    * both intervals occupy, which every overlapping pair shares exactly
    * once by construction.
    */
  def intervalOverlap(a: DataFrame, aStartCol: String, aEndCol: String,
                      b: DataFrame, bStartCol: String, bEndCol: String,
                      bucketMillis: Long,
                      keyCols: Seq[String] = Nil): DataFrame = {
    require(bucketMillis > 0, "bucketMillis must be positive")
    val bv = b.columns.foldLeft(b)((d, c) =>
      d.withColumnRenamed(c, s"i_$c"))
    def bucketOf(c: org.apache.spark.sql.Column) =
      floor(unix_millis(c.cast("timestamp")) / lit(bucketMillis)).cast("long")
    val aX = a.withColumn("__bucket_a",
      explode(guardedBuckets(bucketOf(col(aStartCol)),
        bucketOf(col(aEndCol)), "intervalOverlap")))
    val bX = bv.withColumn("__bucket_b",
      explode(guardedBuckets(bucketOf(col(s"i_$bStartCol")),
        bucketOf(col(s"i_$bEndCol")), "intervalOverlap")))
    val cond = keyCols.map(k => col(k) === col(s"i_$k"))
      .foldLeft(col("__bucket_a") === col("__bucket_b"))(_ && _)
    aX.join(bX, cond)
      .filter(col(aStartCol) <= col(s"i_$bEndCol") &&
        col(s"i_$bStartCol") <= col(aEndCol))
      .filter(col("__bucket_a") ===
        greatest(bucketOf(col(aStartCol)), bucketOf(col(s"i_$bStartCol"))))
      .drop("__bucket_a", "__bucket_b")
  }
}

package graft.catalog

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) data layout: clusters rows so that per-file
  * min/max ranges stay tight on SEVERAL columns at once, which is what
  * makes [[StatsCatalog]]/`StatsFileIndex` pruning effective for
  * multi-dimensional predicates. A linear sort gives perfect pruning on
  * its leading column and none on the others; the Z-curve trades a little
  * of each for usable bounds on all.
  *
  * Write-path only — queries need no changes: pruning continues to work
  * off the per-file stats, the stats are just much tighter.
  *
  * Scale: the z-value is pure per-row bit arithmetic (codegen'd shifts),
  * and the layout is one `repartitionByRange` (sampled range boundaries —
  * one extra shuffle at write time) + in-partition sort, the same cost
  * shape as the reverse-time sort the ingest path already pays.
  */
object ZOrder {

  /** Morton interleave of up to 4 pre-bucketized integer columns (each in
    * `[0, 2^bits)`): bit b of column i lands at position `b·n + i`.
    * Backed by the fused codegen expression
    * [[graft.functions.MortonInterleave]] (n tight loops instead of a
    * ~2·bits·n-node expression tree).
    */
  def zvalue(buckets: Seq[Column], bits: Int = 16): Column = {
    require(buckets.nonEmpty && buckets.size <= 4)
    org.apache.spark.sql.graft.ColumnBridge.column(
      graft.functions.MortonInterleave(
        buckets.map(c =>
          org.apache.spark.sql.graft.ColumnBridge.expression(c.cast("long"))),
        bits))
  }

  /** [[zvalue]] as a composition of builtin shift/mask expressions — the
    * reference implementation the fused expression is tested against.
    */
  def zvalueComposed(buckets: Seq[Column], bits: Int = 16): Column = {
    require(buckets.nonEmpty && buckets.size <= 4)
    val n = buckets.size
    val terms = for {
      b <- 0 until bits
      (c, i) <- buckets.zipWithIndex
    } yield shiftleft(shiftright(c, b).bitwiseAND(lit(1L)), b * n + i)
    terms.reduce[Column](_ + _)
  }

  /** Linear min/max bucketization of a numeric column into `[0, 2^bits)`.
    * `lo`/`hi` come from table stats (or a sample); out-of-range values
    * clamp, so stale bounds only loosen clustering, never break it.
    */
  def bucketize(c: Column, lo: Double, hi: Double, bits: Int = 16): Column = {
    val buckets = (1L << bits) - 1
    val scaled = (c.cast("double") - lit(lo)) / lit(hi - lo) * lit(buckets.toDouble)
    least(greatest(floor(scaled).cast("long"), lit(0L)), lit(buckets))
  }

  /** Lay `df` out along the Z-curve of the given (column, lo, hi) dims
    * into `numFiles` range partitions, each internally sorted by z-value.
    * Write the result with one file per partition for tight per-file stats.
    */
  def layout(df: DataFrame, dims: Seq[(String, Double, Double)],
             numFiles: Int, bits: Int = 16): DataFrame = {
    val zv = zvalue(dims.map { case (c, lo, hi) =>
      bucketize(col(c), lo, hi, bits) }, bits)
    df.withColumn("__zv", zv)
      .repartitionByRange(numFiles, col("__zv"))
      .sortWithinPartitions(col("__zv"))
      .drop("__zv")
  }
}

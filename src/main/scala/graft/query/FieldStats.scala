package graft.query

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Per-field statistics: total/null counts, distinct counts, top-N values.
  *
  * The reference computes these per uploaded parquet file with a hand-rolled
  * HyperLogLog (p=12) and a bounded tracked-value map (parseable
  * `src/storage/field_stats.rs:86-90,122-352,595+`), persisting to the
  * internal `pstats` stream. Spark-first: one pass per field with
  * `approx_count_distinct` (Spark's HLL++, same precision class: rsd 0.01 ≈
  * p=12) and a groupBy/limit top-N; results land in a stats DataFrame with
  * the reference's `pstats` shape.
  */
object FieldStats {

  final case class TopValue(value: String, count: Long)
  final case class FieldStat(
      field: String,
      totalCount: Long,
      nullCount: Long,
      distinctApprox: Long,
      top: Seq[TopValue])

  /** HLL++ relative standard deviation matching the reference's p=12 HLL
    * (4096 registers → rsd ≈ 1.04/sqrt(4096) ≈ 0.016).
    */
  val Rsd = 0.016

  val TopN = 5

  def compute(df: DataFrame, fields: Seq[String]): Seq[FieldStat] = {
    // Single job for the scalar stats of every field: one scan, one row out.
    val aggs = fields.flatMap { f =>
      Seq(
        count(lit(1)).as(s"__total_$f"),
        count(col(f)).as(s"__nonnull_$f"),
        approx_count_distinct(col(f), Rsd).as(s"__distinct_$f"))
    }
    val row = df.agg(aggs.head, aggs.tail: _*).collect()(0)
    fields.map { f =>
      val total = row.getAs[Long](s"__total_$f")
      val nonNull = row.getAs[Long](s"__nonnull_$f")
      val top = df
        .filter(col(f).isNotNull)
        .groupBy(col(f).cast("string").as("v"))
        .agg(count(lit(1)).as("c"))
        .orderBy(col("c").desc, col("v").asc)
        .limit(TopN)
        .collect()
        .toSeq
        .map(r => TopValue(r.getAs[String]("v"), r.getAs[Long]("c")))
      FieldStat(f, total, total - nonNull, row.getAs[Long](s"__distinct_$f"), top)
    }
  }

  /** DataFrame form of exact field stats for one column (oracle-checkable:
    * exact distinct instead of HLL, deterministic top-N tiebreak).
    */
  def statsFrame(df: DataFrame, field: String): DataFrame = {
    val c = col(field)
    df.groupBy(c.cast("string").as("value"))
      .agg(count(lit(1)).as("value_count"))
      .orderBy(col("value_count").desc, col("value").asc)
      .limit(TopN)
  }

  /** Mergeable distinct-count sketches — the property the reference's HLL
    * exists for: per-file (or per-day) sketches that union without rescans
    * (`src/storage/field_stats.rs:89-90` p=12 HLL, merged at rollup time).
    * Spark-first: DataSketches HLL via `hll_sketch_agg`, stored as binary
    * next to each grouping; [[mergeSketches]] unions them and estimates.
    * lgK=12 matches the reference's 4096 registers.
    */
  val LgK = 12

  /** One sketch per group (e.g. per file, per day): (groupCols..., sketch). */
  def sketchByGroup(df: DataFrame, field: String,
                    groupCols: Seq[String]): DataFrame =
    df.groupBy(groupCols.map(col): _*)
      .agg(hll_sketch_agg(col(field).cast("string"), lit(LgK)).as("sketch"))

  /** Union sketches (optionally re-grouped coarser) → distinct estimate.
    * This is the rollup path: day sketches → month estimate with zero data
    * rescan.
    */
  def mergeSketches(sketches: DataFrame,
                    groupCols: Seq[String] = Nil): DataFrame = {
    val merged =
      if (groupCols.isEmpty)
        sketches.agg(hll_union_agg(col("sketch"), lit(true)).as("sketch"))
      else sketches.groupBy(groupCols.map(col): _*)
        .agg(hll_union_agg(col("sketch"), lit(true)).as("sketch"))
    merged.withColumn("distinct_estimate",
      hll_sketch_estimate(col("sketch")).cast("long"))
  }

  /** Persist stats in the reference's pstats row shape
    * (`src/storage/field_stats.rs:98-117`).
    */
  def toPstats(spark: SparkSession, stream: String, stats: Seq[FieldStat]): DataFrame = {
    import spark.implicits._
    stats
      .flatMap { s =>
        s.top.map(tv => (stream, s.field, s.totalCount, s.distinctApprox, tv.value, tv.count))
      }
      .toDF("stream", "field", "total_count", "distinct_count", "value", "value_count")
  }

  /** The `/dataset_stats` response (reference `build_stats_sql`,
    * `field_stats.rs:991-1098`): per field, the rank-paged distinct
    * values with exact counts, plus the field's non-null total and exact
    * distinct count — one row per (field, value) in the rank window
    * `(offset, offset+limit]`, ordered (field asc, count desc, value asc).
    *
    * The reference reads its precomputed `pstats` stream; this computes
    * on demand over the (already time-windowed) scan: melt the selected
    * columns into (field, value) pairs — the explode multiplies rows by
    * |fields| but the very next operator is a map-side-combinable count,
    * so the one shuffle carries (field, value, partial count) rows, not
    * the exploded data. The per-field rank filter compiles to Spark's
    * WindowGroupLimit (shuffle capped at groups × (offset+limit)).
    */
  def datasetStats(df: DataFrame, fields: Seq[String],
                   offset: Int, limit: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val cols = (if (fields.nonEmpty) fields else df.columns.toSeq)
      .filter(df.columns.contains)
    require(cols.nonEmpty, "no matching fields")
    val pairs = df.select(explode(array(cols.map(c =>
        struct(lit(c).as("field_name"),
          col(c).cast("string").as("distinct_value"))): _*)).as("p"))
      .select(col("p.field_name"), col("p.distinct_value"))
    val counts = pairs.filter(col("distinct_value").isNotNull)
      .groupBy(col("field_name"), col("distinct_value"))
      .agg(count(lit(1)).as("distinct_value_count"))
    val w = Window.partitionBy(col("field_name"))
      .orderBy(col("distinct_value_count").desc, col("distinct_value").asc)
    val ranked = counts.withColumn("rn", row_number().over(w))
      .filter(col("rn") > offset && col("rn") <= offset + limit)
    val totals = pairs.groupBy(col("field_name")).agg(
      count(col("distinct_value")).as("field_count"),
      countDistinct(col("distinct_value")).as("distinct_count"))
    ranked.join(totals, "field_name")
      .select(col("field_name"), col("field_count"), col("distinct_count"),
        col("distinct_value"), col("distinct_value_count"))
      .orderBy(col("field_name").asc, col("distinct_value_count").desc,
        col("distinct_value").asc)
  }
}

package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}

import org.apache.spark.sql.graft.ColumnBridge

import graft.plans.{TopKPerGroup, TopKStrategy}

/** Column-API front door for the [[graft.plans.TopKPerGroup]] operator. */
object TopK {

  /** Ensure the planner strategy is installed on this session (idempotent —
    * `GraftSession.tune` also does this).
    */
  def install(spark: SparkSession): Unit =
    if (!spark.experimental.extraStrategies.contains(TopKStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ TopKStrategy

  /** First-k rows per group under `order` (use `.desc`/`.asc` columns; an
    * un-suffixed column sorts ascending). Include a tiebreak column for
    * deterministic results. Output row order is unspecified — apply a final
    * `orderBy` downstream.
    *
    * Resolution: Columns carry lazily-converted nodes the analyzer won't
    * resolve inside a foreign logical operator, so the grouping and sort
    * expressions are harvested from throwaway `Aggregate`/`Sort` plans
    * Spark analyzed against the SAME child (attribute ids line up by
    * construction).
    */
  def perGroup(df: DataFrame, groupCols: Seq[Column], order: Seq[Column],
               k: Int): DataFrame = {
    import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Sort}
    import org.apache.spark.sql.functions.lit
    require(k > 0, "k must be positive")
    val spark = df.sparkSession
    install(spark)
    val sortPlan = ColumnBridge.logicalPlan(df.sortWithinPartitions(order: _*))
      .collectFirst { case s: Sort => s }
      .getOrElse(throw new IllegalStateException("sort plan not found"))
    val groupPlan = ColumnBridge
      .logicalPlan(df.groupBy(groupCols: _*).agg(lit(1)))
      .collectFirst { case a: Aggregate => a }
      .getOrElse(throw new IllegalStateException("aggregate plan not found"))
    ColumnBridge.ofRows(spark,
      TopKPerGroup(groupPlan.groupingExpressions, sortPlan.order, k,
        sortPlan.child))
  }

  /** GLOBAL top-k with 1-based ranks, WINDOW-FREE: `orderBy(order)
    * .limit(k)` plans as a distributed TakeOrdered (each partition
    * keeps k, one bounded single-partition merge), and the rank is the
    * row's ordinal in that single sorted partition
    * (`monotonically_increasing_id()` counts 0..n−1 in partition order;
    * `coalesce(1)` pins partition id 0 so the ids ARE the ordinals).
    * Replaces the bounded-input unpartitioned `row_number` window —
    * same rows, same ranks (include a tiebreak in `order` for
    * determinism), but no `WindowExec: No Partition Defined` log spray
    * and one exchange fewer. Spark 4's `EliminateWindowPartitions`
    * folds a constant `partitionBy` right back to the empty spec, so
    * the window shape has no quiet form — this is the quiet form.
    * `rankCol` is LongType.
    */
  def rankedLimit(df: DataFrame, order: Seq[Column], k: Int,
                  rankCol: String = "rk"): DataFrame = {
    import org.apache.spark.sql.functions.monotonically_increasing_id
    require(k > 0, "k must be positive")
    df.orderBy(order: _*).limit(k)
      .coalesce(1).sortWithinPartitions(order: _*)
      .withColumn(rankCol, monotonically_increasing_id() + 1L)
  }

  /** A per-row CONSTANT-zero window partition key that the optimizer
    * cannot strip — for the deliberate bounded single-partition windows
    * (Packing's per-partition offsets, the burn-rate timeline) where an
    * empty spec is the plan we want but sprays `WindowExec: No Partition
    * Defined` warnings. Spark 4's `EliminateWindowPartitions` removes any
    * FOLDABLE spec, `attr * 0` over a NON-NULLABLE attr constant-folds,
    * and `coalesce(non-nullable, x)` simplifies away — the one shape that
    * survives every rewrite for BOTH nullabilities is
    * `pmod(coalesce(anchor, 0), 1)`: non-foldable (the attribute is
    * inside), null-safe, and 0 on every row. Pass any column of the frame
    * as `anchor`.
    */
  def constPartitionKey(anchor: Column): Column = {
    import org.apache.spark.sql.functions.{coalesce, lit, pmod}
    pmod(coalesce(anchor.cast("long"), lit(0L)), lit(1L))
  }
}

package graft.ml

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing for LLM pretraining: documents in a deterministic
  * order are virtually concatenated and chunked into fixed token-budget
  * packs (the GPT-style "concat then cut every `budget` tokens" layout).
  * Each document gets its global token offset, its pack id, and whether it
  * straddles a pack boundary.
  *
  * The global prefix sum is computed SCALABLY — not with a single-partition
  * `Window.orderBy(id)`, which would funnel the corpus through one task:
  *   1. range-repartition by id (contiguous id ranges, increasing
  *      partition ids),
  *   2. per-partition running sums (parallel windows),
  *   3. a tiny per-partition-totals cumulative (O(numPartitions) rows),
  *      broadcast back.
  * The result is partitioning-independent: offset(doc) = total tokens of
  * all smaller-id docs, whatever the sampled range boundaries were.
  */
object Packing {

  def concatChunks(docs: DataFrame, idCol: String, tokensCol: Column,
                   budgetTokens: Long): DataFrame = {
    require(budgetTokens > 0, "token budget must be positive")
    val base = docs.select(col(idCol).as("__id"), tokensCol.cast("long").as("n_tokens"))
      .repartitionByRange(col("__id"))
      .withColumn("__part", spark_partition_id())
    val localW = Window.partitionBy(col("__part")).orderBy(col("__id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val withLocal = base.withColumn("__local",
      coalesce(sum(col("n_tokens")).over(localW), lit(0L)))
    // one row per partition by construction — the cumulative offsets fit
    // one task, so a constant partition key is the intended plan
    // (optimizer-proof form: [[graft.operators.TopK.constPartitionKey]]).
    val offW = Window
      .partitionBy(graft.operators.TopK.constPartitionKey(col("__part")))
      .orderBy(col("__part"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val partOffsets = withLocal.groupBy(col("__part"))
      .agg(sum(col("n_tokens")).as("__total"))
      .withColumn("__offset", coalesce(sum(col("__total")).over(offW), lit(0L)))
      .select(col("__part"), col("__offset"))
    val budget = lit(budgetTokens)
    withLocal.join(broadcast(partOffsets), Seq("__part"))
      .withColumn("tok_offset", col("__offset") + col("__local"))
      .withColumn("pack_id", (col("tok_offset") / budget).cast("long"))
      .withColumn("spans_boundary",
        when(col("n_tokens") > 0,
          ((col("tok_offset") + col("n_tokens") - 1) / budget).cast("long")
            =!= col("pack_id"))
          .otherwise(lit(false)))
      .select(col("__id").as(idCol), col("n_tokens"), col("tok_offset"),
        col("pack_id"), col("spans_boundary"))
  }
}

package graft.catalog

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed-table layout for shuffle-free joins and aggregations.
  *
  * At 100 TB the dominant cost of a fact-to-fact join is the shuffle of
  * both sides. Writing each table bucketed (hash-partitioned into a fixed
  * number of files per bucket key, recorded in the session catalog's
  * bucketSpec) lets Spark prove both sides are already co-partitioned:
  * the join plans as a zero-Exchange sort-merge over matching bucket ids,
  * and `groupBy(bucketKey)` skips its Exchange the same way. This is the
  * write-once/join-many trade: one extra shuffle at layout time buys every
  * later join.
  *
  * The reference has no analogous layout (DataFusion re-shuffles per
  * query); this is a Spark-native capability the catalog layer exposes.
  * [[BucketingSpec]] asserts the no-Exchange plan shape.
  */
object Bucketing {

  /** Write `df` as a bucketed, in-bucket-sorted managed table. Bucket
    * metadata only exists through the catalog, so this is `saveAsTable`
    * (path-based writes cannot carry a bucketSpec).
    */
  def writeBucketed(df: DataFrame, table: String, key: String,
                    numBuckets: Int): Unit =
    df.write
      .bucketBy(numBuckets, key)
      .sortBy(key)
      .mode("overwrite")
      .saveAsTable(table) // managed: lives under the warehouse dir

  /** Read a bucketed table back (bucketSpec attaches automatically from
    * the catalog).
    */
  def read(spark: SparkSession, table: String): DataFrame =
    spark.table(table)

  /** True iff the physical plan of `df` contains no shuffle exchange —
    * the property bucketing exists to deliver. Unwraps the AQE plan
    * (`AdaptiveSparkPlanExec` does not expose its physical plan as a
    * child, so a naive `exists` would never see the exchanges).
    */
  def isShuffleFree(df: DataFrame): Boolean = {
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
    val plan = df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    !plan.exists(_.isInstanceOf[ShuffleExchangeLike])
  }
}

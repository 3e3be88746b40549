package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Data-distribution helpers for the two big shuffle levers at 100 TB:
  * bucketing (co-located joins — the shuffle never happens) and salting
  * (skewed keys — the shuffle happens evenly).
  */
object Distribution {

  /** Persist a DataFrame bucketed+sorted by the join key. Two tables
    * bucketed the same way join with ZERO exchange on either side — at
    * 100 TB that's the difference between a network-bound and a local
    * join. Bucket count should match across co-joining tables and be a
    * multiple of target parallelism.
    */
  def writeBucketed(df: DataFrame, table: String, key: String,
                    buckets: Int): Unit =
    df.write.mode("overwrite")
      .bucketBy(buckets, key)
      .sortBy(key)
      .saveAsTable(table)

  /** Join two same-bucketed saved tables on their bucket key. */
  def bucketedJoin(spark: SparkSession, leftTable: String,
                   rightTable: String, key: String): DataFrame =
    spark.table(leftTable).join(spark.table(rightTable), key)

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

  /** Skew-tolerant equi-join: salt the skewed side's key-space `factor`
    * ways (deterministically, from `distributeBy` — any reasonably
    * high-cardinality column), replicate the small side across every salt,
    * join on (key, salt). A key with 10^8 rows becomes `factor` groups of
    * 10^8/factor — no straggler task. AQE's skew-join handles moderate
    * skew automatically; this is for the pathological keys AQE can't
    * split (e.g. a single key bigger than an executor).
    */
  def saltedJoin(skewed: DataFrame, small: DataFrame, key: String,
                 distributeBy: String, factor: Int): DataFrame = {
    require(factor > 0, "salt factor must be positive")
    val salted = skewed.withColumn("__salt",
      pmod(xxhash64(col(distributeBy)), lit(factor.toLong)))
    val replicated = small.withColumn("__salt",
      explode(array((0 until factor).map(i => lit(i.toLong)): _*)))
    salted.join(replicated, Seq(key, "__salt")).drop("__salt")
  }
}

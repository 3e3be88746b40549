package graft.catalog

import org.apache.spark.sql.functions._

import graft.SparkSuite
import graft.engine.Distribution

/** Plan-shape guarantees of the bucketed layout ([[Distribution]]): the
  * no-Exchange property checked against a positive control.
  */
class BucketingSpec extends SparkSuite {

  private def withConf[T](pairs: (String, String)*)(body: => T): T = {
    val saved = pairs.map { case (k, _) => k -> spark.conf.getOption(k) }
    pairs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body
    finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  test("bucketed-to-bucketed join and groupBy plan with zero shuffles") {
    import spark.implicits._
    val facts = (0L until 1000L).map(i => (i % 50, i, i * 2.0))
      .toDF("k", "id", "v")
    val dims = (0L until 50L).map(i => (i, s"name$i")).toDF("k", "name")
    Distribution.writeBucketed(facts, "b_facts", "k", 8)
    Distribution.writeBucketed(dims, "b_dims", "k", 8)
    try {
      // forbid broadcast so only bucket co-partitioning can kill the shuffle
      withConf(
        "spark.sql.autoBroadcastJoinThreshold" -> "-1",
        "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1") {
        val f = spark.table("b_facts")
        val d = spark.table("b_dims")
        val joined = f.join(d, "k")
        assert(Distribution.isShuffleFree(joined),
          joined.queryExecution.executedPlan.toString)
        assert(joined.count() == 1000L)

        val agg = f.groupBy(col("k")).agg(sum(col("v")).as("sv"))
        assert(Distribution.isShuffleFree(agg),
          agg.queryExecution.executedPlan.toString)
        assert(agg.count() == 50L)

        // control: the same join over unbucketed TABLES does shuffle
        facts.write.mode("overwrite").saveAsTable("p_facts")
        dims.write.mode("overwrite").saveAsTable("p_dims")
        val plain = spark.table("p_facts").join(spark.table("p_dims"), "k")
        assert(!Distribution.isShuffleFree(plain))
      }
    } finally {
      Seq("b_facts", "b_dims", "p_facts", "p_dims")
        .foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
    }
  }
}

package graft.engine

import org.apache.spark.sql.functions._
import graft.SparkSuite

class DistributionSpec extends SparkSuite {
  import spark.implicits._

  test("bucketed join runs with no shuffle exchange on either side") {
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    // each forked test JVM gets a fresh in-memory metastore but the
    // warehouse DIRECTORY persists — clear stale table locations
    Seq("b_orders", "b_lineitem").foreach { t =>
      val dir = new java.io.File(
        spark.conf.get("spark.sql.warehouse.dir")
          .stripPrefix("file:"), t)
      if (dir.exists())
        org.apache.commons.io.FileUtils.deleteDirectory(dir)
    }
    val orders = spark.range(1000).select(col("id").as("k"),
      (col("id") * 2).as("total"))
    val items = spark.range(3000).select((col("id") % 1000).as("k"),
      col("id").as("item"))
    Distribution.writeBucketed(orders, "b_orders", "k", 4)
    Distribution.writeBucketed(items, "b_lineitem", "k", 4)
    val joined = Distribution.bucketedJoin(spark, "b_orders", "b_lineitem", "k")
    assert(joined.count() == 3000)
    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange hashpartitioning"),
      s"bucketed join still shuffles:\n$plan")
  }

  test("salted join produces exactly the plain join's rows") {
    val skewed = Seq.tabulate(1000)(i =>
      (if (i < 900) 1L else i.toLong, i.toLong)) // key 1 holds 90% of rows
      .toDF("k", "payload")
    val small = Seq((1L, "hot"), (950L, "cold"), (999L, "cold"))
      .toDF("k", "label")
    val plain = skewed.join(small, "k")
      .select("k", "payload", "label").collect().toSet
    val salted = Distribution.saltedJoin(skewed, small, "k",
      distributeBy = "payload", factor = 8)
      .select("k", "payload", "label").collect().toSet
    assert(salted == plain)
    assert(plain.count(_.getLong(0) == 1L) == 900)
  }
}

package graft.catalog

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSuite

class HotTierSpec extends SparkSuite {
  import spark.implicits._

  private def mkStream(root: String, dates: Seq[String]): Unit =
    dates.zipWithIndex.foreach { case (d, i) =>
      Seq.tabulate(50)(j => (i * 50 + j.toLong, s"m$i-$j"))
        .toDF("id", "msg").withColumn("date", lit(d))
        .coalesce(1).write.mode("append").partitionBy("date")
        .parquet(s"$root/logs")
    }

  test("refresh pins newest dates; read = hot union cold, rows exact") {
    HotTier.clear()
    HotTier.budgetBytes = 4L * 1024 * 1024 * 1024
    val root = Files.createTempDirectory("hot").toString
    mkStream(root, Seq("2024-01-01", "2024-01-02", "2024-01-03"))
    val pinned = HotTier.refresh(spark, root, "logs", keepDates = 2)
    assert(pinned == Seq("2024-01-03", "2024-01-02"))
    assert(HotTier.usedBytes(spark) > 0)

    val all = HotTier.read(spark, root, "logs")
    assert(all.count() == 150)
    assert(all.select("id").distinct().count() == 150) // no dup, no loss
    HotTier.clear()
  }

  test("a zero budget evicts everything; reads still answer") {
    HotTier.clear()
    val root = Files.createTempDirectory("hot2").toString
    mkStream(root, Seq("2024-02-01", "2024-02-02"))
    HotTier.refresh(spark, root, "logs", keepDates = 2)
    HotTier.budgetBytes = 0L
    val evicted = HotTier.evictOverBudget(spark)
    assert(evicted.size == 2)
    assert(HotTier.read(spark, root, "logs").count() == 100)
    HotTier.budgetBytes = 4L * 1024 * 1024 * 1024
    HotTier.clear()
  }

  test("rolling refresh unpins dates that fell out of the window") {
    HotTier.clear()
    val root = Files.createTempDirectory("hot3").toString
    mkStream(root, Seq("2024-03-01", "2024-03-02"))
    HotTier.refresh(spark, root, "logs", keepDates = 2)
    mkStream(root, Seq("2024-03-03"))
    val pinned = HotTier.refresh(spark, root, "logs", keepDates = 2)
    assert(pinned == Seq("2024-03-03", "2024-03-02"))
    assert(HotTier.read(spark, root, "logs").count() == 150)
    HotTier.clear()
  }
}

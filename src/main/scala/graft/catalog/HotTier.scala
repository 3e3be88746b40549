package graft.catalog

import java.util.concurrent.ConcurrentHashMap

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.storage.StorageLevel

/** Hot tier: a size-budgeted cache of each stream's most recent date
  * partitions, mirroring the reference's local-disk hot tier (parseable
  * `src/hottier.rs`: configured size, most-recent-first fill, oldest-first
  * eviction). Spark-native form: recent partitions are `DISK_ONLY`-persisted
  * DataFrames (executor-local storage — the same "local disk in front of
  * object store" economics), tracked per (stream, date) with actual cached
  * bytes from the block manager, evicting oldest dates first when over
  * budget.
  *
  * Queries route through [[read]]: cached dates serve from the hot tier,
  * the rest scan the table — a union exactly like the reference's
  * hot-tier ∪ object-store scan split.
  */
object HotTier {

  final case class Entry(stream: String, date: String, df: DataFrame,
                         addedAt: Long)

  private val entries = new ConcurrentHashMap[(String, String), Entry]()

  @volatile var budgetBytes: Long = 4L * 1024 * 1024 * 1024

  /** Pin one date partition of a stream. Most callers use [[refresh]]. */
  def pin(spark: SparkSession, root: String, stream: String,
          date: String): Entry = {
    val key = (stream, date)
    Option(entries.get(key)).getOrElse {
      val df = spark.read.parquet(s"$root/$stream/date=$date")
        .persist(StorageLevel.DISK_ONLY)
      df.count() // materialize so usage accounting is real
      val e = Entry(stream, date, df, System.currentTimeMillis())
      entries.put(key, e)
      evictOverBudget(spark)
      e
    }
  }

  /** Bytes the hot tier currently occupies (block-manager truth, not an
    * estimate).
    */
  def usedBytes(spark: SparkSession): Long =
    spark.sparkContext.getRDDStorageInfo
      .filter(_.isCached).map(_.diskSize).sum

  /** Drop oldest dates (across streams) until within budget. */
  def evictOverBudget(spark: SparkSession): Seq[(String, String)] = {
    val evicted = Seq.newBuilder[(String, String)]
    var over = usedBytes(spark) > budgetBytes
    while (over) {
      val oldest = entries.values.asScala.toSeq.sortBy(e => (e.date, e.addedAt))
        .headOption
      oldest match {
        case None => over = false
        case Some(e) =>
          e.df.unpersist(blocking = true)
          entries.remove((e.stream, e.date))
          evicted += ((e.stream, e.date))
          over = usedBytes(spark) > budgetBytes
      }
    }
    evicted.result()
  }

  /** Keep the newest `keepDates` partitions of a stream pinned (the
    * reference's most-recent-first fill). Returns pinned dates.
    */
  def refresh(spark: SparkSession, root: String, stream: String,
              keepDates: Int): Seq[String] = {
    val dir = java.nio.file.Paths.get(root, stream)
    if (!java.nio.file.Files.isDirectory(dir)) return Nil
    val dates = java.nio.file.Files.list(dir).toArray.toSeq
      .map(_.asInstanceOf[java.nio.file.Path].getFileName.toString)
      .filter(_.startsWith("date=")).map(_.stripPrefix("date="))
      .sorted.reverse.take(keepDates)
    dates.foreach(pin(spark, root, stream, _))
    // unpin anything for this stream that fell out of the window
    entries.values.asScala.filter(e =>
      e.stream == stream && !dates.contains(e.date)).toSeq.foreach { e =>
      e.df.unpersist(blocking = true)
      entries.remove((e.stream, e.date))
    }
    dates
  }

  /** Read a stream as hot-tier ∪ cold scan: pinned dates come from cache,
    * everything else from the table directory.
    */
  def read(spark: SparkSession, root: String, stream: String): DataFrame = {
    val mine = entries.values.asScala.filter(_.stream == stream).toSeq
      .sortBy(_.date)
    val cold = spark.read.parquet(s"$root/$stream")
    if (mine.isEmpty) cold
    else {
      val hotDates = mine.map(_.date).toSet
      import org.apache.spark.sql.functions.col
      val coldOnly = cold.filter(!col("date").isin(hotDates.toSeq: _*))
      val hot = mine.map(e =>
          e.df.withColumn("date",
            org.apache.spark.sql.functions.lit(e.date)))
        .reduce(_.unionByName(_, allowMissingColumns = true))
      coldOnly.unionByName(hot, allowMissingColumns = true)
    }
  }

  def clear(): Unit = {
    entries.values.asScala.foreach(_.df.unpersist(blocking = false))
    entries.clear()
  }
}

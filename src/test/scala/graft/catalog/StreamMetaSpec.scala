package graft.catalog

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSuite
import graft.ingest.IngestPipeline.StreamConfig

class StreamMetaSpec extends SparkSuite {
  import spark.implicits._

  test("stream.json round-trips config, retention, and schema") {
    val root = Files.createTempDirectory("meta").toString
    val schema = StructType(Seq(
      StructField("msg", StringType), StructField("n", LongType)))
    val meta = StreamMeta.fromConfig(
      StreamConfig("logs", timePartition = Some("ts"),
        customPartitions = Seq("tenant"),
        zOrder = Some(graft.ingest.IngestPipeline.ZOrderPolicy(
          Seq("x", "y"), bits = 8))),
      Some(schema), Some(StreamMeta.Retention("delete", 30)))
    StreamMeta.save(root, meta)
    val back = StreamMeta.load(root, "logs").get
    assert(back == meta)
    assert(back.zOrder.contains((Seq("x", "y"), 8)))
    assert(StreamMeta.load(root, "absent").isEmpty)
  }

  test("metadata dir is invisible to parquet partition discovery") {
    val root = Files.createTempDirectory("meta2").toString
    Seq((1L, "2024-01-01"), (2L, "2024-01-02")).toDF("id", "date")
      .write.partitionBy("date").parquet(s"$root/logs")
    StreamMeta.save(root, StreamMeta.fromConfig(StreamConfig("logs"), None))
    assert(spark.read.parquet(s"$root/logs").count() == 2)
  }

  test("retention deletes only date partitions past the horizon") {
    val root = Files.createTempDirectory("ret").toString
    val today = java.time.LocalDate.parse("2024-06-15")
    Seq(
      (1L, "2024-06-01"), // 14 days old — delete at days=7
      (2L, "2024-06-12"), // 3 days old — keep
      (3L, "2024-06-14")).toDF("id", "date")
      .write.partitionBy("date").parquet(s"$root/logs")
    val deleted = RetentionJob(root, "logs", days = 7, today = today)
    assert(deleted == Seq("date=2024-06-01"))
    val back = spark.read.parquet(s"$root/logs")
    assert(back.select("id").as[Long].collect().toSet == Set(2L, 3L))
  }

  test("retention drops deleted partitions' catalog rows atomically") {
    val root = Files.createTempDirectory("retcat").toString
    val cat = Files.createTempDirectory("retcat2").toString
    val today = java.time.LocalDate.parse("2024-06-15")
    Seq((1L, "2024-06-01"), (2L, "2024-06-14")).toDF("id", "date")
      .write.partitionBy("date").parquet(s"$root/logs")
    TxnCatalog.appendNewFiles(spark, s"$root/logs", cat, Seq("id"))
    val v0 = TxnCatalog.latestVersion(cat).get

    val deleted = RetentionJob(root, "logs", days = 7, today, spark, cat)
    assert(deleted == Seq("date=2024-06-01"))
    val paths = TxnCatalog.snapshot(spark, cat).get
      .select("file_path").as[String].collect()
    assert(paths.nonEmpty && paths.forall(!_.contains("date=2024-06-01")))
    // pinned pre-retention version still lists both partitions
    assert(TxnCatalog.snapshot(spark, cat, Some(v0)).get.count() == 2)
  }
}

package graft.query

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.SparkSuite
import graft.streaming.LiveTail

class QueryServiceSpec extends SparkSuite {
  import spark.implicits._

  test("time filter injected unless query already constrains the time col") {
    assert(!QueryService.containsTimeFilter(spark,
      "SELECT * FROM logs WHERE level = 'e'", "p_timestamp"))
    assert(QueryService.containsTimeFilter(spark,
      "SELECT * FROM logs WHERE p_timestamp > '2024-01-01'", "p_timestamp"))
    assert(QueryService.referencedTables(spark,
      "SELECT * FROM a JOIN b ON a.x = b.x") == Seq("a", "b"))
  }

  test("query unions staging rows when the range touches the fresh window") {
    val dir = Files.createTempDirectory("qs").toString
    val now = System.currentTimeMillis()
    val old = new Timestamp(now - 3600 * 1000)
    Seq((1L, old, "persisted")).toDF("id", "p_timestamp", "msg")
      .write.parquet(s"$dir/logs")
    LiveTail.clear("logs")
    LiveTail.publish("logs",
      Seq((2L, new Timestamp(now), "staged")).toDF("id", "p_timestamp", "msg"))

    val streams = Map("logs" -> QueryService.Stream(s"$dir/logs", "p_timestamp"))
    val range = TimeRange(
      java.time.Instant.ofEpochMilli(now - 7200 * 1000),
      java.time.Instant.ofEpochMilli(now + 1000))
    val rows = QueryService
      .query(spark, streams, "SELECT msg FROM logs ORDER BY msg", range)
      .as[String].collect().toSeq
    assert(rows == Seq("persisted", "staged"))

    // historical range: staging data excluded
    val past = TimeRange(
      java.time.Instant.ofEpochMilli(now - 7200 * 1000),
      java.time.Instant.ofEpochMilli(now - 1800 * 1000))
    val rows2 = QueryService
      .query(spark, streams, "SELECT msg FROM logs ORDER BY msg", past)
      .as[String].collect().toSeq
    assert(rows2 == Seq("persisted"))
    LiveTail.clear("logs")
  }
}

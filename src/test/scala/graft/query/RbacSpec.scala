package graft.query

import java.nio.file.Files
import java.sql.Timestamp

import graft.SparkSuite

class RbacSpec extends SparkSuite {
  import Rbac._
  import spark.implicits._

  test("privilege matrix matches the reference role model") {
    assert(allows(Admin(), QueryAction, "any"))
    assert(allows(Editor(), IngestAction, "any"))
    assert(allows(Writer(Some("s1")), QueryAction, "s1"))
    assert(allows(Writer(Some("s1")), IngestAction, "s1"))
    assert(!allows(Writer(Some("s1")), QueryAction, "s2"))
    assert(allows(Reader(Some("s1")), QueryAction, "s1"))
    assert(!allows(Reader(Some("s1")), IngestAction, "s1"))
    assert(allows(Ingestor(None), IngestAction, "anything"))
    assert(!allows(Ingestor(None), QueryAction, "anything"))
  }

  test("authorizeQuery rejects on the first unreadable stream") {
    Rbac.clear()
    Rbac.grant("ana", Seq(Reader(Some("logs"))))
    assert(Rbac.authorizeQuery("ana", Seq("logs")).isRight)
    val denied = Rbac.authorizeQuery("ana", Seq("logs", "metrics"))
    assert(denied.swap.exists(_.contains("metrics")))
    assert(Rbac.authorizeQuery("nobody", Seq("logs")).isLeft)
    Rbac.clear()
  }

  test("authorizedQuery gates QueryService end to end") {
    Rbac.clear()
    val dir = Files.createTempDirectory("rbacq").toString
    val now = System.currentTimeMillis()
    Seq((1L, new Timestamp(now), "hello"))
      .toDF("id", "p_timestamp", "msg").write.parquet(s"$dir/logs")
    val streams = Map("logs" -> QueryService.Stream(s"$dir/logs", "p_timestamp"))
    val range = TimeRange(
      java.time.Instant.ofEpochMilli(now - 1000),
      java.time.Instant.ofEpochMilli(now + 1000))
    Rbac.grant("ana", Seq(Reader(Some("logs"))))
    val ok = QueryService.authorizedQuery(spark, streams,
      "SELECT msg FROM logs", range, "ana")
    assert(ok.exists(_.count() == 1))
    val denied = QueryService.authorizedQuery(spark, streams,
      "SELECT msg FROM logs", range, "bob")
    assert(denied.isLeft)
    Rbac.clear()
  }
}

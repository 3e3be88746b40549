package graft.query

import org.apache.spark.sql.functions._
import graft.SparkSuite
import graft.engine.GraftSession

class CountsSpec extends SparkSuite {

  private lazy val events = GraftSession.table(spark, sfDir, "events")

  test("mergeRollup of 1m pre-aggregates equals direct rollup at 1h") {
    val minute = Counts.rollup(events, "ts", "value", Seq("event_type"), 60L * 1000)
    val cascaded = Counts
      .finalizeRollup(Counts.mergeRollup(minute, Seq("event_type"), 3600L * 1000),
        Seq("event_type"))
    val direct = Counts
      .finalizeRollup(Counts.rollup(events, "ts", "value", Seq("event_type"),
        3600L * 1000), Seq("event_type"))
    def m(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.get(0), r.get(1)) -> r.toSeq.drop(2)).toMap
    assert(m(cascaded) == m(direct))
  }

  test("cascade keeps merging: 1m -> 1h -> 1d equals direct 1d") {
    val minute = Counts.rollup(events, "ts", "value", Seq("event_type"), 60L * 1000)
    val hour = Counts.mergeRollup(minute, Seq("event_type"), 3600L * 1000)
    val day = Counts.mergeRollup(hour, Seq("event_type"), 24 * 3600L * 1000)
    val direct = Counts.rollup(events, "ts", "value", Seq("event_type"),
      24 * 3600L * 1000)
    def m(df: org.apache.spark.sql.DataFrame) =
      Counts.finalizeRollup(df, Seq("event_type"))
        .collect().map(r => (r.get(0), r.get(1)) -> r.toSeq.drop(2)).toMap
    assert(m(day) == m(direct))
  }

  test("rollup bins anchor at the epoch and count every row once") {
    val minute = Counts.rollup(events, "ts", "value", Seq("event_type"), 60L * 1000)
    val total = minute.agg(sum(col("cnt"))).collect()(0).getLong(0)
    assert(total == events.count())
  }
}

package graft.query

import graft.SparkSuite

class TracesSpec extends SparkSuite {
  import spark.implicits._

  test("spanHierarchy assigns BFS levels from roots, bounded by maxDepth") {
    // root s1 -> (s2, s3); s2 -> s4; orphan s9 (parent never appears)
    val spans = Seq(
      ("s1", null.asInstanceOf[String]),
      ("s2", "s1"), ("s3", "s1"),
      ("s4", "s2"),
      ("s9", "zz")).toDF("span_id", "parent_span_id")
    val levels = Traces.spanHierarchy(spans, "span_id", "parent_span_id")
      .collect().map(r => r.getAs[String]("span_id") -> r.getAs[Int]("span_level"))
      .toMap
    assert(levels == Map("s1" -> 0, "s2" -> 1, "s3" -> 1, "s4" -> 2))

    val shallow = Traces.spanHierarchy(spans, "span_id", "parent_span_id",
      maxDepth = 1)
    assert(shallow.count() == 3) // root + level-1 children only
  }

  test("spanHierarchy on an all-root set terminates immediately") {
    val spans = Seq(("a", ""), ("b", "")).toDF("span_id", "parent_span_id")
    val out = Traces.spanHierarchy(spans, "span_id", "parent_span_id")
    assert(out.count() == 2)
    assert(out.select("span_level").distinct().collect().map(_.getInt(0)).toSeq == Seq(0))
  }
}

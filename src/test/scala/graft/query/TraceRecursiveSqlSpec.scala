package graft.query

import org.apache.spark.sql.functions._
import graft.SparkSuite

/** The reference's recursive-CTE trace hierarchy SQL
  * (`traces.rs:608-638`) pasted in its literal shape must (a) parse and
  * execute on this engine — Spark ≥ 4.0 runs `WITH RECURSIVE` natively —
  * and (b) agree with the Column-API equivalent
  * [[Traces.spanHierarchy]] with the reference's orphan-as-root rule.
  */
class TraceRecursiveSqlSpec extends SparkSuite {
  import spark.implicits._

  // a forest with: explicit roots (null / '' parent), a chain, a fan-out,
  // and an ORPHAN (parent id absent from the batch -> level 0 per the
  // reference's root rule)
  private lazy val spans = Seq(
    ("r1", null.asInstanceOf[String]),
    ("r2", ""),
    ("a", "r1"), ("b", "a"), ("c", "b"),
    ("d", "r2"), ("e", "r2"),
    ("orphan", "ghost-parent"),
    ("child-of-orphan", "orphan")).toDF("span_id", "parent_id")

  // the reference SQL shape, verbatim modulo column names: all_span_ids,
  // orphan-as-root anchor, depth-capped recursion, MIN(level) dedup
  private val referenceShapedSql =
    """WITH RECURSIVE all_span_ids AS (
      |  SELECT DISTINCT span_id FROM trace_spans_ref
      |),
      |span_hierarchy AS (
      |  SELECT span_id, 0 AS level
      |  FROM trace_spans_ref
      |  WHERE COALESCE(parent_id, '') = ''
      |    OR parent_id NOT IN (SELECT span_id FROM all_span_ids)
      |  UNION ALL
      |  SELECT s.span_id, sh.level + 1
      |  FROM trace_spans_ref s
      |  INNER JOIN span_hierarchy sh ON s.parent_id = sh.span_id
      |  WHERE sh.level < 10
      |),
      |span_levels AS (
      |  SELECT span_id, MIN(level) AS level
      |  FROM span_hierarchy
      |  GROUP BY span_id
      |)
      |SELECT d.span_id, d.parent_id, sl.level,
      |  COUNT(*) OVER () AS total_span_count
      |FROM trace_spans_ref d
      |INNER JOIN span_levels sl ON d.span_id = sl.span_id
      |ORDER BY sl.level, d.span_id""".stripMargin

  test("the reference WITH RECURSIVE trace SQL runs natively") {
    spans.createOrReplaceTempView("trace_spans_ref")
    val rows = spark.sql(referenceShapedSql).collect()
    assert(rows.length == 9)
    assert(rows.forall(_.getAs[Long]("total_span_count") == 9L))
    val levels = rows.map(r =>
      r.getAs[String]("span_id") -> r.getAs[Int]("level")).toMap
    assert(levels == Map(
      "r1" -> 0, "r2" -> 0, "orphan" -> 0,
      "a" -> 1, "d" -> 1, "e" -> 1, "child-of-orphan" -> 1,
      "b" -> 2, "c" -> 3))
  }

  test("native recursive SQL == spanHierarchy(orphansAsRoots = true)") {
    spans.createOrReplaceTempView("trace_spans_ref")
    val sqlLevels = spark.sql(referenceShapedSql)
      .select("span_id", "level").as[(String, Int)].collect().toSet
    val apiLevels = Traces
      .spanHierarchy(spans, "span_id", "parent_id", maxDepth = 10,
        orphansAsRoots = true)
      .select(col("span_id"), col("span_level")).as[(String, Int)]
      .collect().toSet
    assert(apiLevels == sqlLevels)
  }

  test("default root rule still drops orphans (pre-existing behavior)") {
    val api = Traces.spanHierarchy(spans, "span_id", "parent_id")
      .select("span_id").as[String].collect().toSet
    assert(!api.contains("orphan") && !api.contains("child-of-orphan"))
    assert(api.contains("r1") && api.contains("c"))
  }
}

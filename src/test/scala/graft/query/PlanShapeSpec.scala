package graft.query

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec

import graft.{SparkEntry, SparkSuite}

/** Physical-plan shape assertions for flagship queries: the properties the
  * 100 TB story depends on (scan pruning, broadcastability, no nested
  * loops, map-side partial aggregation) verified as tests instead of
  * eyeballed explain() output.
  */
class PlanShapeSpec extends SparkSuite {

  private def plan(name: String, executeFirst: Boolean = false): String = {
    val df: DataFrame = SparkEntry.queries(name)(spark, sfDir)
    if (executeFirst) df.count() // materialize AQE stages (codegen applied)
    val p = df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    p.toString
  }

  test("q_filter_project: filters AND projection reach the parquet scan") {
    val p = plan("q_filter_project")
    assert(p.contains("PushedFilters: ["), p)
    assert(p.contains("IsNotNull(event_type)") || p.contains("EqualTo(event_type"), p)
    // pruned read schema: only the selected + filtered columns, never props
    assert(p.contains("ReadSchema"), p)
    assert(!p.contains("props"), p)
  }

  test("q_join_multiway: dims broadcast, no nested-loop anywhere") {
    val p = plan("q_join_multiway")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"), p)
  }

  test("q_agg_pricing: partial + final hash aggregation, codegen spans") {
    val p = plan("q_agg_pricing")
    assert(p.contains("HashAggregate"), p)
    assert("HashAggregate".r.findAllIn(p).size >= 2, p) // partial + final
    // codegen-mode explain compiles the plan and reports its codegen
    // spans; AQE defers stage creation, so assert on the static plan.
    // Build the frame FIRST (GraftSession.tune re-enables AQE), then flip
    // the conf before the lazy plan evaluation.
    val df = SparkEntry.queries("q_agg_pricing")(spark, sfDir)
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val cg = df.queryExecution
        .explainString(org.apache.spark.sql.execution.CodegenMode)
      val found = "Found (\\d+) WholeStageCodegen subtrees".r
        .findFirstMatchIn(cg).map(_.group(1).toInt)
      assert(found.exists(_ >= 1), cg.take(500))
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }

  test("dedup pair generation never plans a cartesian/nested-loop join") {
    for (q <- Seq("q_dedup_jaccard", "q_dedup_minhash", "q_decontaminate")) {
      val p = plan(q)
      assert(!p.contains("CartesianProduct"), s"$q:\n$p")
      assert(!p.contains("BroadcastNestedLoopJoin"), s"$q:\n$p")
    }
  }

  test("q_join_range: the BETWEEN join became an equi-join (no nested loop)") {
    val p = plan("q_join_range")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"), p)
  }

  test("q_counts_topk: binned side meets top-k via broadcast, not shuffle") {
    val p = plan("q_counts_topk")
    assert(p.contains("BroadcastHashJoin"), p)
  }

  test("q_text_repetition: per-document statistics plan ZERO exchanges") {
    // the repetition signals are within-document folds; any Exchange here
    // would mean the plan regressed to shuffling corpus text
    val p = plan("q_text_repetition")
    val body = p.replaceAll("(?s)== Initial Plan ==.*", "")
    val exchanges = "Exchange".r.findAllIn(body).size
    // the only allowed exchange is the final global ORDER BY of the gated
    // query (rangepartitioning) — none may be hashpartitioning
    assert(!body.contains("hashpartitioning"), p)
    assert(exchanges <= 1, p)
  }

  test("q_dedup_spans: no shuffle carries corpus text or token arrays") {
    // the wide exchange moves (hash, doc, pos) triples; span strings are
    // built only after the survivor semi-join, so the only exchanges
    // naming `span` are the survivors-only aggregations — the corpus text
    // and the exploded token arrays must never hit the wire
    val p = plan("q_dedup_spans", executeFirst = true)
    val shuffles = p.linesIterator.filter(l =>
      l.contains("Exchange hashpartitioning")).toSeq
    assert(shuffles.nonEmpty, p)
    assert(!shuffles.exists(_.contains("text#")), shuffles.mkString("\n"))
    assert(!shuffles.exists(_.contains("__tk")), shuffles.mkString("\n"))
  }

  test("q_text_lmscore: model tables broadcast; exploded bigrams never " +
      "shuffle before the per-doc aggregation") {
    // the bigram/unigram count tables are dictionary-sized — they must
    // reach the exploded frame as broadcasts, and the big frame's first
    // hash exchange must be the final per-doc reduce
    val p = plan("q_text_lmscore", executeFirst = true)
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("q_trace_depgraph: parent side broadcasts, no nested loop") {
    val p = plan("q_trace_depgraph", executeFirst = true)
    assert(p.contains("BroadcastHashJoin") || p.contains("ShuffledHashJoin"), p)
    assert(!p.contains("NestedLoop"), p)
  }

  test("q_trace_tailsample: whole-trace keep via a join keyed by trace id") {
    val p = plan("q_trace_tailsample", executeFirst = true)
    assert(!p.contains("NestedLoop"), p)
    // the keep-set is tiny after the per-trace aggregate: broadcast wins
    assert(p.contains("BroadcastHashJoin"), p)
  }

  test("q_corpus_report: single scan-bound aggregation, no window, no join") {
    val p = plan("q_corpus_report")
    assert(!p.contains("Window"), p)
    assert(!p.contains("SortMergeJoin") && !p.contains("ShuffledHashJoin"), p)
  }

  test("TracesApi.list: one trace-id window shuffle, no join, no " +
       "nested loop; count is a plain aggregate") {
    import org.apache.spark.sql.functions._
    val spans = graft.engine.GraftSession.table(spark, sfDir, "events")
      .select(col("event_type").as("service.name"),
        concat(lit("s"), col("event_id")).as("span_name"),
        (col("value") * 1000).cast("long").as("span_duration_ns"),
        col("user_id").cast("string").as("span_trace_id"),
        col("event_id").cast("string").as("span_span_id"),
        col("ts").as("span_start_time_unix_nano"),
        unix_millis(col("ts").cast("timestamp"))
          .as("span_start_time_unix_nano_epoch"),
        lit(0).as("span_status_code"),
        lit("").as("span_parent_span_id"),
        col("ts").cast("timestamp").as("p_timestamp"))
    val page = graft.http.TracesApi.list(spans, None, None, "spans",
      "mostRecent", offset = 0, limit = 10).toOption.get
    val p = page.queryExecution.executedPlan.toString
    assert(p.contains("Window"), p) // the per-trace counts window
    assert(!p.contains("Join") && !p.contains("CartesianProduct"), p)
    // exactly one shuffle keys the window (plus the global sort for the
    // deterministic page order) — never one per derived count
    val exchanges = "Exchange hashpartitioning".r.findAllIn(p).size
    assert(exchanges == 1, s"$exchanges hash exchanges:\n$p")
  }

  test("q_dedup_lines: keyed shuffles only, partial aggregation, no " +
      "window over the whole corpus") {
    val p = plan("q_dedup_lines")
    assert(!p.contains("CartesianProduct"), p)
    // the ONLY nested-loop is the documented 1-row corpus-count frame
    // broadcasting into the in-job 1% threshold (lineDedupByShare) —
    // verify it builds on the single-row aggregate, nothing else
    val bnlj = "BroadcastNestedLoopJoin".r.findAllIn(p).size
    assert(bnlj <= 1, p)
    if (bnlj == 1)
      assert(p.contains("div 100"), p) // the threshold comparison rides it
    // doc-frequency + reassembly both partial-aggregate map-side
    assert("HashAggregate".r.findAllIn(p).size >= 2 ||
      ("ObjectHashAggregate".r.findAllIn(p).size >= 2), p)
    // every exchange is hash-keyed (__h or __did) — no global sort/window
    // carries line rows (orderBy of the tiny result frame is fine)
    assert(!p.contains("Window"), p)
  }

  test("q_sample_leakfree: cluster labels broadcast onto the corpus") {
    val p = plan("q_sample_leakfree")
    assert(!p.contains("CartesianProduct"), p)
    // the pair-set-sized label table must not shuffle the corpus side
    assert(p.contains("BroadcastHashJoin"), p)
  }

  test("q_metric_cusum: ONE source scan, every window PARTITIONS by the " +
      "series key, no join at all (the per-series target is a " +
      "whole-partition window on the same exchange)") {
    val p = plan("q_metric_cusum")
    // windowspecdefinition(event_type, ...) — never an empty partition
    // spec over the corpus of bins
    assert(p.contains("windowspecdefinition(event_type"), p)
    assert(!p.contains("windowspecdefinition(__bin"), p)
    assert(!p.toLowerCase.contains("join"), p)
    // exactly one parquet scan: the join form re-scanned events twice
    assert("Scan parquet".r.findAllIn(p).size == 1, p)
  }

  test("q_metric_hist_quantile: windows run over BUCKET rows keyed by " +
      "group, and the plan is pure hash-aggregate + window (no join at " +
      "all)") {
    val p = plan("q_metric_hist_quantile")
    assert(p.contains("windowspecdefinition(event_type"), p)
    assert(!p.toLowerCase.contains("join"), p)
    assert("HashAggregate".r.findAllIn(p).size >= 2, p)
  }

  test("q_metric_apdex: one conditional-sum hash aggregate, no window, " +
      "no join") {
    val p = plan("q_metric_apdex")
    assert(!p.contains("Window"), p)
    assert(!p.toLowerCase.contains("join"), p)
    assert("HashAggregate".r.findAllIn(p).size >= 2, p) // partial + final
  }
}

package graft.http

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.{functions}
import org.apache.spark.sql.functions._

/** APM trace HTTP query shapes — the Spark form of the reference's
  * `/api/v1/services/traces/{list,detail}` SQL builders
  * (parseable `src/handlers/http/traces.rs:464-516` list,
  * `:518-543` count, `:545-668` detail + hierarchy).
  *
  * The reference emits DataFusion SQL strings; here each response is a
  * declarative DataFrame over the stream's windowed scan, so Catalyst
  * keeps file pruning / pushdown intact under the trace filters:
  *
  *   - list: one window over `span_trace_id` computes per-trace span and
  *     error counts (`COUNT(DISTINCT …) OVER` → `size(collect_set)`,
  *     Spark's lawful spelling), then DISTINCT + ORDER BY + OFFSET/LIMIT
  *     page deterministically. One shuffle on the trace id, total.
  *   - count: one hash aggregation (`COUNT(DISTINCT span_span_id)`).
  *   - detail: spans of ONE trace (file-pruned by the time bounds
  *     discovered first, exactly the reference's bounds pre-query), then
  *     span-identity dedup and an iterative-BFS hierarchy level — the
  *     recursive-CTE shape without re-parsing SQL.
  */
object TracesApi {

  /** Reference `TRACE_LIST_REQUIRED_FIELDS` (`traces.rs:45-55`): the OTel
    * flattened-trace columns both endpoints project.
    */
  val RequiredFields: Seq[String] = Seq(
    "service.name", "span_name", "span_duration_ns", "span_trace_id",
    "span_span_id", "span_start_time_unix_nano",
    "span_start_time_unix_nano_epoch", "span_status_code",
    "span_parent_span_id")

  val DefaultLimit = 500
  val MaxLimit = 1000
  val MaxDepth = 100

  def missingFields(df: DataFrame): Seq[String] =
    RequiredFields.filterNot(df.columns.contains)

  // flat column whose NAME contains a dot (OTel resource attr) — must be
  // addressed via the DataFrame, not col(), which would parse a nested ref
  private def service(df: DataFrame): Column = df("`service.name`")

  /** Reference `TraceSortBy::order_by` (`traces.rs:85-96`). */
  def sortColumn(sortBy: String): Either[String, (String, Boolean)] =
    sortBy match {
      case "mostRecent"    => Right(("span_start_time_unix_nano_epoch", false))
      case "leastRecent"   => Right(("span_start_time_unix_nano_epoch", true))
      case "longestFirst"  => Right(("span_duration_ns", false))
      case "shortestFirst" => Right(("span_duration_ns", true))
      case "mostSpans"     => Right(("total_span_count", false))
      case "leastSpans"    => Right(("total_span_count", true))
      case other           => Left(s"unknown sortBy: $other")
    }

  private def sourceFilter(df: DataFrame, serviceName: Option[String],
                           conditions: Option[Column]): DataFrame = {
    val base = df.filter(service(df).isNotNull)
    val named = serviceName.fold(base)(s => base.filter(service(df) === s))
    conditions.fold(named)(named.filter)
  }

  /** Trace list page: reference `build_trace_list_sql`. Returns the page
    * DataFrame; pair with [[count]] for the envelope's total.
    */
  def list(df: DataFrame, serviceName: Option[String],
           conditions: Option[Column], option: String, sortBy: String,
           offset: Int, limit: Int): Either[String, DataFrame] = {
    val missing = missingFields(df)
    if (missing.nonEmpty)
      return Left(s"dataset lacks required trace fields: " +
        missing.mkString(", "))
    sortColumn(sortBy).map { case (sortCol, asc) =>
      val src = sourceFilter(df, serviceName, conditions)
      val w = Window.partitionBy(col("span_trace_id"))
      val stats = src
        .withColumn("total_span_count",
          size(collect_set(col("span_span_id")).over(w)).cast("long"))
        .withColumn("error_count",
          size(collect_set(when(col("span_status_code") === 2,
            col("span_span_id"))).over(w)).cast("long"))
      val resultFilter = option match {
        case "traces" =>
          coalesce(col("span_parent_span_id"), lit("")) === ""
        case "errorSpans" =>
          col("error_count") > 0 && col("span_status_code") === 2
        case _ => lit(true)
      }
      val projected = stats.filter(resultFilter).select(
        stats("`service.name`"),
        col("span_name"), col("span_duration_ns"), col("span_trace_id"),
        col("span_span_id"), col("span_start_time_unix_nano"),
        col("span_start_time_unix_nano_epoch"), col("p_timestamp"),
        col("total_span_count"), col("error_count")).distinct()
      val lead =
        if (asc) col(sortCol).asc else col(sortCol).desc
      projected
        .orderBy(lead, col("span_start_time_unix_nano_epoch").desc,
          col("span_span_id").asc)
        .offset(offset).limit(limit)
    }
  }

  /** Reference `build_trace_count_sql`: distinct span count under the
    * source filter plus the option's count filter.
    */
  def count(df: DataFrame, serviceName: Option[String],
            conditions: Option[Column], option: String): Long = {
    val src = sourceFilter(df, serviceName, conditions)
    val optFilter = option match {
      case "traces" => coalesce(col("span_parent_span_id"), lit("")) === ""
      case "errorSpans" => col("span_status_code") === 2
      case _ => lit(true)
    }
    src.filter(optFilter)
      .agg(countDistinct(col("span_span_id")).as("count"))
      .head().getLong(0)
  }

  /** Trace time bounds inside the discovery window (reference
    * `build_trace_bounds_sql`): None when the trace has no spans there.
    */
  def bounds(df: DataFrame, timeCol: String,
             traceId: String): Option[(java.sql.Timestamp, java.sql.Timestamp)] = {
    val row = df.filter(col("span_trace_id") === traceId)
      .agg(min(col(timeCol)).as("s"), max(col(timeCol)).as("e")).head()
    if (row.isNullAt(0) || row.isNullAt(1)) None
    else Some((row.getTimestamp(0), row.getTimestamp(1)))
  }

  /** Trace detail (reference `build_trace_detail_sql`): span-identity
    * dedup, has_error/event_count rollup, hierarchy level via iterative
    * BFS with orphans as roots (`COALESCE(parent,'')='' OR parent NOT IN
    * ids`), `COUNT(*) OVER ()` total, ordered (level, start time). `df`
    * must already be windowed to the bounds range.
    */
  def detail(df: DataFrame, timeCol: String,
             traceId: String): Either[String, DataFrame] = {
    val missing = missingFields(df)
    if (missing.nonEmpty)
      return Left(s"dataset lacks required trace fields: " +
        missing.mkString(", "))
    val spansRaw = df.filter(col("span_trace_id") === traceId)
    val identity = Seq("span_span_id", "span_parent_span_id",
      "service.name", "span_name", "span_duration_ns",
      "span_start_time_unix_nano", "span_start_time_unix_nano_epoch",
      "span_trace_id")
    val hasEventName = df.columns.contains("event_name")
    val eventCount =
      if (hasEventName)
        sum(when(col("event_name").isNotNull, 1L).otherwise(0L))
      else sum(lit(0L))
    val deduped = spansRaw
      .groupBy(identity.map(c => spansRaw(s"`$c`")): _*)
      .agg(
        max(when(col("span_status_code") === 2, 1).otherwise(0))
          .cast("boolean").as("has_error"),
        eventCount.as("event_count"),
        min(col(timeCol)).as("p_timestamp"))
      .cache() // one trace: tiny, reused by every BFS level
    try {
      val leveled = graft.query.Traces.spanHierarchy(deduped,
        "span_span_id", "span_parent_span_id", maxDepth = MaxDepth,
        orphansAsRoots = true)
      // a span reachable at several depths takes its MINIMUM level
      // (reference span_levels CTE)
      val levels = leveled.groupBy(col("span_span_id"))
        .agg(min(col("span_level")).cast("long").as("level"))
      val out = deduped.join(levels, Seq("span_span_id"))
        // all rows share span_trace_id (filtered to one trace above) —
        // semantically the empty partition spec, minus the warning
        .withColumn("total_span_count",
          functions.count(lit(1)).over(
            Window.partitionBy(col("span_trace_id"))))
        .orderBy(col("level").asc, col("span_start_time_unix_nano").asc)
      // materialized before unpersist so callers get a stable frame
      val rows = out.collect()
      Right(out.sparkSession.createDataFrame(
        new java.util.ArrayList(java.util.Arrays.asList(rows: _*)),
        out.schema))
    } finally { deduped.unpersist(); () }
  }
}

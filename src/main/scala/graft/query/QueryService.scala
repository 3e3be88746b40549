package graft.query

import java.time.Instant

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.analysis.UnresolvedRelation
import org.apache.spark.sql.functions._

/** SQL entry point with automatic time-range injection.
  *
  * The reference rewrites every `TableScan` in the logical plan to add
  * `p_timestamp >= start AND p_timestamp < end` unless the query already
  * constrains the time column (parseable `src/query/mod.rs:829-911`). The
  * Spark-first equivalent: before executing user SQL, re-register each
  * referenced stream view as `SELECT * FROM t WHERE time >= .. AND time < ..`
  * — Catalyst folds the wrapper predicate into the scan (partition pruning +
  * parquet row-group pruning), so injection costs nothing at plan time and
  * prunes at both file and page level during execution.
  */
object QueryService {

  /** Stream registry entry: where the table lives, its time column, an
    * optional stats-catalog path for manifest-grade file pruning, and an
    * optional ingest root holding `.stream/stream.json` — when present,
    * scans read with the persisted union schema (old files null-fill newer
    * columns; no `mergeSchema` footer storm).
    */
  final case class Stream(path: String, timeCol: String,
                          catalogPath: Option[String] = None,
                          metaRoot: Option[String] = None)

  /** Table names referenced by a SQL query, resolved with Spark's own parser
    * (reference uses sqlparser+PostgreSqlDialect, `src/query/mod.rs:747-759`).
    * Names come back UNQUOTED (`tableName` would backtick-quote
    * non-identifier names like `otel-demo-logs`, which then never match the
    * stream registry).
    */
  def referencedTables(spark: SparkSession, sql: String): Seq[String] = {
    val plan = spark.sessionState.sqlParser.parsePlan(sql)
    plan.collectWithSubqueries {
      case r: UnresolvedRelation => r.multipartIdentifier.last
    }.distinct
  }

  /** Streams may carry names Spark's temp-view validator rejects (the
    * reference allows e.g. `otel-demo-logs`). Such names register under a
    * sanitized alias and the parsed plan is rewritten to reference it —
    * wrapped back in a `SubqueryAlias` carrying the ORIGINAL name, so
    * qualified column references (`` `otel-demo-logs`.body ``) and
    * per-relation time-filter attribution keep working.
    */
  private val SafeIdent = "^[A-Za-z_][A-Za-z0-9_]*$".r
  private[query] def viewName(name: String): String =
    if (SafeIdent.matches(name)) name
    else "g_" + name.replaceAll("[^A-Za-z0-9_]", "_") + "_" +
      java.lang.Integer.toHexString(name.hashCode)

  /** Parse `sql`, redirecting single-part relations of aliased streams to
    * their registered view names (identity when every name is safe).
    */
  private def rewrittenPlan(
      spark: SparkSession, sql: String, names: Set[String])
      : org.apache.spark.sql.catalyst.plans.logical.LogicalPlan = {
    import org.apache.spark.sql.catalyst.plans.logical.SubqueryAlias
    val parsed = spark.sessionState.sqlParser.parsePlan(sql)
    if (names.forall(n => viewName(n) == n)) parsed
    else parsed.transformUpWithSubqueries {
      case r: UnresolvedRelation
          if r.multipartIdentifier.size == 1 &&
            names.contains(r.multipartIdentifier.head) &&
            viewName(r.multipartIdentifier.head) !=
              r.multipartIdentifier.head =>
        SubqueryAlias(r.multipartIdentifier.head,
          UnresolvedRelation(Seq(viewName(r.multipartIdentifier.head))))
    }
  }

  /** Whether the parsed query filters on `timeCol` ANYWHERE — the coarse
    * textual check (reference `src/query/mod.rs:890-911`
    * `table_contains_any_time_filters` is stricter: per TableScan). Kept as
    * the fallback for SQL that cannot be analyzed; [[constrainedStreams]]
    * is the per-relation version [[query]] actually uses.
    */
  def containsTimeFilter(spark: SparkSession, sql: String, timeCol: String): Boolean = {
    import org.apache.spark.sql.catalyst.expressions.{Attribute, BinaryComparison}
    import org.apache.spark.sql.catalyst.plans.logical.Filter
    val plan = spark.sessionState.sqlParser.parsePlan(sql)
    plan.collectWithSubqueries { case f: Filter => f.condition }.exists { cond =>
      cond.collect { case cmp: BinaryComparison => cmp }.exists(_.children.exists {
        case a: Attribute => a.name.equalsIgnoreCase(timeCol)
        case _            => false
      })
    }
  }

  /** Stream names whose time column the query ALREADY constrains, attributed
    * per relation — the reference checks the filters of each TableScan
    * (`src/query/mod.rs:890-911`), so `SELECT .. FROM a JOIN b WHERE
    * a.p_timestamp >= X` must still get the window injected into `b` even
    * though both streams share the time-column NAME.
    *
    * Resolution: the SQL is analyzed (not executed) against the registered
    * views; each stream's relation instances surface as `SubqueryAlias`
    * nodes whose output attributes carry unique `ExprId`s, so a comparison
    * is attributed to exactly the relation whose attribute it references.
    * Alias indirection (`SELECT ts AS t FROM s` ... `WHERE t > X`) is
    * resolved through a transitive closure over `Alias` edges. Self-joins
    * of one stream collapse to name granularity (injection here is
    * per-view): if ANY instance is constrained the stream is skipped.
    *
    * Registers each stream as a PLAIN (unwindowed) temp view for the
    * analysis — callers that need windowed views ([[query]]) re-register
    * them afterwards. If analysis fails (e.g. a non-stream table is
    * absent), falls back to the global [[containsTimeFilter]] check per
    * time column — conservative in the same direction as the old behavior.
    */
  def constrainedStreams(
      spark: SparkSession,
      streams: Map[String, Stream],
      sql: String): Set[String] = {
    import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute, BinaryComparison, ExprId}
    import org.apache.spark.sql.catalyst.plans.logical.{Filter => LFilter, SubqueryAlias}
    streams.foreach { case (name, s) =>
      plainReader(spark, name, s).parquet(s.path)
        .createOrReplaceTempView(viewName(name))
    }
    val analyzed =
      try org.apache.spark.sql.graft.ColumnBridge
        .ofRows(spark, rewrittenPlan(spark, sql, streams.keySet))
        .queryExecution.analyzed
      catch {
        case _: Exception =>
          return streams.filter { case (_, s) =>
            containsTimeFilter(spark, sql, s.timeCol)
          }.keySet
      }
    val aliasEdges: Map[ExprId, Set[ExprId]] =
      analyzed.collectWithSubqueries { case p =>
        p.expressions.flatMap(_.collect {
          case a: Alias => a.exprId -> a.child.references.map(_.exprId).toSet
        })
      }.flatten.toMap
    def close(ids: Set[ExprId]): Set[ExprId] = {
      var cur = ids
      var grown = true
      while (grown) {
        val next = cur ++ cur.flatMap(aliasEdges.getOrElse(_, Set.empty[ExprId]))
        grown = next.size != cur.size
        cur = next
      }
      cur
    }
    val compared: Set[ExprId] = close(
      analyzed.collectWithSubqueries { case f: LFilter =>
        f.condition.collect { case cmp: BinaryComparison =>
          cmp.children.collect { case a: Attribute => a.exprId }
        }.flatten
      }.flatten.toSet)
    streams.collect {
      case (name, s) if analyzed.collectWithSubqueries {
            case sa: SubqueryAlias if sa.alias.equalsIgnoreCase(name) =>
              sa.output.filter(_.name.equalsIgnoreCase(s.timeCol)).map(_.exprId)
          }.flatten.exists(compared) =>
        name
    }.toSet
  }

  /** Detect `SELECT COUNT(*) FROM t` (no filters, no grouping) — the shape
    * answerable from catalog metadata without scanning data files
    * (reference `src/query/mod.rs:427-462`). Returns the table name.
    */
  def detectBareCountStar(spark: SparkSession, sql: String): Option[String] =
    bareCountStar(spark, sql).map(_._1)

  /** As [[detectBareCountStar]], also yielding the output column name the
    * executed query would carry (`count(1)` unless aliased) — so a fast
    * path can answer with the exact response shape.
    */
  def bareCountStar(spark: SparkSession,
                    sql: String): Option[(String, String)] = {
    import org.apache.spark.sql.catalyst.expressions.{Alias, Expression}
    import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Project}
    def isCountStar(exprs: Seq[Expression]): Boolean =
      exprs.size == 1 && {
        // parsed (pre-analysis) trees print count(*) as 'count(*) / 'count(1)
        val text = exprs.head.toString.toLowerCase.replaceAll("[\\s']", "")
        text.contains("count(*)") || text.contains("count(1)")
      }
    def outName(e: Expression): String = e match {
      case a: Alias => a.name
      case _        => "count(1)"
    }
    spark.sessionState.sqlParser.parsePlan(sql) match {
      // COUNT(*) with no grouping parses as a bare Project until analysis
      case Project(list, r: UnresolvedRelation) if isCountStar(list) =>
        Some((r.multipartIdentifier.last, outName(list.head)))
      case Aggregate(Nil, aggs, r: UnresolvedRelation, _) if isCountStar(aggs) =>
        Some((r.multipartIdentifier.last, outName(aggs.head)))
      case _ => None
    }
  }

  /** Answer a bare COUNT(*) from the stats catalog if the query has that
    * shape and a catalog exists for the stream; None → execute normally.
    */
  def countStarFastPath(spark: SparkSession, sql: String,
                        catalogPaths: Map[String, String]): Option[Long] =
    detectBareCountStar(spark, sql)
      .flatMap(catalogPaths.get)
      .map(graft.catalog.StatsCatalog.countStar(spark, _))

  /** Reader with the stream's persisted union schema applied (old files
    * null-fill newer columns; no `mergeSchema` footer storm).
    */
  private def plainReader(spark: SparkSession, name: String, s: Stream) =
    s.metaRoot
      .flatMap(graft.catalog.StreamMeta.unionSchema(_, name))
      .foldLeft(spark.read)((r, schema) => r.schema(schema))

  /** Staging freshness window (reference: queries whose range touches the
    * last 5 minutes union in not-yet-synced staging data,
    * `src/query/stream_schema_provider.rs:936-958`).
    */
  val StagingWindowMillis: Long = 5 * 60 * 1000L

  /** Time-windowed single-stream read for the non-SQL paths (alert
    * evaluation, counts scans, log-context pages): the same scan shape
    * [[query]] builds for SQL — stats-catalog `FileIndex` when the stream
    * has one (pushed predicates prune FILES before any footer opens), the
    * coarse Hive date-partition predicate (directory pruning), and the
    * exact row-level window. No staging union — these paths answer from
    * durable data.
    */
  def windowedRead(spark: SparkSession, name: String, s: Stream,
                   range: TimeRange): DataFrame = {
    val source = s.catalogPath match {
      case Some(cat) =>
        val catDf = graft.catalog.StatsCatalog.resolve(spark, cat)
        if (catDf.columns.contains("file_size"))
          graft.plans.StatsFileIndex.read(spark, catDf,
            s.metaRoot.flatMap(graft.catalog.StreamMeta.unionSchema(_, name)))
        else plainReader(spark, name, s).parquet(s.path)
      case _ => plainReader(spark, name, s).parquet(s.path)
    }
    val timed = source.filter(
      col(s.timeCol) >= lit(Instant.ofEpochMilli(range.start.toEpochMilli)) &&
        col(s.timeCol) < lit(Instant.ofEpochMilli(range.end.toEpochMilli)))
    if (source.columns.contains("date")) {
      val fmt = java.time.format.DateTimeFormatter.ISO_LOCAL_DATE
        .withZone(java.time.ZoneOffset.UTC)
      timed.filter(col("date").between(
        fmt.format(range.start), fmt.format(range.end)))
    } else timed
  }

  /** [[query]] behind the RBAC gate (reference query flow step 5,
    * `user_auth_for_datasets`): every stream the SQL references must be
    * readable by `user`.
    */
  def authorizedQuery(
      spark: SparkSession,
      streams: Map[String, Stream],
      sql: String,
      range: TimeRange,
      user: String): Either[String, DataFrame] = {
    val referenced = referencedTables(spark, sql).filter(streams.contains)
    Rbac.authorizeQuery(user, referenced)
      .map(_ => query(spark, streams, sql, range))
  }

  /** Execute `sql` with the time window injected into every referenced
    * stream. Non-stream tables (dims) pass through unfiltered. Queries
    * whose range reaches into the staging window also see the in-memory
    * recent batches ([[graft.streaming.LiveTail]]) unioned under the table
    * view — the Spark shape of the reference's staging ∪ parquet scan.
    */
  def query(
      spark: SparkSession,
      streams: Map[String, Stream],
      sql: String,
      range: TimeRange): DataFrame = {
    val freshCutoff = System.currentTimeMillis() - StagingWindowMillis
    val referenced = referencedTables(spark, sql)
      .flatMap(n => streams.get(n).map(n -> _))
    // pass 1 (inside constrainedStreams): plain views, so the SQL can be
    // ANALYZED (no execution) and existing time filters attributed to
    // individual relations; pass 2 below re-registers the real views
    val constrained =
      constrainedStreams(spark, referenced.toMap, sql)
    referenced.foreach { case (name, s) =>
        val skipInject = constrained.contains(name)
        def windowed(df: DataFrame): DataFrame =
          if (skipInject) df
          else {
            val timed = df.filter(
              col(s.timeCol) >= lit(Instant.ofEpochMilli(range.start.toEpochMilli)) &&
                col(s.timeCol) < lit(Instant.ofEpochMilli(range.end.toEpochMilli)))
            // streams written by IngestPipeline are Hive-partitioned by
            // date/hour string dirs — a coarse date-range predicate on the
            // partition column turns the time window into directory
            // pruning (the row filter above is exact; this one skips IO)
            if (df.columns.contains("date")) {
              val fmt = java.time.format.DateTimeFormatter.ISO_LOCAL_DATE
                .withZone(java.time.ZoneOffset.UTC)
              timed.filter(col("date").between(
                fmt.format(range.start), fmt.format(range.end)))
            } else timed
          }
        // file-level pruning from the stats catalog happens before Spark
        // lists anything (reference manifest pruning); the exact row-level
        // window still applies above the pruned scan. Bounds widen to whole
        // seconds so the string min/max comparison stays conservative.
        val reader = plainReader(spark, name, s)
        val source = s.catalogPath match {
          case Some(cat) if !skipInject =>
            import graft.catalog.StatsCatalog
            val catDf = StatsCatalog.resolve(spark, cat)
            if (catDf.columns.contains("file_size")) {
              // catalog-backed FileIndex: every pushed predicate (the
              // injected window AND the user's own filters) prunes files
              // inside the scan itself — no pre-computed path list
              val schema = s.metaRoot
                .flatMap(graft.catalog.StreamMeta.unionSchema(_, name))
              graft.plans.StatsFileIndex.read(spark, catDf, schema)
            } else {
              // legacy catalogs (no file_size): driver-side path pruning
              val fmt = java.time.format.DateTimeFormatter
                .ofPattern("yyyy-MM-dd HH:mm:ss")
                .withZone(java.time.ZoneOffset.UTC)
              val preds = Seq(
                StatsCatalog.Pred(s.timeCol, StatsCatalog.GtEq,
                  fmt.format(range.start.truncatedTo(java.time.temporal.ChronoUnit.SECONDS))),
                StatsCatalog.Pred(s.timeCol, StatsCatalog.Lt,
                  fmt.format(range.end.plusSeconds(1)
                    .truncatedTo(java.time.temporal.ChronoUnit.SECONDS))))
              val files = StatsCatalog.pruneFiles(spark, cat, preds)
              if (files.isEmpty) reader.parquet(s.path).filter(lit(false))
              else reader.parquet(files: _*)
            }
          case _ => reader.parquet(s.path)
        }
        val base = windowed(source)
        val df =
          if (range.end.toEpochMilli < freshCutoff) base
          else
            graft.streaming.LiveTail.recentFrame(spark, name) match {
              case Some(recent) if recent.columns.contains(s.timeCol) =>
                base.unionByName(windowed(recent), allowMissingColumns = true)
              case _ => base
            }
        df.createOrReplaceTempView(viewName(name))
    }
    org.apache.spark.sql.graft.ColumnBridge.ofRows(spark,
      rewrittenPlan(spark, sql, referenced.map(_._1).toSet))
  }
}

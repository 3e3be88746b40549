package graft.plans

import java.util.concurrent.ConcurrentHashMap

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{And, Attribute, BinaryComparison, GreaterThanOrEqual, LessThan, Literal}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.types.TimestampNTZType

/** Plan-level time-range injection — the reference's `final_logical_plan`
  * rewrite (parseable `src/query/mod.rs:387-424,829-911`: every TableScan
  * of a stream gains `time >= start AND time < end` unless the query
  * already constrains the time column) as a Catalyst `Rule[LogicalPlan]`.
  *
  * [[graft.query.QueryService]] does the same at the view layer; this rule
  * is the engine-level variant that covers ANY DataFrame/SQL path touching
  * a registered stream relation, installed via
  * `spark.experimental.extraOptimizations` ([[install]]).
  *
  * Idempotence = the reference's own skip condition: once a comparison on
  * the time column exists anywhere in the plan (including the filter this
  * rule injected), the rule no-ops — safe under the optimizer's fixed-point
  * iteration.
  */
object TimeFilterInjection {

  /** A registered stream window: any relation whose file path contains
    * `pathFragment` is constrained to [startMs, endMs) on `timeCol`.
    */
  final case class StreamWindow(pathFragment: String, timeCol: String,
                                startMs: Long, endMs: Long)

  private val windows = new ConcurrentHashMap[SparkSession, Seq[StreamWindow]]()

  def set(spark: SparkSession, ws: Seq[StreamWindow]): Unit =
    windows.put(spark, ws)

  def clear(spark: SparkSession): Unit = { windows.remove(spark); () }

  def get(spark: SparkSession): Seq[StreamWindow] =
    Option(windows.get(spark)).getOrElse(Nil)

  def install(spark: SparkSession): Unit = {
    val rule = new TimeFilterInjectionRule(spark)
    if (!spark.experimental.extraOptimizations.exists(
        _.isInstanceOf[TimeFilterInjectionRule]))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ rule
  }
}

final class TimeFilterInjectionRule(spark: SparkSession)
    extends Rule[LogicalPlan] {
  import TimeFilterInjection._

  /** ExprIds compared inside any Filter of the plan. Attribution is by
    * ExprId, not column NAME: the reference skips injection per TableScan
    * (`src/query/mod.rs:890-911`), so `a JOIN b WHERE a.ts >= X` must still
    * inject into `b` even though both relations expose a `ts`. This rule
    * runs post-pushdown (experimental batch), so a user filter sits directly
    * on its relation's attributes by then; the injected filter's own
    * comparison lands in this set on the NEXT fixed-point pass, which is
    * what keeps the rule idempotent.
    */
  private def comparedExprIds(
      plan: LogicalPlan): Set[org.apache.spark.sql.catalyst.expressions.ExprId] =
    plan.collectWithSubqueries { case f: Filter =>
      f.condition.collect { case cmp: BinaryComparison =>
        cmp.children.collect { case a: Attribute => a.exprId }
      }.flatten
    }.flatten.toSet

  override def apply(plan: LogicalPlan): LogicalPlan = {
    val ws = get(spark)
    if (ws.isEmpty) plan
    else {
      val compared = comparedExprIds(plan)
      ws.foldLeft(plan) { (p, w) =>
        // transformUp: top-down would descend into the freshly-wrapped
        // Filter(relation) and wrap again, forever
        p.transformUp {
          case r @ LogicalRelation(h: HadoopFsRelation, _, _, _, _)
              if h.location.rootPaths.exists(_.toString.contains(w.pathFragment)) &&
                r.output.exists(_.name.equalsIgnoreCase(w.timeCol)) =>
            val attr = r.output.find(_.name.equalsIgnoreCase(w.timeCol)).get
            if (compared.contains(attr.exprId)) r // THIS scan already constrained
            else attr.dataType match {
              // micros literals; NTZ compares in UTC session semantics. Other
              // column types: leave the relation alone (a Long literal would
              // mean micros against arbitrary units — unsafe to guess).
              case t @ (org.apache.spark.sql.types.TimestampType |
                        TimestampNTZType) =>
                Filter(And(
                  GreaterThanOrEqual(attr, Literal(w.startMs * 1000L, t)),
                  LessThan(attr, Literal(w.endMs * 1000L, t))), r)
              case _ => r
            }
        }
      }
    }
  }
}

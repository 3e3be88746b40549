package graft.functions

import org.apache.spark.sql.{Column, SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.graft.ColumnBridge

/** Engine extensions: native function registration.
  *
  * Two entry points:
  *   - `--conf spark.sql.extensions=graft.functions.GraftExtensions`
  *     (cluster-wide, SQL-visible);
  *   - [[GraftFunctions.register]] for an already-built session (what
  *     [[graft.engine.GraftSession]] does).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftFunctions.registrations.foreach(ext.injectFunction)
}

object GraftFunctions {

  val registrations: Seq[(FunctionIdentifier, ExpressionInfo,
      Seq[Expression] => Expression)] = Seq(
    (FunctionIdentifier("graft_dot"),
      new ExpressionInfo(classOf[ArrayDotProduct].getName, "graft_dot"),
      (args: Seq[Expression]) => ArrayDotProduct(args(0), args(1))))

  /** Register all graft functions on an existing session (idempotent). */
  def register(spark: SparkSession): Unit =
    registrations.foreach { case (ident, info, builder) =>
      spark.sessionState.functionRegistry.registerFunction(ident, info, builder)
    }

  /** Column-API handle on the native dot product. */
  def graftDot(a: Column, b: Column): Column =
    ColumnBridge.column(
      ArrayDotProduct(ColumnBridge.expression(a), ColumnBridge.expression(b)))
}

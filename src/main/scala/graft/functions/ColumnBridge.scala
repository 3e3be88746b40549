package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge into Spark's package-private Column⇄Expression converters
  * (`org.apache.spark.sql.classic.ExpressionUtils` is `private[sql]`).
  * Lives under the spark package solely to re-export the two calls the
  * engine needs for native-Expression columns.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}

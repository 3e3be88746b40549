package graft.query

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Log-context keyset pagination: rows around an anchor, addressed by a
  * composite (timestamp, tiebreak-id) cursor.
  *
  * Mirrors the reference's query_context SQL generator (parseable
  * `src/handlers/http/query_context.rs:607-872`): forward pages filter
  * `(ts, id) > cursor` ordered ascending, backward pages filter
  * `(ts, id) < cursor` ordered descending. Keyset (not OFFSET) pagination is
  * the scale-correct choice: the predicate prunes parquet row groups by the
  * ts min/max, so page N costs the same as page 1.
  */
object LogContext {

  final case class Cursor(tsMillis: Long, id: Long)

  private def tsCol(timeCol: String): Column = col(timeCol).cast("timestamp")

  /** Rows strictly after the cursor, oldest first. */
  def after(df: DataFrame, timeCol: String, idCol: String, cursor: Cursor, n: Int): DataFrame = {
    val t = tsCol(timeCol)
    val anchor = timestamp_millis(lit(cursor.tsMillis))
    df.filter(t > anchor || (t === anchor && col(idCol) > lit(cursor.id)))
      .orderBy(t.asc, col(idCol).asc)
      .limit(n)
  }

  /** Rows strictly before the cursor, newest first. */
  def before(df: DataFrame, timeCol: String, idCol: String, cursor: Cursor, n: Int): DataFrame = {
    val t = tsCol(timeCol)
    val anchor = timestamp_millis(lit(cursor.tsMillis))
    df.filter(t < anchor || (t === anchor && col(idCol) < lit(cursor.id)))
      .orderBy(t.desc, col(idCol).desc)
      .limit(n)
  }
}

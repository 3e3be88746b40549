package graft.query

import java.io.Writer

import com.fasterxml.jackson.databind.ObjectMapper
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types._

/** Query-response serialization: JSON rows (batch) and chunked NDJSON
  * (streaming), mirroring the reference's two response modes
  * (`src/utils/arrow/mod.rs:50-74` `record_batches_to_json`,
  * `src/handlers/http/query.rs:325-407` NDJSON streaming).
  *
  * Streaming uses `toLocalIterator` — one partition's rows are on the
  * driver at a time, so a 10^9-row result streams with bounded memory
  * while executors compute later partitions ahead.
  */
object ResponseWriter {

  private val mapper = new ObjectMapper()

  /** One row → JSON object text. `sendNull=true` keeps null fields
    * (reference `send_null` fill); otherwise they are omitted.
    */
  def rowToJson(row: Row, schema: StructType, sendNull: Boolean): String = {
    val node = mapper.createObjectNode()
    schema.fields.zipWithIndex.foreach { case (f, i) =>
      if (row.isNullAt(i)) { if (sendNull) node.putNull(f.name) }
      else f.dataType match {
        case BooleanType => node.put(f.name, row.getBoolean(i))
        case IntegerType => node.put(f.name, row.getInt(i))
        case LongType => node.put(f.name, row.getLong(i))
        case FloatType => node.put(f.name, row.getFloat(i))
        case DoubleType => node.put(f.name, row.getDouble(i))
        case _: DecimalType => node.put(f.name, row.getDecimal(i))
        case TimestampType | TimestampNTZType | DateType =>
          node.put(f.name, String.valueOf(row.get(i)))
        case StringType => node.put(f.name, row.getString(i))
        case _ => node.put(f.name, String.valueOf(row.get(i)))
      }
    }
    mapper.writeValueAsString(node)
  }

  /** Batch mode: the full result as a JSON array (collects — use only for
    * bounded results; reference batch mode does the same).
    */
  def toJsonArray(df: DataFrame, sendNull: Boolean = true): String = {
    val schema = df.schema
    df.collect().map(rowToJson(_, schema, sendNull)).mkString("[", ",", "]")
  }

  /** Streaming mode: newline-delimited JSON written incrementally.
    * Returns the row count.
    */
  def writeNdjson(df: DataFrame, out: Writer, sendNull: Boolean = true): Long = {
    val schema = df.schema
    var n = 0L
    val it = df.toLocalIterator()
    while (it.hasNext) {
      out.write(rowToJson(it.next(), schema, sendNull))
      out.write("\n")
      n += 1
    }
    out.flush()
    n
  }
}

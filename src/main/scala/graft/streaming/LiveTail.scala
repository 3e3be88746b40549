package graft.streaming

import java.util.concurrent.ConcurrentHashMap
import java.util.concurrent.CopyOnWriteArrayList

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types.StructType

/** Live tail + recent-batch buffer.
  *
  * Two roles, mirroring the reference (parseable `src/livetail.rs:37-110`
  * and the 5-minute staging window,
  * `src/query/stream_schema_provider.rs:936-958`):
  *   - pub/sub fan-out of each ingested micro-batch to subscribers
  *     (the livetail API);
  *   - a bounded ring of recent batches per stream, exposed as a DataFrame
  *     to union with the parquet table so queries see not-yet-synced data
  *     ([[recentFrame]] — the "staging scan").
  *
  * The buffer holds only the freshness window (seconds of data), so rows
  * living on the driver is bounded and deliberate — it replaces the
  * reference's in-memory Arrow staging, not the table itself.
  */
object LiveTail {

  /** `persisted=true` marks batches already flushed to the parquet table —
    * live-tail subscribers still see them, but the query-time staging union
    * skips them (they'd double-count with the table scan).
    */
  final case class Batch(schema: StructType, rows: Array[Row], atMillis: Long,
                         persisted: Boolean = false)

  private val buffers = new ConcurrentHashMap[String, CopyOnWriteArrayList[Batch]]()
  private val subscribers =
    new ConcurrentHashMap[String, CopyOnWriteArrayList[Batch => Unit]]()

  /** Freshness window: batches older than this are dropped on publish. */
  @volatile var windowMillis: Long = 5 * 60 * 1000L

  /** Max rows retained per stream (hard cap on driver memory). */
  @volatile var maxRows: Int = 100000

  def publish(stream: String, df: DataFrame,
              persisted: Boolean = false): Unit = {
    val rows = df.limit(maxRows).collect()
    val batch = Batch(df.schema, rows, System.currentTimeMillis(), persisted)
    // persisted batches exist only for subscriber fan-out — the staging
    // union always skips them ([[recentFrame]]), so buffering them would
    // be pure driver-heap waste while someone tails a busy stream
    if (!persisted) {
      val buf =
        buffers.computeIfAbsent(stream, _ => new CopyOnWriteArrayList[Batch]())
      buf.add(batch)
      val cutoff = System.currentTimeMillis() - windowMillis
      buf.removeIf(b => b.atMillis < cutoff)
      var total = 0
      // enforce the row cap newest-first
      val keep = buf.asScala.toSeq.reverse.takeWhile { b =>
        total += b.rows.length; total <= maxRows
      }.reverse
      if (keep.size != buf.size) { buf.clear(); buf.addAll(keep.asJava) }
    }
    Option(subscribers.get(stream)).foreach(_.asScala.foreach(f => f(batch)))
  }

  /** Active subscriber count for a stream — lets publishers skip the
    * collect entirely when nobody is tailing.
    */
  def subscriberCount(stream: String): Int =
    Option(subscribers.get(stream)).map(_.size).getOrElse(0)

  def subscribe(stream: String)(f: Batch => Unit): () => Unit = {
    val subs = subscribers.computeIfAbsent(stream,
      _ => new CopyOnWriteArrayList[Batch => Unit]())
    subs.add(f)
    () => { subs.remove(f); () }
  }

  /** Recent *not-yet-persisted* rows as a DataFrame (latest batch schema
    * wins; earlier batches are padded with nulls for columns they predate —
    * the union schema grows monotonically so this is total). Batches
    * published with `persisted=true` are excluded: they are already visible
    * through the table scan.
    */
  def recentFrame(spark: SparkSession, stream: String): Option[DataFrame] = {
    val batches = Option(buffers.get(stream)).map(_.asScala.toSeq).getOrElse(Nil)
      .filterNot(_.persisted)
    if (batches.isEmpty) None
    else {
      val schema = batches.last.schema
      val padded = batches.flatMap { b =>
        val idx = schema.fields.map(f =>
          b.schema.fieldNames.indexOf(f.name)).toSeq
        b.rows.map(r => Row.fromSeq(idx.map(i => if (i < 0) null else r.get(i))))
      }
      Some(spark.createDataFrame(padded.asJava, schema))
    }
  }

  def clear(stream: String): Unit = {
    buffers.remove(stream); ()
  }
}

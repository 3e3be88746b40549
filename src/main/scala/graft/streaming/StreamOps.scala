package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming counterparts of the batch dedup/join operators — the pieces a
  * continuously-ingesting pipeline needs to apply the same semantics
  * in-flight instead of in nightly batches.
  *
  * State-size discipline (the 100 TB question for streams is state, not
  * data): every operator here bounds its state with an event-time
  * watermark — dedup state and join buffers are dropped as the watermark
  * passes, so state is O(traffic within the lateness window), never
  * O(history).
  */
object StreamOps {

  /** Streaming exact dedup on `keyCols`: keeps the first occurrence, drops
    * later duplicates arriving within the watermark delay of each other.
    * State per key expires once the watermark passes (Spark's
    * `dropDuplicatesWithinWatermark`), which is exactly the guarantee an
    * at-least-once ingest (retries, replayed batches) needs — duplicates
    * arrive close together; a re-ingest a week later is a restatement, not
    * a duplicate.
    */
  def dedupExact(df: DataFrame, tsCol: String, delay: String,
                 keyCols: Seq[String]): DataFrame =
    df.withWatermark(tsCol, delay)
      .dropDuplicatesWithinWatermark(keyCols)

  /** Content-fingerprint streaming dedup: same as [[dedupExact]] but keyed
    * on a hash of normalized text — the streaming twin of
    * `Dedup.exactGroups`.
    */
  def dedupByContent(df: DataFrame, tsCol: String, delay: String,
                     textCol: String): DataFrame =
    dedupExact(
      df.withColumn("fp_md5",
        md5(regexp_replace(trim(lower(col(textCol))), "\\s+", " ")
          .cast("binary"))),
      tsCol, delay, Seq("fp_md5"))

  /** Stream-stream inner join: rows match on `keyCol` when the right event
    * lands in `[left ts, left ts + within]` — the impression→click /
    * request→response correlation shape. Right-side columns come back
    * prefixed `r_`. Both sides carry watermarks and the join condition
    * bounds the right ts relative to the left, so each side's join buffer
    * is dropped as the watermark passes — state O(lateness window), not
    * O(stream history).
    */
  def joinWithin(left: DataFrame, right: DataFrame, keyCol: String,
                 leftTs: String, rightTs: String, delay: String,
                 within: String): DataFrame = {
    val r = right.columns.foldLeft(right)((d, c) =>
      d.withColumnRenamed(c, s"r_$c"))
    left.withWatermark(leftTs, delay)
      .join(r.withWatermark(s"r_$rightTs", delay),
        col(keyCol) === col(s"r_$keyCol") &&
          col(s"r_$rightTs") >= col(leftTs) &&
          col(s"r_$rightTs") <= col(leftTs) + expr(s"INTERVAL $within"))
  }
}

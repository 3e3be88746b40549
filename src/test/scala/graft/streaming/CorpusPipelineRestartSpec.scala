package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSuite
import graft.ml.TextAnalysis

/** Cross-session restart for the streaming corpus-prep pipeline: the query
  * is stopped and a NEW query resumes from the same checkpoint — the shape
  * of every real deployment (rolling restarts, crash recovery, rescale).
  * Two properties must hold:
  *   1. the dedup state survives — it lives in the on-disk shingle index,
  *      not executor memory, so a doc arriving after the restart that
  *      duplicates a pre-restart doc is still dropped;
  *   2. at-least-once re-delivery across the restart (offset log ahead of
  *      the commit log — a crash between the two) must not duplicate sink
  *      rows: the `_last_batch` marker makes the replayed foreachBatch a
  *      no-op.
  * MemoryStream is not durable, so the "source" of the restarted query is
  * a fresh stream pre-loaded with the already-delivered rows BEFORE start —
  * reproducing exactly what a replayable source (Kafka, files) serves on
  * recovery.
  */
class CorpusPipelineRestartSpec extends SparkSuite {
  import spark.implicits._

  private val batch1 = Seq(
    (1L, "the quick brown fox jumps over the lazy dog today."),
    (2L, "a perfectly unique document about mountain weather patterns."))
  private val batch2 = Seq(
    (10L, "the quick brown fox jumps over the lazy dog today."), // == 1
    (11L, "another totally distinct essay regarding maritime navigation laws."))

  private def cleaned(df: org.apache.spark.sql.DataFrame) =
    df.filter(TextAnalysis.c4Flags(col("text")).toMap.apply("keep"))
      .withColumn("quality", TextAnalysis.qualityScore(col("text")))

  private def startPipeline(input: MemoryStream[(Long, String)], dir: String) =
    StreamOps.dedupNearStream(
        cleaned(input.toDF().toDF("doc_id", "text")), "doc_id", "text",
        s"$dir/index",
        sink = df => if (!df.isEmpty)
          df.write.mode("append").parquet(s"$dir/clean"),
        n = 3, threshold = 0.5)
      .option("checkpointLocation", s"$dir/ckpt").start()

  test("graceful restart: shingle index survives, cross-restart dups drop") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("scp-restart").toString

    val in1 = MemoryStream[(Long, String)]
    val q1 = startPipeline(in1, dir)
    try { in1.addData(batch1: _*); q1.processAllAvailable() }
    finally q1.stop()

    // session 2: fresh source pre-loaded with the delivered prefix (what a
    // replayable source exposes on recovery); checkpoint offsets say batch
    // 0 is committed, so nothing reprocesses
    val in2 = MemoryStream[(Long, String)]
    in2.addData(batch1: _*)
    val q2 = startPipeline(in2, dir)
    try { q2.processAllAvailable()
          in2.addData(batch2: _*); q2.processAllAvailable() }
    finally q2.stop()

    val ids = spark.read.parquet(s"$dir/clean")
      .select("doc_id").collect().map(_.getLong(0)).toSeq
    // 10 duplicates pre-restart doc 1: only the index (disk state) can
    // know that — its absence proves state survived the restart
    assert(ids.sorted == Seq(1L, 2L, 11L), s"got $ids")
    assert(ids.distinct.length == ids.length, s"duplicate sink rows: $ids")
  }

  test("crash restart: commit log behind offsets -> replay skipped by marker") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("scp-crash").toString

    val in1 = MemoryStream[(Long, String)]
    val q1 = startPipeline(in1, dir)
    try { in1.addData(batch1: _*); q1.processAllAvailable() }
    finally q1.stop()

    // simulate a crash between the offset write and the commit write: drop
    // the commit-log entry for batch 0 so recovery re-delivers it
    val commit0 = java.nio.file.Paths.get(s"$dir/ckpt/commits/0")
    assert(java.nio.file.Files.exists(commit0), "expected commit log entry")
    java.nio.file.Files.delete(commit0)
    // local-FS checksum shadow; left behind it blocks recovery's rename
    java.nio.file.Files.deleteIfExists(
      java.nio.file.Paths.get(s"$dir/ckpt/commits/.0.crc"))

    val in2 = MemoryStream[(Long, String)]
    in2.addData(batch1: _*) // replayable source re-serves the batch
    val q2 = startPipeline(in2, dir)
    try { q2.processAllAvailable()
          in2.addData(batch2: _*); q2.processAllAvailable() }
    finally q2.stop()

    val ids = spark.read.parquet(s"$dir/clean")
      .select("doc_id").collect().map(_.getLong(0)).toSeq
    // batch 0 WAS re-executed (foreachBatch ran again) but the _last_batch
    // marker made it a no-op: no duplicated rows, no self-match dropouts
    // from double-appended index shingles
    assert(ids.sorted == Seq(1L, 2L, 11L), s"got $ids")
    assert(ids.distinct.length == ids.length, s"duplicate sink rows: $ids")
  }
}

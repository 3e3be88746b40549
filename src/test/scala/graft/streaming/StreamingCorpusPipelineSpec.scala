package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSuite
import graft.ml.{Dedup, TextAnalysis}

/** The CONTINUOUS twin of `CorpusPipelineSpec`: the training-data prep
  * workflow as one structured stream — C4 cleaning and quality scoring as
  * stateless per-row stages upstream, index-backed near-dup dedup as the
  * stateful stage, survivors landing in a parquet clean table. The batch
  * pipeline over the identical rows is the oracle: same survivors, same
  * quality values. This is the 100 TB ingest shape — the only state is the
  * on-disk shingle index (bounded by the KEPT corpus, not stream history),
  * so the pipeline restarts/rescales freely.
  */
class StreamingCorpusPipelineSpec extends SparkSuite {
  import spark.implicits._

  test("streaming clean -> near-dedup -> clean-table equals the batch twin") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("scp").toString
    val cleanTable = s"$dir/clean"

    // corpus across three arrivals: C4 rejects (too short / blocklist /
    // braces), near-dup groups spanning batches, and clean docs
    val batch1 = Seq(
      (1L, "the quick brown fox jumps over the lazy dog today."),
      (2L, "the quick brown fox jumps over the lazy cat today."), // ~1, intra
      (3L, "short"),                                              // C4: too short
      (4L, "a perfectly unique document about mountain weather patterns."))
    val batch2 = Seq(
      (10L, "the quick brown fox jumps over the lazy dog today."), // == 1
      (11L, "enable javascript to view this wonderful page with many words."),
      (12L, "another totally distinct essay regarding maritime navigation laws."))
    val batch3 = Seq(
      (20L, "a perfectly unique document about mountain weather patterns."), // == 4
      (21L, "fresh content in the third arrival discussing ancient pottery techniques."))
    val all = batch1 ++ batch2 ++ batch3

    def cleaned(df: org.apache.spark.sql.DataFrame) =
      df.filter(TextAnalysis.c4Flags(col("text")).toMap.apply("keep"))
        .withColumn("quality", TextAnalysis.qualityScore(col("text")))

    val input = MemoryStream[(Long, String)]
    val q = StreamOps.dedupNearStream(
        cleaned(input.toDF().toDF("doc_id", "text")), "doc_id", "text",
        s"$dir/index",
        sink = df => if (!df.isEmpty)
          df.write.mode("append").parquet(cleanTable),
        n = 3, threshold = 0.5)
      .option("checkpointLocation", s"$dir/ckpt").start()
    try {
      input.addData(batch1: _*); q.processAllAvailable()
      input.addData(batch2: _*); q.processAllAvailable()
      input.addData(batch3: _*); q.processAllAvailable()
    } finally q.stop()

    val got = spark.read.parquet(cleanTable)
    val gotIds = got.select("doc_id").collect().map(_.getLong(0)).toSet

    // batch twin over the same rows: C4 filter, then Jaccard keep-list.
    // Arrival order == id order here, so batch lowest-id-wins picks the
    // same canonicals the stream kept on first arrival.
    val static = cleaned(all.toDF("doc_id", "text"))
    val pairs = Dedup.jaccardPairs(static, "doc_id", "text",
      n = 3, threshold = 0.5)
    val expected = Dedup.keepList(static, "doc_id", pairs)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(gotIds == expected, s"stream=$gotIds batch=$expected")
    // C4 rejects and near-dups are gone; quality rides through unchanged
    assert(!gotIds.contains(3L) && !gotIds.contains(11L))
    assert(!gotIds.contains(2L) && !gotIds.contains(10L) &&
      !gotIds.contains(20L))
    val wantQ = static.select("doc_id", "quality").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    got.select("doc_id", "quality").collect().foreach { r =>
      assert(r.getDouble(1) == wantQ(r.getLong(0)), s"doc ${r.getLong(0)}")
    }
  }

  test("chained stages in one micro-batch: line strip feeds near-dedup, " +
      "each stage replay-guarded by its own state dir") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("scp-chain").toString
    val batch1 = Seq(
      (1L, "promo header\nalpha unique body text one two three"),
      (2L, "promo header\nbeta unique body text four five six"))
    val batch2 = Seq(
      (10L, "promo header\nalpha unique body text one two three"),
      (11L, "promo header\ngamma completely different content seven eight"))

    val input = MemoryStream[(Long, String)]
    val q = input.toDF().toDF("doc_id", "text").writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, id: Long) =>
        StreamOps.processLineDedupBatch(batch, id, "doc_id", "text",
          s"$dir/lineState",
          sink = stripped => StreamOps.processDedupBatch(
            stripped.select(col("doc_id"), col("clean_text").as("text")),
            id, "doc_id", "text", s"$dir/index",
            sink = out => if (!out.isEmpty)
              out.write.mode("append").parquet(s"$dir/clean"),
            n = 3, threshold = 0.5, numBuckets = 8),
          maxDocFreq = 2L, minLineChars = 1)
      }
      .option("checkpointLocation", s"$dir/ckpt").start()
    try {
      input.addData(batch1: _*); q.processAllAvailable()
      input.addData(batch2: _*); q.processAllAvailable()
    } finally q.stop()

    val got = spark.read.parquet(s"$dir/clean").collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("text")).toMap
    // batch 1: banner df=2 <= 2, kept; bodies distinct -> both land
    assert(got(1L) == "promo header\nalpha unique body text one two three")
    assert(got(2L).startsWith("promo header\n"))
    // batch 2: banner df=4 strips; doc 10's residual body near-dups the
    // INDEXED doc 1 -> dropped by stage 2; doc 11's residual is novel
    assert(!got.contains(10L), s"near-dup across stages must drop: $got")
    assert(got(11L) == "gamma completely different content seven eight")
    assert(got.keySet == Set(1L, 2L, 11L))
  }
}

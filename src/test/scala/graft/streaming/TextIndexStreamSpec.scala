package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSuite
import graft.ml.{TextIndex, TextRank}

/** Streaming inverted-index maintenance ([[StreamOps.textIndexStream]]):
  * the continuously-grown index must answer searches exactly like the
  * batch path over the stream prefix, replays must be no-ops, the
  * bootstrap crash window must rebuild (not self-append), CDC deletes
  * must hide docs, and in-loop compaction must preserve answers.
  */
class TextIndexStreamSpec extends SparkSuite {
  import spark.implicits._

  private val boot = Seq(
    (0L, "the quick brown fox jumps over the lazy dog"),
    (1L, "a lazy dog sleeps while the quick fox runs"),
    (2L, "gardens bloom in the spring rain"))
  private val extra = Seq(
    (10L, "fox and dog meet in the rain"),
    (11L, "nothing relevant in this one"))

  private val terms = Seq("fox", "dog", "rain")

  private def search(path: String): Seq[(Long, Long)] =
    TextIndex.bm25SearchPersisted(spark, path, terms, 100)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq

  private def adhoc(rows: Seq[(Long, String)]): Seq[(Long, Long)] =
    TextRank.bm25Scores(rows.toDF("doc_id", "text"), "doc_id", "text", terms)
      .orderBy($"score_micro".desc, $"doc_id".asc)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq

  private def process(path: String, batch: Seq[(Long, String)],
                      id: Long): Unit =
    StreamOps.processTextIndexBatch(batch.toDF("doc_id", "text"), id,
      "doc_id", "text", path, numBuckets = 8)

  test("derived artifacts (term dict: fuzzy/suggest/regex) rebuild " +
      "correctly off a streaming-maintained index") {
    val dir = java.nio.file.Files.createTempDirectory("txt-dict").toString
    val dict = java.nio.file.Files.createTempDirectory("txt-dictd").toString
    process(dir, boot, 0L)
    TextIndex.saveTermDict(spark, dir, dict, numBuckets = 4)
    // vocabulary as-of batch 0: "rain" df 1, no "rains"
    assert(TextIndex.fuzzyTermsPersisted(spark, dict, "rain")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet ==
      Set(("rain", 1L)))
    // the dict is REBUILD-on-mutation by contract: after the stream
    // appends, a stale dict still answers (old snapshot), a rebuild
    // reflects the appended batch
    process(dir, extra, 1L)
    TextIndex.saveTermDict(spark, dir, dict, numBuckets = 4)
    assert(TextIndex.fuzzyTermsPersisted(spark, dict, "rain")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet ==
      Set(("rain", 2L)))
    val sugg = TextIndex.suggestTerms(spark, dict, "r", 5)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(sugg == Seq(("rain", 2L), ("relevant", 1L), ("runs", 1L)))
    // regex doc search composes with the streamed postings too
    val rx = TextIndex.regexDocSearch(spark, dir, dict, "^ra.n$")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(rx == Set((2L, 1L), (10L, 1L)))
  }

  test("dictPath: per-batch vocab-delta folding keeps the dict equal " +
      "to a full rebuild across N append batches; a delete batch " +
      "routes to the rebuild") {
    val dir = java.nio.file.Files.createTempDirectory("txt-dfold").toString
    val dict = java.nio.file.Files.createTempDirectory("txt-dfoldd").toString
    val refDict =
      java.nio.file.Files.createTempDirectory("txt-dfoldr").toString
    def proc(batch: Seq[(Long, String)], id: Long): Unit =
      StreamOps.processTextIndexBatch(batch.toDF("doc_id", "text"), id,
        "doc_id", "text", dir, numBuckets = 8, dictPath = Some(dict))
    proc(boot, 0L)  // bootstrap: full derive
    proc(extra, 1L) // appends: incremental folds
    proc(Seq((20L, "rains fox raid"), (21L, "dog dog dog")), 2L)
    proc(Seq((30L, "another rain day")), 3L)
    // reference: offline full rebuild from the same live postings
    TextIndex.saveTermDict(spark, dir, refDict, numBuckets = 8)
    def termsOf(dp: String): Set[(String, Long)] =
      TextIndex.suggestTerms(spark, dp, "r", 100)
        .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(termsOf(dict) == termsOf(refDict),
      "folded dict 'r' vocabulary != rebuilt dict")
    // dict-SERVED fuzzy and suggest equal the rebuild, df included
    def fuzzy(dp: String) =
      TextIndex.fuzzyTermsPersisted(spark, dp, "rain")
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
        .toSet
    assert(fuzzy(dict) == fuzzy(refDict))
    assert(fuzzy(dict).contains(("rain", 3L, 0L))) // docs 2, 10, 30
    assert(fuzzy(dict).contains(("rains", 1L, 1L))) // folded-in new term
    val sugg = TextIndex.suggestTerms(spark, dict, "rai", 5)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(sugg == Seq(("rain", 3L), ("raid", 1L), ("rains", 1L)))
    // a CDC delete batch cannot fold (df decrements need live
    // postings): it must route to the full rebuild
    StreamOps.processTextIndexBatch(
      Seq((10L, "", "delete")).toDF("doc_id", "text", "op"), 4L,
      "doc_id", "text", dir, numBuckets = 8, opCol = Some("op"),
      dictPath = Some(dict))
    val afterDel = TextIndex.fuzzyTermsPersisted(spark, dict, "rain")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(afterDel.contains(("rain", 2L)), // doc 10's contribution gone
      s"delete batch did not rebuild the dict: $afterDel")
  }

  test("streamed index answers like the batch path over the prefix; " +
      "replay is a no-op") {
    val dir = java.nio.file.Files.createTempDirectory("txt-str").toString
    process(dir, boot, 0L)
    assert(search(dir) == adhoc(boot))
    process(dir, extra, 1L)
    assert(search(dir) == adhoc(boot ++ extra))
    val before = search(dir)
    process(dir, extra, 1L) // redelivery
    assert(search(dir) == before, "replay must be a no-op")
    val (n, s, _) = TextIndex.readStats(spark, dir)
    assert(n == 5L)
    assert(s == (boot ++ extra).map(_._2.split(" ").length.toLong).sum)
  }

  test("bootstrap crash between build and commit replays as a rebuild") {
    val dir = java.nio.file.Files.createTempDirectory("txt-crash").toString
    process(dir, boot, 0L)
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sessionState.newHadoopConf())
    assert(fs.delete(new org.apache.hadoop.fs.Path(dir, "_last_batch"), false))
    process(dir, boot, 0L) // replay of the building batch
    assert(search(dir) == adhoc(boot), "bootstrap replay double-appended")
    val (n, _, _) = TextIndex.readStats(spark, dir)
    assert(n == boot.size.toLong)
  }

  test("CDC deletes hide docs; in-loop compaction preserves answers") {
    val dir = java.nio.file.Files.createTempDirectory("txt-cdc").toString
    val withOp = boot.map { case (i, t) => (i, t, "add") }
    StreamOps.processTextIndexBatch(
      withOp.toDF("doc_id", "text", "op"), 0L, "doc_id", "text", dir,
      numBuckets = 8, opCol = Some("op"))
    // batch 1: add one doc, delete doc 0 — delete wins ordering is
    // irrelevant here (different ids), compaction triggered in-loop
    val b1 = Seq((10L, "fox and dog meet in the rain", "add"),
      (0L, "", "delete"))
    StreamOps.processTextIndexBatch(
      b1.toDF("doc_id", "text", "op"), 1L, "doc_id", "text", dir,
      numBuckets = 8, compactEvery = 1, opCol = Some("op"))
    val live = boot.filterNot(_._1 == 0L) :+
      ((10L, "fox and dog meet in the rain"))
    assert(search(dir) == adhoc(live))
    assert(TextIndex.activeDataDir(spark, dir).endsWith("data.gen1"))
    val (n, s, _) = TextIndex.readStats(spark, dir)
    assert(n == live.size.toLong)
    assert(s == live.map(_._2.split(" ").length.toLong).sum)
  }

  test("real stream through the writeStream wrapper") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("txt-live").toString
    val input = MemoryStream[(Long, String)]
    val q = StreamOps.textIndexStream(
        input.toDF().toDF("doc_id", "text"), "doc_id", "text",
        s"$dir/index", numBuckets = 8)
      .option("checkpointLocation", s"$dir/ckpt").start()
    try {
      input.addData(boot: _*); q.processAllAvailable()
      input.addData(extra: _*); q.processAllAvailable()
    } finally q.stop()
    assert(search(s"$dir/index") == adhoc(boot ++ extra))
  }
}

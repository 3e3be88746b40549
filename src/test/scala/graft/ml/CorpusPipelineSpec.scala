package graft.ml

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** End-to-end corpus preparation: the full training-data workflow composed
  * from the library's operators over the real documents table — exactly
  * the sequence a 100 TB pipeline runs, each stage a lazily-composed
  * DataFrame (one logical plan per materialization, no driver loops):
  *
  *   clean (C4 flags) → exact dedup → near dedup (Jaccard keep-list) →
  *   duplicated-passage splice-out → quality filter → mixture sampling →
  *   sequence packing — with a decontamination check on the side.
  */
class CorpusPipelineSpec extends SparkSuite {
  import spark.implicits._

  test("the full prep pipeline composes and conserves rows at each stage") {
    val docs = graft.engine.GraftSession.table(spark, sfDir, "documents")
    val n0 = docs.count()

    // 1. C4-style cleaning: keep flag from per-row predicates
    val kept = docs.filter(
      TextAnalysis.c4Flags(col("text")).toMap.apply("keep"))
    val n1 = kept.count()
    assert(n1 > 0 && n1 <= n0)

    // 2. exact dedup: keep one doc per md5 fingerprint group
    val canon = Dedup.exactGroups(kept, "doc_id", "text")
      .select(col("canonical_id").as("doc_id"))
    val exactDeduped = kept.join(canon, Seq("doc_id"), "left_semi")
    val n2 = exactDeduped.count()
    assert(n2 > 0 && n2 <= n1)

    // 3. near dedup: Jaccard pairs -> connected components -> keep-list
    val pairs = Dedup.jaccardPairs(exactDeduped, "doc_id", "text",
      n = 3, threshold = 0.5)
    val nearDeduped = Dedup.keepList(exactDeduped, "doc_id", pairs)
    val n3 = nearDeduped.count()
    assert(n3 > 0 && n3 <= n2)

    // 4. duplicated-passage splice-out (exact-substring dedup output)
    val cleaned = Dedup.removeDuplicateSpans(nearDeduped, "doc_id", "text")
    assert(cleaned.count() == n3) // row-preserving: text edited in place

    // 5. quality floor on the cleaned text
    val quality = cleaned
      .withColumn("q", TextAnalysis.qualityScore(col("clean_text")))
      .filter(col("q") > 0.3)
    val n5 = quality.count()
    assert(n5 > 0 && n5 <= n3)

    // 6. mixture sampling joins source back in (splice-out dropped it)
    val withSource = quality.join(
      docs.select(col("doc_id"), col("source")), Seq("doc_id"))
    val mixed = Sampling.mixtureSample(withSource, "doc_id", "source",
      weights = Map("src1" -> 2.0), defaultWeight = 1.0)
    val n6 = mixed.count()
    assert(n6 > n5 * 95 / 100) // src1 rows doubled, none lost

    // 7. sequence packing: greedy token-budget chunks per doc order
    val packed = Packing.concatChunks(
      mixed.select(col("doc_id"), col("clean_text")), "doc_id",
      size(TextAnalysis.tokens(col("clean_text"))), budgetTokens = 512)
    assert(packed.count() > 0)

    // side check: decontamination against a fake benchmark set
    val bench = docs.filter(col("doc_id") < 5)
      .select(col("doc_id"), col("text"))
    val contaminated = Dedup.contamination(
      mixed.select(col("doc_id"), col("clean_text").as("text")), bench,
      "doc_id", "text", n = 8, minShared = 2)
    assert(contaminated.count() >= 0) // shape check: join executes

    // the config-driven façade with the SAME stages lands on the same
    // (doc_id, epoch) multiset — CorpusPrep is composition, not new
    // semantics (it also carries `source` through the splice stage, so
    // the manual re-join disappears)
    val facade = CorpusPrep.run(docs, CorpusPrepConfig(
      c4Clean = true, exactDedup = true, nearDedup = Some((3, 0.5)),
      spliceSpansK = Some(8), qualityFloor = Some(0.3),
      mixtureWeights = Map("src1" -> 2.0), packBudgetTokens = None))
    val gotKeys = facade.select(col("doc_id"), col("epoch")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    val wantKeys = mixed.select(col("doc_id"), col("epoch")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    assert(gotKeys == wantKeys,
      s"façade=${gotKeys.take(5)}... manual=${wantKeys.take(5)}...")
  }

  test("CorpusPrep.stages exposes each intermediate lazily, in order") {
    val docs = graft.engine.GraftSession.table(spark, sfDir, "documents")
    val st = CorpusPrep.stages(docs, CorpusPrepConfig(
      nearDedup = None, qualityFloor = Some(0.0),
      lineDedupMaxDocFreq = Some(1000L)))
    assert(st.map(_._1) ==
      Seq("c4_clean", "line_dedup", "exact_dedup", "quality_floor"))
    // monotone doc counts through the filtering stages
    val counts = st.map { case (_, df) =>
      df.select("doc_id").distinct().count() }
    assert(counts.zip(counts.tail).forall { case (a, b) => b <= a }, counts)
    // decontaminate without a bench frame is a config error
    intercept[IllegalArgumentException] {
      CorpusPrep.stages(docs, CorpusPrepConfig(
        decontaminate = Some((8, 2L))))
    }
  }
}

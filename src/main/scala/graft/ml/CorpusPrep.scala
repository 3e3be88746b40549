package graft.ml

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** One-call corpus preparation: the standard training-data workflow
  * (clean → boilerplate strip → exact dedup → near dedup → passage
  * splice-out → decontaminate → quality floor → mixture → packing)
  * composed from the library's operators by a config instead of by hand.
  * Every stage is optional and the whole pipeline stays ONE lazy plan
  * chain — nothing materializes until the caller acts, exactly like the
  * hand-written composition (`CorpusPipelineSpec` pins the equivalence).
  *
  * [[CorpusPrep.stages]] returns every intermediate frame by name for
  * per-stage inspection (counts, sampling, data cards) without forcing
  * anything the caller doesn't ask for.
  */
final case class CorpusPrepConfig(
    idCol: String = "doc_id",
    textCol: String = "text",
    sourceCol: String = "source",
    /** C4-style cleaning predicate (Raffel 2020 flags). */
    c4Clean: Boolean = true,
    /** Strip lines repeated across more than this many docs. */
    lineDedupMaxDocFreq: Option[Long] = None,
    /** Keep one doc per exact content fingerprint. */
    exactDedup: Boolean = true,
    /** (shingle n, Jaccard threshold): near-dup keep-list. */
    nearDedup: Option[(Int, Double)] = Some((3, 0.5)),
    /** k-token duplicated-passage splice-out (Lee 2022). */
    spliceSpansK: Option[Int] = None,
    /** (n-gram, minShared): drop docs contaminated vs the benchmark
      * frame passed to [[CorpusPrep.run]].
      */
    decontaminate: Option[(Int, Long)] = None,
    /** Minimum quality score on the (possibly spliced) text. */
    qualityFloor: Option[Double] = None,
    /** Per-source epoch weights (empty = no mixture stage). */
    mixtureWeights: Map[String, Double] = Map.empty,
    /** Token budget per packed sequence (None = no packing stage). */
    packBudgetTokens: Option[Long] = None)

object CorpusPrep {

  /** Every stage's output frame in order, first to last. The LAST frame
    * is the pipeline result; earlier entries exist for lazy inspection.
    * Text edited by the splice stage continues under the ORIGINAL text
    * column name, so downstream stages and callers see one schema.
    */
  def stages(docs: DataFrame, cfg: CorpusPrepConfig,
             bench: Option[DataFrame] = None)
      : Seq[(String, DataFrame)] = {
    require(cfg.decontaminate.isEmpty || bench.isDefined,
      "decontaminate configured but no benchmark frame passed")
    val id = col(cfg.idCol)
    val out = Seq.newBuilder[(String, DataFrame)]
    var cur = docs
    def stage(name: String, df: DataFrame): Unit = { cur = df; out += name -> df }

    if (cfg.c4Clean) stage("c4_clean",
      cur.filter(TextAnalysis.c4Flags(col(cfg.textCol)).toMap.apply("keep")))

    cfg.lineDedupMaxDocFreq.foreach { maxDf =>
      val stripped = Dedup.lineDedup(cur, cfg.idCol, cfg.textCol, maxDf)
        .select(id, col("clean_text").as(cfg.textCol))
      // line strip rebuilds the frame from scratch: re-attach the other
      // columns (source, metadata) of the surviving docs
      val others = cur.columns.filterNot(_ == cfg.textCol).map(col).toSeq
      stage("line_dedup",
        cur.select(others: _*).join(stripped, Seq(cfg.idCol)))
    }

    if (cfg.exactDedup) {
      val canon = Dedup.exactGroups(cur, cfg.idCol, cfg.textCol)
        .select(col("canonical_id").as(cfg.idCol))
      stage("exact_dedup", cur.join(canon, Seq(cfg.idCol), "left_semi"))
    }

    cfg.nearDedup.foreach { case (n, threshold) =>
      val pairs = Dedup.jaccardPairs(cur, cfg.idCol, cfg.textCol,
        n, threshold)
      stage("near_dedup", Dedup.keepList(cur, cfg.idCol, pairs))
    }

    cfg.spliceSpansK.foreach { k =>
      val spliced = Dedup.removeDuplicateSpans(cur, cfg.idCol, cfg.textCol,
          k)
        .select(id, col("clean_text").as(cfg.textCol))
      val others = cur.columns.filterNot(_ == cfg.textCol).map(col).toSeq
      stage("splice_spans",
        cur.select(others: _*).join(spliced, Seq(cfg.idCol)))
    }

    cfg.decontaminate.foreach { case (n, minShared) =>
      val hit = Dedup.contamination(cur, bench.get, cfg.idCol, cfg.textCol,
          n, minShared)
        .select(col("train_id").as(cfg.idCol)).distinct()
      stage("decontaminate", cur.join(hit, Seq(cfg.idCol), "left_anti"))
    }

    cfg.qualityFloor.foreach { floor =>
      stage("quality_floor",
        cur.filter(TextAnalysis.qualityScore(col(cfg.textCol)) > floor))
    }

    if (cfg.mixtureWeights.nonEmpty) stage("mixture",
      Sampling.mixtureSample(cur, cfg.idCol, cfg.sourceCol,
        cfg.mixtureWeights))

    cfg.packBudgetTokens.foreach { budget =>
      stage("packing", Packing.concatChunks(
        cur.select(id, col(cfg.textCol)), cfg.idCol,
        size(TextAnalysis.tokens(col(cfg.textCol))), budget))
    }

    out.result()
  }

  /** The pipeline result (the last configured stage's frame). */
  def run(docs: DataFrame, cfg: CorpusPrepConfig,
          bench: Option[DataFrame] = None): DataFrame =
    stages(docs, cfg, bench).lastOption.map(_._2).getOrElse(docs)
}

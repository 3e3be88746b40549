package graft.ml

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.ColumnBridge

import graft.functions.{AllSubstrings, UnigramExpected, UnigramModel, UnigramPieces, UnigramPiecesSampled}

/** Unigram-LM (SentencePiece-style) tokenizer — the third family member
  * next to [[BpeTrain]] (merge-based) and the WordPiece encoder
  * (greedy-longest-match): pieces carry PROBABILITIES and a word's
  * tokenization is its maximum-likelihood segmentation (Kudo 2018,
  * "Subword Regularization"; the sentencepiece library's default model).
  * Where BPE's vocabulary is the closure of learned merges, the unigram
  * model SELECTS pieces directly, so rare words segment by probability
  * rather than merge history.
  *
  * Training is hard-EM (Viterbi-EM) over the distinct-word table:
  *   1. SEED: all code-point substrings of length ≤ `maxPieceLen`,
  *      weighted by word frequency; the top `seedSize` by
  *      (count desc, piece asc) plus ALL single characters (coverage:
  *      every word stays segmentable).
  *   2. E-step: each distinct word's Viterbi segmentation under the
  *      current log-probs ([[graft.functions.UnigramPieces]], one
  *      codegen'd distributed pass over the WORD TABLE — never the
  *      corpus); piece counts = Σ word-freq over segmentations.
  *   3. M-step: logp = ln(count / total) on the driver over the
  *      ≤ seedSize-row count table (the bounded-fold house contract).
  *      Multi-char pieces that scored zero drop; single chars always
  *      survive at a FLOOR log-prob `ln(0.5 / total)` (below any real
  *      count, so they only carry segments no learned piece covers).
  *   4. After the last iteration, PRUNE to `vocabSize`: single chars
  *      always kept, remaining budget to the top multi-char pieces by
  *      (count desc, piece asc).
  *
  * Determinism: the Viterbi tie-break is strictly-greater-wins over an
  * ascending-length candidate scan (pinned in [[UnigramModel]]); seeding
  * and pruning order by (count desc, piece asc); all log-probs are
  * driver-computed `Math.log` on exact BIGINT count ratios. Not
  * SQL-expressible (iterative EM + per-word DP), so the op is SPEC-gated
  * against a pure-Scala reference implementation, the deflate/WordPiece
  * convention.
  *
  * Scale shape: one corpus shuffle builds the word table
  * ([[BpeTrain.wordTable]]); each EM pass is one narrow projection +
  * one map-side-combined hash aggregate over DISTINCT WORDS; driver
  * state is bounded by `seedSize`. Encoding is a stateless codegen'd
  * kernel over token arrays — scan-bound, no shuffle.
  */
object UnigramLm {

  val Unk = "<unk>"

  /** Train a unigram model. Returns the model plus its final
    * (piece, count) table for inspection.
    */
  def train(docs: DataFrame, textCol: String, vocabSize: Int,
            maxPieceLen: Int = 8, seedSize: Int = 4096,
            iters: Int = 3): UnigramModel = {
    require(vocabSize >= 1 && maxPieceLen >= 1 && seedSize >= 1 &&
      iters >= 1, "vocabSize, maxPieceLen, seedSize, iters must be >= 1")
    val words = BpeTrain.wordTable(docs, textCol)
      .select(col("word"), col("freq"))
      .persist()
    try {
      // ---- seed ----
      val subCounts = words
        .select(col("freq"), explode(ColumnBridge.column(AllSubstrings(
          ColumnBridge.expression(col("word")), maxPieceLen))).as("piece"))
        .groupBy(col("piece")).agg(sum(col("freq")).as("cnt"))
        // Spark length() = UTF8String.numChars = CODE POINTS, so this is
        // an exact single-code-point test (astral chars included)
        .withColumn("__cp", length(col("piece")))
      // single chars always survive; multi-char pieces take the seed cap
      val singles = subCounts.filter(col("__cp") === 1)
        .select(col("piece"), col("cnt")).collect()
        .map(r => (r.getString(0), r.getLong(1)))
      val multis = subCounts.filter(col("__cp") > 1)
        .orderBy(col("cnt").desc, col("piece").asc)
        .limit(math.max(0, seedSize - singles.length))
        .select(col("piece"), col("cnt")).collect()
        .map(r => (r.getString(0), r.getLong(1)))
      var model = fit(singles.toSeq, multis.toSeq)

      // ---- hard-EM passes ----
      var it = 0
      while (it < iters) {
        val last = it == iters - 1
        val counts = words
          .select(col("freq"),
            explode(ColumnBridge.column(UnigramPieces(
              ColumnBridge.expression(array(col("word"))), model)))
              .as("piece"))
          .filter(col("piece") =!= Unk)
          .groupBy(col("piece")).agg(sum(col("freq")).as("cnt"))
          .collect().map(r => (r.getString(0), r.getLong(1)))
        def cpLen(p: String): Int = p.codePointCount(0, p.length)
        val byPiece = counts.toMap
        // single chars persist even at zero count (coverage floor)
        val singlesNow = singles.map { case (p, _) =>
          (p, byPiece.getOrElse(p, 0L)) }
        val multisNow = counts.filter(p => cpLen(p._1) > 1)
          .toSeq.sortBy(p => (-p._2, p._1))
        val keptMultis =
          if (!last) multisNow
          else multisNow.take(math.max(0, vocabSize - singlesNow.length))
        model = fit(singlesNow.toSeq, keptMultis)
        it += 1
      }
      model
    } finally { words.unpersist(); () }
  }

  /** Soft-EM (forward-backward) training — the full SentencePiece
    * E-step: instead of crediting only each word's single Viterbi
    * segmentation, every piece collects its POSTERIOR expected count
    * over all segmentations of the lattice
    * ([[graft.functions.UnigramModel.expectedMicro]], Kudo 2018 §3.2).
    * Ambiguous words thus split their mass across competing pieces and
    * a near-tie no longer starves the runner-up to zero — the standard
    * fix for hard-EM's winner-take-all local optima.
    *
    * Determinism on the house grid: each word's per-piece expectation
    * is computed with a fully order-pinned float DP and gridded to
    * `floor(e·10⁶)` INSIDE the kernel; the cross-word aggregation sums
    * `freq · e_micro` as DECIMAL(38,0) — exact, order-independent,
    * repartition-invariant (no float summation ever crosses rows).
    * M-step log-probs are driver-side `ln(count/total)` over the
    * micro-count table; zero-expectation single chars keep the
    * 0.5-micro-unit coverage floor (below any real count, same role as
    * [[fit]]'s 0.5). Seeding, pruning, and the encode side (Viterbi —
    * the sentencepiece default) are shared with [[train]].
    *
    * Scale shape: identical to [[train]] — each E-step is one codegen'd
    * kernel pass + one hash aggregate over DISTINCT WORDS; driver state
    * bounded by `seedSize`.
    */
  def trainSoft(docs: DataFrame, textCol: String, vocabSize: Int,
                maxPieceLen: Int = 8, seedSize: Int = 4096,
                iters: Int = 3): UnigramModel = {
    require(vocabSize >= 1 && maxPieceLen >= 1 && seedSize >= 1 &&
      iters >= 1, "vocabSize, maxPieceLen, seedSize, iters must be >= 1")
    val words = BpeTrain.wordTable(docs, textCol)
      .select(col("word"), col("freq"))
      .persist()
    try {
      // seed identically to the hard-EM path (counts are exact there)
      val subCounts = words
        .select(col("freq"), explode(ColumnBridge.column(AllSubstrings(
          ColumnBridge.expression(col("word")), maxPieceLen))).as("piece"))
        .groupBy(col("piece")).agg(sum(col("freq")).as("cnt"))
        .withColumn("__cp", length(col("piece")))
      val singles = subCounts.filter(col("__cp") === 1)
        .select(col("piece"), col("cnt")).collect()
        .map(r => (r.getString(0), r.getLong(1)))
      val multis = subCounts.filter(col("__cp") > 1)
        .orderBy(col("cnt").desc, col("piece").asc)
        .limit(math.max(0, seedSize - singles.length))
        .select(col("piece"), col("cnt")).collect()
        .map(r => (r.getString(0), r.getLong(1)))
      var model = fit(singles.toSeq, multis.toSeq)

      var it = 0
      while (it < iters) {
        val last = it == iters - 1
        val counts = words
          .select(col("freq"),
            explode(ColumnBridge.column(UnigramExpected(
              ColumnBridge.expression(col("word")), model))).as("pe"))
          .filter(col("pe.piece") =!= Unk)
          // DECIMAL(38,0) product + sum: exact for any corpus that fits
          // 38 digits of micro-mass (≈10³⁸⁻⁶ expected tokens)
          .groupBy(col("pe.piece").as("piece"))
          .agg(sum(col("freq").cast("decimal(19,0)") *
            col("pe.e_micro").cast("decimal(19,0)")).as("c"))
          .collect()
          .map(r => (r.getString(0),
            BigInt(r.getDecimal(1).toBigInteger)))
        def cpLen(p: String): Int = p.codePointCount(0, p.length)
        val byPiece = counts.toMap
        val singlesNow = singles.map { case (p, _) =>
          (p, byPiece.getOrElse(p, BigInt(0))) }
        val multisNow = counts
          .filter(p => cpLen(p._1) > 1)
          .toSeq.sortBy(p => (-p._2, p._1))
        val keptMultis =
          if (!last) multisNow
          else multisNow.take(math.max(0, vocabSize - singlesNow.length))
        model = fitMicro(singlesNow.toSeq, keptMultis)
        it += 1
      }
      model
    } finally { words.unpersist(); () }
  }

  /** [[fit]] over exact micro-grid BigInt expected counts (soft-EM
    * M-step): lp = ln(c/total); zero-count single chars at the
    * 0.5-micro-unit floor (below the smallest real count, 1 micro).
    */
  private def fitMicro(singles: Seq[(String, BigInt)],
                       multis: Seq[(String, BigInt)]): UnigramModel = {
    val all = singles ++ multis
    val total = all.map(_._2).sum.max(BigInt(1))
    val floorLp = math.log(0.5 / total.toDouble)
    val entries = all.map { case (p, c) =>
      (p, if (c > 0) math.log(c.toDouble / total.toDouble) else floorLp)
    }
    new UnigramModel(entries, Unk, floorLp + math.log(0.5))
  }

  /** Log-prob table from (piece, count) sets: learned pieces at
    * ln(count/total); zero-count single chars at the ln(0.5/total)
    * coverage floor; UNK one grade below the floor.
    */
  private def fit(singles: Seq[(String, Long)],
                  multis: Seq[(String, Long)]): UnigramModel = {
    val all = singles ++ multis
    val total = math.max(1L, all.map(_._2).sum)
    val floorLp = math.log(0.5 / total.toDouble)
    val entries = all.map { case (p, c) =>
      (p, if (c > 0) math.log(c.toDouble / total.toDouble) else floorLp)
    }
    new UnigramModel(entries, Unk, floorLp + math.log(0.5))
  }

  /** Viterbi pieces of each document's token array under `model` —
    * stateless codegen'd kernel, scan-bound.
    */
  def encodePieces(toks: Column, model: UnigramModel): Column =
    ColumnBridge.column(UnigramPieces(ColumnBridge.expression(toks), model))

  /** SAMPLED pieces (subword regularization, Kudo 2018): one draw from
    * `P(segmentation|word)^alpha` per word via deterministic
    * forward-filtering backward-sampling — same (word, seed) gives the
    * same pieces on every executor and partitioning, so augmented
    * epochs are reproducible by seed. Stateless codegen'd kernel,
    * scan-bound like [[encodePieces]].
    */
  def encodePiecesSampled(toks: Column, model: UnigramModel,
                          alpha: Double, seed: Long): Column = {
    // finite, not just >= 0: the codegen path embeds alpha as a Java
    // double literal, and Infinity/NaN have no such literal form
    require(alpha >= 0.0 && java.lang.Double.isFinite(alpha),
      "alpha must be finite and >= 0")
    ColumnBridge.column(UnigramPiecesSampled(
      ColumnBridge.expression(toks), model, alpha, seed))
  }
}
